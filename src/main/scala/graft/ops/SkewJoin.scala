package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the third tool next to
  * broadcast (small side fits in memory) and AQE's skew-join split
  * (OptimizeSkewedJoin rebalances at runtime from shuffle stats).
  * Explicit salting is the remaining case: BOTH sides too big to
  * broadcast, and the hot keys known/stable enough that waiting for
  * a runtime re-plan wastes a stage — e.g. the null-ish default key
  * of a dimension join, or a power-law user id in a 100-TB event
  * join.
  *
  * Mechanics: the big side gets a deterministic salt in [0, S) per
  * row; the other side is replicated S ways (one copy per salt
  * value). The join key becomes (key, salt), spreading one hot key
  * over S reducers. Cost: the replicated side shuffles S× its size —
  * salt only the keys that need it (`hotKeys`), so the multiplier
  * applies to a handful of rows, not the whole table.
  */
object SkewJoin {

  /** Inner equi-join with per-hot-key salting. `hotKeys` rows of
    * `big` are salted into `saltFactor` sub-keys and the matching
    * `other` rows are replicated; cold keys join 1:1 exactly as an
    * unsalted join. Result set is identical to
    * `big.join(other, keys)` — every big row still meets every
    * matching other row exactly once (its own salt copy).
    *
    * The salt derives from xxhash64 of the big side's whole row —
    * deterministic (no rand(), so retried/speculated tasks
    * regenerate identical salts; rand() here would be a correctness
    * bug under task retry, not just nondeterminism).
    */
  def saltedJoin(big: DataFrame, other: DataFrame, keys: Seq[String],
      hotKeys: DataFrame, saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 1, "saltFactor must exceed 1")
    val saltCol = "graft_salt"
    require(!(big.columns ++ other.columns).contains(saltCol),
      s"inputs must not contain reserved column $saltCol")
    val hot = broadcast(hotKeys.select(keys.map(col): _*).distinct()
      .withColumn("graft_hot", lit(true)))
    // big side: salt hot rows across [0, S), cold rows pinned to 0
    val bigSalted = big.join(hot, keys, "left")
      .withColumn(saltCol,
        when(col("graft_hot"),
          pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor))
            .cast("int"))
          .otherwise(lit(0)))
      .drop("graft_hot")
    // other side: replicate hot rows S ways, cold rows once at salt 0
    val otherSalted = other.join(hot, keys, "left")
      .withColumn(saltCol,
        explode(when(col("graft_hot"),
            sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("graft_hot")
    bigSalted.join(otherSalted, keys :+ saltCol).drop(saltCol)
  }
}
