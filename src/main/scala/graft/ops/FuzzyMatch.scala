package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): find (left, right)
  * pairs whose key strings are within `maxEdits` Levenshtein
  * distance — names, titles, addresses — WITHOUT the all-pairs
  * cross product.
  *
  * Blocking: candidate pairs are generated only where the two
  * sides' `blockCol` values are equal — a coarse deterministic
  * partition of the entity space (country, zip prefix, phonetic
  * code, [[prefixBlock]]). Recall is exactly "matches whose sides
  * share a block": an explicit, measurable contract (unit-pinned
  * here), not a silent approximation — and the knob is the block
  * key's granularity, traded against the within-block quadratic
  * cost.
  *
  * Scale shape: one equi-shuffle on the block key; Levenshtein runs
  * only inside blocks (cost Σ_b |Lb|·|Rb|, bounded by the largest
  * block — watch skew in the block key like any join key). Both
  * Spark and DuckDB ship the same classic edit distance, which makes
  * the whole match set oracle-checkable.
  */
object FuzzyMatch {

  /** Classic prefix block key: lowercased first `prefixLen` chars of
    * the match key. An edit budget of e disturbs the prefix only
    * when an edit lands inside it.
    */
  def prefixBlock(key: Column, prefixLen: Int): Column =
    lower(substring(key, 1, prefixLen))

  /** Pairs (left_id, right_id, dist) with Levenshtein
    * dist <= maxEdits, candidates blocked on `blockCol` equality.
    * Both inputs must expose (idCol, keyCol, blockCol).
    */
  def fuzzyPairs(left: DataFrame, right: DataFrame, maxEdits: Int,
      idCol: String = "id", keyCol: String = "key",
      blockCol: String = "block"): DataFrame = {
    require(maxEdits >= 0, s"maxEdits must be non-negative: $maxEdits")
    val l = left.select(col(idCol).as("left_id"),
      col(keyCol).as("left_key"), col(blockCol).as("block"))
    val r = right.select(col(idCol).as("right_id"),
      col(keyCol).as("right_key"), col(blockCol).as("block"))
    l.join(r, "block")
      .withColumn("dist", levenshtein(col("left_key"), col("right_key")))
      .filter(col("dist") <= maxEdits)
      .select(col("left_id"), col("right_id"), col("dist"))
  }
}
