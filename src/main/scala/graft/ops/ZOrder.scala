package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * so that a scan filtered on EITHER (or both) of two columns prunes
  * most file buckets by min/max statistics. Sorting by one column
  * gives perfect pruning on it and none on the other; interleaving
  * the bits of both keys gives ~√ pruning on each — the layout
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY` and a
  * first-class 100-TB concern (at that scale the winning query plan
  * is the one that never reads 99% of the files).
  *
  * Like those systems, the curve runs over per-dimension RANK
  * buckets, not raw values: ranks are domain-independent (no
  * bit-width contract on the data, skew flattens into equi-depth
  * cells), and here they are EXACT global ranks from the two-phase
  * prefix machinery, so the whole layout is deterministic and
  * engine-reproducible — production systems trade that determinism
  * for sampling-based range ids to save the rank shuffles.
  */
object ZOrder {

  /** Bit-interleaved Morton value of two ints in [0, 2^bits):
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure codegen'd shift/mask arithmetic, zero shuffle; inputs
    * outside the domain raise rather than silently fold together.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of [1,31]")
    def guard(c: Column): Column =
      when(c < 0 || c >= lit(1L << bits),
        raise_error(concat(lit(s"zValue input out of [0, 2^$bits): "),
          c.cast("string"))))
        .otherwise(c.cast("long"))
    val (ga, gb) = (guard(a), guard(b))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(ga, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(gb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Lay `df` out along the Z-curve over (`a`, `b`): each dimension
    * is reduced to its equi-depth quantile cell (exact global rank →
    * `floor(rank·2^bits/n)`), the cells interleave into `zvalue`,
    * and rows take fixed-size `bucket`s (the file-sized write units)
    * in curve order. `tiebreak` must make both per-dimension orders
    * and the curve order total (a unique key column).
    *
    * Scale shape: three range shuffles (rank a, rank b, curve order)
    * and nothing else — each one the [[PrefixSum.withRunningTotal]]
    * two-phase scan, never a single-partition window. Ranks and
    * bucket ids are exact up to the 2^53 double-floor bound
    * (~9e15 rows — see [[PrefixSum.shardShuffle]]).
    *
    * Output: input columns + (`zvalue`, `bucket`, `bucket_pos`).
    */
  def zOrderBuckets(df: DataFrame, a: Column, b: Column, tiebreak: Column,
      bits: Int = 12, bucketSize: Long = 1024L): DataFrame = {
    val n = df.count()
    require(n > 0, "zOrderBuckets: empty input")
    val cells = 1L << bits
    def quantileId(d: DataFrame, c: Column, out: String): DataFrame =
      PrefixSum.withRunningTotal(d, Seq(c, tiebreak), lit(1L), "__r")
        .withColumn(out,
          floor((col("__r") - 1) * lit(cells) / lit(n)).cast("long"))
        .drop("__r")
    PrefixSum.shardShuffle(
      quantileId(quantileId(df, a, "__qa"), b, "__qb")
        .withColumn("zvalue", zValue(col("__qa"), col("__qb"), bits)),
      Seq(col("zvalue"), tiebreak), bucketSize,
      outShard = "bucket", outPos = "bucket_pos")
      .drop("__qa", "__qb")
  }
}
