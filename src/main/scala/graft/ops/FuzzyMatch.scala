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
    *
    * Two RECALL-FREE prunes ride the blocking (the match set is
    * provably identical, so the oracle contract is untouched):
    * a length band on the join — dist ≤ e forces
    * |len(a) − len(b)| ≤ e, so longer/shorter pairs never
    * materialize out of the join — and the THRESHOLDED Levenshtein
    * (`levenshtein(l, r, e)`, Ukkonen banding: cost O(len·e) per
    * pair instead of O(len²), early exit at e+1, -1 past the
    * threshold). Both matter precisely when a block key is coarse:
    * the within-block quadratic term is the scale cost of the
    * explicit recall contract, and these cut its constant without
    * touching which pairs can match. The structural dial remains the
    * block key itself ([[prefixBlock]], composite keys) — at 10×
    * data with a FIXED-cardinality block key the quadratic shows
    * (measured: the q90 nation-blocked register grows ~18× wall at
    * 10× rows pre-prune), which is the expected Σ|Lb|·|Rb| curve,
    * not a plan regression.
    */
  def fuzzyPairs(left: DataFrame, right: DataFrame, maxEdits: Int,
      idCol: String = "id", keyCol: String = "key",
      blockCol: String = "block"): DataFrame = {
    require(maxEdits >= 0, s"maxEdits must be non-negative: $maxEdits")
    val l = left.select(col(idCol).as("left_id"),
      col(keyCol).as("left_key"), col(blockCol).as("lblock"))
    val r = right.select(col(idCol).as("right_id"),
      col(keyCol).as("right_key"), col(blockCol).as("rblock"))
    l.join(r, col("lblock") === col("rblock") &&
        abs(length(col("left_key")) - length(col("right_key"))) <= maxEdits)
      .withColumn("dist",
        levenshtein(col("left_key"), col("right_key"), maxEdits))
      .filter(col("dist") >= 0)
      .select(col("left_id"), col("right_id"), col("dist"))
  }
}
