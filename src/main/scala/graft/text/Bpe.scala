package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-TRAINING step
  * of a data pipeline (the merge table IS the tokenizer; Sennrich's
  * classic algorithm: repeatedly merge the most frequent adjacent
  * symbol pair within words, weighted by word frequency). Not a
  * reference operator: LLM-pipeline extension family, the trainer
  * behind the Vocab/subword encoders.
  *
  * Scale shape (100 TB): the corpus is touched by exactly ONE
  * aggregate — the word-frequency table (one shuffle, output
  * vocabulary-sized). Every merge round then runs over that
  * VOCAB-sized frame: pair counts weighted by `freq`, a
  * pairs-bounded aggregate, a top-1 TakeOrdered to the driver (the
  * growing merge list is model-sized driver state, like the PQ
  * codebooks), and a literal replace over the word reprs. Rounds are
  * the small merge-budget constant; none of them rescan the corpus.
  *
  * Determinism: pair choice orders by (count desc, lhs asc, rhs asc)
  * — ASCII binary order in both engines; counts are exact integers;
  * the merge application is single-pattern left-to-right
  * non-overlapping literal replace, identical in Spark and DuckDB
  * (classic BPE's greedy re-pairing). Words are held in a
  * \u0001-wrapped symbol form (\u0001a\u0001\u0001b\u0001...) so a
  * merged symbol can never false-match inside a neighbor: the
  * pattern \u0001lhs\u0001\u0001rhs\u0001 requires both full
  * symbols with their separators (\u0001 cannot occur in
  * whitespace-split tokens).
  */
object Bpe {
  private val Sep = "\u0001"

  /** Train `rounds` merges on the corpus (stops early if no adjacent
    * pair remains). Returns (step, lhs, rhs, merged, cnt) — step
    * 1-based, cnt the frequency-weighted pair count that won the
    * round.
    */
  def trainMerges(df: DataFrame, rounds: Int,
      textCol: String = "text"): DataFrame =
    trainWithReprs(df, rounds, textCol)._1

  /** Tokenize-and-count with the trained tokenizer: every document's
    * word sequence is encoded against the final merged reprs (word →
    * subword count joins back as a broadcast — the repr table is
    * vocabulary-sized), giving per-doc word/subword counts and the
    * chars-per-token compression signal a pipeline budgets with.
    * Assumes the corpus sustains all `rounds` merges (the fixture
    * corpora do); on an exhausted corpus the trained table is simply
    * shorter and the counts reflect the merges that exist.
    */
  def subwordCounts(df: DataFrame, rounds: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val (_, reprs) = trainWithReprs(df, rounds, textCol)
    val nsub = reprs.select(col("word"),
      size(split(col("s"), Sep + Sep)).as("n_sub"))
    val dtok = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("word"))
    dtok.join(broadcast(nsub), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subwords"))
      .withColumn("ratio",
        col("n_subwords").cast("double") / col("n_words").cast("double"))
  }

  /** The training loop. Returns (merge table, final word reprs
    * (word, freq, s)) — the reprs are what [[subwordCounts]] encodes
    * against.
    */
  private[text] def trainWithReprs(df: DataFrame, rounds: Int,
      textCol: String): (DataFrame, DataFrame) = {
    require(rounds > 0, s"rounds must be positive: $rounds")
    val spark = df.sparkSession
    import spark.implicits._

    // the one corpus-sized pass: word → frequency
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // char-level repr: sep-wrapped symbols, double-sep joints
    var reprs = words.select(col("word"), col("freq"),
        concat(lit(Sep),
          concat_ws(Sep + Sep,
            regexp_extract_all(col("word"), lit("."), lit(0))),
          lit(Sep)).as("s"))
      .localCheckpoint() // vocab-sized; bounds lineage across rounds

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < rounds && !exhausted) {
      val toks = transform(split(col("s"), Sep + Sep), x => trim(x, Sep))
      val prs = reprs
        .select(col("freq"), explode(zip_with(
          slice(toks, lit(1), greatest(size(toks) - lit(1), lit(0))),
          slice(toks, lit(2), greatest(size(toks) - lit(1), lit(0))),
          (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("pr"))
        .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .agg(sum(col("freq")).as("cnt"))
      // top-1 plans as TakeOrdered — per-partition heads, no global sort
      val top = prs.orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((k + 1, l, r, l + r, c))
        reprs = reprs.select(col("word"), col("freq"),
            replace(col("s"), lit(Sep + l + Sep + Sep + r + Sep),
              lit(Sep + l + r + Sep)).as("s"))
        k += 1
        // a replace projection over the vocab-sized frame is cheaper
        // to recompute than to materialize (one extra job + a disk
        // round-trip per round); checkpoint only every 8th MID-LOOP
        // round so large merge budgets keep lineage bounded without
        // paying a final materialization no consumer needs
        if (k % 8 == 0 && k < rounds) reprs = reprs.localCheckpoint()
      }
    }
    (merges.toSeq.toDF("step", "lhs", "rhs", "merged", "cnt"), reprs)
  }
}
