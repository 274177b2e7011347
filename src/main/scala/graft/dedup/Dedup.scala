package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact
  * (content-hash), exact similarity (n-gram Jaccard over a shingle
  * inverted index), and sketch-based near-dup (MinHash+LSH, SimHash)
  * — north-star extension scope (SURVEY §7.1 step 7); the reference
  * has no dedup beyond delegating last-write-wins to ClickHouse's
  * ReplacingMergeTree (tablesqlbuilder.py:392-398 in
  * /root/reference), which graft.ops.Transforms.replacingFinal
  * covers.
  *
  * Scale design rule enforced throughout: NO all-pairs join. Every
  * candidate pair is generated through a bucketed equi-join (shared
  * shingle, shared LSH band, shared SimHash chunk), so the shuffle
  * key spreads over the corpus and AQE can split skewed buckets.
  * Expensive exact verification (set intersection) runs only on the
  * candidate pairs that survive bucketing.
  */
object Dedup {

  /** Sentinel default for `jaccardPairs.maxDF`: size the hot-shingle
    * cap from the corpus itself — `max(1000, 1% of docs)`.
    */
  val AdaptiveMaxDF: Long = -1L

  /** Explicitly uncapped: exact Jaccard over the full shingle sets.
    * For oracle-pinned exactness only — at corpus scale an uncapped
    * index leaves the hot-shingle bucket bomb armed.
    */
  val UncappedMaxDF: Long = Long.MaxValue

  /** Exact dedup by content hash: one row per distinct normalized
    * text, keeping the lowest document id (the usual "first writer
    * wins" keeper rule). One hash-shuffle at any scale.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_doc_id"))

  /** Per-document distinct k-shingle set, exploded to
    * (doc_id, shingle) rows — the inverted-index long format — plus
    * the per-doc set kept as an array for verification joins.
    */
  def shingleRows(docs: DataFrame, k: Int, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        array_distinct(TextAnalysis.shingles(col(textCol), k)).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("shingle"))

  /** Corpus n-gram novelty curve — per document (in `idCol` order,
    * the ingestion order), how much of it is NEW to the corpus: the
    * fraction of its distinct k-shingles whose FIRST occurrence
    * (minimum doc id) is this document. A falling novelty curve is
    * the standard corpus-saturation signal ("more crawl is mostly
    * re-crawl"), and per-source novelty rates drive crawl budget
    * allocation — the acquisition-side complement of the dedup
    * operators (dedup removes what this measures).
    *
    * Returns (doc_id, n_grams, novel, novelty) for documents with at
    * least one shingle (a doc shorter than k tokens has no grams and
    * no row), ordered by doc_id.
    *
    * Scale shape: no pair join anywhere — unlike [[jaccardPairs]]
    * the gram frame never self-joins. One shuffle keyed on the
    * shingle computes each gram's first-occurrence doc with
    * map-side-combined `min`; its result is regrouped by that first
    * doc into per-doc novel counts (gram-cardinality input, doc-
    * cardinality output); the per-doc gram totals ride the same
    * scan. The final join co-partitions two doc-keyed frames. Hot
    * shingles cost one combiner cell each — there is no bucket bomb
    * to cap (cf. [[jaccardPairs]]' maxDF).
    */
  def ngramNovelty(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rows = shingleRows(docs, k, idCol, textCol)
    val perDoc = rows.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val novel = rows.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("nov"))
    perDoc.join(novel, col("doc_id") === col("first_doc"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("nov"), lit(0L)).as("novel"),
        (coalesce(col("nov"), lit(0L)).cast("double") /
          col("n_grams").cast("double")).as("novelty"))
      .orderBy("doc_id")
  }

  /** Source-pair overlap matrix — for every unordered pair of values
    * of `groupCol` (crawl/source/domain buckets), the exact Jaccard
    * and directional containments of their distinct k-shingle sets.
    * This is the corpus-composition view of redundancy: [[jaccardPairs]]
    * answers "which DOCUMENTS duplicate each other", this answers
    * "how much of source B is already covered by source A" — the
    * number dataset-mixture design needs before re-weighting sources
    * (a mirror of CommonCrawl-snapshot overlap studies; cf. the
    * reference's per-table routing in src/pumper.py, which treats
    * sources as disjoint — here we measure whether they are).
    *
    * Scale shape: NO doc-pair join, NO corpus self-join, and the
    * corpus is scanned EXACTLY ONCE. The per-source distinct shingle
    * sets are one map-side-combined aggregate; each shingle then
    * carries its source SET (bounded by the source count, like a
    * label census — `collect_set` here is bucket-bomb-free because
    * its cardinality is |sources|, not corpus); exploding ordered
    * pairs INCLUDING self-pairs (a,a) lets one census-sized
    * aggregate deliver both the intersections (a<b rows) and the
    * per-source set sizes (diagonal rows), so no second pass over
    * the corpus is needed. Per-shingle cost ≤ |sources|²,
    * independent of how many documents share the shingle. That
    * sources²-sized count frame is eagerly materialized
    * (localCheckpoint — the census-frame precedent) and everything
    * downstream is census-only. Output is |sources|²/2 rows;
    * zero-overlap pairs are kept (jaccard 0.0) via the pair grid.
    */
  def sourceOverlap(docs: DataFrame, k: Int = 3, textCol: String = "text",
      groupCol: String = "source"): DataFrame = {
    // sources²-sized; feeds sizes AND intersections — materialized so
    // the corpus chain runs once
    val counts = sourcePairCounts(docs, k, textCol, groupCol)
      .localCheckpoint()
    val sizes = counts.filter(col("source_a") === col("source_b"))
      .select(col("source_a").as("src"), col("cnt").as("n"))
    val inter = counts.filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("cnt").as("inter"))
    // the pair grid is |sources|² — census-sized by construction, so
    // both joins pin the broadcast side explicitly
    val grid = sizes.select(col("src").as("source_a"), col("n").as("n_a"))
      .crossJoin(broadcast(
        sizes.select(col("src").as("source_b"), col("n").as("n_b"))))
      .filter(col("source_a") < col("source_b"))
    grid.join(broadcast(inter), Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("inter"), lit(0L)).as("inter"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("inter"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .as("jaccard"),
        (col("inter").cast("double") / col("n_a").cast("double"))
          .as("containment_a"),
        (col("inter").cast("double") / col("n_b").cast("double"))
          .as("containment_b"))
      .orderBy("source_a", "source_b")
  }

  /** [[sourceOverlap]]'s single corpus pass, pre-checkpoint (exposed
    * so plan tests can pin the scan shape): ordered source pairs per
    * shingle INCLUDING self-pairs, counted — diagonal rows (a,a) are
    * the per-source distinct-shingle set sizes, off-diagonal rows
    * (a<b) the pairwise intersections.
    */
  private[graft] def sourcePairCounts(docs: DataFrame, k: Int,
      textCol: String, groupCol: String): DataFrame =
    docs
      .select(col(groupCol).as("src"),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), k)))
          .as("shingle"))
      .distinct() // Aggregate on (src, shingle): map-side combined
      .groupBy(col("shingle"))
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
      .select(explode(col("srcs")).as("source_a"), col("srcs"))
      .select(col("source_a"), explode(col("srcs")).as("source_b"))
      .filter(col("source_a") <= col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("cnt"))

  /** Exact n-gram Jaccard similarity pairs with J >= `threshold`.
    *
    * Candidate generation is the shingle inverted index: join docs
    * sharing a shingle, count shared shingles per pair, derive
    * J = |A∩B| / (|A|+|B|-|A∩B|) exactly from integer counts (one
    * integer division — bit-identical in any engine).
    *
    * `maxDF` drops ultra-common "stop shingles" from the index
    * before the pair join — the standard frequency cap that keeps
    * the per-shingle bucket size (and so the join fan-out) bounded
    * at corpus scale. Pairs sharing ONLY capped shingles can be
    * missed; with the cap well above any natural document frequency
    * this is recall-neutral (fixture max df = 25 at 5k docs), while
    * a hot shingle shared by 1M docs can no longer produce a
    * 10^12-row bucket. THE SAFE MODE IS THE DEFAULT MODE:
    * [[AdaptiveMaxDF]] sizes the cap as `max(1000, 1% of corpus)` —
    * one column-pruned count() — so the production entry points
    * never run with the bucket bomb armed; pass [[UncappedMaxDF]]
    * explicitly where exact uncapped Jaccard is pinned (the oracle
    * queries).
    *
    * Capped shingles still count toward |A∩B|? No — both the
    * intersection count and the set sizes are computed on the CAPPED
    * index, consistently on both sides of the ratio, so J is the
    * Jaccard of the capped shingle sets.
    */
  def jaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.5,
      maxDF: Long = AdaptiveMaxDF, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val cap =
      if (maxDF == AdaptiveMaxDF) math.max(1000L, docs.count() / 100)
      else { require(maxDF > 0, s"maxDF must be positive, got $maxDF"); maxDF }
    // NOT materialized, deliberately: the index feeds both sides of
    // the pair self-join, but a localCheckpoint here measured ~12%
    // SLOWER than recomputation (the disk round-trip of the exploded
    // index costs more than a second explode). When the post-window
    // side is small it broadcasts and the explode runs twice
    // (cheaply); when both sides shuffle on `shingle` — the 100-TB
    // regime — the subplans are identical and Spark's ReuseExchange
    // rule shares one scan+explode+shuffle.
    val rows = shingleRows(docs, k, idCol, textCol)
    val capped =
      if (cap == Long.MaxValue) rows
      else {
        val hot = rows.groupBy("shingle").count()
          .filter(col("count") > cap).select("shingle")
        // recompute per-doc sizes on the capped index so the ratio
        // is consistent
        rows.join(broadcast(hot), Seq("shingle"), "left_anti")
          .withColumn("n_sh",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id")))
      }
    // Prune shingles with document frequency 1 BEFORE the self-join:
    // they cannot produce a pair, and in real corpora they are the
    // vast majority of the index (80-95%). The per-doc sizes na/nb
    // were computed on the FULL index above, so the Jaccard ratio is
    // unchanged — only dead join input is dropped. The window runs
    // partitioned by shingle, which is exactly the self-join key, so
    // the join below reuses the window's exchange+sort instead of
    // re-shuffling both sides.
    val paired = capped
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("df") > 1)
      .drop("df")
    val a = paired.select(col("doc_id").as("doc_a"), col("n_sh").as("na"),
      col("shingle"))
    val b = paired.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"),
      col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("j", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("j") >= threshold)
      .select("doc_a", "doc_b", "j")
  }

  /** Asymmetric containment pairs: ordered (doc_sub, doc_sup) where
    * the k-shingle set of `doc_sub` is ≥ `thresholdPpm` contained in
    * `doc_sup`'s — C(A,B) = |A∩B| / |A|, the quote/excerpt/superset
    * relation that resemblance Jaccard structurally misses (a 50-word
    * excerpt inside a 5000-word page has J ≈ 0.01 but C = 1.0; the
    * LSH-Ensemble problem setting, Zhu et al., VLDB'16). Training
    * pipelines use it to drop documents subsumed by a longer
    * near-superset instead of keeping both.
    *
    * Candidate generation and the hot-shingle cap are exactly
    * [[jaccardPairs]]'s (shared inverted index, bucketed equi-join,
    * no all-pairs); only the score changes — and it is computed in
    * integer ppm (`inter * 1_000_000 div n_sub`), bit-identical in
    * any engine. Both orientations of a candidate pair are scored;
    * each passing orientation is one output row.
    */
  def containmentPairs(docs: DataFrame, k: Int = 3,
      thresholdPpm: Long = 800000L, maxDF: Long = AdaptiveMaxDF,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cap =
      if (maxDF == AdaptiveMaxDF) math.max(1000L, docs.count() / 100)
      else { require(maxDF > 0, s"maxDF must be positive, got $maxDF"); maxDF }
    val rows = shingleRows(docs, k, idCol, textCol)
    val capped =
      if (cap == Long.MaxValue) rows
      else {
        val hot = rows.groupBy("shingle").count()
          .filter(col("count") > cap).select("shingle")
        rows.join(broadcast(hot), Seq("shingle"), "left_anti")
          .withColumn("n_sh",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id")))
      }
    val paired = capped
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("df") > 1)
      .drop("df")
    val a = paired.select(col("doc_id").as("doc_a"), col("n_sh").as("na"),
      col("shingle"))
    val b = paired.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"),
      col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
    // score both orientations; each row is one direction of containment
    inter.select(col("doc_a").as("doc_sub"), col("doc_b").as("doc_sup"),
        col("inter"), col("na").cast("long").as("n_sub"))
      .unionByName(inter.select(col("doc_b").as("doc_sub"),
        col("doc_a").as("doc_sup"), col("inter"), col("nb").cast("long").as("n_sub")))
      .withColumn("contain_ppm",
        expr("(inter * 1000000) div n_sub"))
      .filter(col("contain_ppm") >= thresholdPpm)
      .select("doc_sub", "doc_sup", "inter", "n_sub", "contain_ppm")
  }

  /** Incremental near-dup check: which documents of a NEW ingest
    * `batch` duplicate something already in `corpus` — the
    * steady-state form of dedup once a corpus exists (re-running the
    * all-pairs self-join over corpus+batch to ingest 0.1% new data
    * would redo 99.9% of the work). Exact `k`-shingle Jaccard, like
    * [[jaccardPairs]], but asymmetric: only batch×corpus pairs form.
    *
    * Scale shape: the batch's shingle index is ingest-batch-sized
    * and BROADCASTS; the corpus index is scanned once in place and
    * never shuffles — only the candidate hits (corpus rows sharing a
    * shingle with the batch) flow into the per-pair count, the
    * [[contaminationScan]] shape upgraded to pair-level Jaccard.
    * The hot-shingle cap (computed on the corpus, applied to both
    * sides so the ratio stays consistent — [[jaccardPairs]]'s
    * convention) bounds the per-shingle fanout; `UncappedMaxDF`
    * pins exactness where an oracle requires it.
    *
    * Output (batch_doc, corpus_doc, j), one row per qualifying pair;
    * a batch doc absent from the output is genuinely novel.
    */
  def incrementalJaccardPairs(corpus: DataFrame, batch: DataFrame,
      k: Int = 3, threshold: Double = 0.5, maxDF: Long = AdaptiveMaxDF,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cap =
      if (maxDF == AdaptiveMaxDF) math.max(1000L, corpus.count() / 100)
      else { require(maxDF > 0, s"maxDF must be positive, got $maxDF"); maxDF }
    val cRows = shingleRows(corpus, k, idCol, textCol)
    val bRows = shingleRows(batch, k, idCol, textCol)
    val (c, b) =
      if (cap == Long.MaxValue) (cRows, bRows)
      else {
        val hot = cRows.groupBy("shingle").count()
          .filter(col("count") > cap).select("shingle")
        def capped(r: DataFrame) =
          r.join(broadcast(hot), Seq("shingle"), "left_anti")
            .withColumn("n_sh",
              count(lit(1)).over(org.apache.spark.sql.expressions.Window
                .partitionBy("doc_id")))
        (capped(cRows), capped(bRows))
      }
    c.select(col("doc_id").as("corpus_doc"), col("n_sh").as("nc"),
        col("shingle"))
      .join(broadcast(b.select(col("doc_id").as("batch_doc"),
        col("n_sh").as("nb"), col("shingle"))), Seq("shingle"))
      .groupBy("batch_doc", "corpus_doc", "nb", "nc")
      .agg(count(lit(1)).as("inter"))
      .withColumn("j", col("inter").cast("double") /
        (col("nb") + col("nc") - col("inter")).cast("double"))
      .filter(col("j") >= threshold)
      .select("batch_doc", "corpus_doc", "j")
  }

  // ---------------------------------------------------------------
  // MinHash + banded LSH
  // ---------------------------------------------------------------

  private val P = 1000000007L

  /** Deterministic universal-hash coefficients (a_i, b_i), seeded so
    * signatures are stable across runs and engines.
    */
  private def coefs(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((1L + math.abs(rnd.nextLong()) % (P - 1),
      math.abs(rnd.nextLong()) % P))
  }

  private def shingleHashes(text: Column, k: Int): Column =
    transform(array_distinct(TextAnalysis.shingles(text, k)),
      TextAnalysis.polyHash(_))

  /** MinHash signature array (length numHashes) per document:
    * sig_i = min over shingles s of (a_i * polyHash(s) + b_i) mod P.
    * Pure per-row array math — no shuffle, scan-parallel.
    *
    * Computed by the native MinHashSig expression — one tight loop
    * over the shingle hashes. (A naive `numHashes x array_min(...)`
    * formulation duplicates the whole shingle-hash subexpression
    * per hash function and blows the Catalyst tree to millions of
    * nodes: driver-side planning minutes, not data seconds.)
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val cs = coefs(numHashes)
    graft.functions.HashExpressions.minhashSig(
      shingleHashes(text, k), cs.map(_._1), cs.map(_._2))
  }

  /** Near-dup pairs via banded MinHash-LSH, verified by exact
    * Jaccard.
    *
    * numHashes = bands * rowsPerBand; docs agreeing on all rows of
    * at least one band become candidates (equi-join on
    * (band, bandHash) — bucketed, never all-pairs), then candidates
    * are verified with the exact shingle-set Jaccard so the output
    * contains no false positives. With 16 bands x 4 rows, a pair at
    * J=0.9 is missed with probability (1-0.9^4)^16 ~ 4e-8 — the
    * standard recall/bucket-size dial.
    */
  def minhashDedup(docs: DataFrame, k: Int = 3, threshold: Double = 0.8,
      bands: Int = 16, rowsPerBand: Int = 4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Materialized before the band fan-out: otherwise Catalyst's
    // projection collapse inlines the signature expression into
    // every band struct (and both join sides), multiplying the
    // plan by 2*bands. In production the signature table would be
    // written out once for exactly the same reason.
    val sigs = docs.select(
      col(idCol).as("doc_id"),
      array_distinct(TextAnalysis.shingles(col(textCol), k)).as("sh"),
      minhashSignature(col(textCol), k, numHashes).as("sig"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()

    val bandRows = sigs.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until rowsPerBand)
            .map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
            .as("bh"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))

    val cand = bandRows.alias("x")
      .join(bandRows.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    verifyJaccard(cand, sigs.select(col("doc_id"), col("sh")), threshold)
  }

  /** Exact-Jaccard verification of candidate pairs against the
    * per-doc shingle sets: two joins to attach the (array) sets,
    * then per-row set intersection — work proportional to the
    * candidate count, not the corpus.
    */
  private[dedup] def verifyJaccard(cand: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")).cast("double"))
      .filter(col("j") >= threshold)
      .select("doc_a", "doc_b", "j")

  // ---------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------

  /** 64-bit SimHash over the k-shingle set: each shingle's 64-bit
    * hash votes +1/-1 per bit position; the signature bit is the
    * vote sign. One native bit-loop per row (SimHash64 expression)
    * — deterministic and shuffle-free; the HOF formulation of the
    * same fold interprets 64 `when` nodes per shingle.
    */
  def simhash(text: Column, k: Int): Column =
    graft.functions.HashExpressions.simhash64(
      transform(array_distinct(TextAnalysis.shingles(text, k)),
        s => xxhash64(s)))

  /** Near-dup pairs via SimHash chunked candidate generation,
    * verified by Hamming distance AND exact Jaccard.
    *
    * The signature splits into `chunks` equal bit-slices; one join
    * side is additionally exploded into all 1-bit variants of each
    * slice (multi-probe). Docs matching on any (chunk_idx, value)
    * become candidates — a bucketed equi-join, never all-pairs. By
    * pigeonhole, a pair within Hamming distance < 2*chunks has some
    * slice with at most one flipped bit, which the 1-bit probes
    * catch — recall is GUARANTEED for maxHamming <= 2*chunks-1
    * (here 15 > the default 12). The probe side costs
    * (sliceBits+1)x index rows — the classic multiprobe trade
    * (Manku et al., WWW'07 use radius 3 with plain chunking; the
    * wider radius here suits small-shingle-set corpora where each
    * shingle carries a big vote share).
    */
  def simhashDedup(docs: DataFrame, k: Int = 3, maxHamming: Int = 12,
      jaccardThreshold: Double = 0.8, chunks: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(64 % chunks == 0, "chunks must divide 64")
    val w = 64 / chunks
    val mask = if (w == 64) -1L else (1L << w) - 1
    // Materialized for the same plan-size reason as minhashDedup:
    // the 64-bit vote fold must not be inlined into every chunk and
    // 1-bit probe struct.
    val sigs = docs.select(
      col(idCol).as("doc_id"),
      array_distinct(TextAnalysis.shingles(col(textCol), k)).as("sh"),
      simhash(col(textCol), k).as("sim"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()

    val chunkRows = sigs.select(
      col("doc_id"), col("sim"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("ci"),
          shiftrightunsigned(col("sim"), c * w).bitwiseAND(lit(mask)).as("cv"))
      }: _*)).as("ck"))
      .select(col("doc_id"), col("sim"), col("ck.ci").as("ci"),
        col("ck.cv").as("cv"))

    // probe side: each slice plus its 1-bit-flip variants
    val probeRows = sigs.select(
      col("doc_id"), col("sim"),
      explode(array((for {
        c <- 0 until chunks
        v <- 0 to w
      } yield {
        val base = shiftrightunsigned(col("sim"), c * w).bitwiseAND(lit(mask))
        val probed = if (v == 0) base else base.bitwiseXOR(lit(1L << (v - 1)))
        struct(lit(c).as("ci"), probed.as("cv"))
      }): _*)).as("ck"))
      .select(col("doc_id"), col("sim"), col("ck.ci").as("ci"),
        col("ck.cv").as("cv"))

    val cand = probeRows.alias("x")
      .join(chunkRows.alias("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(col("x.sim").bitwiseXOR(col("y.sim"))) <= maxHamming)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    verifyJaccard(cand, sigs.select(col("doc_id"), col("sh")), jaccardThreshold)
      .select("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------
  // Duplicate clustering (connected components)
  // ---------------------------------------------------------------

  /** Duplicate clusters from a near-dup PAIR list: connected
    * components of the pair graph, labeled by the minimum doc id in
    * each component — the "keep one copy per duplicate set" step
    * every training-data dedup pipeline ends with (pairs alone
    * over-delete: a~b and b~c must collapse to ONE keeper even when
    * a~c was never emitted as a pair).
    *
    * Algorithm: iterative min-label propagation — each round every
    * node takes the min of its own label and its neighbors' labels;
    * converges in O(graph diameter) rounds, each one equi-join +
    * one groupBy (two shuffles). Near-dup components are
    * near-cliques (diameter ≲ 3 in practice — similarity is almost
    * transitive at high thresholds), so the round count is small and
    * the per-round cost is edge-proportional; pointer-jumping /
    * large-star-small-star (O(log n) rounds worst-case) only pays
    * off on long-chain graphs, which dup sets are not. Lineage is
    * truncated per round (`localCheckpoint`) — an un-truncated
    * 10-round loop would stack 20 shuffles into one plan.
    *
    * Returns (doc_id, cluster_id) for every document that appears in
    * at least one pair; singletons (no pair) are their own implicit
    * cluster and are not emitted. Deterministic: min-label is
    * order-independent.
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 30,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint()
    // seed with one propagation round fused into the init: node's
    // label = min(node, min neighbor). Identical fixpoint, one fewer
    // full join round for the common diameter-2 cluster.
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("m"))
      .select(col("node"), least(col("node"), col("m")).as("label"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(min("label").as("nlabel"))
      // convergence count rides the SAME job that materializes the
      // new labels (observe fires during localCheckpoint) — one pass
      // per iteration instead of a separate change-count join+scan
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"))
        .observe(obs, count(when(col("label") =!= col("old"), 1L))
          .as("changed"))
        .select("node", "label")
        .localCheckpoint()
      labels = next
      changed = obs.get("changed").asInstanceOf[Long]
      iter += 1
    }
    require(changed == 0,
      s"component labeling did not converge in $maxIter rounds")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Benchmark decontamination: count, per corpus document, how many
    * distinct probe k-shingles it contains — the train/eval overlap
    * check every LLM data pipeline runs before training (a document
    * quoting an eval benchmark must be dropped or the benchmark is
    * contaminated).
    *
    * Scale shape: probe sets are benchmark-sized (thousands of
    * documents → ~1e5-1e6 shingles), so the probe shingle set
    * BROADCASTS and the corpus is scanned exactly once — explode +
    * broadcast-hash join with no corpus-side shuffle; only the HITS
    * (probe matches, a tiny fraction of the corpus) shuffle into the
    * per-doc count.
    */
  def contaminationScan(docs: DataFrame, probes: DataFrame, k: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val probeShingles = shingleRows(probes, k, idCol, textCol)
      .select("shingle").distinct()
    shingleRows(docs, k, idCol, textCol)
      .join(broadcast(probeShingles), Seq("shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits")) // shingleRows emits distinct shingles
  }

  /** Contamination as a per-document DECISION with attribution — the
    * GPT-3/PaLM decontamination rule ([[contaminationScan]] gives the
    * raw hit count; this gives the verdict): a document is
    * contaminated when the fraction of its distinct k-shingles found
    * in ANY probe reaches `tau`, and the report names the probe with
    * the largest overlap (ties to the smaller probe id) so the
    * pipeline can say WHICH benchmark leaked, not just that one did.
    *
    * The containment ratio rounds through the shared fixed-point
    * 1e-6 form BEFORE thresholding, so a boundary-landing ratio
    * cannot split engines. Clean documents report zero hits and a
    * NULL probe; documents shorter than k report n_shingles = 0 and
    * containment 0.
    *
    * Scale shape: [[contaminationScan]]'s — probe shingles broadcast
    * (now carrying the probe id, still benchmark-sized), the corpus
    * scans once, only hits shuffle; the attribution argmax window
    * runs per doc over at most #matched-probes rows.
    */
  def contaminationAttribution(docs: DataFrame, probes: DataFrame,
      k: Int = 3, tau: Double = 0.2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val probeSh = shingleRows(probes, k, idCol, textCol)
      .select(col("doc_id").as("probe_id"), col("shingle"))
    val hits = shingleRows(docs, k, idCol, textCol)
      .join(broadcast(probeSh), Seq("shingle"))
    val perDoc = hits.groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_hits"))
    val top = hits.groupBy(col("doc_id"), col("probe_id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("overlap").desc, col("probe_id"))))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("probe_id").as("top_probe"),
        col("overlap").as("top_overlap"))
    val containment = when(col("n_shingles") > 0,
      graft.text.TextAnalysis.round6(col("n_hits").cast("double") /
        col("n_shingles").cast("double"))).otherwise(lit(0.0))
    docs
      .select(col(idCol).as("doc_id"),
        size(array_distinct(graft.text.TextAnalysis
          .shingles(col(textCol), k))).as("n_shingles"))
      .join(perDoc, Seq("doc_id"), "left")
      .join(top, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        containment.as("containment"),
        when(containment >= tau, 1).otherwise(0).as("contaminated"),
        col("top_probe"), col("top_overlap"))
  }

  /** Contamination scan for probe sets too large to broadcast as an
    * exact hash set (full eval-suite unions reach 1e8+ shingles ≈
    * multi-GB): a Bloom prefilter + exact verify join. Results are
    * EXACTLY [[contaminationScan]]'s — the bloom only bounds what
    * shuffles:
    *
    *  1. the probe bloom is built as a real distributed aggregate
    *     (native `BloomFilterAggregate`, the codegen'd expression
    *     behind Spark's own runtime row-level filtering) over
    *     xxhash64(shingle); the result is ONE binary row bounded by
    *     numBits — collected like a broadcast variable, not data;
    *  2. corpus shingles pass through codegen'd
    *     `BloomFilterMightContain` inside the scan stage — the
    *     corpus-side shuffle shrinks to true hits + the fpp·corpus
    *     false-positive sliver;
    *  3. the survivors semi-join the true probe shingle set, which
    *     eliminates every false positive exactly. Unlike
    *     [[contaminationScan]]'s broadcast join, this join may
    *     shuffle — but only the prefiltered sliver does.
    */
  def contaminationScanBloom(docs: DataFrame, probes: DataFrame, k: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      expectedShingles: Long = 4L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => c, expression => e}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // materialized: the probe shingle set feeds TWO jobs (the bloom
    // build and the verify semi-join) — unmaterialized, the probe
    // shingling pass runs twice
    val probeShingles = shingleRows(probes, k, idCol, textCol)
      .select("shingle").distinct().localCheckpoint()
    val bloomAgg = new BloomFilterAggregate(
      e(xxhash64(col("shingle"))), expectedShingles)
    val bloomBytes = probeShingles
      .agg(c(bloomAgg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpus = shingleRows(docs, k, idCol, textCol)
    // empty probe set → empty bloom aggregate (null): nothing can hit
    val prefiltered =
      if (bloomBytes == null) corpus.where(lit(false))
      else corpus.where(c(BloomFilterMightContain(
        Literal(bloomBytes), e(xxhash64(col("shingle"))))))
    prefiltered.join(probeShingles, Seq("shingle"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits")) // shingleRows emits distinct shingles
  }

  /** Keep-one-per-cluster: drop every clustered document except its
    * cluster representative (the min-id member). Documents in no
    * cluster survive untouched. The anti-join side is
    * cluster-membership-sized (duplicates only), far smaller than
    * the corpus.
    */
  def keepCanonical(docs: DataFrame, clusters: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    docs.join(
      clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Leakage-safe train/eval split: hash-partition documents into
    * splits BY NEAR-DUP FAMILY, not by document — if a doc and its
    * near-copy straddle train and eval, the eval set is contaminated
    * and the benchmark lies (the train/test-split analog of
    * [[contaminationScan]]). Every member of a connected near-dup
    * component ([[dupClusters]] over `pairs`) inherits the
    * component's min-id label as its family; documents in no pair
    * are their own family. The split decision is the same portable
    * Knuth uniform as stratified sampling (one hash on the family
    * id), so the assignment is deterministic, engine-independent,
    * and stable under re-runs and retries.
    *
    * Scale shape: the clustering is [[dupClusters]]'s (pair-graph-
    * sized); the family join is one equi-shuffle on doc_id against a
    * frame no larger than the pair participants; the split itself is
    * a pure per-row expression — no extra shuffle, no global sort.
    *
    * Output (doc_id, family, split) with split ∈ {train, eval}.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
      trainFrac: Double, idCol: String = "doc_id"): DataFrame = {
    val clusters = dupClusters(pairs)
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("family", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(graft.ops.Sampler.uniformKnuth(col("family")) < lit(trainFrac),
          lit("train")).otherwise(lit("eval")))
      .select(col("doc_id"), col("family"), col("split"))
  }
}
