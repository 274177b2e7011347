package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, token statistics, quality scoring,
  * language identification, and rolling-hash fingerprinting.
  *
  * Everything here is a pure `Column` expression built from Spark's
  * native higher-order functions — no UDFs, no serialization, fully
  * parallel per-row work with zero shuffles. At 100 TB these ops are
  * a single scan over the corpus; the only shuffles appear when a
  * caller aggregates the per-document outputs.
  *
  * The reference (/root/reference) has no text operators — its
  * closest surface is per-value string conversion
  * (converter/chwriteconverter.py:17-41); this module is north-star
  * extension scope (SURVEY §7.1 step 7).
  */
object TextAnalysis {

  /** Fixed-point 6-digit rounding: `floor(x*1e6 + 0.5)/1e6`. NOT
    * `round(x, 6)` — Spark's round goes through the decimal string
    * repr (HALF_UP) while DuckDB rounds in float math, and they split
    * on exact 1e-6 ties, which small-rational ratios actually hit
    * (e.g. 128 bigrams with an odd top count: p*1e6/128 = p*7812.5).
    * The floor form is the same double pipeline in both engines →
    * bit-identical at any scale.
    */
  def round6(x: Column): Column =
    floor(x * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)

  /** Whitespace tokenizer. The fixture corpus is single-space
    * separated; `\s+` keeps it robust to real whitespace. Empty
    * tokens are dropped: `split` yields a leading "" for text with
    * leading whitespace, which would skew every count/ratio below
    * and disagree with the native Shingles tokenizer (which skips
    * empty tokens).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** BPE-ish subword segmentation: lowercase letter runs, digit
    * runs, and single non-alphanumeric marks — the usual pre-BPE
    * regex split (GPT-2-style contraction classes reduced to the
    * ASCII subset the fixtures exercise). Extraction (not split):
    * a split-based formulation misses letter/digit boundaries
    * inside a token ("gpt4" must yield "gpt","4").
    */
  def subwordTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token (type) count. */
  def typeCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Fraction of tokens found in `stopwords` (exact fraction:
    * integer counts divided once — deterministic across engines).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stops, t)))
      .cast("double") / tokenCount(text).cast("double")
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast("double") / length(text).cast("double")

  /** Composite quality score in [0,1]: rewards length (saturating at
    * `fullLenTokens`), lexical diversity, and a natural stopword
    * rate; penalizes punctuation soup. Deterministic double
    * arithmetic: every term is a ratio of integers, combined in one
    * fixed expression order.
    */
  def qualityScore(text: Column, stopwords: Seq[String],
      fullLenTokens: Int = 50): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenTerm = least(nTok / lit(fullLenTokens.toDouble), lit(1.0))
    val diversity = typeCount(text).cast("double") / nTok
    val stop = stopwordRatio(text, stopwords)
    // natural prose sits near ~8% stopwords; score falls off linearly
    val stopTerm = greatest(lit(0.0), lit(1.0) - abs(stop - lit(0.08)) * lit(4.0))
    val punctTerm = greatest(lit(0.0), lit(1.0) - punctRatio(text) * lit(2.0))
    val raw = lit(0.3) * lenTerm + lit(0.3) * diversity +
      lit(0.2) * stopTerm + lit(0.2) * punctTerm
    // fixed-point rounding — tie-divergence rationale on round6
    round6(raw)
  }

  /** Language-ID by stopword-profile voting: each language has a
    * marker-token profile; the best-scoring profile wins, ties
    * broken by profile order; below `minHits` marker hits the text
    * is 'und' (undetermined). An n-gram-frequency heuristic in the
    * classic langid.py shape, reduced to exact token matching so the
    * decision is reproducible in ANSI SQL.
    */
  def langId(text: Column, profiles: Seq[(String, Seq[String])],
      minHits: Int = 2): Column = {
    val toks = tokens(text)
    val scores = profiles.map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(m, t)))
    }
    val best = scores.map(_._2).reduceLeft((x, y) => greatest(x, y))
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && s >= minHits, lit(lang)).otherwise(els)
    }
  }

  /** English-ish default profile over the fixture vocabulary. */
  val defaultProfiles: Seq[(String, Seq[String])] =
    Seq("en" -> Seq("the", "a"))

  /** Polynomial rolling hash of a string: fold over UTF-8 bytes,
    * `h = (h*31 + byte) mod 1e9+7`. An ordered fold — the order is
    * the byte order, so the result is bit-identical in any engine
    * (unlike a float row-aggregation). Implemented as a native
    * codegen'd Catalyst expression (graft.functions.PolyHash); the
    * equivalent HOF fold over `split(s,"")` interprets one tree
    * node and one 1-char allocation per character.
    */
  def polyHash(s: Column): Column =
    graft.functions.HashExpressions.polyHash(s)

  /** Consecutive k-token shingles ("w1 w2 w3" strings). Empty array
    * when the document has fewer than k tokens. Native single-pass
    * expression (graft.functions.Shingles): the HOF formulation
    * (`transform(sequence, i => concat_ws(slice(tokens,...)))`)
    * re-evaluates the tokenizing split inside the lambda for every
    * shingle — O(tokens) full-text regex splits per row.
    */
  def shingles(text: Column, k: Int): Column =
    graft.functions.Shingles.shingles(text, k)

  /** Document fingerprint: minimum rolling hash over k-token
    * shingles (the min-sketch member of the winnowing family). Two
    * documents sharing their rarest shingle collide — a cheap
    * near-dup prefilter and a stable content ID.
    */
  def fingerprint(text: Column, k: Int = 4): Column =
    array_min(transform(shingles(text, k), polyHash(_)))

  /** Count of the most frequent k-gram in the document — the
    * numerator of the Gopher/FineWeb-family repetition filters
    * ("top-2-gram fraction"). Computed per row with NO shuffle:
    * sort the shingle array, then a single fold counts the longest
    * run of equal neighbors (sorted ⇒ equal shingles are adjacent) —
    * O(n log n) per document vs the explode + groupBy + max
    * formulation, which shuffles every n-gram of the corpus.
    */
  def topNgramCount(text: Column, k: Int = 2): Column = {
    val sorted = array_sort(shingles(text, k))
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("mx")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("mx"), run).as("mx"))
      },
      acc => acc("mx"))
  }

  /** Fraction of k-gram occurrences taken by the single most
    * frequent k-gram; NULL for documents with no k-grams. High
    * values flag boilerplate/spam repetition.
    */
  def topNgramFraction(text: Column, k: Int = 2): Column = {
    val n = size(shingles(text, k))
    when(n > 0, round6(topNgramCount(text, k).cast("double") /
      n.cast("double")))
  }

  /** Fraction of token occurrences that are repeats of an
    * already-seen token (1 − types/tokens) — the word-level
    * repetition signal.
    */
  def dupTokenFraction(text: Column): Column =
    round6(lit(1.0) - typeCount(text).cast("double") /
      tokenCount(text).cast("double"))

  /** Sliding-window document chunking: one output row per window of
    * `windowTokens` tokens, windows starting every `strideTokens`
    * (overlapping when stride < window) — the slicing step of
    * retrieval/embedding pipelines and long-document pretraining
    * prep. A start is emitted for every offset < n (so short
    * documents yield exactly one chunk and tail windows may run
    * short); callers wanting only full windows filter on
    * `chunk_len`.
    *
    * Scale shape: tokenize → `explode` over the start sequence →
    * per-row `slice`, all inside one scan (a Generate over
    * codegen'd expressions); zero shuffle, chunk count bounded by
    * n/stride per document.
    */
  def chunkDocuments(df: DataFrame, windowTokens: Int, strideTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive: $windowTokens")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      s"strideTokens must be in [1, windowTokens]: $strideTokens")
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("chunk_start", explode(sequence(lit(0),
        greatest(size(col("__toks")) - 1, lit(0)), lit(strideTokens))))
      .withColumn("__chunk",
        slice(col("__toks"), col("chunk_start") + 1, lit(windowTokens)))
      .select(col(idCol), col("chunk_start"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).as("chunk_len"))
  }

  /** Cross-document duplicated-span coverage — the substring-level
    * dedup signal of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better", the ExactSubstr criterion) at
    * token-n-gram granularity: an n-gram is DUPLICATED when it
    * occurs in more than one distinct document, and a document's
    * duplicated-span coverage is the number of its token positions
    * lying under at least one duplicated n-gram (overlapping spans
    * union, not sum). Intra-document repetition is deliberately
    * excluded — that is q44's repetition signal; this one flags
    * boilerplate shared ACROSS documents, the spans substring-dedup
    * would cut. One row per document:
    * (idCol, n_tokens, dup_starts, covered, ratio).
    *
    * Scale shape (100 TB): positions explode the scan by ~n_tokens
    * but stay partition-local; the n-gram frequency table is ONE
    * hash aggregate keyed on the gram (partial aggregation bounds
    * the shuffle at distinct-grams per partition); only grams with
    * `nd > 1` — the small duplicated tail — survive into the
    * equi-join back against the position stream; the span union is
    * a bounded ×n Generate then a doc-keyed distinct count. No
    * driver materialization, no broadcast of corpus-sized state.
    */
  def crossDocDupSpans(df: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val tok = df.select(col(idCol), tokens(col(textCol)).as("__ts"))
    // docs shorter than n have no starts — filtered BEFORE the
    // sequence so it never runs backwards (sequence(1, 0) descends)
    val ng = tok
      .filter(size(col("__ts")) >= n)
      .select(col(idCol),
        explode(transform(
          sequence(lit(1), size(col("__ts")) - n + 1),
          i => struct(i.as("pos"),
            array_join(slice(col("__ts"), i, lit(n)), " ").as("g")))).as("e"))
      .select(col(idCol), col("e.pos").as("pos"), col("e.g").as("g"))
    val dupGrams = ng.groupBy(col("g"))
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") > 1)
      .select(col("g"))
    val dup = ng.join(dupGrams, Seq("g"))
    val perDoc = dup
      .select(col(idCol), col("pos"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("cp"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("pos")).as("dup_starts"),
        count_distinct(col("cp")).as("covered"))
    tok.select(col(idCol), size(col("__ts")).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_starts"), lit(0L)).as("dup_starts"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        (coalesce(col("covered"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("ratio"))
  }

  /** Cross-document duplicated-span CUT — the rewrite step on top of
    * [[crossDocDupSpans]]'s measurement: every token position lying
    * under an n-gram that also occurs in a LOWER-id document is
    * removed, and the surviving tokens are reassembled in order (the
    * ExactSubstr deduplication of Lee et al. 2022 at token-n-gram
    * granularity, with "keep the first occurrence" resolved by
    * document id — deterministic, so a retried partition rewrites
    * identically). The minimum-id document owning a gram keeps ALL
    * its occurrences; intra-document repetition is q44's signal, not
    * this op's. One row per document:
    * (idCol, n_tokens, n_removed, text_dedup).
    *
    * Scale shape (100 TB): same position stream and gram aggregate
    * as [[crossDocDupSpans]] (partial aggregation bounds the gram
    * shuffle); only grams shared across documents survive into the
    * join, and only documents that actually lose spans carry a
    * removal set — built by ONE doc-keyed collect_set bounded by the
    * document's own length. Reassembly is per-row array work
    * (transform + filter + array_join) inside the final projection;
    * no global sort, no driver state.
    */
  def substrDedupCut(df: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val tok = df.select(col(idCol), tokens(col(textCol)).as("__ts"))
    val ng = tok
      .filter(size(col("__ts")) >= n)
      .select(col(idCol),
        explode(transform(
          sequence(lit(1), size(col("__ts")) - n + 1),
          i => struct(i.as("pos"),
            array_join(slice(col("__ts"), i, lit(n)), " ").as("g")))).as("e"))
      .select(col(idCol), col("e.pos").as("pos"), col("e.g").as("g"))
    // a gram's owner is the smallest id among the documents carrying
    // it; grams confined to one document never leave the aggregate
    val owners = ng.groupBy(col("g"))
      .agg(min(col(idCol)).as("__owner"),
        count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("g"), col("__owner"))
    // distinct removed positions per doc; collect_set dedups, so the
    // overlapping spans union without a separate distinct shuffle
    val rm = ng.join(owners, Seq("g"))
      .filter(col(idCol) > col("__owner"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("cp"))
      .groupBy(col(idCol))
      .agg(collect_set(col("cp")).as("__rm"))
    val rmArr = coalesce(col("__rm"), array().cast("array<int>"))
    val withPos = transform(col("__ts"),
      (t, i) => struct((i + 1).as("p"), t.as("t")))
    val kept = filter(withPos, s => !array_contains(rmArr, s("p")))
    tok.join(rm, Seq(idCol), "left")
      .select(col(idCol), size(col("__ts")).as("n_tokens"),
        size(rmArr).cast("bigint").as("n_removed"),
        array_join(transform(kept, s => s("t")), " ").as("text_dedup"))
  }

  // --------------------------------------------------------------
  // Gopher quality-rule battery (Rae et al. 2021, appendix A1.1) —
  // the canonical public document-level filter set a pretraining
  // pipeline applies before any model-based scoring. Every signal is
  // a per-row codegen'd expression: zero shuffle, one scan at any
  // corpus size. Ratios go through round6 BEFORE thresholding on
  // BOTH sides, so a ratio landing exactly on a threshold cannot
  // split the engines on a last-ulp disagreement.
  // --------------------------------------------------------------

  /** The Gopher "must contain 2 of" stop list. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document Gopher rule signals and the conjunction verdict:
    * (idCol, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    * ellipsis_ratio, alpha_word_ratio, stop_hits, pass) with pass as
    * an INTEGER 0/1 (the q107 `kept` convention). Rules: word count
    * in [minWords, maxWords]; mean word length in [3, 10]; '#'/'...'
    * symbol-to-word ratio ≤ 0.1; ≤ 90% of lines bullet-started;
    * ≤ 30% of lines ellipsis-ended; ≥ 80% of words containing an
    * alphabetic character; ≥ 2 distinct [[GopherStopwords]] present.
    */
  def gopherQuality(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minWords: Int = 50,
      maxWords: Int = 100000): DataFrame =
    df.select(col(idCol), gopherStruct(col(textCol), minWords, maxWords).as("g"))
      .select(col(idCol), col("g.n_words"), col("g.mean_word_len"),
        col("g.symbol_ratio"), col("g.bullet_ratio"), col("g.ellipsis_ratio"),
        col("g.alpha_word_ratio"), col("g.stop_hits"), col("g.pass"))

  /** The per-row form of [[gopherQuality]]: one struct-valued column
    * over a text column, so the rule battery is also SQL-callable
    * (`graft_gopher(text)` via [[graft.app.GraftExtensions]]) — all
    * codegen'd built-ins, zero shuffle.
    */
  def gopherStruct(t: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    val toks = tokens(t)
    val nWords = size(toks)
    val meanLen = round6(
      aggregate(toks, lit(0L), (a, x) => a + length(x)).cast("double") /
        nWords.cast("double"))
    val symRatio = round6(
      size(regexp_extract_all(t, lit("#|\\.\\.\\."), lit(0))).cast("double") /
        nWords.cast("double"))
    val lines = split(t, "\n")
    val nLines = size(lines)
    val bulletRatio = round6(
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") /
        nLines.cast("double"))
    val ellipsisRatio = round6(
      size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("double") /
        nLines.cast("double"))
    val alphaRatio = round6(
      size(filter(toks, x => x.rlike("[a-zA-Z]"))).cast("double") /
        nWords.cast("double"))
    val stopHits = size(filter(array(GopherStopwords.map(lit): _*),
      s => array_contains(toks, s)))
    val pass = (nWords >= minWords && nWords <= maxWords &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symRatio <= 0.1 && bulletRatio <= 0.9 &&
      ellipsisRatio <= 0.3 && alphaRatio >= 0.8 &&
      stopHits >= 2).cast("int")
    struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"), bulletRatio.as("bullet_ratio"),
      ellipsisRatio.as("ellipsis_ratio"), alphaRatio.as("alpha_word_ratio"),
      stopHits.as("stop_hits"), pass.as("pass"))
  }

  /** TF-IDF term scoring with the top `k` terms kept per document —
    * the classic salient-term extractor (keyword tagging, near-dup
    * feature vectors, quality heuristics).
    *
    * The idf factor is the LINEAR form `N/df`, not `ln(N/df)`: the
    * score is then `(tf·N)/(len·df)` — a single division of two
    * exact integers, which IEEE rounds identically in every engine,
    * making the full score column (and the ranking derived from it)
    * bit-comparable to an external oracle. `ln` is not a
    * correctly-rounded operation, so the logarithmic form cannot
    * make that promise cross-engine; rankings are identical either
    * way because `ln` is monotonic.
    *
    * Scale shape: doc length rides the tokenize scan (no second
    * pass), one (doc, term) hash aggregate, a vocabulary-sized df
    * aggregate broadcast back, and a per-doc top-k window that
    * Spark executes as WindowGroupLimit (partial top-k before the
    * exchange). The corpus shuffles once on (doc, term).
    */
  def tfidfTopTerms(df: DataFrame, k: Int = 1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val n = df.count()
    val tok = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("doc_len"),
        explode(col("__toks")).as("token"))
    val tf = tok.groupBy(col(idCol), col("doc_len"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("dfreq"))
    val scored = tf.join(broadcast(dfreq), "token")
      .withColumn("tfidf", (col("tf") * lit(n)).cast("double") /
        (col("doc_len") * col("dfreq")).cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("token"), col("tf"),
        col("dfreq"), col("tfidf"))
  }

  /** Per-group token-distribution drift: L1 distance between each
    * group's unigram distribution and the whole corpus's — the
    * domain-drift / mix-shift monitor of a multi-source training
    * pipeline. Returns (group, n_s, l1_num, l1).
    *
    * Exactness: with group counts c_st (n_s total) and corpus counts
    * c_t (N total), L1 = Σ_t |c_st/n_s − c_t/N| is computed as the
    * exact integer numerator Σ|c_st·N − c_t·n_s| (decimal(38,0) —
    * exact even at 1e12-token count magnitudes) divided ONCE at the
    * end; the single division is correctly rounded, so the scores
    * are bit-identical in any engine. A float per-token sum would be
    * order-dependent.
    *
    * Scale shape: ONE corpus shuffle to the (group, token)
    * aggregate; every other frame (corpus counts, group totals, the
    * group×vocab grid) derives from that |groups|·|vocab|-sized
    * frame. Tokens absent from a group still contribute
    * |0 − c_t·n_s| via the grid.
    */
  def tokenDistributionDrift(df: DataFrame, groupCol: String,
      textCol: String = "text"): DataFrame = {
    val tok = df.select(col(groupCol),
      explode(tokens(col(textCol))).as("token"))
    val byGroup = tok.groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("c_st")).localCheckpoint()
    val corpus = byGroup.groupBy("token").agg(sum(col("c_st")).as("c_t"))
    val groups = byGroup.groupBy(groupCol).agg(sum(col("c_st")).as("n_s"))
    val nTotal = corpus.agg(coalesce(sum(col("c_t")), lit(0L)))
      .head().getLong(0)
    def d(c: Column) = c.cast("decimal(19,0)")
    groups.crossJoin(broadcast(corpus))
      .join(byGroup, Seq(groupCol, "token"), "left")
      .na.fill(0L, Seq("c_st"))
      .withColumn("num",
        abs(d(col("c_st")) * d(lit(nTotal)) - d(col("c_t")) * d(col("n_s"))))
      .groupBy(col(groupCol), col("n_s"))
      .agg(sum(col("num")).as("l1_dec"))
      .select(col(groupCol), col("n_s"),
        col("l1_dec").cast("long").as("l1_num"),
        (col("l1_dec").cast("double") /
          (d(col("n_s")) * d(lit(nTotal))).cast("double")).as("l1"))
  }

  // --------------------------------------------------------------
  // PII detection / redaction — the scrubbing step every public
  // training corpus goes through before a token reaches a model.
  // Patterns stay inside the syntax subset Java regex and RE2 share
  // (character classes, bounded repetition, \b), so an external
  // engine reproduces the exact same match set — which is what makes
  // the redaction oracle-checkable.
  // --------------------------------------------------------------

  /** Email addresses (pragmatic RFC-lite shape). */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** NANP-style phone numbers `[+]NNN-NNN-NNNN`. */
  val PhonePattern = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** US SSN shape `NNN-NN-NNNN` (word-bounded so it never fires
    * inside a longer digit run).
    */
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (word-bounded; octet range not validated —
    * over-redaction is the safe failure mode for PII).
    */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Count of matches of `pattern` in `text` — computed on the
    * UNREDACTED text, so counts are independent of redaction order.
    */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Replace every email/phone/SSN/IPv4 occurrence with a typed
    * placeholder. Pure codegen'd `regexp_replace` chain — per-row
    * work, zero shuffle, one scan at any corpus size. Order is part
    * of the contract: emails first (their local parts may contain
    * digit runs), then phones before SSNs (disjoint digit shapes,
    * but a fixed order keeps the output deterministic if a future
    * pattern overlaps).
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    val noSsn = regexp_replace(noPhone, SsnPattern, "<SSN>")
    regexp_replace(noSsn, Ipv4Pattern, "<IP>")
  }

  /** Per-document readability signals — the Flesch/SMOG family's
    * inputs under the classic vowel-group syllable heuristic (a
    * maximal `[aeiouy]+` run ≈ one syllable, minimum one per word;
    * the dictionary-free approximation every readability tool uses):
    * word count, total syllables, mean syllables per word, and the
    * count/ratio of complex (≥3-syllable) words that drives
    * SMOG/Gunning-Fog. The corpus has no sentence punctuation, so
    * the sentence-normalized composites are left to the caller —
    * these are the per-word terms, rounded through the shared
    * fixed-point form.
    *
    * Scale shape: pure per-row codegen'd array expressions — the
    * syllable transform runs on the token array without an explode —
    * zero shuffle, one scan at any corpus size.
    * Returns (idCol, n_words, n_syllables, n_complex,
    * mean_syllables, complex_ratio).
    */
  def readabilitySignals(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val syl = transform(tokens(col(textCol)), t =>
      greatest(lit(1), size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0)))))
    df.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_words"),
        aggregate(syl, lit(0L), (a, x) => a + x).as("n_syllables"),
        size(filter(syl, s => s >= 3)).cast("long").as("n_complex"))
      .select(col(idCol), col("n_words"), col("n_syllables"), col("n_complex"),
        when(col("n_words") > 0, round6(col("n_syllables").cast("double") /
          col("n_words").cast("double"))).otherwise(lit(0.0))
          .as("mean_syllables"),
        when(col("n_words") > 0, round6(col("n_complex").cast("double") /
          col("n_words").cast("double"))).otherwise(lit(0.0))
          .as("complex_ratio"))
  }

  /** Per-document character-distribution Shannon entropy — the
    * randomness quality signal that separates natural prose
    * (~4 bits/char band) from base64 blobs, minified code, and
    * repeated-character padding, a standard cheap filter next to the
    * Gopher rules. Documents with empty text drop (no distribution
    * to measure) — the [[graft.text.LanguageModel]] empty-doc
    * convention.
    *
    * Determinism: each character class's surprisal −ln(cnt/n) is
    * rounded ONCE to integer micro-nats, weighted by its exact
    * integer count, and summed as integers (the q102 discipline);
    * `n` is the count-sum itself, so both engines agree even if
    * their notions of string length diverge on exotic input. The
    * entropy is then one fixed-order double division chain.
    *
    * Scale shape: one (doc, char) hash aggregate (map-side combined
    * — the value space is doc × charset), one doc-keyed window over
    * that charset-bounded frame, one doc-keyed aggregate. Returns
    * (idCol, n_chars, distinct_chars, entropy) in nats.
    */
  def charEntropy(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val counts = df
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("cnt"))
    val withN = counts.withColumn("n",
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol))))
    val smicro = floor(
      log(col("cnt").cast("double") / col("n").cast("double")) *
        lit(-1e6) + lit(0.5))
    withN
      .select(col(idCol), col("n"), (col("cnt") * smicro).as("contrib"))
      .groupBy(col(idCol))
      .agg(max(col("n")).as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        (sum(col("contrib")).cast("double") /
          max(col("n")).cast("double") / lit(1e6)).as("entropy"))
  }

  /** Distinct-n diversity (Li et al. 2016) per group: for each
    * n-gram order 1..maxN, the group's distinct grams over its total
    * gram occurrences — the standard mode-collapse / template-spam
    * gauge. A source whose distinct-2 craters is pasting the same
    * boilerplate (or a generator is looping); the repetition filters
    * (q44 topNgramCount) catch it WITHIN a document, this catches it
    * ACROSS documents where every individual page looks clean.
    *
    * Determinism: counts are exact integers; each ratio is one
    * correctly-rounded division (0.0 for a group with no grams at
    * that order — docs shorter than n contribute none).
    *
    * Scale shape: ONE corpus scan — every order's grams explode in
    * the same pass, order-tagged (the [[graft.ops.Agreement]]
    * tagged-explode technique), into a (group, order, gram)-keyed
    * map-side-combined census, then a groups-sized rollup. No joins,
    * no window.
    *
    * Returns one row per group:
    * `(grp, total_1, distinct_1, ratio_1, …, total_maxN, …)`.
    */
  def ngramDiversity(df: DataFrame, group: Column, text: Column,
      maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN must be in [1,6]: $maxN")
    val tagged = (1 to maxN).map { n =>
      val grams = if (n == 1) tokens(text) else shingles(text, n)
      transform(grams, g => struct(lit(n).as("n"), g.as("g")))
    }
    val flat = (1 to maxN).flatMap { n =>
      Seq(coalesce(sum(when(col("n") === n, col("n_total"))), lit(0L))
          .as(s"total_$n"),
        coalesce(sum(when(col("n") === n, col("n_distinct"))), lit(0L))
          .as(s"distinct_$n"))
    }
    val ratios = (1 to maxN).map { n =>
      when(col(s"total_$n") > 0,
          col(s"distinct_$n").cast("double") /
            col(s"total_$n").cast("double"))
        .otherwise(lit(0.0)).as(s"ratio_$n")
    }
    df.select(group.as("grp"),
        explode(concat(tagged: _*)).as("r"))
      .groupBy(col("grp"), col("r.n").as("n"), col("r.g").as("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("grp"), col("n"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("cnt")).as("n_total"))
      .groupBy(col("grp"))
      .agg(flat.head, flat.tail: _*)
      .select((col("grp") +: (1 to maxN).flatMap(n =>
        Seq(col(s"total_$n"), col(s"distinct_$n"), ratios(n - 1)))): _*)
      .orderBy("grp")
  }
}
