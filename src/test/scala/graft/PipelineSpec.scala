package graft

import graft.dedup.Dedup
import graft.text.TextAnalysis
import graft.vector.VectorSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def one(text: String) = Seq(text).toDF("t")

  test("tokens and type counts") {
    val r = one("a b b c").select(
      TextAnalysis.tokenCount($"t"), TextAnalysis.typeCount($"t")).head()
    assert(r.getInt(0) == 4 && r.getInt(1) == 3)
  }

  test("crossDocDupSpans unions overlapping spans, ignores intra-doc repeats and short docs") {
    // "a b c" is shared by d1/d2/d5; "b c d" by d1/d5 — in d1 and d5
    // the two starts OVERLAP, so covered is the union {1..4} = 4,
    // not 6. d3's only gram is unshared; d4 is below n. d6 repeats
    // "m n o" twice INSIDE itself only — intra-doc repetition is
    // q44's signal, not this one's.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "x a b c y z"), (3L, "p q r"),
      (4L, "s t"), (5L, "a b c d q t"), (6L, "m n o m n o")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.crossDocDupSpans(docs, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 6, 2L, 4L, 4.0 / 6), (2L, 6, 1L, 3L, 0.5),
      (3L, 3, 0L, 0L, 0.0), (4L, 2, 0L, 0L, 0.0),
      (5L, 6, 2L, 4L, 4.0 / 6), (6L, 6, 0L, 0L, 0.0)))

    // partitioning-invariant (pure hash aggregates + equi-joins)
    val re = TextAnalysis.crossDocDupSpans(docs.repartition(5), n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(re.toSeq == got.toSeq)

    // the dup-gram join is an equi-join: no cartesian anywhere
    val plan = TextAnalysis.crossDocDupSpans(docs, n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("substrDedupCut keeps the min-id owner, cuts covered spans elsewhere") {
    // same corpus as the coverage test: "a b c" lives in d1/d2/d5
    // (owner d1), "b c d" in d1/d5 (owner d1). d1 keeps everything;
    // d2 loses positions 2-4, d5 loses 1-4 (overlap unioned); d6's
    // intra-doc repeat is untouched (single-document gram).
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "x a b c y z"), (3L, "p q r"),
      (4L, "s t"), (5L, "a b c d q t"), (6L, "m n o m n o")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.substrDedupCut(docs, n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 6, 0L, "a b c d e f"), (2L, 6, 3L, "x y z"),
      (3L, 3, 0L, "p q r"), (4L, 2, 0L, "s t"),
      (5L, 6, 4L, "q t"), (6L, 6, 0L, "m n o m n o")))

    // deterministic under partitioning (owner = MIN over all docs)
    val re = TextAnalysis.substrDedupCut(docs.repartition(5), n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(re.toSeq == got.toSeq)

    val plan = TextAnalysis.substrDedupCut(docs, n = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("substrDedupCut: a fully-covered document empties to ''") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.substrDedupCut(docs, n = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 4, 0L, "a b c d"), (2L, 4, 4L, "")))
  }

  test("gopherQuality rule battery: each signal and the verdict") {
    val docs = Seq(
      // passes every rule (with the test-sized word bound)
      (1L, "the cat sat with food today"),
      // mean word length 1 < 3 AND no stopwords
      (2L, "a b c d e f"),
      // symbol soup: '#'/'...' ratio over 0.1, alpha ratio under 0.8
      (3L, "the cat ... sat with # and # dog ..."),
      // bullet-started lines over 90%
      (4L, "- the cat sat\n- with food today"),
      // ellipsis-ended lines over 30%
      (5L, "the cat sat...\nwith food...\nall day long")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(docs, minWords = 5, maxWords = 100)
      .orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap

    val d1 = byId(1L)
    assert(d1.getInt(1) == 6)                       // n_words
    assert(d1.getDouble(2) == 3.666667)             // mean_word_len round6
    assert(d1.getInt(7) == 2)                       // stop_hits: the, with
    assert(d1.getInt(8) == 1)                       // pass

    val d2 = byId(2L)
    assert(d2.getDouble(2) == 1.0 && d2.getInt(7) == 0 && d2.getInt(8) == 0)

    val d3 = byId(3L)
    assert(d3.getDouble(3) == 0.4)                  // 4 symbols / 10 words
    assert(d3.getDouble(6) == 0.6 && d3.getInt(8) == 0)

    val d4 = byId(4L)
    assert(d4.getDouble(4) == 1.0 && d4.getInt(8) == 0)   // bullet_ratio

    val d5 = byId(5L)
    assert(d5.getDouble(5) == 0.666667 && d5.getInt(8) == 0) // ellipsis
  }

  test("perplexityBuckets: per-language NTILE bands, id tie-break") {
    import graft.text.LanguageModel
    // six docs per language; surprisal rises with rare-token count,
    // docs 5/6 are identical so only the doc_id tiebreak orders them
    def corpus(lang: String, off: Long) = Seq(
      (off + 1, s"c c c c c c", lang), (off + 2, s"c c c c c r1", lang),
      (off + 3, s"c c c c r1 r2", lang), (off + 4, s"c c c r1 r2 r3", lang),
      (off + 5, s"c r1 r2 r3 r4 r5", lang), (off + 6, s"c r1 r2 r3 r4 r5", lang))
    val docs = (corpus("en", 0L) ++ corpus("de", 10L))
      .toDF("doc_id", "text", "lang")
    val got = LanguageModel.perplexityBuckets(docs, v = 32, buckets = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3),
        r.getInt(5), r.getString(6)))
    assert(got.length == 12)
    for (g <- Seq("en", "de")) {
      val in = got.filter(_._2 == g).sortBy(t => (t._3, t._1))
      assert(in.map(_._4).toSeq == Seq(1, 1, 2, 2, 3, 3),
        s"bucket bands for $g: ${in.mkString(",")}")
      assert(in.map(_._5).toSeq ==
        Seq("head", "head", "middle", "middle", "tail", "tail"))
      // identical docs: the smaller id lands in the earlier band
      val ties = in.filter(t => t._1 % 10 == 5 || t._1 % 10 == 6)
      assert(ties.head._1 % 10 == 5 && ties.head._4 <= ties.last._4)
    }
  }

  test("stupidBackoffPerplexity: bigram hits, 0.4 backoff, pruning") {
    import graft.text.LanguageModel
    // corpus: a appears 3x, b 2x, c 1x, N=6; bigrams (a,b) 2x,
    // (a,c) 1x; vb=1 prunes the model to {(a,b)} so d3's second
    // token backs off
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    def micro(p: Double) = math.floor(-math.log(p) * 1e6 + 0.5).toLong
    def pplOf(smicros: Seq[Long]) = {
      val avg = smicros.sum.toDouble / smicros.length.toDouble / 1e6
      (avg, math.floor(math.exp(avg) * 1e6 + 0.5) / 1e6)
    }
    val d12 = Seq(micro(3.0 / 6.0), micro(2.0 / 3.0))
    val d3 = Seq(micro(3.0 / 6.0), micro(0.4 * (1.0 / 6.0)))

    val got = LanguageModel.stupidBackoffPerplexity(docs, vb = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, pplOf(d12)._1, pplOf(d12)._2),
      (2L, 2L, 0L, pplOf(d12)._1, pplOf(d12)._2),
      (3L, 2L, 1L, pplOf(d3)._1, pplOf(d3)._2)))

    // partition-invariant (integer smicro sums, model is a global agg)
    val re = LanguageModel.stupidBackoffPerplexity(docs.repartition(4), vb = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(re.toSeq == got.toSeq)

    // model tables join broadcast; no shuffle join on the pair stream
    val plan = LanguageModel.stupidBackoffPerplexity(docs, vb = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)

    // unpruned model (vb covers both bigrams): no backoff anywhere
    val full = LanguageModel.stupidBackoffPerplexity(docs, vb = 16)
      .agg(sum("n_backoff")).head().getLong(0)
    assert(full == 0L)
  }

  test("chunkDocuments slides overlapping windows, short docs yield one chunk") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, windowTokens = 4, strideTokens = 2)
      .orderBy("doc_id", "chunk_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, 0, "t0 t1 t2 t3", 4), (1L, 2, "t2 t3 t4 t5", 4),
      (1L, 4, "t4 t5 t6", 3), (1L, 6, "t6", 1),
      (2L, 0, "a b", 2)))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(docs, windowTokens = 4, strideTokens = 5)
    }
    // zero shuffle: chunking is a Generate inside one scan
    val plan = TextAnalysis.chunkDocuments(docs, 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle: $plan")
  }

  test("repetition signals: top bigram run-count and dup-token fraction") {
    // "a b a b a b c": bigrams = [a b, b a, a b, b a, a b, b c]
    // → top bigram "a b" ×3 of 6 → 0.5; tokens 7, types 3 → dup 4/7
    val r = one("a b a b a b c").select(
      TextAnalysis.topNgramCount($"t", 2),
      TextAnalysis.topNgramFraction($"t", 2),
      TextAnalysis.dupTokenFraction($"t")).head()
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 0.5)
    assert(math.abs(r.getDouble(2) - (1.0 - 3.0 / 7.0)) < 1e-6)
    // no-bigram doc → NULL fraction, not a division error
    val n = one("solo").select(TextAnalysis.topNgramFraction($"t", 2)).head()
    assert(n.isNullAt(0))
  }

  test("PII redaction scrubs all four types, globally, word-bounded") {
    val r = one("mail a.b+c@x-corp.io and a.b+c@x-corp.io call +555-123-4567 " +
      "ssn 123-45-6789 host 10.0.255.3 ref 123-456-7890")
      .select(TextAnalysis.redactPii($"t"),
        TextAnalysis.piiCount($"t", TextAnalysis.EmailPattern),
        TextAnalysis.piiCount($"t", TextAnalysis.PhonePattern),
        TextAnalysis.piiCount($"t", TextAnalysis.SsnPattern),
        TextAnalysis.piiCount($"t", TextAnalysis.Ipv4Pattern)).head()
    // both email occurrences scrubbed (global replace); 123-456-7890
    // is a phone shape, not an SSN
    assert(r.getString(0) == "mail <EMAIL> and <EMAIL> call <PHONE> " +
      "ssn <SSN> host <IP> ref <PHONE>")
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) == (2, 2, 1, 1))
  }

  test("PII patterns do not fire inside longer digit runs") {
    val r = one("id 1234-56-78901 build 2024.01.15.999 v10.2.3.4.5")
      .select(TextAnalysis.redactPii($"t")).head()
    // SSN needs \b before its 3-digit group (1234- has none);
    // 2024.01.15.999 has no boundary-started dotted quad; v10.2.3.4.5
    // redacts only the boundary-started "2.3.4.5" — over-redaction
    // inside version-ish strings is the safe failure mode for PII
    assert(r.getString(0) == "id 1234-56-78901 build 2024.01.15.999 v10.<IP>")
  }

  test("URL components: host, path, query param, www-folded domain") {
    val r = one("https://www.shop7.example.com/cat/3/p42?item=99&ref=r1")
      .select(text.WebAnalysis.host($"t"), text.WebAnalysis.path($"t"),
        text.WebAnalysis.queryParam($"t", "item"),
        text.WebAnalysis.queryParam($"t", "absent"),
        text.WebAnalysis.registeredDomain($"t")).head()
    assert(r.getString(0) == "www.shop7.example.com")
    assert(r.getString(1) == "/cat/3/p42")
    assert(r.getString(2) == "99")
    assert(r.isNullAt(3))
    assert(r.getString(4) == "shop7.example.com")
    // www folds only as a leading label — never inside the domain
    val d = one("https://wwwx.example.com/a")
      .select(text.WebAnalysis.registeredDomain($"t")).head()
    assert(d.getString(0) == "wwwx.example.com")
  }

  test("tfidf: hand-computed linear-idf scores, top-k per doc") {
    // corpus of 3 docs; "rare" appears only in doc 1, "common" in all
    val docs = Seq((1L, "common rare common"), (2L, "common x"),
      (3L, "common y")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, k = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(5))))
      .toMap
    // doc1: rare tf=1 len=3 df=1 n=3 → 1*3/(3*1)=1.0 beats common 2*3/(3*3)=0.667
    assert(got(1L) == ("rare", 1.0))
    // doc2: x 1*3/(2*1)=1.5 beats common 1*3/(2*3)=0.5
    assert(got(2L) == ("x", 1.5))
    assert(got(3L) == ("y", 1.5))
    // per-doc top-k must plan as a partial top-k below the exchange
    val plan = TextAnalysis.tfidfTopTerms(docs, k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("vocab: count-desc/token-asc ids, OOV encodes to 0, empty doc kept") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a z b"), (3L, ""))
      .toDF("doc_id", "text")
    val vocab = graft.text.Vocab.buildVocab(docs, v = 3)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    // counts: b=4, a=3, c=1, z=1 → ties (c,z) break by token asc
    assert(vocab == Map("b" -> 1, "a" -> 2, "c" -> 3))
    val enc = graft.text.Vocab.encodeDocuments(docs,
        graft.text.Vocab.buildVocab(docs, v = 3))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(enc.toSeq == Seq(
      (1L, "1 1 1 2 2 3", 6L, 0L),
      (2L, "2 0 1", 3L, 1L), // z is OOV → 0
      (3L, "", 0L, 0L)))     // empty doc survives with an empty code
  }

  test("unigram perplexity: smoothed probs, integer micro-nats, partition-invariant") {
    // corpus: a=2 b=2 c=1, N=5; v=2 → vocab {a,b}, c is OOV
    // p(a)=p(b)=(2+1)/(5+2+1)=3/8, p(OOV)=1/8
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    def micro(p: Double): Long = math.floor(-math.log(p) * 1e6 + 0.5).toLong
    val sAB = micro(3.0 / 8.0) // 980829
    val sC = micro(1.0 / 8.0)  // 2079442
    assert(sAB == 980829L && sC == 2079442L)
    def expect(sum: Long, n: Long): (Double, Double) = {
      val avg = sum.toDouble / n.toDouble / 1e6
      (avg, math.floor(math.exp(avg) * 1e6 + 0.5) / 1e6)
    }
    val (avg1, ppl1) = expect(3 * sAB, 3)
    val (avg2, ppl2) = expect(sAB + sC, 2)
    val got = graft.text.LanguageModel.unigramPerplexity(docs, v = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((3L, 0L, avg1, ppl1)))
    assert(got(2L) == ((2L, 1L, avg2, ppl2)))
    // ppl of an all-in-vocab doc ≈ 1/p — the sanity anchor
    assert(math.abs(ppl1 - 8.0 / 3.0) < 1e-5)

    // exact-integer aggregation: any partitioning yields the SAME
    // doubles (a float-mean formulation would not survive this)
    val re = graft.text.LanguageModel
      .unigramPerplexity(docs.repartition(7), v = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(re == got)

    // the model joins broadcast — the corpus must never sort-merge
    val plan = graft.text.LanguageModel.unigramPerplexity(docs, v = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("bpe merges: weighted pair counts, greedy re-pairing, early stop, ties") {
    // words: aab×3, ab×2 → round 1 pairs (a,a):3 (a,b):5 → merge (a,b)
    // round 2: aab=[a,ab], ab=[ab] → (a,ab):3 → merge (a,ab)
    // round 3: no pairs left → early stop at 2 of 5 rounds
    val docs = Seq((1L, "aab aab ab"), (2L, "aab ab")).toDF("doc_id", "text")
    val got = graft.text.Bpe.trainMerges(docs, rounds = 5)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "a", "ab", "aab", 3L)))

    // count ties break (lhs asc, rhs asc): (x,y) beats (y,x)
    val tie = Seq((1L, "xy yx")).toDF("doc_id", "text")
    val first = graft.text.Bpe.trainMerges(tie, rounds = 1).collect()(0)
    assert((first.getString(1), first.getString(2)) == (("x", "y")))

    // encode with the trained merges: after (a,b)+(a,ab), word aab
    // is ONE subword and ab is one; doc1 = aab aab ab → 3 words /
    // 3 subwords; with rounds=1 (only (a,b)→ab) aab=[a,ab] → 5
    val enc2 = graft.text.Bpe.subwordCounts(docs, rounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(enc2(1L) == ((3L, 3L, 1.0)))
    assert(enc2(2L) == ((2L, 2L, 1.0)))
    val enc1 = graft.text.Bpe.subwordCounts(docs, rounds = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(enc1(1L) == ((3L, 5L, 5.0 / 3.0)))

    // the encode join must broadcast the repr table, never sort-merge
    val plan = graft.text.Bpe.subwordCounts(docs, rounds = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("token-distribution drift: exact integer L1 numerators") {
    // A: "x x y" (n=3), B: "y z" (n=2); corpus x=2 y=2 z=1, N=5
    // L1_A num: |2*5-2*3| + |1*5-2*3| + |0*5-1*3| = 4+1+3 = 8
    // L1_B num: |0*5-2*2| + |1*5-2*2| + |1*5-1*2| = 4+1+3 = 8
    val docs = Seq(("A", "x x y"), ("B", "y z")).toDF("source", "text")
    val got = TextAnalysis.tokenDistributionDrift(docs, "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("A") == ((3L, 8L, 8.0 / 15.0)))
    assert(got("B") == ((2L, 8L, 8.0 / 10.0)))
  }

  test("leading/trailing/multi whitespace yields no empty tokens") {
    val r = one("  a  b \t c ").select(
      TextAnalysis.tokenCount($"t"), TextAnalysis.typeCount($"t")).head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 3)
    // and the HOF tokenizer agrees with the native Shingles tokenizer
    val sh = one("  w1  w2   w3 ").select(TextAnalysis.shingles($"t", 2)).head()
    assert(sh.getSeq[String](0) == Seq("w1 w2", "w2 w3"))
  }

  test("polyHash matches the reference fold ((h*31+c) mod 1e9+7)") {
    // independently computed: fold over 'abc def' ascii codes
    val r = one("abc def").select(TextAnalysis.polyHash($"t")).head()
    assert(r.getLong(0) == 985994463L)
  }

  test("shingles builds consecutive k-grams, empty below k tokens") {
    val r = one("w1 w2 w3 w4").select(TextAnalysis.shingles($"t", 3)).head()
    assert(r.getSeq[String](0) == Seq("w1 w2 w3", "w2 w3 w4"))
    val e = one("w1 w2").select(TextAnalysis.shingles($"t", 3)).head()
    assert(e.getSeq[String](0).isEmpty)
  }

  test("stopwordRatio and qualityScore bounds") {
    val df = one("the cat sat on the mat")
    val sr = df.select(TextAnalysis.stopwordRatio($"t", Seq("the", "on"))).head().getDouble(0)
    assert(math.abs(sr - 0.5) < 1e-12)
    val q = df.select(TextAnalysis.qualityScore($"t", Seq("the"))).head().getDouble(0)
    assert(q >= 0.0 && q <= 1.0)
  }

  test("langId votes by profile, und below minHits") {
    val profiles = Seq("en" -> Seq("the", "a"), "de" -> Seq("der", "die"))
    val r = Seq("the cat and a dog", "der hund und die katze", "x y z")
      .toDF("t").select(TextAnalysis.langId($"t", profiles).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("en", "de", "und"))
  }

  test("fingerprint is stable and identical for identical text") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "z y x w v u"))
      .toDF("id", "t")
    val fps = df.select($"id", TextAnalysis.fingerprint($"t").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
  }

  test("canonicalizeUrl folds each alias class, leaves real variants alone") {
    def canon(raw: String): String =
      one(raw).select(text.WebAnalysis.canonicalizeUrl($"t")).head().getString(0)
    // every alias class at once: scheme/authority case (path case is
    // CONTENT and must survive), default port, www, tracking params in
    // leading/middle/only position, fragment, trailing slash
    assert(canon("HTTPS://WWW.Shop1.Example.COM:443/Cat/3/p5/?utm_source=x&item=2&utm_campaign=c#frag")
      == "https://shop1.example.com/Cat/3/p5?item=2")
    assert(canon("http://example.com:80/a") == "http://example.com/a")
    assert(canon("https://example.com/path/?utm_campaign=only")
      == "https://example.com/path")
    assert(canon("https://example.com/") == "https://example.com")
    assert(canon("https://example.com/a?ref=r1&x=1&fbclid=z")
      == "https://example.com/a?x=1")
    // NON-aliases must not fold: explicit non-default port, https on
    // :80 (not its default), ref-ish text in the path, mid-host www
    assert(canon("http://example.com:8080/a") == "http://example.com:8080/a")
    assert(canon("https://example.com:80/a") == "https://example.com:80/a")
    assert(canon("https://example.com/ref=r1/x") == "https://example.com/ref=r1/x")
    assert(canon("https://wwwx.example.com/a") == "https://wwwx.example.com/a")
  }

  test("crossDocDupSpans: overlap-unioned coverage, only cross-doc grams count") {
    // n=3 grams; docs 1/2 share "x y z" and "y z w" (two overlapping
    // starts), doc 3's gram is unique, doc 4 is shorter than n
    val docs = Seq(
      (1L, "x y z w q"), (2L, "a x y z w"), (3L, "p q r"), (4L, "u v"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.crossDocDupSpans(docs, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // doc 1: starts {1,2} cover positions {1,2,3}∪{2,3,4} = 4 of 5
    assert(got(1L) == ((5, 2L, 4L, 0.8)))
    // doc 2: starts {2,3} cover {2,3,4}∪{3,4,5} = 4 of 5
    assert(got(2L) == ((5, 2L, 4L, 0.8)))
    // a gram occurring twice in ONE doc only is not a cross-doc dup
    assert(got(3L) == ((3, 0L, 0L, 0.0)))
    assert(got(4L) == ((2, 0L, 0L, 0.0)))
  }
}

class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Driver-side sequential recompute of Bm25.topK's model — the same
  // rounding discipline (idf and per-(doc,term) contribution each
  // rounded once to integer micro units) but none of the distributed
  // machinery, so it cross-checks the join/aggregate plumbing.
  private def refScores(corpus: Seq[(Long, String)],
      query: Seq[String]): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val terms = query.distinct
    def idfMicro(t: String): Long = {
      val df = toks.values.count(_.contains(t)).toDouble
      math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e6 + 0.5).toLong
    }
    toks.flatMap { case (id, ts) =>
      val dl = ts.size.toDouble
      val norm = 1.0 - 0.75 + 0.75 * dl / avgdl
      val s = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) 0L
        else math.floor(idfMicro(t) * (tf * 2.2 / (tf + 1.2 * norm)) + 0.5).toLong
      }.sum
      if (s > 0) Some(id -> s) else None
    }
  }

  test("scores match a sequential recompute; rank ties break on doc id") {
    val corpus = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b c"))
    val queries = Seq(1 -> Seq("a", "b"), 2 -> Seq("c"))
    val got = graft.text.Bm25.topK(corpus.toDF("doc_id", "text"), queries, k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = got.groupBy(_._1)
    for ((qid, ts) <- queries) {
      val exp = refScores(corpus, ts).toSeq
        .sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.map { case ((id, s), i) => (qid, i + 1, id, s) }
      assert(byQ(qid).sortBy(_._2).toSeq == exp, s"query $qid")
    }
    // duplicate terms in one query must not double-count
    val dup = graft.text.Bm25.topK(corpus.toDF("doc_id", "text"),
      Seq(9 -> Seq("c", "c")), k = 3)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(dup == refScores(corpus, Seq("c")))
  }

  test("k bounds each query's rows; plan is top-k + broadcast, not a global sort") {
    val corpus = (1L to 40L).map(i =>
      i -> (if (i % 2 == 0) "a b" else "a")).toSeq
    val df = graft.text.Bm25.topK(corpus.toDF("doc_id", "text"),
      Seq(1 -> Seq("a"), 2 -> Seq("b")), k = 5)
    val rows = df.collect()
    assert(rows.count(_.getInt(0) == 1) == 5)
    assert(rows.count(_.getInt(0) == 2) == 5)
    val plan = df.queryExecution.executedPlan.toString
    // literal rank bound → partial top-k below the exchange; the
    // df/idf and query tables must come in as broadcasts
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog again and again today"
  val nearDup = base.replace("today", "tomorrow") // 1 token differs
  val other = "completely different content with no overlap whatsoever in it at all"

  def docs = Seq((0L, base), (1L, base), (2L, nearDup), (3L, other))
    .toDF("doc_id", "text")

  test("exactDedup groups identical texts and keeps the min id") {
    val r = Dedup.exactDedup(docs).orderBy("keeper_doc_id").collect()
    assert(r.length == 3)
    val dup = r.find(_.getLong(1) == 2L).get
    assert(dup.getLong(2) == 0L) // keeper is min doc_id
  }

  test("jaccardPairs finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(docs, k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)) && keys.contains((0L, 2L)) && keys.contains((1L, 2L)))
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
  }

  test("jaccardPairs maxDF cap drops hot shingles but keeps rare-shingle pairs") {
    val pairs = Dedup.jaccardPairs(docs, k = 3, threshold = 0.5, maxDF = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("adaptive maxDF default disarms a planted hot shingle by itself") {
    // 3000 docs all sharing ONE boilerplate shingle: uncapped, the
    // inverted-index self-join materializes 3000*2999/2 ≈ 4.5M
    // candidate rows from that single bucket; the adaptive default
    // (max(1000, 1% of corpus) = 1000 < 3000) must drop the shingle
    // and produce NO pairs without anyone passing a cap.
    val hot = (0L until 3000L).map(i => (i, "hot boiler plate"))
      .toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(hot, k = 3, threshold = 0.1).count() == 0L)
    // same corpus, uncapped pinned: the bucket bomb goes off (on 60
    // docs so the test stays fast) — proving the cap, not a bug,
    // removed the pairs
    val small = hot.filter($"doc_id" < 60)
    assert(Dedup.jaccardPairs(small, k = 3, threshold = 0.1,
      maxDF = Dedup.UncappedMaxDF).count() == 60L * 59 / 2)
    // and the adaptive default keeps legitimate rare-shingle pairs
    val mixed = docs.union(hot.filter($"doc_id" >= 100)) // ids disjoint
    val pairs = Dedup.jaccardPairs(mixed, k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
  }

  test("minhash signatures are equal for identical text, length = bands*rows") {
    val sigs = docs.select($"doc_id", Dedup.minhashSignature($"text", 3, 64).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L).length == 64)
    assert(sigs(0L) != sigs(3L))
  }

  test("minhashDedup finds the planted pairs with exact-jaccard verification") {
    val pairs = Dedup.minhashDedup(docs, k = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash of identical texts is identical; hamming to unrelated is large") {
    val sims = docs.select($"doc_id", Dedup.simhash($"text", 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(0L) == sims(1L))
    assert(java.lang.Long.bitCount(sims(0L) ^ sims(3L)) > 12)
  }

  test("simhashDedup catches near dups, excludes unrelated") {
    val pairs = Dedup.simhashDedup(docs, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedup plans contain no cartesian product") {
    val fixture = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    for (df <- Seq(Dedup.jaccardPairs(fixture), Dedup.minhashDedup(fixture),
        Dedup.simhashDedup(fixture))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), "all-pairs join in dedup plan")
    }
  }

  test("dupClusters merges transitive pairs into min-labeled components") {
    // chain 1-2-3-4-5 (diameter 4: forces several propagation rounds),
    // separate pair (10,11), singleton 99 absent from pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("incrementalJaccardPairs pairs batch docs against the corpus only") {
    val corpus = Seq((0L, base), (1L, nearDup), (2L, other))
      .toDF("doc_id", "text")
    val batch = Seq((100L, base), (101L, "fresh unseen material here and nowhere else truly"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalJaccardPairs(corpus, batch, k = 3,
      threshold = 0.5, maxDF = Dedup.UncappedMaxDF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 100 duplicates corpus 0 exactly and near-duplicates corpus 1;
    // 101 is novel; NO corpus-corpus pair (0,1) appears
    val keys = got.map(p => (p._1, p._2)).toSet
    assert(keys.contains((100L, 0L)) && keys.contains((100L, 1L)))
    assert(got.find(p => (p._1, p._2) == (100L, 0L)).get._3 == 1.0)
    assert(!keys.exists(_._1 == 101L), "novel batch doc must not pair")
    assert(keys.forall(_._1 >= 100L), "corpus-corpus pairs must not form")
    // the corpus-side hot-shingle cap disarms a planted boilerplate
    // shingle shared by the whole corpus (adaptive default)
    val hotCorpus = (0L until 3000L).map(i => (i, "hot boiler plate"))
      .toDF("doc_id", "text")
    val hotBatch = Seq((9000L, "hot boiler plate")).toDF("doc_id", "text")
    assert(Dedup.incrementalJaccardPairs(hotCorpus, hotBatch, k = 3,
      threshold = 0.1).count() == 0L)
    // batch index broadcasts: the corpus never shuffles for the join
    val plan = Dedup.incrementalJaccardPairs(corpus, batch, k = 3,
      threshold = 0.5, maxDF = Dedup.UncappedMaxDF)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"batch side must broadcast")
  }

  test("keepCanonical drops all but the min-id member per cluster") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (11L, "b"),
      (99L, "solo")).toDF("doc_id", "text")
    val clusters = Dedup.dupClusters(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b"))
    val kept = Dedup.keepCanonical(docs, clusters)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 10L, 99L),
      "cluster reps and singletons survive; other members drop")
  }
}

class SamplerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.ops.Sampler

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("sample is deterministic and respects per-stratum rates") {
    val rates = Map("en" -> 0.3, "zh" -> 0.9)
    def draw() = Sampler.stratifiedSample(docs, col("lang"),
        Sampler.uniformKnuth(col("doc_id")), rates, defaultRate = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = draw(); val s2 = draw()
    assert(s1 == s2, "same inputs must draw the same sample")
    val byLang = Sampler.stratifiedSample(docs, col("lang"),
        Sampler.uniformKnuth(col("doc_id")), rates, defaultRate = 0.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet.subsetOf(Set("en", "zh")), "defaultRate=0 drops others")
    // Bernoulli tolerance: observed rate within ±0.2 of target
    for ((l, target) <- rates)
      assert(math.abs(byLang.getOrElse(l, 0L).toDouble / totals(l) - target) < 0.2,
        s"$l sampled at ${byLang.getOrElse(l, 0L)}/${totals(l)}, want ~$target")
  }

  test("sampling plan is a pushed filter over the scan — no exchange") {
    val plan = Sampler.stratifiedSample(docs, col("lang"),
        Sampler.uniformKnuth(col("doc_id")), Map("en" -> 0.5), 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "stratified sample must not shuffle")
  }

  test("fixed-size stratified sample: exact counts, deterministic, WindowGroupLimit plan") {
    val out = Sampler.stratifiedFixedSample(docs, col("lang"),
      Sampler.uniformKnuth(col("doc_id")), col("doc_id"), k = 5)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exactly k per stratum (or the whole stratum when smaller)
    for ((l, n) <- totals)
      assert(counts(l) == math.min(5L, n), s"$l: ${counts(l)} of $n")
    // same inputs draw the same members
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Sampler.stratifiedFixedSample(docs, col("lang"),
      Sampler.uniformKnuth(col("doc_id")), col("doc_id"), k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet)
    // the rank filter must plan as a partial top-k, not a full sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must push partial top-k below the shuffle: $plan")
  }

  test("temperatureMix: √count quotas, Knuth membership, WindowGroupLimit plan") {
    import spark.implicits._
    // strata A(9 docs) and B(4), num=2: isq 3/2, T=5, target=6 →
    // quotas 6·3/5=3 and 6·2/5=2 — B holds 31% of the corpus but
    // draws 40% of the mix (the small-source upsampling α=0.5 buys)
    val rows = ((1L to 9L).map(i => (i, "A")) ++
      (11L to 14L).map(i => (i, "B"))).toDF("doc_id", "src")
    val got = Sampler.temperatureMix(rows, "src", "doc_id", num = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def u(id: Long) = (id * 2654435761L) % (1L << 32)
    val expA = (1L to 9L).sortBy(i => (u(i), i)).take(3).toSet
    val expB = (11L to 14L).sortBy(i => (u(i), i)).take(2).toSet
    assert(got.filter(_._2 == "A").map(_._1).toSet == expA)
    assert(got.filter(_._2 == "B").map(_._1).toSet == expB)

    // a stratum smaller than its √-inflated quota yields all its
    // rows and nothing more
    val skew = ((100L until 200L).map(i => (i, "L")) :+ (5L, "S"))
      .toDF("doc_id", "src")
    val sk = Sampler.temperatureMix(skew, "src", "doc_id", num = 1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // isq 10/1, T=11, target=101 → quotas 91 and 9; S has only 1 row
    assert(sk.count(_._2 == "L") == 91 && sk.count(_._2 == "S") == 1)

    // the literal rank bound keeps the partial top-k rewrite alive
    val plan = Sampler.temperatureMix(rows, "src", "doc_id", num = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rn<=maxQuota must plan as WindowGroupLimit: $plan")
  }

  test("weighted priority: u/w formula, heavier rows win, TakeOrdered plan") {
    import spark.implicits._
    val rows = (0L until 400L).map(id => (id, if (id % 100 == 7) 10000L else 1L))
      .toDF("id", "w")
    val sel = rows.select(col("id"), col("w"),
        Sampler.weightedPriorityKey(col("id"), col("w")).as("p"))
      .orderBy(col("p"), col("id")).limit(8)
    val got = sel.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // formula: priority = knuth-uniform / weight, exactly
    got.foreach { case (id, w, p) =>
      val u = Seq(id).toDF("id").select(Sampler.uniformKnuth(col("id")))
        .head().getDouble(0)
      assert(p == u / w.toDouble, s"id=$id")
    }
    // all four 10000x-weight rows must beat the ~396 weight-1 rows
    val heavy = got.filter(_._2 == 10000L).map(_._1).toSet
    assert(heavy == Set(7L, 107L, 207L, 307L),
      s"heavy rows must dominate the sample: $got")
    // global top-k must be per-partition heaps, not a full sort
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("A-ES key: in [0,1], weight-1 key is u itself, heavier keys larger") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id").select(col("id"),
      Sampler.uniformHash(col("id")).as("u"),
      Sampler.aresKey(col("id"), lit(1L)).as("k1"),
      Sampler.aresKey(col("id"), lit(50L)).as("k50"))
    val rows = df.collect()
    rows.foreach { r =>
      val (u, k1, k50) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(k1 >= 0 && k1 <= 1 && k50 >= 0 && k50 <= 1)
      assert(k1 == u, "u^(1/1) = u")
      assert(k50 >= k1, "same u at higher weight must not shrink the key")
    }
  }

  test("knuth uniform survives 1e10-scale ids and matches the naive formula") {
    import spark.implicits._
    // ids at the 10x-soak scale (base + i*1e9 key shifts) overflowed
    // the naive id*K product under ANSI mode; the split-multiply form
    // must (a) not throw, (b) equal the naive product computed wide
    val ids = Seq(0L, 1L, 65535L, 65536L, 4294967295L, 4294967296L,
      3500000017L, 9000000000L + 12345L, Long.MaxValue / 3)
    val got = ids.toDF("id")
      .select(Sampler.uniformKnuth(col("id")).as("u"))
      .collect().map(_.getDouble(0))
    val want = ids.map { id =>
      val prod = (BigInt(id) * BigInt(2654435761L)).mod(BigInt(1L) << 32)
      prod.toDouble / (1L << 32).toDouble
    }
    (got zip want).zip(ids).foreach { case ((g, w), id) =>
      assert(g == w, s"id=$id: got $g want $w")
    }
  }

  test("xxhash and knuth uniforms are in [0,1)") {
    val r = docs.select(
      max(Sampler.uniformHash(col("doc_id"))).as("mh"),
      min(Sampler.uniformHash(col("doc_id"))).as("nh"),
      max(Sampler.uniformKnuth(col("doc_id"))).as("mk"),
      min(Sampler.uniformKnuth(col("doc_id"))).as("nk")).head()
    for (i <- 0 until 4) {
      assert(r.getDouble(i) >= 0.0 && r.getDouble(i) < 1.0)
    }
  }
}

class VectorSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("PQ: codebook shape, code assignment, exact ADC distances") {
    // dim 4, m=2, dsub=2; 4 corpus vectors → ksub=2 codebooks
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
      (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
      (3L, Seq(0.1f, 0.9f, 0.9f, 0.1f))).toDF("vec_id", "embedding")
    val c = VectorSearch.prepared(corpus)
    val books = VectorSearch.pqCodebooks(c, m = 2, ksub = 2)
    assert(books.length == 2 && books.forall(_.length == 2) &&
      books.forall(_.forall(_.length == 2)))
    val codes = VectorSearch.pqEncode(c, books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(cs => cs.length == 2 &&
      cs.forall(x => x >= 1 && x <= 2)))
    // Knuth order over ids {0,1,2,3} picks seeds {0, 2} — one per
    // planted cluster — so 0/1 share codes, 2/3 share codes, and the
    // clusters get distinct codewords in every subspace
    assert(codes(0L) == codes(1L) && codes(2L) == codes(3L) &&
      codes(0L) != codes(2L), s"$codes")
    // ADC distance recomputed by hand for one (query, vec) pair
    val out = VectorSearch.pqTopK(corpus, corpus.filter($"vec_id" === 0L),
        k = 3, m = 2, ksub = 2)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    val q0 = c.filter($"vec_id" === 0L).select("q").head().getSeq[Long](0)
    def l2(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for ((vid, adist) <- out) {
      val cs = codes(vid)
      val want = l2(q0.slice(0, 2), books(0)(cs(0).toInt - 1)) +
        l2(q0.slice(2, 4), books(1)(cs(1).toInt - 1))
      assert(adist == want, s"vec $vid: $adist != $want")
    }
    // nearest neighbor of 0 must come from its own cluster {1}
    val top1 = VectorSearch.pqTopK(corpus, corpus.filter($"vec_id" === 0L),
      k = 1, m = 2, ksub = 2).head().getLong(2)
    assert(top1 == 1L, s"PQ top-1 of vec 0 must be its near-dup 1, got $top1")
  }

  test("PQ rejects dimensions not divisible into m subspaces") {
    val corpus = Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorSearch.pqCodebooks(VectorSearch.prepared(corpus), m = 2, ksub = 1)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("quantized dot and cosine of known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b")
      .select(VectorSearch.quantize($"a").as("qa"), VectorSearch.quantize($"b").as("qb"))
      .select(VectorSearch.cosine(
        VectorSearch.dot($"qa", $"qb"),
        VectorSearch.norm2($"qa"), VectorSearch.norm2($"qb")).as("cos"))
    val r = df.collect().map(_.getDouble(0))
    assert(math.abs(r(0) - 0.0) < 1e-9 && math.abs(r(1) - 1.0) < 1e-9)
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0L)
    val r = VectorSearch.bruteForceTopK(corpus, queries, k = 3)
      .orderBy("rnk").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(r.toSeq == Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("ivfTopK with exhaustive probing equals brute force on the fixture") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(pmod($"vec_id", lit(100)) === 0)
    val brute = VectorSearch.bruteForceTopK(emb, q, 10).collect().toSet
    val ivf = VectorSearch.ivfTopK(emb, q, 10, nprobe = 1000).collect().toSet
    assert(ivf == brute)
  }

  test("ivfTopK at reduced nprobe returns k rows per query (approximate mode)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter($"vec_id" === 0)
    val r = VectorSearch.ivfTopK(emb, q, 10, nprobe = 4)
    assert(r.count() == 10)
  }

  test("brute-force top-k plan uses a window group limit (partial top-k)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter($"vec_id" === 0)
    val plan = VectorSearch.bruteForceTopK(emb, q, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no partial top-k in plan")
  }

  test("cosineNearDupPairs finds planted near-identical vectors at small assign") {
    // planted: 100/101 and 102/103 are near-identical (cos ~ 1)
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val base = Seq.fill(40)(vec())
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++ Seq(
      (100L, base.head), (101L, base.head.map(x => x + 1e-4f)),
      (102L, base(1)), (103L, base(1).map(x => x * 1.0001f)))
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = VectorSearch.cosineNearDupPairs(emb, threshold = 0.99,
      assign = 2, numCells = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)) && pairs.contains((100L, 101L)))
    assert(pairs.contains((1L, 102L)) && pairs.contains((102L, 103L)))
    val plan = VectorSearch.cosineNearDupPairs(emb, 0.99, assign = 2,
      numCells = 6).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "near-dup must stay bucketed")
  }

  test("rpLshNearDupPairs equals the brute-force Hamming+cosine recompute") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = VectorSearch.rpLshNearDupPairs(emb, maxHamming = 5,
      minCos = 0.0, nbits = 32, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent recompute: plain Scala over the collected vectors
    val vecs = emb.select($"vec_id",
      VectorSearch.quantize($"embedding").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def sig(v: Array[Long]): Long =
      (0 until 32).foldLeft(0L) { (s, b) =>
        val d = v.indices.map(j => v(j) * VectorSearch.rpPlane(b, j)).sum
        if (d >= 0) s | (1L << b) else s
      }
    val sigs = vecs.map { case (id, v) => id -> sig(v) }
    val expected = (for {
      a <- vecs.keys; b <- vecs.keys if a < b
      ham = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if ham <= 5
      dot = vecs(a).indices.map(j => vecs(a)(j) * vecs(b)(j)).sum
      if dot.toDouble / math.sqrt(
        vecs(a).map(x => x * x).sum.toDouble *
          vecs(b).map(x => x * x).sum.toDouble) >= 0.0
    } yield (a, b, ham.toLong)).toSet
    assert(got == expected, "pigeonhole recall must be exact")
    assert(expected.nonEmpty)
    val plan = VectorSearch.rpLshNearDupPairs(emb, 5, 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LSH must stay bucketed")
    // the guarantee precondition is enforced, not assumed
    intercept[IllegalArgumentException] {
      VectorSearch.rpLshNearDupPairs(emb, maxHamming = 8, minCos = 0.0,
        nbits = 32, chunks = 4)
    }
  }

  test("adaptive nbits holds bucket occupancy ~constant across 10x corpus growth") {
    import VectorSearch.{AdaptiveNbits, RpTargetOccupancy, resolveRpNbits}
    val occ = Seq(10000L, 100000L, 1000000L).map { n =>
      val bits = resolveRpNbits(AdaptiveNbits, 4, n)
      assert(bits % 4 == 0 && bits <= 63, s"n=$n resolved nbits=$bits")
      n.toDouble / (1L << (bits / 4))
    }
    // fixed 32 bits would grow occupancy 100x over this range; the
    // adaptive width pins it inside a 2x band
    occ.foreach(o => assert(o <= RpTargetOccupancy &&
      o > RpTargetOccupancy / 2.0, s"occupancy $o drifted: $occ"))
    // signature space is 63 bits: past ~2M vectors the width caps
    // (60 bits at chunks=4) instead of violating rpSignatures' bound
    assert(resolveRpNbits(AdaptiveNbits, 4, 1000000000L) == 60)
    // an explicit request (the pinned oracle shape) passes through
    assert(resolveRpNbits(32, 4, 1000000000L) == 32)
  }

  test("rpLshNearDupPairs finds planted identical vectors at hamming 0") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 30L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat))) :+
      (100L, Seq.fill(16)(0.5f)) :+ (101L, Seq.fill(16)(0.5f))
    val emb = rows.toDF("vec_id", "embedding")
    val got = VectorSearch.rpLshNearDupPairs(emb, maxHamming = 0,
      minCos = 0.99, nbits = 32, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.exists(p => p._1 == 100L && p._2 == 101L && p._3 == 0L &&
      p._4 == 1.0))
  }

  test("leakageSafeSplit keeps near-dup families in one split") {
    val docs = (0L until 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Dedup.leakageSafeSplit(docs, pairs, trainFrac = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // family = component min id; singletons are their own family
    assert(Seq(1L, 2L, 3L).map(got(_)._1).distinct == Seq(1L))
    assert(Seq(5L, 6L).map(got(_)._1).distinct == Seq(5L))
    assert(got(0L)._1 == 0L && got(4L)._1 == 4L)
    // members of one family never straddle the boundary
    assert(Seq(1L, 2L, 3L).map(got(_)._2).distinct.size == 1)
    assert(Seq(5L, 6L).map(got(_)._2).distinct.size == 1)
    // split matches the portable Knuth uniform on the family id
    def u(id: Long): Double =
      ((id * 2654435761L) % (1L << 32)).toDouble / (1L << 32).toDouble
    got.foreach { case (doc, (fam, split)) =>
      assert(split == (if (u(fam) < 0.5) "train" else "eval"),
        s"doc $doc family $fam")
    }
    // frac 1.0 puts everything in train (uniform is in [0,1))
    val all = Dedup.leakageSafeSplit(docs, pairs, trainFrac = 1.0)
    assert(all.filter($"split" === "train").count() == 10)
  }

  test("int8 quantization: per-vector symmetric scale to [-127, 127]") {
    val emb = Seq((0L, Seq(0.5f, -1.0f, 0.25f)), (1L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = VectorSearch.preparedInt8(emb).orderBy("vec_id")
      .collect().map(_.getSeq[Long](1))
    // max |component| maps to ±127; 63.5 rounds half-away to 64
    assert(q(0) == Seq(64L, -127L, 32L))
    // zero vector quantizes to zeros, not a division error
    assert(q(1) == Seq(0L, 0L, 0L))
  }

  test("int8TopK recall@10 vs the exact baseline on the fixture") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(pmod($"vec_id", lit(10)) === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = pairs(VectorSearch.bruteForceTopK(emb, q, 10))
    val i8 = pairs(VectorSearch.int8TopK(emb, q, 10))
    val recall = (brute intersect i8).size.toDouble / brute.size
    assert(recall >= 0.9, s"int8 recall@10 = $recall")
  }

  test("centroid count is bounded O(sqrt n), never a corpus fraction") {
    // auto mode: ~sqrt(n), clamped to [16, 65536]
    assert(VectorSearch.resolveNumCells(0, 2000L) == 45)
    assert(VectorSearch.resolveNumCells(0, 100L) == 16)
    assert(VectorSearch.resolveNumCells(0, 1000L * 1000 * 1000) == 31623)
    assert(VectorSearch.resolveNumCells(0, 10L * 1000 * 1000 * 1000) == 65536)
    // explicit numCells wins
    assert(VectorSearch.resolveNumCells(128, 1000L * 1000 * 1000) == 128)
    // and the assignment actually produces at most that many cells
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    val cells = VectorSearch.ivfAssign(emb)
      .select("cell").distinct().count()
    assert(cells <= VectorSearch.resolveNumCells(0, n),
      s"$cells cells for $n vectors exceeds the sqrt-n bound")
  }

  test("Lloyd refinement does not degrade cell cohesion") {
    import spark.implicits._
    // two tight clusters; hash-seeded centroids may land both in one
    val rnd = new scala.util.Random(9)
    def near(base: Float) =
      Array.fill(16)(base + rnd.nextFloat() * 0.05f)
    val rows = (0L until 100L).map(i =>
      (i, near(if (i % 2 == 0) 1.0f else -1.0f)))
    val emb = rows.toDF("vec_id", "embedding")
    val c = VectorSearch.prepared(emb).localCheckpoint()
    val seed = c.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(2)
      .select(col("vec_id").as("cell"), col("q").as("cq"), col("n2").as("cn2"))
    val seedCoh = VectorSearch.cellCohesion(c, seed)
    val refined = VectorSearch.refineCentroids(c, seed, iters = 2)
    val refCoh = VectorSearch.cellCohesion(c, refined)
    assert(refCoh >= seedCoh - 1e-9,
      s"refinement degraded cohesion: $seedCoh -> $refCoh")
    // and the refined assignment still covers every vector
    val assigned = VectorSearch.ivfAssign(emb, numCells = 2, refineIters = 2)
    assert(assigned.count() == 100)
    assert(assigned.select("cell").distinct().count() <= 2)
  }

  test("labelCentroidStats covers every label with sane cosines") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val r = VectorSearch.labelCentroidStats(emb).collect()
    assert(r.length == 10)
    assert(r.forall(row => math.abs(row.getDouble(2)) <= 1.0))
  }
}

class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent plain-Scala replay of the full Lloyd loop on the
    * shifted quantized grid — seeds, assignment ties, floor means,
    * empty-cluster retention. Input is the already-shifted vectors.
    */
  private def reference(vs: Map[Long, Array[Long]], k: Int,
      iters: Int): Map[Long, (Int, Long)] = {
    def uk(i: Long): Long = {
      val a = i % (1L << 32)
      val ah = a >> 16
      val al = a & 0xFFFFL
      (((ah * 2654435761L) % 65536L) * 65536L + al * 2654435761L) % (1L << 32)
    }
    var cents: Seq[(Int, Array[Long])] =
      vs.keys.toSeq.sortBy(i => (uk(i), i)).take(k)
        .zipWithIndex.map { case (id, ix) => (ix + 1, vs(id).clone()) }
    def assign(): Map[Long, (Int, Long)] = vs.map { case (id, w) =>
      val (d2, cid) = cents.map { case (c, cw) =>
        (w.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min
      id -> ((cid, d2))
    }
    for (_ <- 1 to iters) {
      val byC = assign().toSeq.groupBy(_._2._1)
      cents = cents.map { case (cid, old) =>
        byC.get(cid) match {
          case Some(members) =>
            val ws = members.map { case (id, _) => vs(id) }
            (cid, Array.tabulate(old.length)(p =>
              ws.map(_(p)).sum / ws.size))
          case None => (cid, old)
        }
      }
    }
    assign().map { case (id, (cid, d2)) => id -> ((cid, d2)) }
  }

  test("kmeans: Spark loop equals an independent reference, any partitioning") {
    val rnd = new scala.util.Random(42)
    val corpus = (0L until 40L).map(id =>
      (id, Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = corpus.toDF("vec_id", "embedding")
    val vs = corpus.map { case (id, emb) =>
      id -> emb.map(x => math.round(x.toDouble * 1e6) + 1000000L).toArray
    }.toMap
    val want = reference(vs, k = 3, iters = 2)

    val got = graft.vector.KMeans.lloydAssign(df, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.values.map(_._1).toSet.size > 1, "degenerate clustering")

    // exact-integer arithmetic: any partitioning → identical output
    val re = graft.vector.KMeans
      .lloydAssign(df.repartition(7), k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(re == got)
  }

  test("kmeans: ties to smallest cluster, empty cluster keeps centroid, zero-shuffle assignment") {
    // three identical vectors: both seeds coincide, every distance
    // ties → all rows land in cluster 1; cluster 2 goes empty and
    // must retain its centroid through both updates without error
    val dup = Seq((1L, Seq(0.5f, 0.5f)), (2L, Seq(0.5f, 0.5f)),
      (3L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = graft.vector.KMeans.lloydAssign(dup, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 1, 0L), (2L, 1, 0L), (3L, 1, 0L)))

    // the assignment is a projection against literal centroids:
    // no join, no exchange anywhere in its plan
    val plan = graft.vector.KMeans.lloydAssign(dup, k = 2, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("semanticDedup: pair logic matches an independent cosine, equi-join plan") {
    val rnd = new scala.util.Random(7)
    // 30 base vectors plus 6 planted near-copies (tiny jitter) —
    // the copies must be flagged against their originals whenever
    // clustering co-locates them
    val base = (0L until 30L).map(id =>
      (id, Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)))
    val copies = (0 until 6).map { i =>
      val (src, emb) = base(i * 4)
      (100L + src, emb.map(x => (x + 0.001f * (i + 1))))
    }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val minCos = 0.98

    val got = graft.vector.KMeans
      .semanticDedup(df, k = 3, iters = 2, minCos = minCos)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(got.size == 36)

    // independent reference for the pair/keep step: same clusters
    // (lloydAssign is pinned by the tests above), cosine recomputed
    // from scratch on the quantized grid in plain Scala
    val cluster = graft.vector.KMeans.lloydAssign(df, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qv = (base ++ copies).map { case (id, emb) =>
      id -> emb.map(x => math.round(x.toDouble * 1e6)).toArray
    }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d.toDouble / math.sqrt(a.map(x => x * x).sum.toDouble *
        b.map(x => x * x).sum.toDouble)
    }
    val ids = qv.keys.toSeq.sorted
    val wantDups = ids.map { b =>
      b -> ids.count(a => a < b && cluster(a) == cluster(b) &&
        cos(qv(a), qv(b)) >= minCos).toLong
    }.toMap
    for (id <- ids) {
      val (cl, nd, kept) = got(id)
      assert(cl == cluster(id), s"cluster of $id")
      assert(nd == wantDups(id), s"n_dups of $id: got $nd want ${wantDups(id)}")
      assert(kept == (if (nd == 0L) 1 else 0), s"kept of $id")
    }
    assert(got.values.count(_._3 == 0) >= 4,
      "planted near-copies must be dropped")

    // all-pairs only WITHIN a cluster: the pair stage is an
    // equi-join on the cluster id, never a cartesian
    val plan = graft.vector.KMeans
      .semanticDedup(df, k = 3, iters = 2, minCos = minCos)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("triangles: hand graph — closure counted per corner, wedges without closure don't") {
    // groups: {1,2,3} all-pairs once, {1,2} again (support 2), {3,4}
    // edges (k=4 keeps everything): (1,2)s2 (1,3)s1 (2,3)s1 (3,4)s1
    // → one triangle 1-2-3; 3-4 dangles (wedge 4-3-x never closes)
    val m = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 3L), (30L, 4L)).toDF("grp", "item")
    val e = graft.ops.Triangles.cooccurrenceKnnGraph(m, "grp", "item", k = 4)
    assert(e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    val got = graft.ops.Triangles.triangleCounts(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 1L, 0L)))
  }

  test("triangles: top-k prunes weak edges by (support desc, nbr asc)") {
    // same memberships, k=1: node 1 keeps (1,2) [support 2]; node 2
    // keeps (2,1); node 3 ties everywhere (all support 1) → smallest
    // nbr 1; node 4 keeps 3 → edges {(1,2),(1,3),(3,4)}, no triangle
    val m = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 3L), (30L, 4L)).toDF("grp", "item")
    val e = graft.ops.Triangles.cooccurrenceKnnGraph(m, "grp", "item", k = 1)
    assert(e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 3L), (3L, 4L)))
    val got = graft.ops.Triangles.triangleCounts(e)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // the top-k rank must plan as WindowGroupLimit (partial top-k),
    // not a full per-node sort of the support lists
    val plan = graft.ops.Triangles
      .cooccurrenceKnnGraph(m, "grp", "item", k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("triangles: K4 counts three per corner") {
    // one group of 4 → complete graph K4: every node sits in C(3,2)=3
    // triangles, degree 3
    val m = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L)).toDF("grp", "item")
    val e = graft.ops.Triangles.cooccurrenceKnnGraph(m, "grp", "item", k = 4)
    val got = graft.ops.Triangles.triangleCounts(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 3L), (2L, 3L, 3L), (3L, 3L, 3L), (4L, 3L, 3L)))
  }
}

class ProfilerPercentileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("histogram: bucket layout, clamped max, degenerate range") {
    import graft.ops.Profiler
    // 0..99 in 10 bins: width 9.9, every bin gets 10; 99 clamps to 9
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val h = Profiler.histogram(df, "v", bins = 10)
      .orderBy("bucket").collect()
    assert(h.map(_.getAs[Long]("n")).sum == 100)
    assert(h.head.getAs[Int]("bucket") == 0 && h.last.getAs[Int]("bucket") == 9)
    assert(h.head.getAs[Double]("lo") == 0.0)
    assert(math.abs(h.last.getAs[Double]("hi") - 99.0) < 1e-9)
    // single distinct value → one bucket holding everything
    val flat = Profiler.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), "v", 10)
      .collect()
    assert(flat.length == 1 && flat.head.getAs[Int]("bucket") == 0 &&
      flat.head.getAs[Long]("n") == 3)
    intercept[IllegalArgumentException] {
      Profiler.histogram(df, "v", bins = 0)
    }
  }

  test("numericPercentiles interpolates exactly (p at index p*(n-1))") {
    // values 1..5: p50 = 3.0; p95 = 1 + 0.95*4 = 4.8
    val df = (1 to 5).map(_.toDouble).toDF("v")
    val r = graft.ops.Profiler.numericPercentiles(df, Seq("v")).head()
    assert(r.getString(0) == "v")
    assert(r.getDouble(1) == 3.0 && math.abs(r.getDouble(2) - 4.8) < 1e-12)
  }

  test("approxProfile tracks the exact profile within the HLL error bound") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = byCol(graft.ops.Profiler.profile(docs))
    val approx = byCol(graft.ops.Profiler.approxProfile(docs, rsd = 0.02))
    exact.foreach { case (c, (n, nulls, nd)) =>
      val (an, anulls, and) = approx(c)
      // row/null counts are exact in both forms; only n_distinct
      // carries sketch error
      assert(an == n && anulls == nulls)
      assert(math.abs(and - nd) <= math.max(1, (nd * 0.06).toLong),
        s"$c: approx $and vs exact $nd")
    }
  }

  test("distributedPercentiles is bit-identical to the percentile aggregate") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def byCol(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = byCol(graft.ops.Profiler.numericPercentiles(li, cols))
    val dist = byCol(graft.ops.Profiler.distributedPercentiles(li, cols))
    cols.foreach { c =>
      assert(dist(c) == exact(c), s"$c: ${dist(c)} vs ${exact(c)}")
    }
    // and the small-n edge: 1 row → both percentiles are that value
    import spark.implicits._
    val one = Seq(7.5).toDF("v")
    val r = graft.ops.Profiler.distributedPercentiles(one, Seq("v")).head()
    assert(r.getDouble(1) == 7.5 && r.getDouble(2) == 7.5)
  }

  test("approxNumericPercentiles stays within rank error of exact") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_quantity", "l_extendedprice")
    val exact = graft.ops.Profiler
      .numericPercentiles(li, Seq("l_quantity", "l_extendedprice"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.ops.Profiler
      .approxNumericPercentiles(li, Seq("l_quantity", "l_extendedprice"),
        accuracy = 10000)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (c, (p50, p95)) =>
      val (a50, a95) = approx(c)
      // rank-error contract: the sketch answer must sit within a few
      // percent of the exact value on these smooth distributions
      assert(math.abs(a50 - p50) <= math.abs(p50) * 0.05 + 1e-9, s"$c p50")
      assert(math.abs(a95 - p95) <= math.abs(p95) * 0.05 + 1e-9, s"$c p95")
    }
  }
}

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.SkewJoin

  test("salted join equals the plain join on a skewed key") {
    // k=1 is hot (1000 rows big-side, 3 matches other-side);
    // k=2..5 cold
    val big = ((1 to 1000).map(i => (1L, s"b$i")) ++
      (2L to 5L).flatMap(k => (1 to 10).map(i => (k, s"b${k}_$i"))))
      .toDF("k", "bval")
    val other = Seq((1L, "w1"), (1L, "w2"), (1L, "w3"),
      (2L, "x"), (3L, "y"), (9L, "unmatched")).toDF("k", "wval")
    val hot = Seq(Tuple1(1L)).toDF("k")
    val salted = SkewJoin.saltedJoin(big, other, Seq("k"), hot, saltFactor = 8)
      .select("k", "bval", "wval").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val plain = big.join(other, Seq("k"))
      .select("k", "bval", "wval").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.length == 1000 * 3 + 20)
    assert(salted.sameElements(plain),
      "salting must not change the join result")
  }

  test("salting is deterministic across evaluations (retry safety)") {
    val big = (1 to 200).map(i => (1L, i.toLong)).toDF("k", "v")
    val other = Seq((1L, "w")).toDF("k", "w")
    val hot = Seq(Tuple1(1L)).toDF("k")
    def run() = SkewJoin.saltedJoin(big, other, Seq("k"), hot, 4)
      .agg(sum("v")).head().getLong(0)
    assert(run() == run())
    assert(run() == (1 to 200).map(_.toLong).sum)
  }
}

class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.PrefixSum

  test("distributed running total equals the sequential scan") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "v").repartition(16) // scrambled input
    val got = PrefixSum.withRunningTotal(df, Seq(col("id")), col("v"))
      .orderBy("id").collect().map(r => r.getAs[Long]("running_total"))
    val want = rows.sortBy(_._1).map(_._2).scanLeft(0L)(_ + _).tail
    assert(got.toSeq == want)
  }

  test("takeByBudget keeps the exact order prefix within budget") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("id", "v")
    val kept = PrefixSum.takeByBudget(df, Seq(col("id")), col("v"), 60L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L)) // 10+20+30=60 <= 60, +40 exceeds
  }

  test("packSequences lays out the concat-and-chunk windows exactly") {
    // tokens: 1000, 1500, 100, 2048 in id order; C=2048
    // starts:     0, 1000, 2500, 2600
    // bins:       0,    0,    1,    1   offsets: 0, 1000, 452, 552
    val df = Seq((1L, 1000L), (2L, 1500L), (3L, 100L), (4L, 2048L))
      .toDF("id", "n").repartition(3)
    val got = PrefixSum.packSequences(df, Seq(col("id")), col("n"), 2048L)
      .orderBy("id")
      .select("id", "bin_id", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 1000L),
      (3L, 1L, 452L), (4L, 1L, 552L)))
    intercept[IllegalArgumentException] {
      PrefixSum.packSequences(df, Seq(col("id")), col("n"), 0L)
    }
  }

  test("no single-partition global window in the plan") {
    val df = (1 to 100).map(i => (i.toLong, 1L)).toDF("id", "v")
    val plan = PrefixSum.withRunningTotal(df, Seq(col("id")), col("v"))
      .queryExecution.executedPlan.toString
    // the window must be partitioned (by __pid), never a bare
    // global-order window (which plans a SinglePartition exchange)
    assert(!plan.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      "global cumsum must not collapse to one partition")
  }

  test("zValue interleaves bits; out-of-domain input raises") {
    import graft.ops.ZOrder
    // a=0b11, b=0b01 → a bits at 0,2 (1+4) + b bit at 1 (2) = 7
    val got = Seq((3L, 1L), (0L, 0L), (3L, 3L)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 2).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(7L, 0L, 15L))
    intercept[Exception] {
      Seq((4L, 0L)).toDF("a", "b")
        .select(ZOrder.zValue(col("a"), col("b"), 2)).collect()
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(col("a"), col("b"), 0)
    }
  }

  test("zOrderBuckets clusters a grid into quadrants — both dims prune") {
    import graft.ops.ZOrder
    // 4×4 grid, one row per cell; quantile cells reduce to the raw
    // coordinates, so 4-row buckets must be exactly the 2×2 quadrants
    val grid = (for { x <- 0L until 4L; y <- 0L until 4L }
      yield (x * 4 + y, x, y)).toDF("id", "x", "y").repartition(5)
    val env = ZOrder.zOrderBuckets(grid, col("x"), col("y"), col("id"),
        bits = 2, bucketSize = 4L)
      .groupBy("bucket")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("bucket"),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
        r.getAs[Long]("n")))
    assert(env.length == 4 && env.forall(_._3 == 4L))
    // every bucket envelope is 2 wide in BOTH dimensions (a 1-column
    // sort would span the full 0..3 range on the other dimension)
    assert(env.map(_._2).toSet == Set(
      (0L, 1L, 0L, 1L), (2L, 3L, 0L, 1L), (0L, 1L, 2L, 3L), (2L, 3L, 2L, 3L)))
  }

  test("shardShuffle is the id-order permutation sharded exactly") {
    // order by id directly: shard/pos must follow 0-based rank
    val df = (0L until 10L).map(i => (i, s"d$i")).toDF("id", "t")
      .repartition(4)
    val got = PrefixSum.shardShuffle(df, Seq(col("id")), shardSize = 4)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos")))
    assert(got.toSeq == (0L until 10L).map(i => (i, i / 4, i % 4)))
    // payload columns survive
    assert(PrefixSum.shardShuffle(df, Seq(col("id")), 4)
      .columns.toSeq == Seq("id", "t", "shard", "pos"))
    intercept[IllegalArgumentException] {
      PrefixSum.shardShuffle(df, Seq(col("id")), 0)
    }
    val plan = PrefixSum.shardShuffle(df, Seq(col("id")), 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      "shard shuffle must not collapse to one partition")
  }
}

class ContaminationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("contaminationScan counts distinct shared shingles, broadcast plan") {
    val probes = Seq((100L, "the secret benchmark answer is forty two"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "i quote the secret benchmark answer is forty two verbatim"),
      (2L, "completely unrelated text about other topics entirely here"),
      (3L, "partially the secret benchmark but then it diverges a lot"))
      .toDF("doc_id", "text")
    val scan = Dedup.contaminationScan(corpus, probes, k = 3)
    val hits = scan.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 1 contains the full probe phrase → many shared 3-shingles;
    // doc 3 shares only the leading ones; doc 2 none (absent)
    assert(hits(1L) >= 5 && hits(3L) >= 1 && !hits.contains(2L))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "probe shingles must broadcast — corpus shingles never shuffle")
  }

  test("contaminationScanBloom equals the exact scan; bloom only prunes") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val probes = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val exact = Dedup.contaminationScan(corpus, probes, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloomDf = Dedup.contaminationScanBloom(corpus, probes, k = 3)
    val bloom = bloomDf.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(exact.nonEmpty && bloom == exact,
      "bloom prefilter must not change results — it only bounds the shuffle")
    // the prefilter must actually be IN the plan, upstream of the join
    val plan = bloomDf.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "corpus shingles must pass through BloomFilterMightContain")
    // empty probe set → empty result, not a crash on a null bloom
    assert(Dedup.contaminationScanBloom(
      corpus, probes.where(lit(false)), k = 3).count() == 0)
  }

  test("contaminationAttribution: verdicts, attribution ties, clean docs") {
    val probes = Seq((100L, "a b c d"), (200L, "c d e")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c x"), (2L, "z z z"), (3L, "a"), (4L, "c d e a b")
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationAttribution(corpus, probes, k = 2, tau = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Long])))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.toSeq == Seq(
      // doc 1: {a b, b c, c x}; a b + b c hit probe 100 → 2/3
      (1L, 3, 2L, r6(2.0 / 3.0), 1, Some(100L), Some(2L)),
      // doc 2: its only (repeated) shingle is unshared — clean
      (2L, 1, 0L, 0.0, 0, None, None),
      // doc 3: shorter than k → no shingles, containment 0
      (3L, 0, 0L, 0.0, 0, None, None),
      // doc 4: 3 of 4 shingles hit; probes 100 and 200 TIE at
      // overlap 2 → attribution breaks to the smaller probe id
      (4L, 4, 3L, 0.75, 1, Some(100L), Some(2L))))

    // partition-invariant; the probe side joins broadcast
    val re = Dedup.contaminationAttribution(
        corpus.repartition(5), probes, k = 2, tau = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Long])))
    assert(re.toSeq == got.toSeq)
    val plan = Dedup.contaminationAttribution(corpus, probes, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

}

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.HeavyHitters

  test("misraGries: undercount bounded, heavy survivors present") {
    // 600 copies of key 1, 300 of key 2, 900 distinct singletons
    // (n=1800). capacity=8 → undercount ≤ n/capacity = 225, so keys
    // with count > 225 MUST survive the sketch.
    val stream = Seq.fill(600)(1L) ++ Seq.fill(300)(2L) ++
      (1000L until 1900L)
    // interleave deterministically so heavy keys aren't front-loaded
    val shuffled = stream.sortBy(k => (k * 2654435761L) % 104729)
    val survivors = HeavyHitters.misraGries(shuffled.iterator, 8).toSet
    assert(survivors.contains(1L), "600 of 1800 must survive capacity 8")
    assert(survivors.contains(2L), "300 of 1800 must survive capacity 8")
    assert(survivors.size <= 8, "never more than capacity counters")
  }

  test("exactHeavyHitters equals the full groupBy under a planted skew") {
    // 50k rows over 5k distinct keys; keys 0..9 are hot (1000 each),
    // the rest appear ~8 times. tiny capacity keeps sketches honest.
    val rows = (0 until 10).flatMap(k => Seq.fill(1000)(k.toLong)) ++
      (0 until 40000).map(i => 100L + i % 5000)
    val df = rows.toDF("k").repartition(13) // uneven partition mix
    val got = HeavyHitters.exactHeavyHitters(df, col("k"),
        minCount = 500L, capacity = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df.groupBy("k").count().filter(col("count") >= 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.size == 10,
      s"sketch path must reproduce the exact groupBy: got=$got")
  }

  test("recall-bound violation is an error, not a weaker answer") {
    val df = (0L until 10000L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(df, col("k"),
        minCount = 3L, capacity = 16)
    }
    assert(e.getMessage.contains("recall bound"))
  }
}

class FuzzyMatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.FuzzyMatch

  test("blocked fuzzy pairs: distance filter, block recall contract") {
    val left = Seq((1L, "jonathan", "j"), (2L, "marta", "m"))
      .toDF("id", "key", "block")
    val right = Seq(
      (10L, "jonathon", "j"),  // dist 1, same block → match
      (11L, "jxnxthxn", "j"),  // dist 3 → dropped
      (12L, "marta", "x"))     // exact match, WRONG block → dropped
      .toDF("id", "key", "block")
    val got = FuzzyMatch.fuzzyPairs(left, right, maxEdits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 10L, 1)),
      "only within-block pairs under the edit budget survive")
    // no cartesian product in the plan — blocking is an equi-join
    val plan = FuzzyMatch.fuzzyPairs(left, right, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("fuzzy pairs: length band + thresholded distance change nothing") {
    // the recall-free prunes (length band in the join, thresholded
    // levenshtein) must yield the EXACT match set of the naive
    // unbanded formulation — including boundary pairs sitting right
    // at the edit budget and at the length-difference limit
    val keys = Seq("ab", "abc", "abcd", "abcde", "abcdef", "xbcde",
      "abde", "ba", "", "a")
    val left = keys.zipWithIndex.map { case (k, i) => (i.toLong, k, "b") }
      .toDF("id", "key", "block")
    val right = keys.zipWithIndex.map { case (k, i) =>
      (100L + i, k.reverse, "b")
    }.toDF("id", "key", "block")
    for (e <- 0 to 3) {
      val got = FuzzyMatch.fuzzyPairs(left, right, e)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val naive = left.select(col("id").as("lid"), col("key").as("lk"))
        .crossJoin(right.select(col("id").as("rid"), col("key").as("rk")))
        .withColumn("d", levenshtein(col("lk"), col("rk")))
        .filter(col("d") <= e)
        .select(col("lid"), col("rid"), col("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == naive, s"banded != naive at maxEdits=$e")
    }
  }
}

class ExactCorrelationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.Profiler

  test("perfect, inverse, and degenerate correlations") {
    val df = Seq(
      ("pos", 1.0, 10.0), ("pos", 2.0, 20.0), ("pos", 3.0, 30.0),
      ("neg", 1.0, 30.0), ("neg", 2.0, 20.0), ("neg", 3.0, 10.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0))
      .toDF("g", "x", "y")
    val got = Profiler.exactCorrelation(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got("pos")._1 == 3L && math.abs(got("pos")._2.get - 1.0) < 1e-12)
    assert(math.abs(got("neg")._2.get - (-1.0)) < 1e-12)
    assert(got("flat")._2.isEmpty, "zero variance must yield NULL, not NaN")
  }
}

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.PageRank

  test("hand-computed integer ranks on a hub graph") {
    // a→b, a→c, b→a, c→a: outdeg a=2, b=c=1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    def ranks(iters: Int) = PageRank.integerPageRank(edges, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0) == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    // iter 1: b,c get 150000 + (1e6*85) div 200 = 575000;
    //         a gets 150000 + 2 * ((1e6*85) div 100) = 1850000
    assert(ranks(1) == Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    // iter 2: b,c: 150000 + (1850000*85) div 200 = 936250;
    //         a: 150000 + 2 * ((575000*85) div 100) = 1127500
    assert(ranks(2) == Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("2-cycle is the fixed point; dangling mass exits") {
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(PageRank.integerPageRank(cyc, 4)
      .collect().map(_.getLong(1)).toSet == Set(1000000L))
    // a→b only: b never feeds back; a bottoms out at the base 150000
    val dang = Seq((1L, 2L)).toDF("src", "dst")
    val r = PageRank.integerPageRank(dang, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 150000L)
    assert(r(2L) == 150000L + (150000L * 85) / 100)
  }

  test("sharded regime (rank table past the broadcast bound) matches broadcast bit-exactly") {
    // a ragged graph with hubs, chains, and dangling nodes so the two
    // code paths have real structure to disagree on
    val edges = (0L until 400L).flatMap { i =>
      Seq(i -> (i + 1) % 400, i -> (i * 7 + 3) % 400) ++
        (if (i % 5 == 0) Seq(i -> 0L) else Nil)
    }.toDF("src", "dst")
    val viaBroadcast = PageRank
      .integerPageRank(edges, 3, maxBroadcastNodes = Long.MaxValue)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val viaShuffle = PageRank
      .integerPageRank(edges, 3, maxBroadcastNodes = 0L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(viaShuffle == viaBroadcast,
      "integer arithmetic must make the two join regimes bit-identical")
  }

  test("plan shapes: broadcast regime hints the rank join; sharded pins edges on src") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val e = edges.select($"src", $"dst").distinct().localCheckpoint()
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node"))).distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ranks0 = nodes.withColumn("rank", lit(1000000L))
    // one un-checkpointed round per regime: broadcast carries the hint
    // into the optimized plan; sharded must NOT force one (a forced
    // broadcast of a >10^7-node rank table is exactly the failure the
    // switch exists to avoid — AQE may still pick broadcast at
    // runtime when a shuffle side turns out tiny, which is fine)
    val flat = e.join(deg, "src").localCheckpoint()
    val pinned = PageRank.pinBySrc(e.join(deg, "src"))
    val bPlan = PageRank.oneRound(flat, nodes, ranks0, useBroadcast = true)
      .queryExecution.optimizedPlan.toString
    val sPlan = PageRank.oneRound(pinned, nodes, ranks0, useBroadcast = false)
      .queryExecution.optimizedPlan.toString
    assert(bPlan.contains("broadcast"))
    assert(!sPlan.contains("broadcast"))
    // sharded edge frame: hashpartitioning(src) is pinned in the
    // checkpointed scan so per-round rank joins reuse it
    val part = pinned.queryExecution.executedPlan.outputPartitioning.toString
    assert(part.contains("hashpartitioning(src"),
      s"checkpoint must preserve the src partitioning, got: $part")
  }

  test("sharded regime: zero edge-sized exchanges across two consecutive rounds") {
    // The sharded variant's entire purpose: past the broadcast bound,
    // per round only node-sized frames move — the pinned edge frame
    // stays put. Broadcast is disabled so AQE cannot paper over a
    // lost pin by broadcasting the (here tiny) rank side.
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    saved.foreach { case (k, _) => conf.set(k, "-1") }
    try {
      val edges = (0L until 2000L).flatMap { i =>
        Seq(i -> (i + 1) % 2000, i -> (i * 7 + 3) % 2000)
      }.toDF("src", "dst")
      val e = edges.select($"src", $"dst").distinct().localCheckpoint()
      val nodes = e.select($"src".as("node"))
        .union(e.select($"dst".as("node"))).distinct().localCheckpoint()
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val pinned = PageRank.pinBySrc(e.join(deg, "src"))
      val ranks0 = nodes.withColumn("rank", lit(1000000L))
      val r1 = PageRank.oneRound(pinned, nodes, ranks0, useBroadcast = false)
      val r2 = PageRank.oneRound(pinned, nodes, r1, useBroadcast = false)
      assert(r2.count() == 2000L)
      // walk the finalized adaptive plan, descending into query stages
      def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = {
        val here = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            exchanges(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            exchanges(q.plan)
          case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
            Seq(x) ++ exchanges(x.child)
          case _ => Nil
        }
        here ++ p.children.flatMap(exchanges)
      }
      val xs = exchanges(r2.queryExecution.executedPlan)
      assert(xs.nonEmpty, "expected node-sized rank shuffles in the plan")
      val edgeSized = xs.filter(_.child.output.exists(_.name == "outdeg"))
      assert(edgeSized.isEmpty,
        s"edge frame re-shuffled: ${edgeSized.map(_.child.output.map(_.name).mkString(","))}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

class TableDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("diff classifies added/removed/changed with null-safe compares") {
    val before = Seq((1L, "a", Some(10)), (2L, "b", None),
      (3L, "c", Some(30))).toDF("id", "name", "v")
    val after = Seq((2L, "b", Some(20)), (3L, "c", Some(30)),
      (4L, "d", Some(40))).toDF("id", "name", "v")
    val got = graft.migrate.TableDiff.diff(before, after, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "removed", ""),
      (2L, "changed", "v"), // NULL -> 20 must register as a change
      (4L, "added", "")),
      s"unchanged row 3 must be absent: ${got.toSeq}")
  }

  test("diff refuses mismatched schemas") {
    val b = Seq((1L, "a")).toDF("id", "x")
    val a = Seq((1L, "a")).toDF("id", "y")
    val e = intercept[IllegalArgumentException] {
      graft.migrate.TableDiff.diff(b, a, Seq("id"))
    }
    assert(e.getMessage.contains("schema mismatch"))
  }
}

class CorpusModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the shared micro-nat forms: one rounding per token on both sides
  private def wm(ct: Long, cr: Long, nt: Long, nr: Long, v: Int): Long =
    math.floor((math.log((ct + 1).toDouble / (nt + v + 1).toDouble) -
      math.log((cr + 1).toDouble / (nr + v + 1).toDouble)) * 1e6 + 0.5).toLong

  test("dsir importanceWeights: hand-computed log-ratios, OOV bucket, plan") {
    import graft.text.Dsir
    // full corpus: a:3 b:3 c:3 (N_r=9); target (en): a:3 b:1 c:1 (N_t=5)
    val docs = Seq(
      (1L, "a a b", "en"), (2L, "a c", "en"), (3L, "b b c c", "de")
    ).toDF("doc_id", "text", "lang")
    val (wa, wb, wc) =
      (wm(3, 3, 5, 9, 16), wm(1, 3, 5, 9, 16), wm(1, 3, 5, 9, 16))
    val got = Dsir.importanceWeights(docs, col("lang") === "en", v = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 2 * wa + wb, if (2 * wa + wb > 0) 1 else 0),
      (2L, 2L, wa + wc, if (wa + wc > 0) 1 else 0),
      (3L, 4L, 2 * wb + 2 * wc, 0)))
    assert(wa > 0 && wb < 0, s"a must favor target, b the raw corpus: $wa $wb")

    // v=1 prunes the vocab to {a} (count ties break token-asc): b and
    // c score through the OOV bucket — numerators 1 on both models
    val oov = Dsir.importanceWeights(docs, col("lang") === "en", v = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val (oa, ox) = (wm(3, 3, 5, 9, 1), wm(0, 0, 5, 9, 1))
    assert(oov.toSeq == Seq(
      (1L, 2 * oa + ox), (2L, oa + ox), (3L, 4 * ox)))

    // partition-invariant; model joins broadcast, corpus never
    // shuffle-joins another corpus-sized frame
    val re = Dsir.importanceWeights(
        docs.repartition(5), col("lang") === "en", v = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(re.toSeq == got.toSeq)
    val plan = Dsir.importanceWeights(docs, col("lang") === "en", v = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("naiveBayes: hand scores, deterministic tie to class-asc, OOV regime") {
    import graft.text.Classifier
    // en: a:3 b:1 (N=4); de: a:1 b:3 (N=4); priors 2/4 each. Doc 2
    // and doc 4 share the text "a b", whose class scores are EQUAL
    // sums of the same micro-nat multiset — the argmax must break
    // the tie to the ascending class name on both engines.
    val docs4 = Seq(
      (1L, "a a", "en"), (2L, "a b", "en"),
      (3L, "b b", "de"), (4L, "a b", "de")
    ).toDF("doc_id", "text", "lang")
    val got = Classifier.naiveBayes(docs4, "lang", v = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, "en", "en", 1), (2L, "en", "de", 0),
      (3L, "de", "de", 1), (4L, "de", "de", 1)))

    // score_micro of doc 1 under en: 2·ln(4/21) tokens + ln(2/4) prior
    def t(c: Long, n: Long, v: Int): Long =
      math.floor(math.log((c + 1).toDouble / (n + v + 1).toDouble) * 1e6 + 0.5).toLong
    val s1 = Classifier.naiveBayes(docs4, "lang", v = 16)
      .filter(col("doc_id") === 1).head().getLong(3)
    assert(s1 == 2 * t(3, 4, 16) +
      math.floor(math.log(0.5) * 1e6 + 0.5).toLong)

    // five-doc corpus under v=1 ({a} in vocab, b/z OOV): doc 5's "z z"
    // flips to de purely through the per-class OOV mass and doc 4
    // breaks en-ward on the en-favoring prior — hand-traced labels
    val docs5 = docs4.union(Seq((5L, "z z", "en")).toDF("doc_id", "text", "lang"))
    val oov = Classifier.naiveBayes(docs5, "lang", v = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(oov.toSeq == Seq(
      (1L, "en"), (2L, "en"), (3L, "de"), (4L, "en"), (5L, "de")))

    // partition-invariant; model joins broadcast
    val re = Classifier.naiveBayes(docs4.repartition(5), "lang", v = 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(4)))
    assert(re.toSeq == got.toSeq)
    val plan = Classifier.naiveBayes(docs4, "lang", v = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}

class HitsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 1→3, 2→3, 2→4, 3→4: node 2 is the strong hub (it reaches both
  // authorities), 3 and 4 the authorities; hand-traced half-steps
  // with divisor-first integer L∞ normalization
  private def g = Seq((1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    .toDF("src", "dst")

  test("integerHits matches the hand-traced iterations") {
    import graft.ops.Hits
    val one = Hits.integerHits(g, iters = 1).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(one.toSeq == Seq(
      (1L, 500000L, 0L), (2L, 1000000L, 0L),
      (3L, 500000L, 1000000L), (4L, 0L, 1000000L)))

    // round 2: a2 raws tie at 1.5e6 (divisor 1 floors to the raw),
    // h2 max 3e6 → hubs re-scale through divisor 3
    val two = Hits.integerHits(g, iters = 2).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(two.toSeq == Seq(
      (1L, 500000L, 0L), (2L, 1000000L, 0L),
      (3L, 500000L, 1500000L), (4L, 0L, 1500000L)))

    // duplicate edges collapse; partitioning can't move a score
    val dup = Hits.integerHits(g.union(g).repartition(5), iters = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dup.toSeq == two.toSeq)
  }

  test("half-step plan: node-sized scores broadcast, edges stay put") {
    import graft.ops.Hits
    val e = g.select($"src", $"dst").distinct()
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node"))).distinct()
    val hub = nodes.withColumn("score", lit(1000000L))
      .select($"node".as("src"), $"score")
    val plan = Hits.rawSum(e, nodes, hub, joinOn = "src", keyedBy = "dst")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("sharded regime (score table past the broadcast bound) matches broadcast bit-exactly") {
    import graft.ops.Hits
    // hubs, chains, and a popular sink so the two code paths have
    // real structure to disagree on
    val edges = (0L until 300L).flatMap { i =>
      Seq(i -> (i * 3 + 1) % 300, i -> (i * 7 + 5) % 300) ++
        (if (i % 4 == 0) Seq(i -> 1L) else Nil)
    }.toDF("src", "dst")
    val viaBroadcast = Hits
      .integerHits(edges, 2, maxBroadcastNodes = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val viaShuffle = Hits.integerHits(edges, 2, maxBroadcastNodes = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(viaShuffle.toSeq == viaBroadcast.toSeq,
      "integer arithmetic must make the two join regimes bit-identical")
  }

  test("hits sharded regime: zero edge-sized exchanges across two consecutive half-steps") {
    import graft.ops.{Hits, PageRank}
    // Past the broadcast bound only node-sized score frames may move:
    // the auth half-step reuses the src-pinned edge copy, the hub
    // half-step the dst-pinned one. Broadcast is disabled so AQE
    // cannot paper over a lost pin by broadcasting the (here tiny)
    // score side.
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    saved.foreach { case (k, _) => conf.set(k, "-1") }
    try {
      val edges = (0L until 2000L).flatMap { i =>
        Seq(i -> (i + 1) % 2000, i -> (i * 7 + 3) % 2000)
      }.toDF("src", "dst")
      val e = edges.select($"src", $"dst").distinct().localCheckpoint()
      val nodes = e.select($"src".as("node"))
        .union(e.select($"dst".as("node"))).distinct().localCheckpoint()
      val eBySrc = PageRank.pinBy(e, "src")
      val eByDst = PageRank.pinBy(e, "dst")
      val hub0 = nodes.withColumn("score", lit(1000000L))
        .select($"node".as("src"), $"score")
      val a1 = Hits.rawSum(eBySrc, nodes, hub0,
        joinOn = "src", keyedBy = "dst", useBroadcast = false)
      // feed the raw auths straight back (normalization is node-local
      // arithmetic — irrelevant to the exchange shape under test)
      val h1 = Hits.rawSum(eByDst, nodes,
        a1.select($"node".as("dst"), $"raw".as("score")),
        joinOn = "dst", keyedBy = "src", useBroadcast = false)
      assert(h1.count() == 2000L)
      def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = {
        val here = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            exchanges(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            exchanges(q.plan)
          case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
            Seq(x) ++ exchanges(x.child)
          case _ => Nil
        }
        here ++ p.children.flatMap(exchanges)
      }
      val xs = exchanges(h1.queryExecution.executedPlan)
      assert(xs.nonEmpty, "expected node-sized score shuffles in the plan")
      // the edge frame is the only one carrying BOTH src and dst
      val edgeSized = xs.filter { x =>
        val names = x.child.output.map(_.name).toSet
        names.contains("src") && names.contains("dst")
      }
      assert(edgeSized.isEmpty,
        s"edge frame re-shuffled: ${edgeSized.map(_.child.output.map(_.name).mkString(","))}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

class GraphSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // out-neighbor sets: A{x,y,z} B{x,y} C{y,q} D{h}; y has in-degree 3
  private def g = Seq(
    ("A", "x"), ("A", "y"), ("A", "z"),
    ("B", "x"), ("B", "y"), ("C", "y"), ("C", "q"), ("D", "h")
  ).toDF("src", "dst")

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("neighborJaccard: exact over the maxDF-filtered graph") {
    import graft.ops.GraphSim
    // maxDF=3 keeps the whole graph: all three sharing pairs appear
    val full = GraphSim.neighborJaccard(g, maxDF = 3L).orderBy("a", "b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(full.toSeq == Seq(
      ("A", "B", 2L, 3L, 2L, r6(2.0 / 3.0)),
      ("A", "C", 1L, 3L, 2L, 0.25),
      ("B", "C", 1L, 2L, 2L, r6(1.0 / 3.0))))

    // maxDF=2 drops hot y FIRST: degrees shrink too, so (A,B)'s
    // jaccard is 1/(2+1-1) over the filtered graph, not a biased
    // estimate of the raw one; (A,C)/(B,C) lose their only shared
    // neighbor and vanish
    val cap = GraphSim.neighborJaccard(g, maxDF = 2L).orderBy("a", "b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(cap.toSeq == Seq(("A", "B", 1L, 2L, 1L, 0.5)))

    // tau thresholds on the ALREADY-rounded value
    val tau = GraphSim.neighborJaccard(g, maxDF = 3L, tau = 0.3)
      .orderBy("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
    assert(tau.toSeq == Seq(("A", "B"), ("B", "C")))

    // partition-invariant; pair generation is an equi-join bucket,
    // never a cartesian
    val re = GraphSim.neighborJaccard(g.repartition(5), maxDF = 3L)
      .orderBy("a", "b").collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(re.toSeq == full.toSeq)
    val plan = GraphSim.neighborJaccard(g, maxDF = 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

class WinsorizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("winsorizedStats: discrete rank bounds, clipping, groups") {
    import graft.ops.Profiler
    // A: cents 1..20 → k5 = ceil(1.0) = 1 → lo = 1; k95 = 19 → hi = 19,
    // so only the 20 clips (to 19). B: duplicates at 5 and a tail 9 →
    // k95 = 4 lands on the 9 itself, nothing clips.
    val df = ((1 to 20).map(i => ("A", i / 100.0)) ++
      Seq(("B", 0.05), ("B", 0.05), ("B", 0.05), ("B", 0.09))).toDF("g", "v")
    val got = Profiler.winsorizedStats(df, "v", "g").orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == Seq(
      ("A", 20L, 0.01, 0.19, 210.0 / 20 / 100, 209.0 / 20 / 100, 0L, 1L),
      ("B", 4L, 0.05, 0.09, 24.0 / 4 / 100, 24.0 / 4 / 100, 0L, 0L)))

    // pctLo = 0: rank 0 is reached by every cumulative count, so the
    // low bound is the group minimum and nothing clips low
    val lo0 = Profiler.winsorizedStats(df, "v", "g", pctLo = 0, pctHi = 50)
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(lo0.toSeq == Seq(("A", 0.01), ("B", 0.05)))

    // partition-invariant; the bounds come back via a broadcast join
    val re = Profiler.winsorizedStats(df.repartition(5), "v", "g")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7)))
    assert(re.toSeq == got.toSeq)
    val plan = Profiler.winsorizedStats(df, "v", "g")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("winsorizedStats rejects inverted percentile bounds") {
    val df = Seq(("A", 1.0)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Profiler.winsorizedStats(df, "v", "g", pctLo = 90, pctHi = 10)
    }
    assert(e.getMessage.contains("pctLo"))
  }
}

class EwmaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ewmaHalf folds the integer recurrence in event-time order") {
    import graft.ops.Transforms
    // user 1: cents 5, 3, 9 → 5, (5+3)/2 = 4, (4+9)/2 = 6 → 0.06;
    // user 2: single event is its own EWMA; user 3: equal ts breaks
    // the fold order on event_id (9 before 1 by id → 5,7,4 ≠ 5,3,6)
    val df = Seq(
      (1L, 10L, 1L, 0.05), (1L, 20L, 2L, 0.03), (1L, 30L, 3L, 0.09),
      (2L, 10L, 4L, 0.42),
      (3L, 10L, 5L, 0.05), (3L, 20L, 7L, 0.01), (3L, 20L, 6L, 0.09)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Transforms.ewmaHalf(df).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 0.09, 0.06),
      (2L, 1L, 0.42, 0.42),
      // 5 → (5+9)/2 = 7 (id 6 first) → (7+1)/2 = 4
      (3L, 3L, 0.01, 0.04)))

    // partition-invariant; one key shuffle, no joins anywhere
    val re = Transforms.ewmaHalf(df.repartition(5)).orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(re.toSeq == got.toSeq)
    val plan = Transforms.ewmaHalf(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}

class ReadabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("readabilitySignals: vowel-group syllables, complex words, zero shuffle") {
    // "hello" = he-llo → 2; "sky" has no aeiou but y counts → 1;
    // "beautiful" = eau-i-u → 3 (complex); "xyzzy" → y+y = 2;
    // a consonant-only token floors at 1
    val docs = Seq(
      (1L, "hello sky beautiful"), (2L, "xyzzy tsk"), (3L, "")
    ).toDF("doc_id", "text")
    val got = graft.text.TextAnalysis.readabilitySignals(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.toSeq == Seq(
      (1L, 3L, 6L, 1L, 2.0, r6(1.0 / 3.0)),
      (2L, 2L, 3L, 0L, 1.5, 0.0),
      (3L, 0L, 0L, 0L, 0.0, 0.0)))

    // per-row expressions only: no exchange, no join in the plan
    val plan = graft.text.TextAnalysis.readabilitySignals(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }
}

class RankFusionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fuse: integer reciprocal ranks, direction, ties to id") {
    import graft.ops.RankFusion
    // group g: ppl ranks (asc) 1=b, 2=a, 3=c; quality ranks (desc)
    // 1=a, 2=b(tie with c broken by id), 3=c
    val df = Seq(
      ("a", "g", 2.0, 0.9), ("b", "g", 1.0, 0.5), ("c", "g", 3.0, 0.5),
      ("d", "h", 9.0, 0.1)
    ).toDF("id", "grp", "ppl", "quality")
    val got = RankFusion.fuse(df, "id", "grp",
        Seq(("ppl", true), ("quality", false)))
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getInt(4), r.getInt(5), r.getLong(6)))
    def c(r: Int) = 1000000L / (60 + r)
    assert(got.toSeq == Seq(
      ("a", 2, 1, c(2) + c(1)),
      ("b", 1, 2, c(1) + c(2)),
      ("c", 3, 3, c(3) + c(3)),
      // a singleton group ranks 1 on every signal
      ("d", 1, 1, c(1) + c(1))))

    // partition-invariant
    val re = RankFusion.fuse(df.repartition(5), "id", "grp",
        Seq(("ppl", true), ("quality", false)))
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getInt(4), r.getInt(5), r.getLong(6)))
    assert(re.toSeq == got.toSeq)
  }

  test("fuse rejects an empty signal list") {
    val df = Seq(("a", "g", 1.0)).toDF("id", "grp", "x")
    val e = intercept[IllegalArgumentException] {
      graft.ops.RankFusion.fuse(df, "id", "grp", Nil)
    }
    assert(e.getMessage.contains("signal"))
  }
}
