package graft

import graft.ops.{DedupSim, ScratchCache, TextOps}
import org.apache.spark.sql.functions.col

/** Planted-case tests for the training-data curation operators added in
  * round 3 (contamination, repetition flags, cluster collapse, mixture
  * sampling). The oracle gate value-checks the three SQL-expressible
  * ones on real data; these tests pin the SEMANTICS on hand-built
  * corpora where the right answer is known by construction. */
class TrainingDataSpec extends GraftSuite {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(col("text")).cast("long"))

  test("bpe pairs count adjacent char pairs inside words only") {
    val corpus = docs((1L, "aaa ab b", "en", "s1"))
    // aaa -> aa,aa; ab -> ab; "b" too short to pair
    val out = TextOps.bpePairsOn(corpus).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n"))
    assert(out.toSeq == Seq("aa" -> 2L, "ab" -> 1L))
  }

  test("bpe train: k=5 greedy merges reproduce the hand-computed " +
      "Sennrich-style merge table") {
    // classic BPE fixture — vocab {low:5, lower:2, newest:6, widest:3}:
    //  r1: es:9 ties st:9 -> (e,s) wins (lowest pair); newest/widest
    //      re-segment to [n,e,w,es,t]/[w,i,d,es,t]
    //  r2: (es,t):9 -> est
    //  r3: lo:7 ties ow:7 -> (l,o) wins; low -> [lo,w]
    //  r4: (lo,w):7 -> low
    //  r5: (e,w):6 ties (n,e):6, (w,est):6 -> (e,w) wins
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val corpus = docs((1L, text, "en", "s1"))
    val out = TextOps.bpeTrainOn(spark, corpus, 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n")))
    assert(out.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
      (4, "lo", "w", 7L), (5, "e", "w", 6L)))
    // greedy left-to-right within a word: "aaa" + pair (a,a) merges
    // the FIRST two only, and non-[a-z] tokens never train
    val out2 = TextOps.bpeTrainOn(spark,
      docs((1L, "aaa aaa x9y x9y x9y", "en", "s1")), 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n")))
    // r1: (a,a):4 (two per "aaa"); after: [aa,a]; r2: (a,aa)? no —
    // pairs are (aa,a):2 -> merge (aa,a)
    assert(out2.toSeq == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("bpe train: the driver-side incremental trainer reproduces the " +
      "distributed per-round-job twin merge-for-merge") {
    // real corpus (sf docs) so ties, repeated symbols, and exhaustion
    // paths all occur naturally; k past the demo 5
    val corpus = Tables.documents(spark, sf)
    val k = 12
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n"))).toSeq
    val local = rows(TextOps.bpeTrainOn(spark, corpus, k))
    val dist = rows(TextOps.bpeTrainDistributedOn(spark, corpus, k))
    assert(local == dist)
    // production-k smoke: k=64 must run in-loop without Spark jobs —
    // bounded by the one collapse job plus driver work (the r11 shape
    // was 64 sequential jobs). Assert it trains and merges are
    // monotone-consistent (counts never increase across rounds for the
    // same pair space is not guaranteed, but rounds are dense 1..64 or
    // stop at exhaustion).
    val big = rows(TextOps.bpeTrainOn(spark, corpus, 64))
    assert(big.map(_._1) == (1 to big.size).toSeq && big.size <= 64)
    assert(big.take(k) == local) // prefix-stability: more rounds, same start
  }

  test("bpe train vocab-size gate: a vocabulary over " +
      "spark.graft.bpe.maxLocalVocab trips to the distributed twin " +
      "with an identical merge table") {
    val corpus = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n"))).toSeq
    // default threshold: the sf vocab fits, the local trainer runs
    val (viaLocal, usedLocal) = TextOps.bpeTrainGated(spark, corpus, 5)
    assert(usedLocal, "sf vocab must fit under the default 5M threshold")
    // planted tiny threshold: the gate MUST trip (the sf docs carry
    // far more than 3 distinct words) and the key's output must be
    // byte-equal — gated ≡ ungated
    val key = "spark.graft.bpe.maxLocalVocab"
    spark.conf.set(key, "3")
    try {
      val (viaDist, usedLocal2) = TextOps.bpeTrainGated(spark, corpus, 5)
      assert(!usedLocal2, "a 3-row threshold must trip the gate")
      assert(rows(viaDist) == rows(viaLocal))
    } finally spark.conf.unset(key)
  }

  test("bpe encode: the learned merges compress the fixture to the " +
      "hand-computed token-length histogram") {
    // after the 5 merges (es, est, lo, low, ew):
    //   low    -> [low]        1 sym,  freq 5
    //   lower  -> [low,e,r]    3 syms, freq 2
    //   newest -> [n,ew,est]   3 syms, freq 6
    //   widest -> [w,i,d,est]  4 syms, freq 3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val out = TextOps.bpeEncodeOn(spark,
      docs((1L, text, "en", "s1")), 5).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_vocab_words"),
        r.getAs[Long]("n_corpus_words"), r.getAs[Long]("n_corpus_tokens")))
    assert(out.toSeq == Seq(
      (1, 1L, 5L, 5L), (3, 2L, 8L, 24L), (4, 1L, 3L, 12L)))
    // encode shares the train gate: with a tripping threshold (4
    // distinct vocab words > 3) the merges come from the distributed
    // trainer and the histogram must be byte-equal
    val key = "spark.graft.bpe.maxLocalVocab"
    spark.conf.set(key, "3")
    try {
      val gated = TextOps.bpeEncodeOn(spark,
        docs((1L, text, "en", "s1")), 5).collect()
        .map(r => (r.getInt(0), r.getAs[Long]("n_vocab_words"),
          r.getAs[Long]("n_corpus_words"), r.getAs[Long]("n_corpus_tokens")))
      assert(gated.toSeq == out.toSeq)
    } finally spark.conf.unset(key)
  }

  test("classifier training: distributed decimal-gradient loop matches " +
      "a pure-driver replica and is repartition-invariant") {
    val corpus = Tables.documents(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val m = TextOps.classifierTrainOn(df, 16, 1.0).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      ops.ScratchCache.releaseAll()
      m
    }
    val out = run(corpus)
    // exact-decimal gradient sums: a different partitioning must give
    // the BIT-SAME weights, not merely close ones
    assert(out == run(corpus.repartition(7)))
    // pure-driver replica of the identical loop (same per-row double
    // contributions, same HALF_UP cast to scale 14, same update order)
    val feats = TextOps.classifierTrainFeatures(corpus).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val w = Array.fill(5)(0.0)
    val n = feats.length.toDouble
    // the pinned-rational sigmoid, op-for-op (see classifierTrainOn)
    def p(f: (Double, Double, Double, Double, Double)): Double = {
      val m = w(0) + w(1) * f._2 + w(2) * f._3 +
        w(3) * f._4 + w(4) * f._5
      0.5 * (1.0 + m / (1.0 + math.abs(m)))
    }
    for (_ <- 1 to 16) {
      val sums = Array.fill(5)(BigDecimal(0))
      feats.foreach { f =>
        val g = p(f) - f._1
        val xs = Array(1.0, f._2, f._3, f._4, f._5)
        var j = 0
        while (j < 5) {
          sums(j) += BigDecimal(g * xs(j))
            .setScale(14, BigDecimal.RoundingMode.HALF_UP)
          j += 1
        }
      }
      var j = 0
      while (j < 5) { w(j) -= 1.0 * sums(j).toDouble / n; j += 1 }
    }
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("w_bias") == r6(w(0)) && out("w_stop") == r6(w(1)) &&
      out("w_digit") == r6(w(2)) && out("w_len") == r6(w(3)) &&
      out("w_wlen") == r6(w(4)), s"$out vs ${w.toSeq}")
    // the synthetic corpus draws text from one shared vocab regardless
    // of lang, so the features are (correctly) uninformative here and
    // the honest fit converges to the majority class — training must
    // never do WORSE than that floor (the separable-fixture test below
    // covers the signal-present case, where accuracy reaches 1)
    val base = feats.count(_._1 == 1.0) / n
    assert(out("accuracy") >= math.max(base, 1 - base), out.toString)
    assert(out("n_docs") == n && out("n_positive") == feats.count(_._1 == 1.0))
  }

  test("classifier training: a separable planted corpus converges to " +
      "accuracy 1 with a positive stopword weight") {
    // en docs are pure stopword text (x1 = 1), others have none
    // (x1 = 0) — one feature separates perfectly, so the logistic fit
    // must classify every doc and push w_stop positive
    val corpus = docs(
      (1 to 10).map(i =>
        (i.toLong, "the of and is to in the a", "en", "s1")) ++
      (11 to 20).map(i =>
        (i.toLong, "bonjour monde sans pareil jamais", "fr", "s1")): _*)
    val out = TextOps.classifierTrainOn(corpus, 16, 1.0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    ops.ScratchCache.releaseAll()
    assert(out("accuracy") == 1.0, out.toString)
    assert(out("w_stop") > 0.0, out.toString)
    assert(out("n_positive") == 10.0 && out("n_docs") == 20.0)
  }

  test("classifier calibration: bins partition the corpus, the top bin " +
      "is en-dominated on a separable corpus, partition-invariant") {
    // en docs are stopword-rich (high score8), fr docs digit-heavy
    // (low score8) — a calibrated diagram must put en mass in the top
    // bin and fr mass in the bottom one
    val corpus = docs(
      ((1 to 12).map(i =>
        (i.toLong, "the of and is to in the a of the", "en", "s1")) ++
      (13 to 24).map(i =>
        (i.toLong, "99 12345 678 00 42 7 31337 5", "fr", "s1"))): _*)
    val out = TextOps.textClassifierCalibrationOn(corpus, nBins = 10)
      .collect()
    ops.ScratchCache.releaseAll()
    assert(out.map(_.getAs[Long]("n_docs")).sum == 24L,
      "bins must partition every doc")
    val top = out.maxBy(_.getAs[Long]("bin"))
    val bot = out.minBy(_.getAs[Long]("bin"))
    assert(top.getAs[Double]("en_rate") == 1.0 &&
      top.getAs[Long]("n_docs") == 12L, top.toString)
    assert(bot.getAs[Double]("en_rate") == 0.0 &&
      bot.getAs[Long]("n_docs") == 12L, bot.toString)
    assert(out.forall(r => r.getAs[Long]("lo8") <= r.getAs[Long]("hi8")))
    val out2 = TextOps.textClassifierCalibrationOn(
      corpus.repartition(7), nBins = 10).collect()
    ops.ScratchCache.releaseAll()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
  }

  test("classifier scores are integer-exact and threshold deterministically") {
    val corpus = docs(
      // "a b 1": nt=3 ns=1 nc=5 nd=1 nsp=2 -> f_stop6=333333,
      // f_digit6=200000, f_len6=11718, f_wlen6=125000 -> score8 =
      // 20000000 + 49999950 - 40000000 + 937440 + 6250000 = 37187390
      (1L, "a b 1", "en", "s1"),
      // all-stopword doc: nt=8 ns=8 nc=26 nd=0 nsp=7 -> f_stop6=1000000,
      // f_len6=31250, f_wlen6=296875 -> score8 = 20000000 + 150000000
      // + 2500000 + 14843750 = 187343750 (> 55000000: kept)
      (2L, "the of and is to in the of", "en", "s1"))
    val out = TextOps.textClassifierOn(corpus).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("n_kept") == 1L)
    assert(r.getAs[Long]("min_score8") == 37187390L)
    assert(r.getAs[Long]("max_score8") == 187343750L)
    // (37187390 + 187343750) / 2 / 1e8 = 1.1226557 -> 1.122656
    assert(r.getAs[Double]("mean_score") == 1.122656)
  }

  test("contamination flags exactly the train docs sharing a benchmark 5-gram") {
    val corpus = docs(
      (100L, "alpha beta gamma delta epsilon zeta", "en", "s1"), // benchmark
      (1L, "alpha beta gamma delta epsilon different tail", "en", "s1"), // leaked
      (2L, "totally unrelated words with no overlap at all", "en", "s1"),
      (3L, "short doc", "en", "s2")) // < 5 tokens: cannot be contaminated
    val out = TextOps.contaminationOn(corpus).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_train"), r.getAs[Long]("n_contaminated"))).toMap
    assert(out("s1") == ((2L, 1L)))
    assert(out("s2") == ((1L, 0L)))
  }

  test("repetition flags: top-token and duplicate-2-gram thresholds") {
    val corpus = docs(
      // "spam" is 4/6 of tokens (>20%) and "spam spam" repeats -> both flags
      (1L, "spam spam spam spam other words", "en", "s1"),
      // all-distinct tokens -> no flags
      (2L, "one two three four five six seven eight nine ten", "en", "s1"))
    val out = TextOps.repetitionOn(corpus).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_top_token_heavy") == 1L)
    assert(r.getAs[Long]("n_dup_2gram_heavy") == 1L)
  }

  test("cluster collapse: transitive near-dups keep one representative") {
    // three docs of identical text (pairwise Jaccard 1.0) + one clean:
    // one cluster {10,11,12}, representative 10, removed 11 and 12
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = docs(
      (10L, t, "en", "s1"), (11L, t, "en", "s1"), (12L, t, "en", "s1"),
      (20L, "completely different content with many unique tokens here", "en", "s1"))
    val out = DedupSim.dedupClusterOn(corpus).collect().head
    assert(out.getAs[Long]("n_docs") == 4L)
    assert(out.getAs[Long]("n_in_dup_clusters") == 3L)
    assert(out.getAs[Long]("n_removed") == 2L)
    assert(out.getAs[Long]("n_kept") == 2L)
  }

  test("vocab encode: frequency-ranked ids, ordered sequences") {
    // corpus: "b a a" + "a c" → tf a=3, b=1, c=1 → ids a=1, b=2, c=3
    // (ties on tf broken by term: b before c)
    val corpus = docs(
      (0L, "b a a", "en", "s1"),
      (1L, "a c", "en", "s1"))
    val out = TextOps.vocabEncodeOn(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("id_sum"),
          r.getAs[String]("encoded"))).toMap
    assert(out(0L) == ((3L, 4L, "2,1,1")))
    assert(out(1L) == ((2L, 4L, "1,3")))
  }

  test("cluster collapse is idempotent: keeping survivors removes nothing") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = docs(
      (10L, t, "en", "s1"), (11L, t, "en", "s1"), (12L, t, "en", "s1"),
      (20L, "completely different content with many unique tokens here", "en", "s1"),
      (21L, "yet another clean document about entirely other matters", "en", "s1"))
    // survivors = corpus minus removed = {10, 20, 21}
    val survivors = corpus.filter(col("doc_id") =!= 11L && col("doc_id") =!= 12L)
    val second = DedupSim.dedupClusterOn(survivors).collect().head
    assert(second.getAs[Long]("n_removed") == 0L,
      "a deduped corpus must have nothing left to remove")
    assert(second.getAs[Long]("n_in_dup_clusters") == 0L)
  }

  test("quantization stays within int8 bounds and hits the extremes") {
    import org.apache.spark.sql.functions.{abs => fabs, max => fmax}
    val out = DedupSim.embQuantize(spark, sf)
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("min_q") >= -127L && r.getAs[Long]("max_q") <= 127L)
      // max-abs scaling maps each (non-zero) vector's extreme dimension
      // to exactly ±127
      assert(r.getAs[Long]("n_extreme") >= r.getAs[Long]("n_vecs"),
        "each vector contributes at least one saturated dimension")
    }
    assert(rows.nonEmpty)
  }

  test("ranged shard packing equals the single-sequence global pack") {
    import graft.ops.ScratchCache
    val corpus = Tables.documents(spark, sf)
    // one range = literally the global window; many ranges must produce
    // the IDENTICAL packing (two-phase prefix sum is exact, and range
    // boundaries cannot move a doc between shards)
    val global = TextOps.packShardsRangedOn(corpus, 500L, 1).collect().toSeq
    val ranged = TextOps.packShardsRangedOn(corpus, 500L, 7).collect().toSeq
    assert(ranged == global)
    assert(ranged.length > 1)
    // independent reference: the naive one-task global window (the plan
    // the two-phase prefix sum exists to avoid)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = corpus
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("shard",
        floor((col("cum") - col("toks")) / 500L).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("sum_tokens"))
      .orderBy(col("shard")).collect().toSeq
    assert(ranged == expected)
    // input partitioning must not leak into the result: the range
    // exchange re-establishes global doc_id order whatever arrives
    val shuffled = TextOps.packShardsRangedOn(
      corpus.repartition(13), 500L, 7).collect().toSeq
    assert(shuffled == expected)
    ScratchCache.releaseAll()
  }

  test("mixture sampling is deterministic and repartition-stable") {
    val a = TextOps.sampleMixture(spark, sf).collect()
    val b = TextOps.sampleMixture(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    // en keeps everything (rate 100); every lang row satisfies
    // 0 <= n_kept <= n_total
    val m = a.map(r => r.getString(0) ->
      (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))).toMap
    assert(m("en")._1 == m("en")._2)
    m.values.foreach { case (tot, kept) => assert(kept >= 0 && kept <= tot) }
    // zh rate 50: strictly between the extremes on any non-trivial corpus
    if (m("zh")._1 > 20) assert(m("zh")._2 > 0 && m("zh")._2 < m("zh")._1)
  }

  test("stratified sampling matches a java-side md5 replay and is stable") {
    val corpus = docs((0L until 200L).map(i =>
      (i, s"document body $i", Seq("en", "zh", "de", "xx")((i % 4).toInt),
        s"src${i % 3}")): _*)
    // independent replay of the bucketing: MessageDigest md5 of
    // "<doc_id>#strat", first 4 hex chars as int, % 100 vs threshold
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Int = {
      val h = md.digest(s"$id#strat".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(h.substring(0, 4), 16) % 100
    }
    val thr = Map("en" -> 50, "zh" -> 30, "de" -> 20).withDefaultValue(10)
    val expected = (0L until 200L)
      .map(i => (Seq("en", "zh", "de", "xx")((i % 4).toInt), i))
      .groupBy(_._1)
      .map { case (lang, rows) =>
        lang -> (rows.size.toLong,
          rows.count { case (l, id) => bucket(id) < thr(l) }.toLong) }
    val out = TextOps.sampleStratifiedOn(corpus).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_sampled"))).toMap
    assert(out == expected)
    // membership is row-local: physical partitioning cannot change it
    val shuffled = TextOps.sampleStratifiedOn(corpus.repartition(13))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_sampled"))).toMap
    assert(shuffled == expected)
  }

  test("line dedup keeps first occurrence of content and footer lines") {
    // docs 1 and 2 share CONTENT (doc 2's copy removed); docs 10 and 17
    // share the planted FOOTER (both % 7 == 3; doc 17's copy removed)
    val corpus = docs(
      (1L, "same text", "en", "s1"),
      (2L, "same text", "en", "s1"),
      (10L, "aaa", "en", "s2"),
      (17L, "bbb", "en", "s2"))
    val out = TextOps.dedupLinesOn(corpus).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"),
        r.getAs[Long]("chars_removed"))).toMap
    val footerLen = ("boilerplate footer variant 3" +
      " subscribe for updates and accept cookies").length.toLong
    assert(out("s1") == ((4L, 3L, 1L, "same text".length.toLong)))
    assert(out("s2") == ((4L, 3L, 1L, footerLen)))
  }

  test("keyterms: planted language signatures rank by exact lift with " +
      "min-support filtering") {
    // en: 'the'x30 + 'data'x20; de: 'und'x30 + 'data'x20; T = 100
    // lift(en,the) = 30*100/(30*50) = 2.0; lift(en,data) = 1.0;
    // 'rare' appears 5x < min support 20 -> excluded
    val corpus = docs(
      (1L, (Seq.fill(30)("the") ++ Seq.fill(20)("data")).mkString(" "),
        "en", "s1"),
      (2L, (Seq.fill(30)("und") ++ Seq.fill(20)("data")
        ++ Seq.fill(5)("rare")).mkString(" "), "de", "s1"))
    val out = TextOps.keyTermsOn(corpus).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rank")) ->
        ((r.getString(2), r.getAs[Double]("lift"))))
      .toMap
    ScratchCache.releaseAll()
    // de totals include 'rare': T_de = 55, T = 105
    // lift(de,und) = 30*105/(30*55) = 1.909091
    // lift(de,data) = 20*105/(40*55) = 0.954545
    // lift(en,the) = 30*105/(30*50) = 2.1
    // lift(en,data) = 20*105/(40*50) = 1.05
    assert(out == Map(
      ("en", 1L) -> (("the", 2.1)), ("en", 2L) -> (("data", 1.05)),
      ("de", 1L) -> (("und", 1.909091)),
      ("de", 2L) -> (("data", 0.954545))), out.toString)
  }

  test("importance sampling: target-vocabulary docs score above the " +
      "corpus mean and are selected, regardless of their own source") {
    // target domain = src0 uses 'aaa'; doc 2 shares that vocabulary
    // from src1 and must be selected too (that's the DSIR point)
    val corpus = docs(
      (1L, "aaa aaa aaa", "en", "src0"),
      (2L, "aaa aaa aaa", "en", "src1"),
      (3L, "zzz zzz zzz", "en", "src1"),
      (4L, "zzz zzz zzz", "de", "src1"))
    // w(aaa) = (3+1)*1e6 // (6+1) = 571428; w(zzz) = 1e6 // 7 = 142857
    // mean = 357142.5 -> docs 1,2 selected
    val out = TextOps.sampleImportanceOn(corpus).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_selected"),
        Option(r.getAs[java.lang.Double]("avg_sel_score"))))).toMap
    ScratchCache.releaseAll()
    assert(out == Map(
      "en" -> ((3L, 2L, Some(571428.0))),
      "de" -> ((1L, 0L, None))), out.toString)
  }

  test("span dedup: cross-doc 8-token spans flagged, within-doc " +
      "repeats and short docs excluded") {
    val corpus = docs(
      // 9 tokens -> 2 spans; the first span [w1..w8] recurs in doc 2
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "s1"),
      // same first span modulo CASE (lower() applies); second differs
      (2L, "W1 w2 w3 w4 w5 w6 w7 w8 x9", "en", "s1"),
      // unique single span
      (3L, "a1 a2 a3 a4 a5 a6 a7 a8", "en", "s1"),
      // < 8 tokens -> contributes no spans, absent from output
      (4L, "only three words", "en", "s1"),
      // WITHIN-doc repetition: [r1..r8] occurs twice in doc 5 alone —
      // cross-doc definition keeps it NOT duplicated
      (5L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8", "en", "s1"))
    val out = TextOps.dedupSpansOn(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_ratio")))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, 0.5)), 2L -> ((2L, 1L, 0.5)),
      3L -> ((1L, 0L, 0.0)), 5L -> ((9L, 0L, 0.0))), out.toString)
  }

  test("url dedup collapses case/port/utm/slash/fragment variants") {
    // doc_ids chosen so every planted URL points at the SAME resource
    // (id % 7, % 50, % 5 all equal) while the raw strings differ:
    // 350 (even: WWW., trailing slash; %4!=0: no campaign; %3!=0: no port)
    // 1050 (even, %3==0: explicit :443; %4!=0)
    // 2100 (even, %3==0, %4==0: adds utm_campaign)
    // and 701 (odd: lowercase www, #frag) hits resource 701%50=1 — a
    // DIFFERENT canonical from the 0-group
    val corpus = docs(
      (350L, "a", "en", "s1"), (1050L, "b", "en", "s1"),
      (2100L, "c", "en", "s1"), (701L, "d", "en", "s1"))
    val r = TextOps.dedupUrlOn(corpus).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") == 4L)
    assert(row.getAs[Long]("n_raw") == 4L)       // all raw forms differ
    assert(row.getAs[Long]("n_canonical") == 2L) // {350,1050,2100} + {701}
    assert(row.getAs[Long]("n_collapsed") == 2L)
  }

  test("bloom filter drops exactly the docs sharing >= 2 benchmark 5-grams") {
    val corpus = docs(
      // benchmark doc (doc_id % 100 == 0): 3 distinct 5-grams
      (100L, "alpha beta gamma delta epsilon zeta eta", "en", "s1"),
      // shares 2 distinct 5-grams -> dropped
      (1L, "alpha beta gamma delta epsilon zeta tailword", "en", "s1"),
      // shares exactly 1 -> kept (threshold is >= 2)
      (2L, "gamma delta epsilon zeta eta unrelated trailing words", "en", "s1"),
      // no overlap -> kept
      (3L, "completely different content with many unique tokens here", "en", "s2"))
    val out = TextOps.filterBloomOn(corpus).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_train"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))).toMap
    assert(out("s1") == ((2L, 1L, 1L)))
    assert(out("s2") == ((1L, 1L, 0L)))
    ScratchCache.releaseAll()
  }

  test("bloom false positives cannot change the result (saturated sketch)") {
    // 64-bit bloom over dozens of shingles: nearly every probe is a
    // false positive, so the prefilter passes almost everything and
    // the exact verify join must carry the semantics alone
    val corpus = docs(
      (100L, "alpha beta gamma delta epsilon zeta eta", "en", "s1"),
      (1L, "alpha beta gamma delta epsilon zeta tailword", "en", "s1"),
      (2L, "gamma delta epsilon zeta eta unrelated trailing words", "en", "s1"),
      (3L, "completely different content with many unique tokens here", "en", "s2"))
    val exact = TextOps.filterBloomOn(corpus).collect().toSeq
    ScratchCache.releaseAll()
    val saturated = TextOps.filterBloomOn(corpus, estItems = 4L,
      numBits = 64L).collect().toSeq
    assert(saturated == exact)
    ScratchCache.releaseAll()
  }

  test("ngram lm: bigram counts and conditional probabilities") {
    val corpus = docs(
      (1L, "a b a b c", "en", "s1"),
      (2L, "b c d", "en", "s1"))
    // bigrams: (a,b)x2, (b,a), (b,c)x2, (c,d); totals a:2 b:3 c:1
    val out = TextOps.ngramLmOn(corpus).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 1.0), ("b", "c", 2L, 0.666667),
      ("b", "a", 1L, 0.333333), ("c", "d", 1L, 1.0)))
    ScratchCache.releaseAll()
  }

  test("bloom benchmark temp views are dropped by releaseAll (no leak)") {
    val corpus = docs(
      (100L, "alpha beta gamma delta epsilon zeta eta", "en", "s1"),
      (1L, "alpha beta gamma delta epsilon zeta tailword", "en", "s1"))
    def viewCount = spark.catalog.listTables()
      .filter(_.name.startsWith("graft_bench_ngrams_")).count()
    val before = viewCount
    TextOps.filterBloomOn(corpus).collect()
    TextOps.filterBloomOn(corpus).collect()
    assert(viewCount == before + 2) // views live while results pend
    ScratchCache.releaseAll()
    assert(viewCount == before,
      "releaseAll must drop every per-construction benchmark view")
  }

  test("reservoir keeps exactly k per stratum, stable under repartition") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"text $i", if (i % 2 == 0) "en" else "de")).toDF(
      "doc_id", "text", "lang")
    val a = TextOps.sampleReservoirOn(docs).collect()
    val b = TextOps.sampleReservoirOn(docs.repartition(7)).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perLang == Map("en" -> 3, "de" -> 3))
    assert(a.map(r => r.getAs[Long]("rk")).sorted.toSeq
      == Seq(1L, 1L, 2L, 2L, 3L, 3L))
  }

  test("winnowing guarantee: an 8-word shared run shares a fingerprint") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three four five six seven $run x y z", "s0", 60L),
      (2L, s"$run p q r s t u v w", "s0", 50L),
      (3L, "too short for any window", "s0", 24L), // 5 toks: dropped
      (4L, "k l m n o p q r s t u v", "s1", 20L)
    ).toDF("doc_id", "text", "source", "n_chars").select(
      col("doc_id"), col("source"), col("text"), col("n_chars"))
    val out = TextOps.winnowingOn(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    ScratchCache.releaseAll()
    // winnowing theorem: docs 1 and 2 share a >= w+k-1 = 8-word run,
    // so at least one selected fingerprint is common -> shared_fp >= 1
    assert(out("s0").getAs[Long]("n_docs") == 2L) // doc 3 dropped
    assert(out("s0").getAs[Long]("shared_fp") >= 1L)
    assert(out("s1").getAs[Long]("n_docs") == 1L)
    assert(out("s1").getAs[Long]("shared_fp") == 0L)
    // selected set is a subset of all shingle hashes: tot >= distinct
    assert(out("s0").getAs[Long]("tot_sel")
      >= out("s0").getAs[Long]("distinct_fp"))
  }

  test("temperature weights flatten the head and are exactly integer") {
    import spark.implicits._
    // en 100 docs, de 4, fr 1 -> weights 10, 2, 1 (tw=13, td=105)
    val docs = ((1 to 100).map(i => (i.toLong, "en")) ++
      (101 to 104).map(i => (i.toLong, "de")) ++ Seq((105L, "fr")))
      .toDF("doc_id", "lang")
    val out = TextOps.sampleTemperatureOn(docs).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("weight"), r.getAs[Long]("target_docs"))).toMap
    ScratchCache.releaseAll()
    assert(out == Map("en" -> ((10L, 80L)), "de" -> ((2L, 16L)),
      "fr" -> ((1L, 8L))))
  }

  test("curate pipeline ledger drops each stage's planted casualty") {
    import spark.implicits._
    val long20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, long20, "s0", "en", 10L),            // survives everything?
      (2L, long20, "s0", "en", 10L),            // exact dup of 1
      (3L, "short doc only five words x", "s0", "en", 5L), // quality drop
      (4L, long20 + " zh extra", "s0", "zh", 9L) // lang drop
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val rows = TextOps.curatePipelineOn(docs).collect()
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_docs")).toMap
    ScratchCache.releaseAll()
    assert(rows(0L) == 4L)
    assert(rows(1L) == 3L) // zh gone
    assert(rows(2L) == 2L) // short gone
    assert(rows(3L) == 1L) // dup collapsed to min doc_id
    assert(rows(4L) <= 1L) // split bucket of the survivor
  }

  test("lm_score ranks the rare-bigram document as most surprising") {
    import spark.implicits._
    // corpus LM: (a,a)=3, (a,b)=1, tot(a)=4
    // doc 1 "a a a a": 3×(−ln 3/4) -> score 0.287682
    // doc 2 "a b":     1×(−ln 1/4) -> score 1.386294
    val docs = Seq((1L, "a a a a"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.lmScoreOn(docs).collect()
    ScratchCache.releaseAll()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    val byDoc = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_bigrams"), r.getAs[Double]("score"))).toMap
    assert(byDoc(1L) == ((3L, 0.287682)))
    assert(byDoc(2L) == ((1L, 1.386294)))
  }
}
