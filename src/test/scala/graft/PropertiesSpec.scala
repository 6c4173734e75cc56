package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops._

/** Property-based invariants (SURVEY.md §5.2 item 3); scalacheck run
  * directly (no scalatestplus bridge in the offline cache). */
class PropertiesSpec extends GraftSuite {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("cc: distributed star rounds ≡ single-task union-find on random graphs") {
    // the two ccLabels execution paths (large/small-star rounds above
    // the endgame threshold, union-find below it) must label any graph
    // identically — run both on random edge lists and compare maps.
    // Fewer iterations than usual: each case runs two Spark jobs.
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(edgeGen) { (es: List[(Long, Long)]) =>
        val df = es.toDF("a", "b")
        def run(): Map[Long, Long] = GraphOps.ccLabels(df).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val viaUnionFind = run() // default threshold → endgame path
        spark.conf.set("spark.graft.cc.localEdgeThreshold", "0")
        val viaStars = try run()
          finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
        viaUnionFind == viaStars
      })
    assert(res.passed, res.status.toString)
  }

  test("TopKAggregator ≡ sort-take-k under arbitrary input order") {
    val agg = new TopKAggregator(5)
    check(Prop.forAll(
      Gen.listOf(Gen.zip(Gen.choose(0.0, 1000.0), Gen.choose(0L, 50L)))) {
      (xs: List[(Double, Long)]) =>
        val viaAgg = xs.foldLeft(agg.zero)(agg.reduce)
        val expected = xs.sortBy { case (p, id) => (-p, id) }.take(5)
        agg.finish(viaAgg) == expected
    })
  }

  test("TopKAggregator merge is associative-enough: split points don't matter") {
    check(Prop.forAll(
      Gen.listOf(Gen.zip(Gen.choose(0.0, 100.0), Gen.choose(0L, 20L))),
      Gen.choose(0, 100)) { (xs: List[(Double, Long)], cut: Int) =>
      val agg = new TopKAggregator(5)
      val k = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (l, r) = xs.splitAt(k)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      merged == whole
    })
  }

  test("node merge is invariant under input order") {
    val a = Seq((1L, "customer", "x"), (1L, "user", "y"), (2L, "user", "z"))
    List(a, a.reverse).map { rows =>
      rows.toDF("id", "category", "name")
        .groupBy($"id")
        .agg(org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.collect_set($"category")).as("cats"),
          org.apache.spark.sql.functions.max($"name").as("name"))
        .orderBy($"id")
        .collect().map(_.toString).toSeq
    } match { case List(x, y) => assert(x == y) }
  }

  test("sample split is a partition (90/5/5-ish) and repartition-stable") {
    import org.apache.spark.sql.functions.{col, sum}
    val rows = graft.ops.TextOps.sampleSplit(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(total == Tables.documents(spark, sf).count())
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
    // same doc lands in the same split under any partitioning
    val a = graft.ops.TextOps.sampleSplit(spark, sf).collect().toSeq
    assert(a == rows.toSeq)
  }

  test("shard packing: docs and tokens conserved, shards contiguous") {
    import org.apache.spark.sql.functions.{col, sum, size, split, lower}
    val rows = graft.ops.TextOps.packShards(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val tokTotal = docs
      .select(size(split(lower(col("text")), " ")).cast("long").as("t"))
      .agg(sum(col("t"))).first().getLong(0)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum == tokTotal)
    // shard ids are 0..max contiguous within each source
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("shard")).sorted.toSeq
      assert(ids == (0L until ids.length.toLong).toSeq)
    }
  }

  test("dedup is idempotent") {
    val df = Seq(1, 2, 2, 3, 3, 3).toDF("x")
    val once = df.dropDuplicates("x")
    val twice = once.dropDuplicates("x")
    assert(once.collect().map(_.getInt(0)).sorted.toSeq ==
      twice.collect().map(_.getInt(0)).sorted.toSeq)
  }

  test("session splitting: gap strictly greater than 30 min opens a session") {
    import java.sql.Timestamp
    def mk(mins: Seq[Long]) = mins.zipWithIndex.map { case (m, i) =>
      (i.toLong, new Timestamp(1704100000000L + m * 60000L), 7L, "click", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // gaps: 30 min exactly (same session), 31 min (new session)
    val sessions = StreamingOps.sessionOn(mk(Seq(0L, 30L, 61L))).collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.getAs[Long]("n_events")).toSeq.sorted == Seq(1L, 2L))
  }

  test("sessionization invariant: intra-gaps ≤ 30min, inter-gaps > 30min") {
    import java.sql.Timestamp
    check(Prop.forAll(Gen.listOfN(40,
        Gen.zip(Gen.choose(0L, 3000L), Gen.choose(0L, 4L)))) { evs =>
      val df = evs.zipWithIndex.map { case ((mins, user), i) =>
        (i.toLong, new Timestamp(1704100000000L + mins * 60000L),
          user, "click", 1.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val sessions = graft.ops.StreamingOps.sessionOn(df).collect()
        .map(r => (r.getLong(0), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events")))
      val gapUs = 30L * 60 * 1000000
      val byUser = sessions.groupBy(_._1)
      val interOk = byUser.values.forall { ss =>
        ss.sortBy(_._2).sliding(2).forall {
          case Array(a, b) => b._2 - a._3 > gapUs
          case _ => true
        }
      }
      val countOk = sessions.map(_._4).sum ==
        evs.length // every event lands in exactly one session
      interOk && countOk
    })
  }

  test("embcos candidate volume grows ~N^1.5, far below N^2") {
    // Planted-cluster embedding sets: `clusters` well-separated centers
    // (deterministic pseudo-random via sin(), so the frame is generated
    // distributedly with no driver-side data), each member = center +
    // 1% noise. Cluster SIZE is held fixed as N grows — the realistic
    // 100 TB near-dup regime (more documents ⇒ more duplicate groups,
    // not bigger ones) — so an N^1.5-shaped plan must keep candidate
    // volume ~N^1.5 while an unpruned all-pairs plan pays ~N².
    def planted(n: Int): org.apache.spark.sql.DataFrame = {
      val clusters = n / 100
      spark.range(n.toLong).selectExpr(
        "id AS vec_id",
        s"""transform(sequence(0, 63), d ->
             cast(sin((pmod(id, $clusters) * 64 + d) * 12.9898d) +
                  0.01d * sin((id * 64 + d) * 78.233d) AS float))
           AS embedding""")
    }
    def measure(n: Int): Long =
      try DedupSim.embCosCandidateCount(planted(n))
      finally ScratchCache.releaseAll()
    val c5 = measure(5000)
    val c20 = measure(20000)
    info(s"candidates: N=5000 -> $c5, N=20000 -> $c20")
    // absolute scale: ≤ 2·N^1.5 at both sizes (an all-pairs plan would
    // be N²/2 ≈ 35×/70× that); growth over a 4× N step: N^1.5 predicts
    // 8×, N² predicts 16× — assert well below the quadratic rate
    assert(c5 <= 2L * math.pow(5000d, 1.5).toLong,
      s"N=5000 candidate volume $c5 not ~N^1.5")
    assert(c20 <= 2L * math.pow(20000d, 1.5).toLong,
      s"N=20000 candidate volume $c20 not ~N^1.5")
    val growth = c20.toDouble / c5
    assert(growth < 12.0, s"growth $growth over 4x N is closer to N^2")
  }

  test("cosine similarity of a vector with itself is 1") {
    val v = Array.tabulate(64)(i => (i % 7 + 1).toFloat)
    val df = Seq((0L, v, 0), (1L, v, 1)).toDF("vec_id", "embedding", "label")
    // reuse the production expression shape
    val e = df.select($"vec_id",
      org.apache.spark.sql.functions.expr(
        "transform(embedding, x -> cast(x as double))").as("v"))
    val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
    val cos = e.filter($"vec_id" =!= 0).crossJoin(q)
      .select(org.apache.spark.sql.functions.expr(
        "round(aggregate(zip_with(v, qv, (x, y) -> x * y), 0d, (a, x) -> a + x) / " +
        "(sqrt(aggregate(transform(v, x -> x * x), 0d, (a, x) -> a + x)) * " +
        " sqrt(aggregate(transform(qv, x -> x * x), 0d, (a, x) -> a + x))), 6)"))
      .first().getDouble(0)
    assert(cos == 1.0)
  }

  test("funnel stage counts are monotone non-increasing on random logs") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    // random (user, type, µs) logs; ties in ts included deliberately
    // (strict '>' ordering must still yield a well-formed funnel)
    val evGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(0L, 7L),
      Gen.oneOf("view", "click", "purchase", "error"),
      Gen.choose(0L, 20L)))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(evGen) { (es: List[(Long, String, Long)]) =>
        val df = es.toDF("user_id", "event_type", "us")
          .select(col("user_id"), col("event_type"),
            timestamp_micros(col("us")).as("ts"))
        val m = EventOps.funnelOn(df).collect()
          .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
        val (a, b, c) = (m("1_view"), m("2_view_click"),
          m("3_view_click_purchase"))
        a >= b && b >= c && c >= 0
      })
    assert(res.passed, res.status.toString)
  }

  test("retention cells bounded by cohort size; offset 0 covers the cohort") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val evGen = Gen.listOfN(50, Gen.zip(
      Gen.choose(0L, 9L),                       // user
      Gen.choose(0L, 5L * 86400L * 1000000L)))  // µs within 6 days
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(evGen) { (es: List[(Long, Long)]) =>
        val df = es.toDF("user_id", "us")
          .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
        val rows = EventOps.retentionOn(df).collect()
        val day0 = rows.filter(_.getAs[Int]("day_offset") == 0)
        rows.forall { r =>
          r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_users") &&
          r.getAs[Int]("day_offset") >= 0 &&
          r.getAs[Double]("retention") <= 1.0
        } &&
        // every cohort member is active on their own first day, so the
        // offset-0 cell equals the cohort size exactly
        day0.forall(r =>
          r.getAs[Long]("n_active") == r.getAs[Long]("cohort_users"))
      })
    assert(res.passed, res.status.toString)
  }

  test("louvain2: mutual-merge coarsening NEVER loses modularity on " +
      "random membership graphs") {
    // the Q-monotonicity claim is BY CONSTRUCTION (accepted merges are
    // disjoint positive-gain pairs), so it must hold on EVERY graph,
    // not just the planted fixtures — random co-membership frames,
    // including degenerate ones (single order, disconnected parts).
    // Few iterations: each case runs the full two-level pipeline.
    val memGen = Gen.listOfN(25, Gen.zip(
      Gen.choose(1L, 6L),               // order
      Gen.choose(0L, 9L).map(_ * 4L)))  // part (ids ≡ 0 mod 4)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(memGen) { (ms: List[(Long, Long)]) =>
        val df = ms.toDF("o", "p")
        // a graph needs ≥1 co-membership edge, else the key's
        // landmark/degree frames are empty by contract
        val hasEdge = ms.groupBy(_._1).values.exists(g =>
          g.map(_._2).distinct.size >= 2)
        if (!hasEdge) true
        else {
          val row = GraphOps.louvain2On(df).collect().head
          ScratchCache.releaseAll()
          row.getAs[Double]("q_level2") >= row.getAs[Double]("q_level1") &&
          row.getAs[Long]("n_communities") <= row.getAs[Long]("n_super")
        }
      })
    assert(res.passed, res.status.toString)
  }

  test("fuzzy join route-split: exact-once on adversarial random corpora " +
      "(duplicate names, transposes, repeated-char runs)") {
    // The r17 route-split replaced the candidate-pair distinct() with
    // a meets-exactly-once argument (length-partitioned routes + the
    // one-shared-deletion-variant lemma for substitution pairs, with
    // same-name del⋈del meetings suppressed). A tiny alphabet makes
    // the hard cases DENSE — names sharing several deletion variants
    // ("ab"/"ba" share both "a" and "b"), equal-char runs, and
    // duplicate names across DIFFERENT ids (the identity-by-name case
    // the customer fixture never produces). Any double-counted
    // surviving pair would inflate n_cands vs the brute force.
    import org.apache.spark.sql.functions.col
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def sub(s: String, fromEnd: Int, ch: Char): String =
      s.updated(s.length - fromEnd - 1, ch)
    // same planting as Joins.joinFuzzyOn (keys ≡0 mod 7 / mod 13)
    def dirty(k: Long, n: String): String =
      if (k % 13 == 0) sub(sub(n, (k % 5 + 1).toInt, 'x'), (k % 5 + 4).toInt, 'y')
      else if (k % 7 == 0) sub(n, (k % 5 + 1).toInt, 'x')
      else n
    val nameGen = Gen.choose(8, 12).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf('a', 'b')).map(_.mkString))
    val corpusGen = Gen.choose(6, 14).flatMap(n =>
      Gen.listOfN(n, nameGen).map(_.zipWithIndex.map {
        case (nm, i) => ((i + 1).toLong, nm) }))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(corpusGen) { (names: List[(Long, String)]) =>
        val got = DedupSim.synchronized { // joinFuzzyOn caches scratch
          val out = Joins.joinFuzzyOn(names.toDF("c_custkey", "c_name"))
            .collect()
            .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
            .toMap
          ScratchCache.releaseAll()
          out
        }.filter(!_._1.startsWith("density_"))
        val queries = names.map { case (k, n) => k -> dirty(k, n) }
        val expected = queries.map { case (_, qn) =>
          val ds = names.map { case (ck, cn) => (ck, lev(qn, cn)) }
            .filter(_._2 <= 1)
          val outcome =
            if (ds.isEmpty) "miss"
            else if (ds.map(_._2).min == 0) "exact"
            else if (ds.length == 1) "fuzzy_unique" else "fuzzy_ambiguous"
          (outcome, ds.length.toLong)
        }.groupBy(_._1).map { case (o, xs) =>
          o -> (xs.length.toLong, xs.map(_._2).sum) }
        got == expected
      })
    assert(res.passed, res.status.toString)
  }

  test("kdqAssign edge clamping: batch vectors with split-dim values " +
      "OUTSIDE the frozen history range always land inside their " +
      "parent's bucket space, on random vector sets") {
    // r17 ADVICE (medium): without the lower clamp a below-min value
    // computed a negative half and escaped into a sibling parent's
    // bucket space (or went negative). Property: for any frozen
    // quantizer and any batch (including values far outside the
    // history range on every dim), every assigned list_id sits in
    // [0, prod(fanouts)) — the tree's leaf space.
    import org.apache.spark.sql.functions.col
    val histGen = Gen.listOfN(4, Gen.oneOf(0.0, 0.5, 1.0))
    val batchGen = Gen.listOfN(4, Gen.oneOf(-9.0, -0.3, 0.2, 1.4, 12.0))
    val caseGen = for {
      n <- Gen.choose(4, 12)
      hs <- Gen.listOfN(n, histGen)
      m <- Gen.choose(1, 8)
      bs <- Gen.listOfN(m, batchGen)
      k <- Gen.choose(2, 8)
    } yield (hs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) },
      bs.zipWithIndex.map { case (v, i) => ((i + 101).toLong, v) }, k)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(caseGen) { case (hist, batch, k) =>
        val hdf = hist.toDF("vec_id", "v")
        val (_, splits) = DedupSim.kdQuantizeWithSplits(hdf, k)
        val fanProd = splits.select(col("round"), col("fanout"))
          .distinct().collect().map(_.getLong(1)).product
        val got = DedupSim.kdqAssign(batch.toDF("vec_id", "v"), splits)
          .select(col("list_id")).collect().map(_.getLong(0))
        ScratchCache.releaseAll()
        got.forall(l => l >= 0L && l < math.max(1L, fanProd))
      })
    assert(res.passed, res.status.toString)
  }

  test("ivfAssign containment: any batch vector — including values far " +
      "outside every centroid's range — lands on a list_id OF THE " +
      "FROZEN QUANTIZER, with ties and partitioning invariant") {
    // r18 verdict ask #5 (the kdqAssign-class sweep): ivfAssign is the
    // other frozen-structure assign path fed by out-of-history inputs
    // (the standing-index append admits arbitrary new vectors against
    // a frozen centroid table). Unlike kdq's range arithmetic it is
    // structurally contained — list_id comes FROM the broadcast
    // centroid join, argmin by min(struct(sc, list_id)) — so the
    // property pins that containment plus the two ways it could still
    // rot: tie-breaks (duplicate centroids → equal distances → lowest
    // list_id must win, deterministically) and partitioning (the
    // groupBy argmin must not depend on row order).
    import org.apache.spark.sql.functions.col
    val centGen = Gen.listOfN(4, Gen.oneOf(-1.0, 0.0, 1.0)) // dup-heavy
    val vecGen = Gen.listOfN(4, Gen.oneOf(-1.0e12, -0.3, 0.0, 0.7, 1.0e12))
    val caseGen = for {
      nc <- Gen.choose(2, 5)
      cs <- Gen.listOfN(nc, centGen)
      nv <- Gen.choose(1, 8)
      vs <- Gen.listOfN(nv, vecGen)
    } yield (cs.zipWithIndex.map { case (c, i) => (i.toLong, c) },
      vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, i % 2, v) })
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(caseGen) { case (cents, vecs) =>
        val cent = cents.toDF("list_id", "cv")
        val e = vecs.toDF("vec_id", "label", "embedding")
        def asg(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
          DedupSim.ivfAssign(df, cent)
            .select(col("vec_id"), col("list_id")).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val a = asg(e)
        val b = asg(e.repartition(7))
        ScratchCache.releaseAll()
        val ids = cents.map(_._1).toSet
        a.values.forall(ids.contains) && a == b &&
          a.keySet == vecs.map(_._1).toSet
      })
    assert(res.passed, res.status.toString)
  }

  test("layoutZorder containment: any (o, p) key set — negative, huge, " +
      "degenerate — yields file_ids inside [0, 16) and loses no rows") {
    // r18 verdict ask #5: the zorder advisor's divide-only split
    // (`z div ((zmax div 16) + 1)`) was designed against the signed
    // wrap of the multiply-first form; this property pins the other
    // edges — mortonSpread masks every input into the nonnegative
    // even-bit space (so negative keys cannot produce a negative z)
    // and zmax=0 corpora divide by 1 — by asserting the full file_id
    // containment on wild key sets. (Keys ≥ 2^32 alias in z — the
    // spread reads the LOW 32 bits by documented contract — which
    // affects clustering quality, never containment or row counts.)
    import org.apache.spark.sql.functions.col
    val keyGen = Gen.oneOf(-1L, 0L, 1L, 7L, (1L << 31) - 1, 1L << 32,
      (1L << 40) + 13, Long.MaxValue, Long.MinValue)
    val caseGen = for {
      n <- Gen.choose(1, 24)
      ks <- Gen.listOfN(n, Gen.zip(keyGen, keyGen))
    } yield ks
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(caseGen) { ks =>
        val stats = Sources.layoutZorderOn(ks.toDF("o", "p")).collect()
        val fids = stats.map(_.getAs[Long]("file_id"))
        fids.forall(f => f >= 0L && f < 16L) &&
          stats.map(_.getAs[Long]("n_rows")).sum == ks.size
      })
    assert(res.passed, res.status.toString)
  }

  test("kdQuantize split tables: walking the frozen artifact reassigns " +
      "every build vector to its build list, on random degenerate-heavy " +
      "vector sets") {
    // The r17 incr-semantic oracle conversion rests on kdqAssign
    // replaying kdQuantizeWithSplits' cuts exactly. Values drawn from
    // a 3-point set force the HAIRY paths: equal-width ties (lowest
    // dim wins), fully degenerate lists (mx = mn → vec_id % fanout),
    // and k exceeding the distinct-vector count.
    import org.apache.spark.sql.functions.col
    val vecGen = Gen.listOfN(4, Gen.oneOf(0.0, 0.5, 1.0))
    val caseGen = for {
      n <- Gen.choose(4, 16)
      vs <- Gen.listOfN(n, vecGen)
      k <- Gen.choose(1, 8)
    } yield (vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }, k)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(caseGen) { case (rows: List[(Long, List[Double])], k: Int) =>
        val df = rows.toDF("vec_id", "v")
        val (asg, splits) = DedupSim.kdQuantizeWithSplits(df, k)
        val built = asg.select(col("vec_id"), col("list_id")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val walked = DedupSim.kdqAssign(df, splits)
          .select(col("vec_id"), col("list_id")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        ScratchCache.releaseAll()
        built == walked
      })
    assert(res.passed, res.status.toString)
  }
}
