package graft

import graft.ops._

class AggregatesSpec extends GraftSuite {

  test("rollup emits detail + subtotal + grand total rows") {
    val rows = Aggregates.aggRollup(spark, sf).collect()
    // 3 flags × 2 statuses detail + 3 flag subtotals + 1 grand total
    assert(rows.length == 10)
    val grand = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == 6000L)
  }

  test("cube adds the status-only slice rollup lacks") {
    val rows = Aggregates.aggCube(spark, sf).collect()
    assert(rows.length == 12) // 6 detail + 3 flag + 2 status + 1 grand
  }

  test("udaf top-k equals the window-function twin") {
    val viaUdaf = Aggregates.udafTopK(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        row_number().over(w).cast("long").as("rank"), col("o_orderkey"))
      .filter(col("rank") <= 5)
      .orderBy(col("o_orderpriority"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaUdaf == viaWindow)
  }

  test("approx_count_distinct within 10% of exact") {
    import org.apache.spark.sql.functions._
    val approx = Aggregates.aggApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.10,
        s"flag $k: approx ${approx(k)} vs exact $e")
    }
  }

  test("count-min quantity estimates bound exact per-group counts") {
    import org.apache.spark.sql.functions._
    val rows = Aggregates.aggApprox(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        col("l_quantity").cast("int").cast("string").as("q"))
    val groupN = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.filter(col("q").isin("1", "25", "50"))
      .groupBy("l_returnflag", "q").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val flag = r.getString(0)
      val est = r.getAs[String]("cm_qty_est").split(",").map(_.toLong)
      Seq("1", "25", "50").zip(est).foreach { case (q, e) =>
        val truth = exact.getOrElse((flag, q), 0L)
        assert(e >= truth, s"$flag/$q: estimate $e < exact $truth")
        // depth=4, width=256 → overcount per probe ≲ group_n/256
        assert(e <= truth + 4 * groupN(flag) / 256 + 4,
          s"$flag/$q: estimate $e way above exact $truth")
      }
    }
  }

  test("hll rollup: merged sketches match exact and the direct sketch") {
    import org.apache.spark.sql.functions._
    val rolled = Aggregates.aggHllRollup(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_parts")).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(rolled(k) - e).toDouble / e < 0.05,
        s"flag $k: rolled-up estimate ${rolled(k)} vs exact $e")
    }
    // roll-up consistency: union of the per-cell sketches must give the
    // same estimate as sketching the flag level directly in one pass
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))")
        .as("est")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    assert(rolled == direct,
      s"sketch-of-union != union-of-sketches: $rolled vs $direct")
    graft.ops.ScratchCache.releaseAll()
  }

  test("agg_stats variance matches builtin within float tolerance") {
    import org.apache.spark.sql.functions._
    val ours = Aggregates.aggStats(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("var_qty")).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_quantity")).as("v")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("v")).toMap
    builtin.foreach { case (k, v) =>
      // ours is rounded to 4dp, builtin is not: allow half-ulp of 4dp
      assert(math.abs(ours(k) - v) < 5e-4, s"flag $k: ${ours(k)} vs $v")
    }
  }

  test("argmax resolves balance ties by custkey, deterministically") {
    import spark.implicits._
    // nation 0: custs 1 and 2 TIE on balance -> top picks the larger
    // custkey (2), bottom the smaller (1) by the composite ordering;
    // negative balances must survive the cents encoding
    val cust = Seq(
      (1L, "alice", 0, 50.25), (2L, "bob", 0, 50.25),
      (3L, "carol", 0, -10.00),
      (4L, "dan", 1, -999.99), (5L, "eve", 1, 9999.99))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nat = Seq((0, "N0"), (1, "N1")).toDF("n_nationkey", "n_name")
    val out = Aggregates.aggArgmaxOn(cust, nat).collect()
      .map(r => r.getString(0) ->
        (r.getAs[String]("top_cust"), r.getAs[Double]("top_bal"),
          r.getAs[String]("bottom_cust"), r.getAs[Double]("bottom_bal"),
          r.getAs[Long]("n_customers"))).toMap
    assert(out("N0") == (("bob", 50.25, "carol", -10.00, 3L)))
    assert(out("N1") == (("eve", 9999.99, "dan", -999.99, 2L)))
  }

  test("histogram partitions every order into 16 integer-exact buckets") {
    val rows = Aggregates.aggHistogram(spark, sf).collect()
    val buckets = rows.map(_.getAs[Long]("bucket"))
    assert(buckets.forall(b => b >= 0 && b <= 15))
    // min lands in bucket 0 and max in bucket 15 by construction:
    // ((hi-lo)*16) div (hi-lo+1) == 15 whenever hi-lo >= 15
    assert(buckets.contains(0L) && buckets.contains(15L))
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders)
    // bucket sums add up to the exact-decimal total of the table
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val total = Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
        .cast(DecimalType(38, 2)).cast("double")).head.getDouble(0)
    // exact 2dp arithmetic: valueOf uses the shortest decimal repr, so
    // each wire double round-trips to its exact money value
    val sumPrices = rows
      .map(r => java.math.BigDecimal.valueOf(r.getAs[Double]("sum_price")))
      .reduce(_ add _)
    assert(sumPrices.compareTo(java.math.BigDecimal.valueOf(total)) == 0)
  }

  test("corr matches a driver-side recomputation from the raw rows") {
    val out = Aggregates.aggCorr(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"),
        r.getAs[Double]("covar_qty_disc"),
        r.getAs[Double]("corr_qty_disc")))).toMap
    // recompute per flag from the collected raw pairs with the same
    // power-sum formula (exact BigDecimal sums, doubles only at the end)
    val raw = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2),
        BigDecimal(r.getDouble(2)).setScale(2)))
      .groupBy(_._1)
    raw.foreach { case (flag, rows) =>
      val n = rows.length
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxy = rows.map(t => t._2 * t._3).sum
      val sxx = rows.map(t => t._2 * t._2).sum
      val syy = rows.map(t => t._3 * t._3).sum
      val nd = n.toDouble
      val mx = sx.toDouble / nd; val my = sy.toDouble / nd
      val cov = (sxy.toDouble - nd * mx * my) / (nd - 1.0)
      val corr = (sxy.toDouble / nd - mx * my) /
        math.sqrt((sxx.toDouble / nd - mx * mx) *
          (syy.toDouble / nd - my * my))
      val (gotN, gotCov, gotCorr) = out(flag)
      assert(gotN == n.toLong)
      assert(math.abs(gotCov - cov) < 1e-6, s"$flag covar")
      assert(math.abs(gotCorr - corr) < 1e-6, s"$flag corr")
      assert(gotCorr >= -1.0 && gotCorr <= 1.0)
    }
  }

  test("corr guards: single-row and zero-variance groups emit NULL, not Inf/NaN") {
    import spark.implicits._
    val planted = Seq(
      ("single", 5.0, 0.05),            // n = 1 → both NULL
      ("flatx", 3.0, 0.01), ("flatx", 3.0, 0.07), // var(x) = 0 → corr NULL
      ("ok", 1.0, 0.01), ("ok", 2.0, 0.02), ("ok", 3.0, 0.03))
      .toDF("l_returnflag", "l_quantity", "l_discount")
    val out = Aggregates.aggCorrOn(planted).collect()
      .map(r => r.getString(0) ->
        ((r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(out("single") == ((true, true)))
    assert(out("flatx") == ((false, true))) // covar defined (0), corr not
    assert(out("ok") == ((false, false)))
    val ok = Aggregates.aggCorrOn(planted).collect()
      .find(_.getString(0) == "ok").get
    assert(math.abs(ok.getAs[Double]("corr_qty_disc") - 1.0) < 1e-6)
  }

  test("linreg: exact fit on a planted line, degenerate groups NULL, " +
      "partition-invariant") {
    import spark.implicits._
    // "line": y = 100 + 50x exactly -> slope 50, intercept 100, r2 1;
    // "single": n = 1 -> all NULL; "flatx": zero x variance -> all NULL
    val planted = Seq(
      ("line", 1.0, 150.0), ("line", 2.0, 200.0), ("line", 3.0, 250.0),
      ("line", 4.0, 300.0),
      ("single", 5.0, 400.0),
      ("flatx", 3.0, 10.0), ("flatx", 3.0, 20.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val out = Aggregates.aggLinregOn(planted).collect()
    val line = out.find(_.getString(0) == "line").get
    assert(math.abs(line.getAs[Double]("slope") - 50.0) < 1e-6)
    assert(math.abs(line.getAs[Double]("intercept") - 100.0) < 1e-6)
    assert(math.abs(line.getAs[Double]("r2") - 1.0) < 1e-6)
    val single = out.find(_.getString(0) == "single").get
    assert(single.isNullAt(2) && single.isNullAt(3) && single.isNullAt(4))
    val flatx = out.find(_.getString(0) == "flatx").get
    assert(flatx.isNullAt(2) && flatx.isNullAt(3) && flatx.isNullAt(4))
    val out2 = Aggregates.aggLinregOn(planted.repartition(5)).collect()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
  }

  test("mode picks the max-count value with lowest-value tie-break") {
    val out = Aggregates.aggMode(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Double]("mode_qty"), r.getAs[Long]("n_mode")))).toMap
    val counts = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .groupBy(_._1._1)
    counts.foreach { case (flag, vs) =>
      val maxN = vs.map(_._2).max
      val expectQty = vs.filter(_._2 == maxN).map(_._1._2).min
      assert(out(flag) == ((expectQty, maxN)), s"flag $flag")
    }
  }

  test("bitmap distinct: daily states OR-merge without double counting") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // user 1 active both days (overlap), users 2/3 one day each; user
    // 130 forces a bitmap grow across word boundaries
    val log = Seq(
      ("click", "2024-01-01 10:00:00", 1L),
      ("click", "2024-01-01 11:00:00", 2L),
      ("click", "2024-01-02 10:00:00", 1L), // same user, next day
      ("click", "2024-01-02 11:00:00", 130L),
      ("view", "2024-01-01 10:00:00", 3L))
      .toDF("event_type", "t", "user_id")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = Aggregates.aggBitmapOn(log).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_days"),
        r.getAs[Long]("sum_daily_uniques"), r.getAs[Long]("n_uniques"))))
      .toMap
    // daily sum counts user 1 twice; the merged bitmap doesn't
    assert(out("click") == ((2L, 4L, 3L)))
    assert(out("view") == ((1L, 1L, 1L)))
  }

  test("exact percentiles: bucket selection equals the sorted k-th, " +
      "spanning buckets, without a nested loop") {
    import org.apache.spark.sql.functions.col
    // values straddle several 2^16 buckets; shuffled input order
    val vals = (1 to 997).map(i => (i.toLong * 1009L) % 300000L)
    val df = spark.createDataFrame(
      scala.util.Random.shuffle(vals).map(Tuple1(_))).toDF("cents")
    val out = Aggregates.aggPercentileExactOn(df)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val got = out.collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("kth"),
        r.getAs[Double]("value")))).toMap
    val sorted = vals.sorted
    def kth(num: Long, den: Long): (Long, Double) = {
      val k = (vals.size * num + den - 1) / den
      (k, sorted(k.toInt - 1).toDouble / 100)
    }
    assert(got("p50") == kth(1, 2))
    assert(got("p90") == kth(9, 10))
    assert(got("p99") == kth(99, 100))
  }

  test("tdigest: two-phase merged quantiles track the exact percentiles " +
      "and match the direct one-phase sketch") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val exact = li
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"))
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(q, 0.5)").as("p50"),
        expr("percentile(q, 0.9)").as("p90"),
        expr("percentile(q, 0.99)").as("p99"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val twoPhase = Aggregates.aggTDigest(spark, sf).collect()
    assert(twoPhase.length == exact.size)
    // direct one-phase sketch per flag (no daily pre-aggregation)
    val build = udaf(new ops.TDigestBuildAggregator(100.0))
    val onePhaseStates = li
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"))
      .groupBy(col("l_returnflag")).agg(build(col("q")).as("st"))
      .collect().map(r => r.getString(0) ->
        ops.TDigest.deserialize(
          r.getStruct(1).getAs[Array[Byte]]("sk"))).toMap
    // l_quantity spans [1, 50]: 1.0 abs tolerance = 2% of the range
    val tol = 1.0
    twoPhase.foreach { r =>
      val flag = r.getString(0)
      val (e50, e90, e99, en) = exact(flag)
      assert(r.getAs[Long]("n") == en, s"$flag exact n")
      assert(math.abs(r.getAs[Double]("p50") - e50) <= tol, s"$flag p50")
      assert(math.abs(r.getAs[Double]("p90") - e90) <= tol, s"$flag p90")
      assert(math.abs(r.getAs[Double]("p99") - e99) <= tol, s"$flag p99")
      val one = onePhaseStates(flag)
      assert(math.abs(r.getAs[Double]("p50") - one.quantile(0.5)) <= tol,
        s"$flag two-phase vs one-phase p50")
      assert(math.abs(r.getAs[Double]("p99") - one.quantile(0.99)) <= tol,
        s"$flag two-phase vs one-phase p99")
    }
  }

  test("TDigest local: compression bounds the state, quantiles are " +
      "accurate, and merge-of-halves matches the direct digest") {
    val xs = new scala.util.Random(11).shuffle((1 to 20000).map(_.toDouble))
    val direct = new ops.TDigest(100.0)
    xs.foreach(direct.add)
    val a = new ops.TDigest(100.0); val b = new ops.TDigest(100.0)
    xs.zipWithIndex.foreach { case (x, i) =>
      if (i % 2 == 0) a.add(x) else b.add(x) }
    a.mergeDigest(b)
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val truth = q * 20000
      assert(math.abs(direct.quantile(q) - truth) <= 0.01 * 20000,
        s"direct q=$q got ${direct.quantile(q)}")
      assert(math.abs(a.quantile(q) - truth) <= 0.01 * 20000,
        s"merged q=$q got ${a.quantile(q)}")
    }
    // constant-size state: 20k points compress to O(compression) bytes
    assert(direct.serialize.length < 8 * 1024, s"${direct.serialize.length}")
    // roundtrip preserves the read surface
    val rt = ops.TDigest.deserialize(direct.serialize)
    assert(rt.count == 20000L && rt.quantile(0.5) == direct.quantile(0.5))
  }

  test("roaring bitmap: sparse 64-bit ids (incl. > 2^26 and negative) " +
      "count exactly where the dense bitset fail-fasted") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // ids deliberately hostile to a dense bitset: beyond the old 2^26
    // cap, full-64-bit hashes, Long extremes, and negatives — each is
    // its own 2^16 container, so this also walks the container index
    val ids = Seq(1L, 2L, 1L << 26, (1L << 26) + 1, 1L << 40, Long.MaxValue,
      Long.MinValue, -1L, -98765432109L, 0x9e3779b97f4a7c15L)
    val rows = ids.zipWithIndex.flatMap { case (id, i) =>
      // every id on day 1; odd-index ids again on day 2 (overlap)
      Seq(("click", "2024-01-01 10:00:00", id)) ++
        (if (i % 2 == 1) Seq(("click", "2024-01-02 10:00:00", id)) else Nil)
    }
    val log = rows.toDF("event_type", "t", "user_id")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
      .repartition(7) // force partial-buffer shuffle through the encoder
    val out = Aggregates.aggBitmapOn(log).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") == 2L)
    assert(r.getAs[Long]("sum_daily_uniques") == (ids.size + ids.size / 2).toLong)
    assert(r.getAs[Long]("n_uniques") == ids.size.toLong) // overlap not double-counted
  }

  test("kmv sketch: estimates track exact counts, union-merge is " +
      "lossless, and saturating scopes report exactly") {
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sf)
    val out = Aggregates.aggKmvOn(ev, 256).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_exact"),
        r.getAs[Long]("kmv_k"), r.getAs[Double]("kmv_est")))).toMap
    ScratchCache.releaseAll()
    out.foreach { case (scope, (exact, kk, est)) =>
      if (kk < 256) assert(est == exact.toDouble, s"$scope saturation")
      else {
        // RSE of the (k-1)/u_k estimator ~ 1/sqrt(k-2) ~ 6.3% at k=256;
        // 4 sigma is a deterministic-corpus-safe band
        assert(math.abs(est - exact) / exact < 0.25,
          s"$scope est=$est exact=$exact")
      }
    }
    // the lossless-union property, directly: merging the per-type
    // k-min arrays driver-side must equal the ALL_UNION sketch's k-min
    val kmvAgg = org.apache.spark.sql.functions.udaf(new KmvAggregator(256))
    val hashed = ev.select(col("event_type"),
      org.apache.spark.sql.functions.conv(
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(
            col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h")).distinct()
    val perType = hashed.groupBy(col("event_type"))
      .agg(kmvAgg(col("h")).as("mins")).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("mins"))
    val allUnion = hashed.select(col("h")).distinct()
      .agg(kmvAgg(col("h")).as("mins")).collect()(0)
      .getAs[scala.collection.Seq[Long]]("mins")
    val merged = perType.flatten.distinct.sorted.take(256).toSeq
    assert(merged == allUnion.toSeq)
  }

  test("welch t: planted cohort difference recovers the hand-computed " +
      "statistic, degenerate cohorts emit NULL") {
    import spark.implicits._
    // type x: A (even users) values {9,10,11}, B {4,5,6} -> means 10/5,
    // va=vb=1, t = 5/sqrt(2/3) = 6.1237; type y: n=1 per cohort -> NULL
    val ev = Seq(
      ("x", 2L, 9.0), ("x", 4L, 10.0), ("x", 6L, 11.0),
      ("x", 1L, 4.0), ("x", 3L, 5.0), ("x", 5L, 6.0),
      ("y", 2L, 7.0), ("y", 1L, 3.0))
      .toDF("event_type", "user_id", "value")
    val out = Aggregates.aggAbTestOn(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = out("x")
    assert(x.getAs[Long]("n_a") == 3L && x.getAs[Long]("n_b") == 3L)
    assert(x.getAs[Double]("mean_a") == 10.0)
    assert(x.getAs[Double]("mean_b") == 5.0)
    assert(x.getAs[Double]("t_stat") == 6.1237, x.toString)
    assert(x.getAs[Long]("significant") == 1L)
    val y = out("y")
    assert(y.isNullAt(y.fieldIndex("t_stat")))
    assert(y.isNullAt(y.fieldIndex("significant")))
  }

  test("theta intersection: unsaturated pairs estimate exactly, " +
      "saturated estimates track the planted overlap") {
    import spark.implicits._
    // A = users 0..399, B = 200..599 -> |A ∩ B| = 200
    val rows = (0 until 400).map(u => ("A", u.toLong)) ++
      (200 until 600).map(u => ("B", u.toLong))
    val ev = rows.toDF("event_type", "user_id")
    // k > |A|,|B|: neither sketch saturates -> theta = full range,
    // C = exact common hash count -> estimator collapses to EXACT
    val ex = Aggregates.aggThetaOn(ev, 1000).collect()
    ScratchCache.releaseAll()
    assert(ex.length == 1)
    assert(ex.head.getAs[Long]("exact_inter") == 200L)
    assert(ex.head.getAs[Long]("common_below_theta") == 200L)
    assert(ex.head.getAs[Double]("theta_est") == 200.0)
    // k = 64: both saturate; theta estimator within a 4-sigma-ish band
    val sat = Aggregates.aggThetaOn(ev, 64).collect()
    ScratchCache.releaseAll()
    val est = sat.head.getAs[Double]("theta_est")
    assert(math.abs(est - 200.0) / 200.0 < 0.5, s"est=$est")
  }

  test("mg heavy hitters: two-pass output equals exact brute force, " +
      "survives adversarial small-k and repartitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Zipf-ish planted corpus: "the" 300x, "of" 120x, "and" 80x, plus
    // 200 distinct singletons spread over docs — with k=8 the sketch
    // decrement and merge-trim paths both fire (200 >> k)
    val words = Seq.fill(300)("the") ++ Seq.fill(120)("of") ++
      Seq.fill(80)("and") ++ (0 until 200).map(i => s"rare$i")
    // deterministic spread over 20 docs
    val docs = words.zipWithIndex.groupBy(_._2 % 20).toSeq
      .map { case (d, ws) => (d.toLong, ws.map(_._1).mkString(" "),
        "en", "s1") }
      .toDF("doc_id", "text", "lang", "source")
    val n = words.size.toLong
    def exact(k: Int): Seq[(String, Long)] =
      words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .filter { case (_, c) => c * (k + 1) > n }
        .sortBy { case (t, c) => (-c, t) }
    def run(df: org.apache.spark.sql.DataFrame, k: Int) = {
      val r = Aggregates.aggFreqOn(df, k).collect()
        .map(r => (r.getString(0), r.getAs[Long]("n"))).toSeq
      ScratchCache.releaseAll()
      r
    }
    assert(run(docs, 8) == exact(8))     // {the, of, and} at k=8
    assert(run(docs, 2) == exact(2))     // only "the" clears n/3
    assert(run(docs.repartition(13), 8) == exact(8)) // partition-invariant
    // MG guarantee directly on the aggregator: an adversarial stream
    // (heavy item interleaved with distinct noise) must keep the heavy
    // item in the candidate set at minimal k
    val agg = new FreqAggregator(2)
    val stream = (0 until 50).flatMap(i => Seq("heavy", s"noise$i"))
    val b = stream.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b).contains("heavy"))
  }

  test("bitmap retention: the AND of stored daily states counts exactly " +
      "the planted overlap, across container types") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // day1 actives {1, 2, 1L<<40, -5}; day2 actives {2, 1L<<40, 7}:
    // retained = {2, 1<<40} = 2 — ids span multiple 2^16 containers
    // and the unsigned (negative) range; day3 {9} retains 0
    val rows =
      Seq(1L, 2L, 1L << 40, -5L).map(u => ("click", "2024-01-01 10:00:00", u)) ++
      Seq(2L, 1L << 40, 7L).map(u => ("click", "2024-01-02 10:00:00", u)) ++
      Seq(9L).map(u => ("click", "2024-01-03 10:00:00", u)) ++
      Seq(5L).map(u => ("view", "2024-01-05 10:00:00", u)) // no prev day
    val log = rows.toDF("event_type", "t", "user_id")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = Aggregates.aggBitmapRetentionOn(log).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_retained")))
    ScratchCache.releaseAll()
    assert(out.toSeq == Seq(
      ("click", "2024-01-02", 3L, 2L),
      ("click", "2024-01-03", 1L, 0L)))
    // unit level: intersect across array/bitmap container types — one
    // side dense enough to promote, the other sparse
    val dense = new Roaring64
    (0 until 5000).foreach(i => dense.add(i.toLong)) // bitmap container
    val sparse = new Roaring64
    Seq(3L, 4997L, 70000L, Long.MinValue).foreach(sparse.add)
    dense.add(Long.MinValue)
    assert(Roaring64.andCardinalityOf(dense.serialize, sparse.serialize)
      == 3L) // 3, 4997, MinValue; 70000 only in sparse
  }

  test("Roaring64: array container promotes to bitmap at 4096, " +
      "serialization is canonical, OR equals set union") {
    val rnd = new scala.util.Random(42)
    // two overlapping sets straddling the promotion threshold: set A
    // densely fills one container past 4096; set B is sparse across many
    val a = (0 until 5000).map(i => 100000L + i * 3).toSet
    val b = (0 until 3000).map(_ => rnd.nextLong()).toSet ++ a.take(500)
    def build(s: Iterable[Long], order: Seq[Long] => Seq[Long]): Roaring64 = {
      val r = new Roaring64
      order(s.toSeq).foreach(r.add)
      r
    }
    val ra = build(a, identity)
    val raShuffled = build(a, s => new scala.util.Random(7).shuffle(s))
    // canonical: same id set => same bytes, regardless of insert order
    assert(java.util.Arrays.equals(ra.serialize, raShuffled.serialize))
    assert(ra.cardinality == a.size.toLong)
    val rb = build(b, identity)
    // OR through the wire format: deserialize(serialize) roundtrip + union
    val merged = Roaring64.deserialize(ra.serialize)
    merged.orInPlace(Roaring64.deserialize(rb.serialize))
    assert(merged.cardinality == (a ++ b).size.toLong)
    assert(Roaring64.cardinalityOf(merged.serialize) == (a ++ b).size.toLong)
    // idempotence: OR-ing the same state twice changes nothing
    val before = merged.serialize
    merged.orInPlace(Roaring64.deserialize(rb.serialize))
    assert(java.util.Arrays.equals(merged.serialize, before))
    // compression sanity: 3500 sparse random longs must cost ~2 bytes of
    // payload each plus container headers, nowhere near dense 8 KiB each
    assert(rb.serialize.length < b.size * 24)
  }

  test("countmin ledger: estimates bound exact counts from above, " +
      "collide where planted, and survive any partitioning") {
    import spark.implicits._
    // probe keys 1..5 with distinct counts, plus per-hash-row planted
    // colliders against probe 3: est(3) = min_i counter[i][h_i(3)]
    // only overcounts when EVERY row's bucket is polluted, so plant
    // one heavy background key per row (found by brute force — each
    // single-row collision is a ~1/64 search, deterministic).
    def bucket(a: Long, b: Long, x: Long): Long =
      ((a * ((x + 1) % 2147483647L) + b) % 2147483647L) % 64L
    val params = Seq((31L, 7L), (131L, 17L), (1031L, 29L), (10007L, 47L))
    val colliders = params.map { case (a, b) =>
      (16L to 100000L).find(x => bucket(a, b, x) == bucket(a, b, 3L)).get
    }
    val xs = (Seq.fill(3)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(2)(3L) ++
      Seq.fill(7)(4L) ++ Seq.fill(1)(5L) ++
      colliders.flatMap(c => Seq.fill(100)(c))).toDF("x")
    val out = Aggregates.aggCountMinOn(xs).collect()
    val rows = out.map(r => (r.getAs[Long]("k"), r.getAs[Long]("exact_cnt"),
      r.getAs[Long]("cms_est"), r.getAs[Long]("overcount")))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    rows.foreach { case (k, exact, est, over) =>
      assert(est >= exact, s"k=$k: CMS must never underestimate")
      assert(over == est - exact)
    }
    assert(rows.map(_._2).toSeq == Seq(3L, 5L, 2L, 7L, 1L))
    // every row's bucket for key 3 is polluted by ≥100 planted rows,
    // so the min over rows cannot dodge the overcount
    val k3 = rows.find(_._1 == 3L).get
    assert(k3._4 >= 100L, s"planted collision missing: $k3")
    // partition-independence == mergeability of the counter table
    val out2 = Aggregates.aggCountMinOn(xs.repartition(13)).collect()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
  }
}
