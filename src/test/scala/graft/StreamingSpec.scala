package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingTwins
import graft.ops.StreamingOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
  event_type: String, value: Double)

/** Structured Streaming twins vs their batch equivalents, via
  * MemoryStream (SURVEY.md §2.10/§5.2). */
class StreamingSpec extends GraftSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val baseEvents = Seq(
    Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 10:20:00"), 1, "view", 2.0),
    Ev(3, ts("2024-01-01 10:45:00"), 2, "click", 3.0),
    Ev(4, ts("2024-01-01 11:10:00"), 1, "click", 4.0),
    Ev(5, ts("2024-01-01 12:30:00"), 2, "view", 5.0))

  test("tumbling: streaming result equals batch twin on same input") {
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("tumb")
      .outputMode("append").start()
    try {
      ms.addData(baseEvents: _*)
      q.processAllAvailable()
      // advance the watermark far past all windows so they all emit
      ms.addData(Ev(99, ts("2024-01-02 00:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("tumb")
        .filter($"wstart" < ts("2024-01-01 23:00:00"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getDecimal(3))).toSet
      val batch = StreamingOps.tumbling _ // batch twin over same rows:
      val batchDf = baseEvents.toDF()
        .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour").as("w"), $"event_type")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"value"
            .cast("decimal(12,2)")).cast("decimal(38,2)").as("sum_value"))
        .select($"w.start", $"event_type", $"n", $"sum_value")
      val batchSet = batchDf.collect().map(r => (r.getTimestamp(0),
        r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
      assert(streamed == batchSet)
    } finally q.stop()
  }

  test("tumbling: late row beyond the watermark is dropped") {
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      ms.addData(baseEvents: _*)
      q.processAllAvailable()
      ms.addData(Ev(99, ts("2024-01-02 00:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val before = spark.table("late").count()
      // 14 hours late — far beyond the 10-minute watermark
      ms.addData(Ev(100, ts("2024-01-01 10:06:00"), 1, "click", 99.0))
      q.processAllAvailable()
      val after = spark.table("late")
      assert(after.count() == before, "late row must not re-emit a window")
      val h10 = after.filter($"wstart" === ts("2024-01-01 10:00:00"))
        .collect()
      assert(h10.forall(_.getLong(2) <= 2L), "late row must not be counted")
    } finally q.stop()
  }

  test("session_window twin groups like the batch lag/cumsum twin") {
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.session(ms.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      ms.addData(baseEvents: _*)
      ms.addData(Ev(99, ts("2024-01-03 00:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .filter($"user_id" < 9)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
        .toSet
      val batch = StreamingOps.sessionOn(baseEvents.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_events"),
          r.getAs[Long]("start_us"), r.getAs[Long]("end_us")))
        .toSet
      assert(streamed == batch,
        s"streaming $streamed vs batch $batch")
    } finally q.stop()
  }

  test("sliding: streaming result equals batch twin on same input") {
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.sliding(ms.toDF())
      .writeStream.format("memory").queryName("slid")
      .outputMode("append").start()
    try {
      ms.addData(baseEvents: _*)
      ms.addData(Ev(99, ts("2024-01-02 00:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("slid")
        .filter($"wstart" < ts("2024-01-01 23:00:00"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
        .toSet
      val batch = baseEvents.toDF()
        .select(org.apache.spark.sql.functions
          .window($"ts", "1 hour", "15 minutes").as("w"),
          ($"user_id" % 10).as("ub"))
        .groupBy($"w.start".as("wstart"), $"ub")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops in-watermark duplicates") {
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.dedup(ms.toDF())
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      ms.addData(baseEvents: _*)
      q.processAllAvailable()
      ms.addData(baseEvents.head) // duplicate event_id 1
      q.processAllAvailable()
      assert(spark.table("dd").count() == baseEvents.length.toLong)
    } finally q.stop()
  }

  test("transformWithState processor matches flatMapGroupsWithState semantics") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Ev]
      val q = ms.toDF().select($"user_id", $"event_type")
        .as[(Long, String)](Encoders.product[(Long, String)])
        .groupByKey(_._1)(Encoders.scalaLong)
        .transformWithState(new graft.streaming.SignupCounterProcessor,
          TimeMode.None, OutputMode.Append)(
          Encoders.product[(Long, Long)])
        .toDF("user_id", "n")
        .writeStream.format("memory").queryName("tws")
        .outputMode("append").start()
      try {
        ms.addData(
          Ev(1, ts("2024-01-01 10:00:00"), 1, "signup", 0.0),
          Ev(2, ts("2024-01-01 10:01:00"), 1, "click", 0.0),
          Ev(3, ts("2024-01-01 10:02:00"), 1, "view", 0.0),
          Ev(4, ts("2024-01-01 10:00:00"), 2, "click", 0.0))
        q.processAllAvailable()
        // second batch exercises state restore across micro-batches
        ms.addData(Ev(5, ts("2024-01-01 10:03:00"), 1, "click", 0.0))
        q.processAllAvailable()
        val out = spark.table("tws").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(out == Set((1L, 1L), (1L, 2L), (1L, 3L)))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-stream interval join emits exactly the batch twin's pairs") {
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamingTwins.clickAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      val cs = Seq(
        Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 0.0),
        Ev(2, ts("2024-01-01 10:50:00"), 1, "click", 0.0),
        Ev(3, ts("2024-01-01 09:30:00"), 1, "click", 0.0), // >1h before
        Ev(4, ts("2024-01-01 10:40:00"), 2, "click", 0.0)) // other user
      val ps = Seq(
        Ev(10, ts("2024-01-01 11:00:00"), 1, "purchase", 0.0),
        Ev(11, ts("2024-01-01 12:00:00"), 3, "purchase", 0.0)) // no clicks
      clicks.addData(cs: _*)
      purchases.addData(ps: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssj").collect()
        .map(r => (r.getLong(0), r.getLong(4))).toSet
      val batch = StreamingOps.streamJoinPairsOn((cs ++ ps).toDF())
        .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
      assert(streamed == batch)
      assert(streamed == Set((10L, 1L), (10L, 2L)),
        "purchase 10 pairs with in-window clicks 1 and 2 only")
    } finally q.stop()
  }

  test("stream late: matches a sequential scala reference and is range-count invariant") {
    val events = Tables.events(spark, sf)
    // independent sequential reference: same md5 arrival permutation,
    // plain running max in a driver loop
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = events.selectExpr("event_id", "event_type", "unix_micros(ts) AS t")
      .collect()
      .map(r => (md5hex(r.getLong(0).toString), r.getLong(0), r.getString(1),
        r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    var runMax = Long.MinValue
    val acc = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    for ((_, _, et, t) <- rows) {
      val wm = runMax - 600000000L
      val late = runMax != Long.MinValue && t < wm
      val (n, nl, lu) = acc.getOrElse(et, (0L, 0L, 0L))
      acc(et) = (n + 1, nl + (if (late) 1 else 0),
        lu + (if (late) wm - t else 0L))
      if (t > runMax) runMax = t
    }
    val gotSeq = StreamingOps.lateOn(events, 8).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(gotSeq == acc.toMap)
    assert(gotSeq.values.map(_._2).sum > 0, "disorder must plant real lates")
    // two-phase prefix must not depend on the range count
    val one = StreamingOps.lateOn(events, 1).collect().map(_.toString).toSeq
    val many = StreamingOps.lateOn(events, 32).collect().map(_.toString).toSeq
    assert(one == many)
  }

  test("foreachBatch sink: batch ids key idempotent exactly-once writes") {
    val ms = MemoryStream[Ev]
    // keyed by batchId: a replayed batch OVERWRITES its own slot
    // instead of appending — the standard idempotent-sink recipe for
    // exactly-once delivery to non-transactional stores
    val sink = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q = ms.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(id) = batch.count()
      }
      .start()
    try {
      ms.addData(baseEvents: _*)
      q.processAllAvailable()
      ms.addData(Ev(99, ts("2024-01-02 00:00:00"), 9, "click", 0.0))
      q.processAllAvailable()
      assert(sink.values.sum == baseEvents.length + 1,
        "every event delivered exactly once across batches")
      assert(sink.size >= 2, "multiple batches hit the sink")
    } finally q.stop()
  }

  test("streaming normalization: micro-batches through the batched transport") {
    val ms = MemoryStream[String]
    val root = java.nio.file.Files
      .createTempDirectory("graft_streamnorm").toString
    val q = StreamingTwins.normalizeStream(
        ms.toDF().withColumnRenamed("value", "raw"),
        "raw", 3, new TransportSpec.BoomService,
        s"$root/out", s"$root/fail")
      .start()
    try {
      ms.addData("ID1", "ID2", "ID3", "ID4")
      q.processAllAvailable()
      ms.addData("ID5", "BAD", "ID6")
      q.processAllAvailable()
    } finally q.stop()
    def dirs(p: String): Seq[String] =
      java.nio.file.Files.list(java.nio.file.Paths.get(p)).toArray
        .map(_.toString).filter(_.contains("batch_")).toSeq.sorted
    val outBatches = dirs(s"$root/out")
    assert(outBatches.size >= 2, "one mapping slot per micro-batch")
    val failSchema = "raw_id STRING, err STRING"
    // per micro-batch: mapping and failure twin are disjoint
    val perBatch = outBatches.map { ob =>
      val bid = ob.substring(ob.lastIndexOf("batch_"))
      val mapped = spark.read.parquet(ob)
        .select("raw_id").as[String].collect().toSet
      val failed = spark.read.schema(failSchema)
        .json(s"$root/fail/$bid")
        .select("raw_id").as[String].collect().toSet
      assert((mapped & failed).isEmpty, s"$bid overlaps")
      mapped ++ failed
    }
    // globally: every streamed id accounted for exactly once, the
    // poisoned chunk in a failure twin, everything else mapped
    assert(perBatch.reduce(_ ++ _) ==
      Set("ID1", "ID2", "ID3", "ID4", "ID5", "BAD", "ID6"))
    val allFailed = outBatches.map { ob =>
      val bid = ob.substring(ob.lastIndexOf("batch_"))
      spark.read.schema(failSchema).json(s"$root/fail/$bid")
        .select("raw_id").as[String].collect().toSet
    }.reduce(_ ++ _)
    assert(allFailed.contains("BAD"))
    assert(!allFailed.contains("ID1"), "first micro-batch had no poison")
  }

  test("stateful events-since-signup (flatMapGroupsWithState, batch mode)") {
    val evs = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "signup", 0.0),
      Ev(2, ts("2024-01-01 10:01:00"), 1, "click", 0.0),
      Ev(3, ts("2024-01-01 10:02:00"), 1, "view", 0.0),
      Ev(4, ts("2024-01-01 10:00:00"), 2, "click", 0.0)).toDF()
    val out = StreamingTwins.eventsSinceSignup(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (1L, 2L)))
  }

  test("funnel twin: streamed stage counts equal the batch funnel") {
    // the EventOpsSpec planted log, fed across TWO triggers (split in
    // per-user event-time order) so state must carry between triggers
    val log = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, ts("2024-01-01 10:05:00"), 1, "click", 0.0),
      Ev(3, ts("2024-01-01 10:10:00"), 1, "purchase", 0.0),
      Ev(4, ts("2024-01-01 09:00:00"), 2, "click", 0.0),
      Ev(5, ts("2024-01-01 09:30:00"), 2, "view", 0.0),
      Ev(6, ts("2024-01-01 08:00:00"), 3, "view", 0.0),
      Ev(7, ts("2024-01-01 08:10:00"), 3, "purchase", 0.0),
      Ev(8, ts("2024-01-01 08:20:00"), 3, "click", 0.0),
      Ev(9, ts("2024-01-01 06:00:00"), 5, "view", 0.0),
      Ev(10, ts("2024-01-01 06:00:00"), 5, "click", 0.0))
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.funnelStages(ms.toDF())
      .writeStream.format("memory").queryName("funtwin")
      .outputMode("append").start()
    try {
      val (first, second) = log.partition(_.event_id <= 5)
      ms.addData(first: _*); q.processAllAvailable()
      ms.addData(second: _*); q.processAllAvailable()
      val streamed = spark.table("funtwin")
        .groupBy($"stage")
        .agg(org.apache.spark.sql.functions.countDistinct($"user_id")
          .as("n_users"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = graft.ops.EventOps.funnelOn(log.toDF()).collect()
        .filter(_.getAs[Long]("n_users") > 0)
        .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("funnel twin A/B: transformWithState port emits exactly the " +
      "flatMapGroupsWithState rows (multi-trigger)") {
    // r12 migration probe: same planted log, same two-trigger split,
    // BOTH stateful APIs — outputs must be row-identical
    val log = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, ts("2024-01-01 10:05:00"), 1, "click", 0.0),
      Ev(3, ts("2024-01-01 10:10:00"), 1, "purchase", 0.0),
      Ev(4, ts("2024-01-01 09:00:00"), 2, "click", 0.0),
      Ev(5, ts("2024-01-01 09:30:00"), 2, "view", 0.0),
      Ev(6, ts("2024-01-01 08:00:00"), 3, "view", 0.0),
      Ev(7, ts("2024-01-01 08:10:00"), 3, "purchase", 0.0),
      Ev(8, ts("2024-01-01 08:20:00"), 3, "click", 0.0),
      Ev(9, ts("2024-01-01 06:00:00"), 5, "view", 0.0),
      Ev(10, ts("2024-01-01 06:00:00"), 5, "click", 0.0))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(name: String,
          build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
          : Set[(Long, String, Long)] = {
        val ms = MemoryStream[Ev]
        val q = build(ms.toDF())
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          val (first, second) = log.partition(_.event_id <= 5)
          ms.addData(first: _*); q.processAllAvailable()
          ms.addData(second: _*); q.processAllAvailable()
          spark.table(name).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        } finally q.stop()
      }
      val viaFmgs = run("funab_fmgs", StreamingTwins.funnelStages)
      val viaTws = run("funab_tws", StreamingTwins.funnelStagesTws)
      assert(viaTws == viaFmgs, s"tws=$viaTws fmgs=$viaFmgs")
      assert(viaTws.nonEmpty)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("attribution twin: streamed credits reproduce the batch report") {
    // per-user last-touch cases: credited touch, '(none)' first-event
    // purchase, self-exclusion at a shared timestamp, re-credit after a
    // second touch — split across TWO triggers so state must carry
    val log = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, ts("2024-01-01 10:05:00"), 1, "click", 0.0),
      Ev(3, ts("2024-01-01 10:10:00"), 1, "purchase", 0.0),
      Ev(4, ts("2024-01-01 09:00:00"), 2, "purchase", 0.0), // (none)
      Ev(5, ts("2024-01-01 09:30:00"), 2, "view", 0.0),
      Ev(6, ts("2024-01-01 09:30:00"), 2, "purchase", 0.0), // same-ts view wins
      Ev(7, ts("2024-01-01 08:00:00"), 3, "error", 0.0),
      Ev(8, ts("2024-01-01 08:30:00"), 3, "purchase", 0.0),
      Ev(9, ts("2024-01-01 08:40:00"), 3, "purchase", 0.0)) // same touch twice
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.attributionCredits(ms.toDF())
      .writeStream.format("memory").queryName("atttwin")
      .outputMode("append").start()
    try {
      val (first, second) = log.partition(_.event_id <= 5)
      ms.addData(first: _*); q.processAllAvailable()
      ms.addData(second: _*); q.processAllAvailable()
      import org.apache.spark.sql.functions.{count, countDistinct, lit, round, sum, when, col}
      import org.apache.spark.sql.types.DecimalType
      val streamed = spark.table("atttwin")
        .groupBy($"touch_type")
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct($"user_id").as("n_users"),
          when(count(when($"gap_us" >= 0, 1)) > 0,
            round(sum(when($"gap_us" >= 0, $"gap_us")
                .cast(DecimalType(38, 0))).cast("double")
              / (count(when($"gap_us" >= 0, 1)).cast(DecimalType(38, 0))
                * 1000000L).cast("double"), 6)).as("avg_gap_sec"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)))).toSet
      val batch = graft.ops.EventOps.attributionOn(log.toDF()).collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_purchases"),
          r.getAs[Long]("n_users"), Option(r.get(3)))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("attribution twin A/B: transformWithState port emits exactly the " +
      "flatMapGroupsWithState rows (multi-trigger)") {
    // r13 migration probe, the funnel-probe method: same planted log,
    // same two-trigger split, BOTH stateful APIs — row-identical
    val log = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, ts("2024-01-01 10:05:00"), 1, "click", 0.0),
      Ev(3, ts("2024-01-01 10:10:00"), 1, "purchase", 0.0),
      Ev(4, ts("2024-01-01 09:00:00"), 2, "purchase", 0.0), // (none)
      Ev(5, ts("2024-01-01 09:30:00"), 2, "view", 0.0),
      Ev(6, ts("2024-01-01 09:30:00"), 2, "purchase", 0.0), // same-ts view
      Ev(7, ts("2024-01-01 08:00:00"), 3, "error", 0.0),
      Ev(8, ts("2024-01-01 08:30:00"), 3, "purchase", 0.0),
      Ev(9, ts("2024-01-01 08:40:00"), 3, "purchase", 0.0))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(name: String,
          build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
          : Set[(Long, String, Long, Long)] = {
        val ms = MemoryStream[Ev]
        val q = build(ms.toDF())
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          val (first, second) = log.partition(_.event_id <= 5)
          ms.addData(first: _*); q.processAllAvailable()
          ms.addData(second: _*); q.processAllAvailable()
          spark.table(name).collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
              r.getLong(3))).toSet
        } finally q.stop()
      }
      val viaFmgs = run("attab_fmgs", StreamingTwins.attributionCredits)
      val viaTws = run("attab_tws",
        df => StreamingTwins.attributionCreditsTws(df))
      assert(viaTws == viaFmgs, s"tws=$viaTws fmgs=$viaFmgs")
      assert(viaTws.nonEmpty)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("attribution twin TTL: a stale touch is evicted by the store and " +
      "a later purchase credits '(none)'") {
    // the capability that NEEDS transformWithState: declarative state
    // TTL. Touch in trigger 1, wait past the TTL, purchase in trigger
    // 2 — the store must have evicted the touch (no user-code timers).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ProcessingTime mode schedules continuous no-data maintenance
    // batches (TTL/timer advancement); with them on, the two-trigger
    // memory-stream harness churns batches instead of idling
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      def run(ttlMs: Long, name: String): Map[Long, (String, Long)] = {
        val ms = MemoryStream[Ev]
        val q = StreamingTwins.attributionCreditsTws(ms.toDF(), ttlMs)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          ms.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0))
          q.processAllAvailable()
          Thread.sleep(400) // comfortably past the 50 ms TTL
          ms.addData(Ev(2, ts("2024-01-01 10:10:00"), 1, "purchase", 0.0))
          q.processAllAvailable()
          spark.table(name).collect()
            .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3))))
            .toMap
        } finally q.stop()
      }
      val expired = run(ttlMs = 50L, "attttl_on")
      assert(expired(1L) == ("(none)", Long.MinValue), expired.toString)
      // control: same timeline without TTL still credits the touch
      val kept = run(ttlMs = -1L, "attttl_off")
      assert(kept(1L)._1 == "click", kept.toString)
      assert(kept(1L)._2 == 600L * 1000000L) // 10 min in µs
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }

  test("attribution batched twin: hot user (10k events in one trigger) " +
      "rides the window sort, credits match the batch report") {
    // ONE user floods a single trigger with 10k events — the case the
    // state-op twin would whole-trigger-buffer on one task heap; here
    // the ordering is an engine window (external sort) and user code
    // never materializes the trigger. Trigger 2 exercises the carried
    // one-row state (purchase before any trigger-2 touch).
    val base = ts("2024-01-01 10:00:00").getTime
    def at(i: Int) = new Timestamp(base + i * 1000L)
    val hot = (1 to 10000).map { i =>
      val et =
        if (i == 5000 || i == 10000) "purchase"
        else if (i % 3 == 0) "click" else "view"
      Ev(i.toLong, at(i), 1L, et, 0.0)
    }
    val late = Seq(
      Ev(10001L, at(10001), 1L, "purchase", 0.0), // carried-state credit
      Ev(10002L, at(10002), 2L, "purchase", 0.0), // (none) first event
      Ev(10003L, at(10003), 1L, "error", 0.0),
      Ev(10004L, at(10004), 1L, "purchase", 0.0))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_att_batched").toString
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.attributionCreditsBatched(ms.toDF(),
        s"$dir/state", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      ms.addData(hot: _*); q.processAllAvailable()
      ms.addData(late: _*); q.processAllAvailable()
      import org.apache.spark.sql.functions.{count, countDistinct, lit, round, sum, when, col}
      import org.apache.spark.sql.types.DecimalType
      val streamed = spark.read.parquet(s"$dir/out/batch_*")
        .groupBy($"touch_type")
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct($"user_id").as("n_users"),
          when(count(when($"gap_us" >= 0, 1)) > 0,
            round(sum(when($"gap_us" >= 0, $"gap_us")
                .cast(DecimalType(38, 0))).cast("double")
              / (count(when($"gap_us" >= 0, 1)).cast(DecimalType(38, 0))
                * 1000000L).cast("double"), 6)).as("avg_gap_sec"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)))).toSet
      val batch = graft.ops.EventOps
        .attributionOn((hot ++ late).toDF()).collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_purchases"),
          r.getAs[Long]("n_users"), Option(r.get(3)))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("retention twin: streamed cells equal the batch matrix") {
    val log = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, ts("2024-01-03 10:00:00"), 1, "click", 0.0),
      Ev(3, ts("2024-01-01 11:00:00"), 2, "view", 0.0),
      Ev(4, ts("2024-01-02 09:00:00"), 3, "view", 0.0),
      Ev(5, ts("2024-01-03 09:00:00"), 3, "view", 0.0),
      Ev(6, ts("2024-01-03 09:30:00"), 3, "view", 0.0)) // dup cell
    val ms = MemoryStream[Ev]
    val q = StreamingTwins.retentionCells(ms.toDF())
      .writeStream.format("memory").queryName("rettwin")
      .outputMode("append").start()
    try {
      val (first, second) = log.partition(_.event_id <= 3)
      ms.addData(first: _*); q.processAllAvailable()
      ms.addData(second: _*); q.processAllAvailable()
      val streamed = spark.table("rettwin")
        .groupBy($"cohort_day", $"day_offset")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_active"))
        .collect().map { r =>
          val cohort = java.time.LocalDate.ofEpochDay(r.getInt(0)).toString
          ((cohort, r.getInt(1)), r.getLong(2))
        }.toMap
      val batch = graft.ops.EventOps.retentionOn(log.toDF()).collect()
        .map(r => ((r.getDate(0).toString, r.getAs[Int]("day_offset")),
          r.getAs[Long]("n_active"))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("retention twin A/B: transformWithState (ValueState + ListState) " +
      "equals flatMapGroupsWithState across triggers") {
    // dup cell (user 3 day 2 twice) + multi-trigger state carry: the
    // second trigger must read the first's cohort AND seen-offsets
    val log = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Ev(2, ts("2024-01-03 10:00:00"), 1, "click", 0.0),
      Ev(3, ts("2024-01-01 11:00:00"), 2, "view", 0.0),
      Ev(4, ts("2024-01-02 09:00:00"), 3, "view", 0.0),
      Ev(5, ts("2024-01-03 09:00:00"), 3, "view", 0.0),
      Ev(6, ts("2024-01-03 09:30:00"), 3, "view", 0.0), // dup cell
      Ev(7, ts("2024-01-04 09:00:00"), 3, "view", 0.0))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(name: String,
          build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
          : Set[(Long, Int, Int)] = {
        val ms = MemoryStream[Ev]
        val q = build(ms.toDF())
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          val (first, second) = log.partition(_.event_id <= 4)
          ms.addData(first: _*); q.processAllAvailable()
          ms.addData(second: _*); q.processAllAvailable()
          spark.table(name).collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
        } finally q.stop()
      }
      val viaFmgs = run("retab_fmgs", StreamingTwins.retentionCells)
      val viaTws = run("retab_tws", StreamingTwins.retentionCellsTws)
      assert(viaTws == viaFmgs, s"tws=$viaTws fmgs=$viaFmgs")
      assert(viaTws.nonEmpty)
      // the dup cell must have been emitted exactly once
      assert(viaTws.count(c => c._1 == 3L && c._3 == 1) == 1)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
