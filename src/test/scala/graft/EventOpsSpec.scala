package graft

import graft.ops.EventOps
import org.apache.spark.sql.functions.{col, timestamp_micros, to_timestamp}

/** Planted-case tests for the behavioral-analytics operators
  * (q_events_funnel, q_events_retention). The oracle gate value-checks
  * both against DuckDB on real data; these pin the ordering/cohort
  * SEMANTICS on hand-built event logs where the right answer is known
  * by construction. */
class EventOpsSpec extends GraftSuite {
  import spark.implicits._

  private def events(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "t")
      .withColumn("ts", to_timestamp(col("t")))
      .drop("t")

  test("rfm: planted customers land in their designed segments with " +
      "exact means, partition-invariant") {
    // cust 1: fresh heavy spender (recency 10d, 18 orders, 4.5M) ->
    // (5,5,5); cust 2: mid (200d, 9 orders, 2.7M) -> (3,3,3);
    // cust 3: lapsed light (799d, 2 orders, 0.3M) -> (1,1,1)
    val rows =
      (1 to 18).map(i => (100L + i, 1L, "1998-07-22", 250000.0)) ++
      (1 to 9).map(i => (200L + i, 2L, "1998-01-13", 300000.0)) ++
      Seq((301L, 3L, "1996-05-24", 150000.0),
        (302L, 3L, "1995-01-01", 150000.0)) :+
      ((999L, 9L, "1998-08-01", 1000000.0)) // sets the ref date
    val df = rows.toDF("o_orderkey", "o_custkey", "dt", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("dt"))).drop("dt")
    val out = EventOps.rfmOn(df).collect()
    def seg(r: Long, f: Long, m: Long) = out.find(x =>
      x.getAs[Long]("r_score") == r && x.getAs[Long]("f_score") == f &&
      x.getAs[Long]("m_score") == m)
    val s555 = seg(5, 5, 5).get
    assert(s555.getAs[Long]("n_customers") == 1L)
    assert(s555.getAs[Double]("avg_recency_days") == 10.0)
    assert(s555.getAs[Double]("avg_frequency") == 18.0)
    assert(s555.getAs[Double]("avg_monetary") == 4500000.0)
    val s333 = seg(3, 3, 3).get
    assert(s333.getAs[Long]("n_customers") == 1L)
    assert(s333.getAs[Double]("avg_recency_days") == 200.0)
    assert(seg(1, 1, 1).get.getAs[Double]("avg_monetary") == 300000.0)
    val out2 = EventOps.rfmOn(df.repartition(7)).collect()
    assert(out.map(_.toString).toSeq == out2.map(_.toString).toSeq)
  }

  test("sequence match: exclusion window classifies matched / blocked " +
      "/ no_view, with ties broken by event_id") {
    val log = Seq(
      // user 1: view -> purchase within 1h, nothing between -> matched
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "purchase", "2024-01-01 10:30:00"),
      // user 2: view -> ERROR -> purchase -> blocked
      (3L, 2L, "view", "2024-01-01 10:00:00"),
      (4L, 2L, "error", "2024-01-01 10:10:00"),
      (5L, 2L, "purchase", "2024-01-01 10:20:00"),
      // user 3: error BEFORE the view -> view is clean -> matched
      (6L, 3L, "error", "2024-01-01 09:00:00"),
      (7L, 3L, "view", "2024-01-01 09:30:00"),
      (8L, 3L, "purchase", "2024-01-01 09:45:00"),
      // user 4: view expired (>1h before purchase) -> no_view
      (9L, 4L, "view", "2024-01-01 08:00:00"),
      (10L, 4L, "purchase", "2024-01-01 09:30:00"),
      // user 5: purchase with no view at all -> no_view
      (11L, 5L, "purchase", "2024-01-01 07:00:00"),
      // user 6: error at the SAME ts as the view but a LATER event_id
      // -> the (us, event_id) order puts it after the view -> blocked
      (12L, 6L, "view", "2024-01-01 06:00:00"),
      (13L, 6L, "error", "2024-01-01 06:00:00"),
      (14L, 6L, "purchase", "2024-01-01 06:30:00"))
      .toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = EventOps.sequenceMatchOn(log).collect()
      .map(r => r.getAs[Long]("decile") -> ((r.getAs[Long]("n_purchases"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("n_blocked"),
        r.getAs[Long]("n_no_view")))).toMap
    assert(out == Map(
      1L -> ((1L, 1L, 0L, 0L)), 2L -> ((1L, 0L, 1L, 0L)),
      3L -> ((1L, 1L, 0L, 0L)), 4L -> ((1L, 0L, 0L, 1L)),
      5L -> ((1L, 0L, 0L, 1L)), 6L -> ((1L, 0L, 1L, 0L))), out.toString)
  }

  test("forecast: planted linear series recovers slope exactly, " +
      "single-day series emits NULL") {
    // type "lin": 10,12,14,16,18 events on 5 consecutive days -> the
    // OLS line is exact (slope 2, next-day forecast 20); type "one":
    // a single day -> degenerate, NULL stats
    val rows = (0 until 5).flatMap { i =>
      val day = f"2024-01-${i + 1}%02d"
      (0 until 10 + 2 * i).map(j =>
        (j.toLong, "lin", s"$day 0${j % 10}:00:00"))
    } :+ ((99L, "one", "2024-02-01 12:00:00"))
    val log = events(rows: _*)
    val out = EventOps.forecastOn(log).collect()
      .map(r => r.getString(0) -> r).toMap
    val lin = out("lin")
    assert(lin.getAs[Long]("n_days") == 5L)
    assert(lin.getAs[Double]("slope") == 2.0, lin.toString)
    assert(lin.getAs[Double]("forecast_next") == 20.0, lin.toString)
    // intercept = mean(y) - slope*mean(x) with x = epoch days
    val x0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble
    val expInt = 14.0 - 2.0 * (x0 + 2.0)
    assert(math.abs(lin.getAs[Double]("intercept") - expInt) < 1e-6)
    val one = out("one")
    assert(one.getAs[Long]("n_days") == 1L)
    assert(one.isNullAt(one.fieldIndex("slope")))
    assert(one.isNullAt(one.fieldIndex("forecast_next")))
  }

  test("gaps-islands: streak profile with earliest-longest tiebreak " +
      "and multi-event days collapsed") {
    val log = events(
      // user 1: days 1,2,3 then 5,6 -> streaks 3 and 2; two events on
      // day 2 must not split or lengthen the streak
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-02 09:00:00"),
      (1L, "click", "2024-01-02 18:00:00"),
      (1L, "view", "2024-01-03 10:00:00"),
      (1L, "view", "2024-01-05 10:00:00"),
      (1L, "view", "2024-01-06 10:00:00"),
      // user 2: two equal-length streaks (2,2) -> longest_start is the
      // EARLIEST of the longest
      (2L, "view", "2024-02-01 10:00:00"),
      (2L, "view", "2024-02-02 10:00:00"),
      (2L, "view", "2024-02-10 10:00:00"),
      (2L, "view", "2024-02-11 10:00:00"),
      // user 3: single day
      (3L, "view", "2024-03-15 10:00:00"))
    val out = EventOps.gapsIslandsOn(log).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("longest_streak"),
          r.getAs[java.sql.Date]("longest_start").toString))).toMap
    assert(out == Map(
      1L -> ((5L, 2L, 3L, "2024-01-01")),
      2L -> ((4L, 2L, 2L, "2024-02-01")),
      3L -> ((1L, 1L, 1L, "2024-03-15"))), out.toString)
  }

  test("funnel counts strictly-ordered first-touch stage arrivals") {
    val log = events(
      // user 1: fully ordered -> all three stages
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: click BEFORE the first view -> view stage only
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 09:30:00"),
      // user 3: purchase between view and click -> stages 1 and 2 only
      (3L, "view", "2024-01-01 08:00:00"),
      (3L, "purchase", "2024-01-01 08:10:00"),
      (3L, "click", "2024-01-01 08:20:00"),
      // user 4: no view at all -> appears in no stage
      (4L, "purchase", "2024-01-01 07:00:00"),
      (4L, "click", "2024-01-01 07:01:00"),
      // user 5: click at EXACTLY the first view's timestamp -> strict
      // '>' excludes it, view stage only
      (5L, "view", "2024-01-01 06:00:00"),
      (5L, "click", "2024-01-01 06:00:00"))
    val out = EventOps.funnelOn(log).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("conv_rate"))).toMap
    assert(out("1_view") == ((4L, 1.0)))
    assert(out("2_view_click") == ((2L, 0.5)))
    assert(out("3_view_click_purchase") == ((1L, 0.25)))
  }

  test("funnel later-but-cheaper click does not resurrect a purchase") {
    // the purchase precedes the SECOND click too, so no ordering of
    // clicks can qualify it; guards against "any click before any
    // purchase" mis-semantics
    val log = events(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "purchase", "2024-01-01 10:01:00"),
      (1L, "click", "2024-01-01 10:02:00"),
      (1L, "click", "2024-01-01 10:03:00"))
    val out = EventOps.funnelOn(log).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    assert(out("2_view_click") == 1L)
    assert(out("3_view_click_purchase") == 0L)
  }

  test("funnel is total on a zero-view log: counts 0, rate null") {
    // nobody reaches stage 1, so the conversion base is 0 — the rate
    // must be an explicit NULL (engine-independent), never NaN/0-div
    val log = events(
      (1L, "click", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 11:00:00"))
    val out = EventOps.funnelOn(log).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_users") == 0L)
      assert(r.isNullAt(r.fieldIndex("conv_rate")))
    }
  }

  test("anomaly flags exactly the hours beyond 1.2x the global error rate") {
    // hour 10: 1/4 errors (25%); hour 11: 3/4 (75%); hour 12: 0/4.
    // global = 4/12 (33.3%); 1.2x = 40% -> only hour 11 flagged
    def ev(h: Int, types: String*) = types.zipWithIndex.map { case (t, i) =>
      (1L, t, f"2024-01-01 $h%02d:0$i:00") }
    val log = events(
      (ev(10, "error", "view", "view", "view") ++
       ev(11, "error", "error", "error", "view") ++
       ev(12, "view", "view", "view", "view")): _*)
    val out = EventOps.anomalyOn(log).collect()
    assert(out.length == 1)
    assert(out.head.getTimestamp(0).toString.startsWith("2024-01-01 11"))
    assert(out.head.getAs[Long]("n") == 4L)
    assert(out.head.getAs[Long]("errs") == 3L)
    assert(out.head.getAs[Double]("err_rate") == 0.75)
  }

  test("retention cohorts by first-seen day with per-cohort rates") {
    val log = events(
      // cohort 2024-01-01: users 1 and 2; user 1 returns on day 2
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-03 10:00:00"),
      (2L, "view", "2024-01-01 11:00:00"),
      // cohort 2024-01-02: user 3, also active the next day
      (3L, "view", "2024-01-02 09:00:00"),
      (3L, "view", "2024-01-03 09:00:00"),
      (3L, "view", "2024-01-03 09:30:00")) // same day twice: one cell hit
    val out = EventOps.retentionOn(log).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Int]("day_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_users"),
          r.getAs[Double]("retention"))).toMap
    assert(out(("2024-01-01", 0)) == ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 2)) == ((1L, 2L, 0.5)))
    assert(out(("2024-01-02", 0)) == ((1L, 1L, 1.0)))
    assert(out(("2024-01-02", 1)) == ((1L, 1L, 1.0)))
    assert(out.size == 4)
  }

  // sessionize/attribution need the event_id tie-break column
  private def eventsId(rows: (Long, Long, String, String)*) =
    rows.toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", to_timestamp(col("t")))
      .drop("t")

  test("sessionize splits on >12h gaps and profiles by size class") {
    val log = eventsId(
      // user 1: two events 1h apart, then one 13h later -> sessions
      // of size 2 (dur 3600s) and size 1 (dur 0)
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 11:00:00"),
      (3L, 1L, "view", "2024-01-02 00:00:00"),
      // user 2: single event -> one size-1 session
      (4L, 2L, "view", "2024-01-01 09:00:00"),
      // user 3: gap of EXACTLY 12h does NOT split (strict >)
      (5L, 3L, "view", "2024-01-01 00:00:00"),
      (6L, 3L, "view", "2024-01-01 12:00:00"))
    val out = EventOps.sessionizeOn(log).collect()
      .map(r => r.getAs[Long]("size_bucket") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Double]("avg_dur_sec"))).toMap
    assert(out(1L) == ((2L, 2L, 0.0)))
    // two 2-event sessions: durations 3600 and 43200 -> mean 23400
    assert(out(2L) == ((2L, 4L, 23400.0)))
    assert(out.size == 2)
  }

  test("sessionize caps the size class at 10+") {
    val many = (1L to 12L).map(i =>
      (i, 1L, "view", f"2024-01-01 10:${i}%02d:00"))
    val out = EventOps.sessionizeOn(eventsId(many: _*)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("size_bucket") == 10L)
    assert(out.head.getAs[Long]("n_events") == 12L)
  }

  test("attribution credits the last preceding non-purchase touch") {
    val log = eventsId(
      // user 1: view then click then purchase -> click credited
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:05:00"),
      (3L, 1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: purchase is the FIRST event -> '(none)', null gap
      (4L, 2L, "purchase", "2024-01-01 09:00:00"),
      // user 3: a purchase between touch and purchase does not count
      // as a touch -> both purchases credit the one view
      (5L, 3L, "view", "2024-01-01 08:00:00"),
      (6L, 3L, "purchase", "2024-01-01 08:10:00"),
      (7L, 3L, "purchase", "2024-01-01 08:20:00"))
    val out = EventOps.attributionOn(log).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_users"),
          Option(r.getAs[java.lang.Double]("avg_gap_sec")))).toMap
    assert(out("click") == ((1L, 1L, Some(300.0))))
    assert(out("view") == ((2L, 1L, Some(900.0)))) // (600+1200)/2
    assert(out("(none)") == ((1L, 1L, None)))
    assert(out.size == 3)
  }

  test("attribution same-timestamp touch attributes by event_id order") {
    // touch shares the purchase's timestamp but has a SMALLER event_id:
    // the (us, event_id) frame places it before the purchase -> credited
    val log = eventsId(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "purchase", "2024-01-01 10:00:00"))
    val out = EventOps.attributionOn(log).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "view")
    assert(out.head.getAs[Double]("avg_gap_sec") == 0.0)
  }

  test("transitions count per-user consecutive pairs with row-conditional p") {
    val log = eventsId(
      // user 1: view -> click -> view; user 2: view -> purchase
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:05:00"),
      (3L, 1L, "view", "2024-01-01 10:10:00"),
      (4L, 2L, "view", "2024-01-01 09:00:00"),
      (5L, 2L, "purchase", "2024-01-01 09:30:00"))
    val out = EventOps.transitionsOn(log).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p")))).toMap
    assert(out(("view", "click")) == ((1L, 0.5)))
    assert(out(("view", "purchase")) == ((1L, 0.5)))
    assert(out(("click", "view")) == ((1L, 1.0)))
    assert(out.size == 3) // no cross-user pair (2->4 never adjacent)
  }

  test("dwell: per-type gap stats from each event to the user's next") {
    val log = eventsId(
      // user 1: view --300s--> click --60s--> view (terminal, no gap)
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:05:00"),
      (3L, 1L, "view", "2024-01-01 10:06:00"),
      // user 2: view --30s--> purchase (terminal)
      (4L, 2L, "view", "2024-01-01 09:00:00"),
      (5L, 2L, "purchase", "2024-01-01 09:00:30"))
    val out = EventOps.dwellOn(log).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"),
        r.getAs[Double]("avg_dwell_sec"),
        r.getAs[Double]("max_dwell_sec")))).toMap
    // 'view' starts: 300s (u1 e1) + 30s (u2 e4) -> avg 165, max 300
    assert(out("view") == ((2L, 165.0, 300.0)))
    assert(out("click") == ((1L, 60.0, 60.0)))
    assert(!out.contains("purchase")) // both purchases are terminal
  }

  private def eventsVal(rows: (Long, Long, String, String, Double)*) =
    rows.toDF("event_id", "user_id", "event_type", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
      .drop("t")

  test("ltv: cohort purchase value accumulates across day offsets") {
    val log = eventsVal(
      // user 1+2 cohort Jan-1 (u2 via a non-purchase first touch)
      (1L, 1L, "purchase", "2024-01-01 10:00:00", 10.0),
      (2L, 2L, "view", "2024-01-01 11:00:00", 99.0), // value ignored
      (3L, 1L, "purchase", "2024-01-03 10:00:00", 5.0),
      (4L, 2L, "purchase", "2024-01-03 12:00:00", 7.0),
      // user 3 cohort Jan-2, never purchases -> cohort sized, no cells
      (5L, 3L, "view", "2024-01-02 09:00:00", 50.0))
    val out = EventOps.ltvOn(log).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Int]("day_offset")) ->
        ((r.getAs[Double]("day_value"), r.getAs[Double]("cum_value"),
          r.getAs[Double]("ltv_per_user")))).toMap
    assert(out(("2024-01-01", 0)) == ((10.0, 10.0, 5.0))) // 2 cohort users
    assert(out(("2024-01-01", 2)) == ((12.0, 22.0, 11.0)))
    assert(out.size == 2) // no cells for the purchase-free cohort
  }

  test("resample forward-fills planted hour gaps with the latest hourly value") {
    val log = Seq(
      (1L, 101L, "2024-01-01 10:05:00", 1.0),
      (1L, 102L, "2024-01-01 10:40:00", 2.0), // hr10 keeps the LATER value
      (1L, 103L, "2024-01-01 13:30:00", 5.0), // hrs 11,12 are gaps
      (2L, 201L, "2024-01-01 09:00:00", 7.0)  // single-hour user, no gaps
    ).toDF("user_id", "event_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = EventOps.resampleOn(log).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("sum_fill"))).toMap
    // user 1: hours 10..13 -> fv = 2.0, 2.0, 2.0, 5.0
    assert(out(1L) == ((4L, 2L, 11.0)))
    assert(out(2L) == ((1L, 1L, 7.0)))
  }

  test("resample: argmax tie-break on equal timestamps is the larger event_id") {
    val log = Seq(
      (1L, 5L, "2024-01-01 10:00:00", 1.0),
      (1L, 9L, "2024-01-01 10:00:00", 3.0) // same ts: event_id 9 wins
    ).toDF("user_id", "event_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = EventOps.resampleOn(log).collect()
    assert(out.length == 1 && out.head.getAs[Double]("sum_fill") == 3.0)
  }

  test("interp: closed-form gap sums equal the explicit dense series") {
    val log = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.0),
      (1L, 2L, "2024-01-01 13:00:00", 4.0), // gap 3h: interior 2,3
      (2L, 3L, "2024-01-01 10:00:00", 1.0),
      (2L, 4L, "2024-01-01 12:00:00", 2.0), // gap 2h: interior 1.5
      (3L, 5L, "2024-01-01 09:00:00", 7.0)) // single obs, no gaps
      .toDF("user_id", "event_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = EventOps.interpOn(log).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_obs"),
        r.getAs[Long]("n_hours"), r.getAs[Double]("sum_dense")))).toMap
    assert(out(1L) == ((2L, 4L, 10.0))) // 1+2+3+4
    assert(out(2L) == ((2L, 3L, 4.5)))  // 1+1.5+2
    assert(out(3L) == ((1L, 1L, 7.0)))
    assert(out.size == 3)
  }

  test("sliding uniques: user spanning two hours counted once per shared window") {
    val log = Seq(
      (1L, 1L, "2024-01-01 10:10:00"), // u1 in hour 10
      (1L, 2L, "2024-01-01 11:10:00"), // u1 again in hour 11
      (2L, 3L, "2024-01-01 11:20:00")) // u2 in hour 11
      .toDF("user_id", "event_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = EventOps.slidingUniquesOn(log).collect()
      .map(r => r.getTimestamp(0).toString ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_events")))).toMap
    // a window [w, w+3h) covers hours {w, w+1h, w+2h}; u1 appears in
    // hours 10 and 11 but counts once per shared window
    assert(out("2024-01-01 08:00:00.0") == ((1L, 1L))) // covers h10 only
    assert(out("2024-01-01 09:00:00.0") == ((2L, 3L))) // h09..h11: all 3
    assert(out("2024-01-01 10:00:00.0") == ((2L, 3L))) // h10..h12: all 3
    assert(out("2024-01-01 11:00:00.0") == ((2L, 2L))) // h11 only
    assert(out.size == 4)
  }

  test("encode delta: varint widths follow the 128^b thresholds exactly") {
    val base = 1700000000000000L // µs
    // gaps: 0 (1B), 127 (1B), 128 (2B), 16384 (3B), 2_097_152 (4B)
    val gaps = Seq(0L, 127L, 128L, 16384L, 2097152L)
    val times = gaps.scanLeft(base)(_ + _)
    val log = times.zipWithIndex.map { case (us, i) =>
      (7L, i.toLong, us)
    }.toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = EventOps.encodeDeltaOn(log).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_events") == 6L)
    assert(r.getAs[Long]("raw_bytes") == 48L)
    // first event 8B + 1+1+2+3+4
    assert(r.getAs[Long]("delta_bytes") == 19L)
    assert(r.getAs[Long]("max_gap_us") == 2097152L)
  }
}
