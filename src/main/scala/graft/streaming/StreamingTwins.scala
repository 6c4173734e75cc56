package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming twins of the §2.10 batch operators
  * (SURVEY.md §2.10): the same logical transformations expressed over an
  * unbounded events stream (readStream / MemoryStream) with watermarks
  * bounding state. The reference has no streaming at all — its
  * "streaming" is chunked file iteration (`Common/kgx_file_writer.py`
  * buffered writes); these twins are the north star's streaming-capable
  * design.
  *
  * Each builder takes a STREAMING DataFrame with the events schema
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double) and returns a streaming aggregation. Batch≡streaming
  * equivalence and late-data dropping are asserted in StreamingSpec via
  * MemoryStream.
  *
  * State-size notes for unbounded runs: every groupBy here is keyed by
  * (window × small dimension) or per-user session windows, and the
  * watermark lets Spark evict windows older than the lateness bound —
  * state is O(active windows), not O(stream length).
  */
/** Per-user state for [[StreamingTwins.eventsSinceSignup]] (top-level so
  * an Encoder TypeTag exists). */
case class SignupState(signedUp: Boolean, n: Long)

/** Per-user state for [[StreamingTwins.funnelStages]] (µs of each
  * stage's first-touch arrival; -1 = not reached). */
case class FunnelState(vUs: Long, cUs: Long, pUs: Long)

/** Per-user state for [[StreamingTwins.retentionCells]]: first-seen
  * epoch day and the day-offsets already emitted (bounded by the
  * active-day span, not the stream length). */
case class RetentionState(cohortDay: Int, seen: Seq[Int])

/** Per-user state for [[StreamingTwins.attributionCredits]]: the most
  * recent non-purchase touch (type + µs); touchUs = -1 ⇒ no touch yet. */
case class TouchState(touchType: String, touchUs: Long)

/** transformWithState processor (Spark 4 stateful API, the successor to
  * flatMapGroupsWithState): per-user running count of events since the
  * first signup, with explicit ValueState. Requires the RocksDB state
  * store provider when run in a streaming query. */
class SignupCounterProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String), (Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var st: ValueState[SignupState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SignupState]("signup_state",
      Encoders.product[SignupState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    var s = Option(st.get()).getOrElse(SignupState(signedUp = false, 0L))
    val out = rows.flatMap { case (_, et) =>
      if (et == "signup" && !s.signedUp) {
        s = SignupState(signedUp = true, 0L); None
      } else if (s.signedUp) {
        s = s.copy(n = s.n + 1); Some((key, s.n))
      } else None
    }.toList
    st.update(s)
    out.iterator
  }
}

/** transformWithState port of [[StreamingTwins.funnelStages]] (r12
  * migration probe — the Spark 4 forward API for custom state): the
  * SAME per-user first-touch funnel logic as the
  * flatMapGroupsWithState twin, with the FunnelState carried in an
  * explicit ValueState. Differences that matter for the migration
  * decision (PLANS.md r12 note): state is a named, typed handle
  * (multiple states per key compose; TTL is declarative via
  * TTLConfig instead of hand-rolled timeout juggling), init is
  * explicit, and the processor object is reusable across queries —
  * but the query REQUIRES the RocksDB state store provider, which the
  * HDFS-backed default does not satisfy. A/B'd against the
  * flatMapGroupsWithState twin in StreamingSpec. */
class FunnelStagesProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, String), (Long, String, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var st: ValueState[FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[FunnelState]("funnel_state",
      Encoders.product[FunnelState], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, String)],
      timerValues: TimerValues): Iterator[(Long, String, Long)] = {
    var s = Option(st.get()).getOrElse(FunnelState(-1L, -1L, -1L))
    val out = rows.toSeq.sortBy(_._2).flatMap { case (_, us, et) =>
      if (et == "view" && s.vUs < 0) {
        s = s.copy(vUs = us); Some((key, "1_view", us))
      } else if (et == "click" && s.vUs >= 0 && us > s.vUs && s.cUs < 0) {
        s = s.copy(cUs = us); Some((key, "2_view_click", us))
      } else if (et == "purchase" && s.cUs >= 0 && us > s.cUs && s.pUs < 0) {
        s = s.copy(pUs = us); Some((key, "3_view_click_purchase", us))
      } else None
    }
    st.update(s)
    out.iterator
  }
}

/** transformWithState port of [[StreamingTwins.attributionCredits]]
  * (r13 migration — the first twin that NEEDS the new API): the same
  * last-touch credit logic, with the carried TouchState in an explicit
  * ValueState that can take a DECLARATIVE TTL. A marketing-attribution
  * deployment does not credit a touch forever — "a click older than N
  * days earns nothing" — and under flatMapGroupsWithState that policy
  * is hand-rolled timeout bookkeeping (per-key timers + manual
  * expiry-vs-data interleaving). Here it is one TTLConfig: the STORE
  * evicts a touch not refreshed within the TTL, so a purchase arriving
  * after expiry reads empty state and credits '(none)' with the
  * first-event sentinel gap — no user code ever checks a clock.
  * ttlMs <= 0 runs with TTLConfig.NONE and is row-identical to the
  * flatMapGroupsWithState twin (A/B'd in StreamingSpec, the r12
  * funnel-probe method); TTL eviction itself is spec'd with a
  * microscopic TTL across two triggers. Requires RocksDB state store;
  * TTL requires TimeMode.ProcessingTime. */
class AttributionCreditsProcessor(ttlMs: Long = -1L)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long, String), (Long, String, Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var st: ValueState[TouchState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TouchState]("touch_state",
      Encoders.product[TouchState],
      if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
      else TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long, String)],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] = {
    var s = Option(st.get()).getOrElse(TouchState("(none)", -1L))
    var touched = false
    val out = rows.toSeq.sortBy(r => (r._3, r._2))
      .flatMap { case (_, _, us, et) =>
        if (et != "purchase") { s = TouchState(et, us); touched = true; None }
        else Some((key, s.touchType, us,
          if (s.touchUs < 0) Long.MinValue else us - s.touchUs))
      }
    // write state ONLY when the batch carried a touch: an unconditional
    // update would let purchase-only batches refresh the carried
    // touch's TTL (and re-persist the '(none)' sentinel after
    // eviction), defeating "a click older than N days earns nothing"
    // for users whose purchases keep arriving — the stored touch must
    // age out on ITS OWN clock
    if (touched) st.update(s)
    out.iterator
  }
}

/** transformWithState port of [[StreamingTwins.retentionCells]] (r14 —
  * completes the dual-API coverage: every flatMapGroupsWithState twin
  * now has a transformWithState twin): the cohort day rides a
  * ValueState and the emitted offsets a typed LISTSTATE — the
  * composite state surface the new API adds over fMGWS's single
  * value. Appending the trigger's new offsets is ListState.appendList
  * (an RocksDB merge op) instead of rewriting the whole seen-set
  * value every trigger, which is the right write amplification for a
  * state that only ever GROWS by small deltas. Output-identical to
  * the fMGWS twin (A/B'd in StreamingSpec on the same multi-trigger
  * input). Requires RocksDB state store. */
class RetentionCellsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Int), (Long, Int, Int)] {
  import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  import org.apache.spark.sql.Encoders

  @transient private var cohort: ValueState[Int] = _
  @transient private var seen: ListState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cohort = getHandle.getValueState[Int]("cohort_day",
      Encoders.scalaInt, TTLConfig.NONE)
    seen = getHandle.getListState[Int]("seen_offsets",
      Encoders.scalaInt, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Int)],
      timerValues: TimerValues): Iterator[(Long, Int, Int)] = {
    var cd = if (cohort.exists()) cohort.get() else -1
    val seenSet = scala.collection.mutable.Set[Int]()
    if (seen.exists()) seen.get().foreach(seenSet += _)
    val newOffsets = scala.collection.mutable.ArrayBuffer[Int]()
    val out = rows.toSeq.sorted.flatMap { case (_, day) =>
      if (cd < 0) {
        cd = day; cohort.update(day)
        newOffsets += 0; seenSet += 0
        Some((key, day, 0))
      } else if (day >= cd && !seenSet.contains(day - cd)) {
        val off = day - cd
        newOffsets += off; seenSet += off
        Some((key, cd, off))
      } else None
    }
    if (newOffsets.nonEmpty) seen.appendList(newOffsets.toArray)
    out.iterator
  }
}

object StreamingTwins {
  private val D = DecimalType(12, 2)

  /** q_stream_tumbling twin: 1h tumbling counts/sums per event type,
    * 10-minute watermark (append mode emits a window only once it can
    * no longer receive late rows). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(D)).cast(DecimalType(38, 2)).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))

  /** q_stream_sliding twin: 1h window every 15 min per user bucket. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        (col("user_id") % 10).as("ub"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("ub"), col("n"))

  /** q_stream_session twin: built-in session_window with a 30-minute
    * inactivity gap — Spark merges windows whose gap is ≤ 30 min, the
    * batch twin starts a new session when the gap is strictly > 30 min:
    * identical boundary semantics. */
  def session(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D)).cast(DecimalType(38, 2)).as("sum_value"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
      .select(col("user_id"), col("n_events"), col("sum_value"),
        col("start_us"), col("end_us"))

  /** q_stream_dedup twin: exactly-once semantics over a duplicated
    * input — duplicates of event_id arriving within the watermark are
    * dropped with bounded state. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** q_stream_join twin — STREAM-STREAM interval join: purchases join
    * the same user's clicks from the trailing hour. Both sides carry
    * watermarks and the join condition bands the two event-time
    * columns, so Spark provably evicts click state older than
    * (watermark + 1 hour) and purchase state older than the watermark —
    * bounded state on unbounded streams. Inner join: a purchase with no
    * clicks in the window emits nothing (same as the batch twin). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "10 minutes")
    val p = purchases
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    p.join(c,
        col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("user_id"),
        unix_micros(col("p_ts")).as("p_us"),
        unix_micros(col("c_ts")).as("c_us"), col("c_id"))
  }

  /** Stateful custom operator (§2.10 capability row): per-user running
    * count of events since that user's first signup, via
    * flatMapGroupsWithState — the GroupState surface the reference's
    * in-memory accumulators map onto. Test-only (no deterministic file
    * output ordering). */
  def eventsSinceSignup(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoders, Row}
    val typed = events.select(col("user_id"), col("event_type"))
      .as[(Long, String)](Encoders.product[(Long, String)])
    typed
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SignupState, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[SignupState]) =>
          var st = state.getOption.getOrElse(SignupState(signedUp = false, 0L))
          val out = rows.flatMap { case (_, et) =>
            if (et == "signup" && !st.signedUp) {
              st = SignupState(signedUp = true, 0L); None
            } else if (st.signedUp) {
              st = st.copy(n = st.n + 1); Some((user, st.n))
            } else None
          }.toList
          state.update(st)
          out.iterator
      }(Encoders.product[SignupState], Encoders.product[(Long, Long)])
      .toDF("user_id", "events_since_signup")
  }

  /** q_events_funnel streaming twin — per-user first-touch stage
    * tracking via flatMapGroupsWithState: emits (user_id, stage, us)
    * the moment a user first reaches each funnel stage, under the same
    * strict ordering rule as the batch [[graft.ops.EventOps.funnelOn]]
    * (stage k+1 needs an event strictly later than the stage-k
    * first-touch). Rows within a trigger are applied in event-time
    * order; ACROSS triggers the twin assumes per-user event-time order
    * (the usual one-pass streaming caveat — an earlier view arriving
    * after a later one was processed cannot retroactively rewrite
    * first-touch; batch replay is the reconciliation path). State is
    * three timestamps per user — O(users), independent of stream
    * length. The funnel REPORT is the downstream count of distinct
    * users per emitted stage (StreamingSpec compares it against the
    * batch funnel's counts). */
  def funnelStages(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.Encoders
    val typed = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .as[(Long, Long, String)](Encoders.product[(Long, Long, String)])
    typed
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, (Long, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = rows.toSeq.sortBy(_._2).flatMap { case (_, us, et) =>
            if (et == "view" && st.vUs < 0) {
              st = st.copy(vUs = us); Some((user, "1_view", us))
            } else if (et == "click" && st.vUs >= 0 && us > st.vUs &&
                st.cUs < 0) {
              st = st.copy(cUs = us); Some((user, "2_view_click", us))
            } else if (et == "purchase" && st.cUs >= 0 && us > st.cUs &&
                st.pUs < 0) {
              st = st.copy(pUs = us)
              Some((user, "3_view_click_purchase", us))
            } else None
          }
          state.update(st)
          out.iterator
      }(Encoders.product[FunnelState],
        Encoders.product[(Long, String, Long)])
      .toDF("user_id", "stage", "us")
  }

  /** [[funnelStages]] on the transformWithState API
    * ([[FunnelStagesProcessor]]) — the r12 migration probe.
    * Semantically identical (StreamingSpec asserts output equality on
    * the same multi-trigger input); requires RocksDB state store. */
  def funnelStagesTws(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .as[(Long, Long, String)](Encoders.product[(Long, Long, String)])
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new FunnelStagesProcessor,
        TimeMode.None, OutputMode.Append)(
        Encoders.product[(Long, String, Long)])
      .toDF("user_id", "stage", "us")
  }

  /** q_events_retention streaming twin — per-user cohort assignment and
    * emit-once day-offset cells via flatMapGroupsWithState: the first
    * event pins the user's cohort (first-seen epoch day, in-order
    * caveat as [[funnelStages]]), every later event emits
    * (user_id, cohort_day, day_offset) the first time that offset is
    * seen. The retention MATRIX is the downstream (cohort, offset)
    * count of these cells — exactly [[graft.ops.EventOps.retentionOn]]'s
    * n_active (StreamingSpec asserts cell-for-cell equality). State per
    * user is the cohort day + emitted offsets: O(active days), not
    * O(events). */
  def retentionCells(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.Encoders
    val typed = events
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("day"))
      .as[(Long, Int)](Encoders.product[(Long, Int)])
    typed
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[RetentionState, (Long, Int, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          var st = state.getOption.getOrElse(RetentionState(-1, Seq.empty))
          val out = rows.toSeq.sorted.flatMap { case (_, day) =>
            if (st.cohortDay < 0) {
              st = RetentionState(day, Seq(0)); Some((user, day, 0))
            } else if (day >= st.cohortDay &&
                !st.seen.contains(day - st.cohortDay)) {
              val off = day - st.cohortDay
              st = st.copy(seen = st.seen :+ off)
              Some((user, st.cohortDay, off))
            } else None
          }
          state.update(st)
          out.iterator
      }(Encoders.product[RetentionState],
        Encoders.product[(Long, Int, Int)])
      .toDF("user_id", "cohort_day", "day_offset")
  }

  /** [[retentionCells]] on the transformWithState API
    * ([[RetentionCellsProcessor]]: ValueState cohort + ListState
    * offsets). Semantically identical — StreamingSpec asserts output
    * equality on the same multi-trigger input; requires RocksDB. */
  def retentionCellsTws(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    events
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("day"))
      .as[(Long, Int)](Encoders.product[(Long, Int)])
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new RetentionCellsProcessor,
        TimeMode.None, OutputMode.Append)(
        Encoders.product[(Long, Int, Int)])
      .toDF("user_id", "cohort_day", "day_offset")
  }

  /** q_events_attribution streaming twin — last-touch credit assignment
    * via flatMapGroupsWithState: per-user state is ONLY the most recent
    * non-purchase touch (one type + one µs per user — O(users),
    * independent of stream length); every purchase emits
    * (user_id, touch_type, purchase_us, gap_us) the moment it arrives,
    * crediting the carried touch ('(none)' / gap Long.MinValue when the
    * purchase is the user's first event — a RESERVED sentinel, so any
    * OTHER negative gap can only mean cross-trigger event-time disorder
    * and is detectable downstream instead of masquerading as a
    * first-event row; ADVICE r8). Rows within a trigger are applied in
    * (us, event_id) order, reproducing the batch window's
    * excludes-current-row frame (a touch sharing the purchase's
    * timestamp but ordered before it still gets the credit); across
    * triggers the twin assumes per-user event-time order, the same
    * one-pass caveat as [[funnelStages]]. The attribution REPORT is the
    * downstream per-touch-type aggregate of these credits —
    * StreamingSpec asserts it equals the batch
    * [[graft.ops.EventOps.attributionOn]] report row-for-row.
    *
    * MEMORY CONTRACT (the whole-trigger buffering decision): this
    * low-latency twin sorts each user's per-trigger rows on the task
    * heap (`rows.toSeq.sortBy`), which is O(user's rows in the
    * trigger). That is deliberate, not an oversight: resolving "latest
    * touch before each purchase" over an UNORDERED group iterator is
    * information-theoretically O(touches) — any touch may be the
    * predecessor of a purchase that arrives later in the iterator, so
    * no exact one-pass bounded-state algorithm exists, and
    * flatMapGroupsWithState offers no engine-side ordering. Use this
    * twin when per-user per-trigger volume is bounded (interactive
    * attribution over keyed sessions). For hot-user / firehose
    * triggers use [[attributionCreditsBatched]], which moves the
    * (us, event_id) ordering into a batch WINDOW — Tungsten external
    * sort, spill-capable, zero user-code buffering — and carries the
    * same one-row-per-user state across triggers idempotently. */
  def attributionCredits(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.Encoders
    val typed = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .as[(Long, Long, Long, String)](
        Encoders.product[(Long, Long, Long, String)])
    typed
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[TouchState, (Long, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          var st = state.getOption.getOrElse(TouchState("(none)", -1L))
          val out = rows.toSeq.sortBy(r => (r._3, r._2))
            .flatMap { case (_, _, us, et) =>
              if (et != "purchase") { st = TouchState(et, us); None }
              else Some((user, st.touchType, us,
                if (st.touchUs < 0) Long.MinValue else us - st.touchUs))
            }
          state.update(st)
          out.iterator
      }(Encoders.product[TouchState],
        Encoders.product[(Long, String, Long, Long)])
      .toDF("user_id", "touch_type", "purchase_us", "gap_us")
  }

  /** [[attributionCredits]] on the transformWithState API
    * ([[AttributionCreditsProcessor]]) — r13 migration. ttlMs > 0
    * turns on declarative state TTL (processing-time), the capability
    * the old API could not express without hand-rolled timers;
    * ttlMs <= 0 is row-identical to the flatMapGroupsWithState twin.
    * Requires RocksDB state store. */
  def attributionCreditsTws(events: DataFrame, ttlMs: Long = -1L)
      : DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .as[(Long, Long, Long, String)](
        Encoders.product[(Long, Long, Long, String)])
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new AttributionCreditsProcessor(ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime else TimeMode.None,
        OutputMode.Append)(
        Encoders.product[(Long, String, Long, Long)])
      .toDF("user_id", "touch_type", "purchase_us", "gap_us")
  }

  /** Hot-user-safe attribution twin: the same last-touch credit
    * semantics as [[attributionCredits]], restructured so NO user code
    * ever buffers a user's trigger rows. Each micro-batch is processed
    * as a BATCH plan inside foreachBatch: the (us, event_id) ordering
    * that the state-op twin does on the task heap becomes a window
    * (`last(touch) IGNORE NULLS OVER (PARTITION BY user ORDER BY us,
    * event_id ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)`) — Tungsten's
    * external sort, which SPILLS, so one user with millions of rows in
    * a trigger degrades to disk, never to OOM. Purchases with no
    * in-batch predecessor fall back to the carried per-user state (ONE
    * row per user: the max-(us, event_id) touch), persisted to
    * `stateDir/batch_<id>` and read back as `batch_<id-1>` — slot
    * keyed by micro-batch id, so a REPLAYED batch overwrites itself:
    * the same idempotent exactly-once recipe as [[normalizeStream]].
    * Credits land in `outDir/batch_<id>` (read the whole dir for the
    * stream-to-date ledger). Cross-trigger event-time order is assumed
    * exactly as in the state-op twin.
    *
    * Scale shape: per trigger this is one windowed pass over the batch
    * plus two bounded-size joins against the O(users) state frame —
    * shuffle on user_id only, broadcast-eligible when the active-user
    * set is small. State growth is O(distinct users), not O(events). */
  def attributionCreditsBatched(events: DataFrame, stateDir: String,
      outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val typed = batch
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("event_type"))
          .persist()
        try {
          val prevDir = new java.io.File(s"$stateDir/batch_${id - 1}")
          val prev =
            if (prevDir.exists)
              s.read.parquet(prevDir.getPath)
                .select(col("user_id"), col("touch_type").as("p_type"),
                  col("touch_us").as("p_us"))
            else Seq.empty[(Long, String, Long)]
              .toDF("user_id", "p_type", "p_us")
          // engine-side ordering: the window sort replaces the state
          // op's rows.toSeq.sortBy — external sort, spill-capable
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(col("us"), col("event_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)
          val credits = typed
            .withColumn("prev_touch",
              last(when(col("event_type") =!= "purchase",
                struct(col("event_type").as("t"), col("us").as("u"))),
                ignoreNulls = true).over(w))
            .filter(col("event_type") === "purchase")
            .join(prev, Seq("user_id"), "left")
            .select(col("user_id"),
              coalesce(col("prev_touch.t"), col("p_type"), lit("(none)"))
                .as("touch_type"),
              col("us").as("purchase_us"),
              when(col("prev_touch.u").isNotNull,
                  col("us") - col("prev_touch.u"))
                .when(col("p_us").isNotNull && col("p_us") >= 0,
                  col("us") - col("p_us"))
                .otherwise(lit(Long.MinValue)).as("gap_us"))
          credits.write.mode("overwrite").parquet(s"$outDir/batch_$id")
          // new state: the batch's max-(us, event_id) touch per user
          // overrides the carried one (cross-trigger order assumption)
          val lastTouch = typed
            .filter(col("event_type") =!= "purchase")
            .groupBy(col("user_id"))
            .agg(max(struct(col("us"), col("event_id"),
              col("event_type"))).as("m"))
            .select(col("user_id"), col("m.event_type").as("b_type"),
              col("m.us").as("b_us"))
          prev.join(lastTouch, Seq("user_id"), "full")
            .select(col("user_id"),
              coalesce(col("b_type"), col("p_type")).as("touch_type"),
              coalesce(col("b_us"), col("p_us")).as("touch_us"))
            .write.mode("overwrite").parquet(s"$stateDir/batch_$id")
        } finally typed.unpersist()
        ()
    }

  /** Continuous-ingest EP2: raw CURIEs arrive on a stream and every
    * micro-batch runs the SAME batched transport the batch path uses
    * ([[graft.ops.NodeNorm.normalizeBatched]] — mapPartitions POSTs of
    * ≤batchSize ids, parse, failure-file twin). Both writes are keyed
    * by the micro-batch id (`outDir/batch_<id>` mapping parquet,
    * `failRoot/batch_<id>` failure jsonl), so a REPLAYED micro-batch
    * overwrites its own slot — the idempotent exactly-once recipe the
    * foreachBatch sink twin pins down. Returns the DataStreamWriter;
    * the caller `.start()`s it.
    *
    * Scratch note: each micro-batch's transport cache is fully
    * consumed by its own writes, so the batch handler drains
    * [[graft.ops.ScratchCache]] — state never grows with stream
    * length. Run the stream from a session that doesn't hold its own
    * scratch registrations across micro-batches. */
  def normalizeStream(ids: DataFrame, idCol: String, batchSize: Int,
      transport: graft.ops.NormTransport, outDir: String,
      failRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    ids.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        graft.ops.NodeNorm.normalizeBatched(batch, idCol, batchSize,
            transport, s"$failRoot/batch_$id")
          .write.mode("overwrite").parquet(s"$outDir/batch_$id")
        graft.ops.ScratchCache.releaseAll()
    }
}
