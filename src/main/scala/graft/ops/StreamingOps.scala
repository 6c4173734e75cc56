package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Streaming operator surface (SURVEY.md §2.10), batch form. Each query
  * here is the batch-equivalent DataFrame the harness verifies/benches;
  * the Structured Streaming twins (same logic over readStream with
  * watermarks / session_window / dropDuplicatesWithinWatermark) are
  * built by [[StreamingTwins]] and exercised in the test suite via
  * MemoryStream — the reference has no streaming at all, this is the
  * north star's streaming-capable design.
  */
object StreamingOps {
  private val D = DecimalType(12, 2)
  // Exact decimal internally; DOUBLE on the wire (see Relational.d2).
  private def d2(c: Column): Column = c.cast(DecimalType(38, 2)).cast("double")

  /** q_stream_tumbling — 1h tumbling window counts/sums per event type.
    * Streaming twin: groupBy(window($"ts","1 hour"), ...) + 10 min
    * watermark, append mode. */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        d2(sum(col("value").cast(D))).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** q_stream_sliding — 1h window sliding 15min, count per
    * (window_start, user bucket): each event lands in 4 windows. */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(window(col("ts"), "1 hour", "15 minutes").as("w"),
        (col("user_id") % 10).as("ub"))
      .groupBy(col("w.start").as("wstart"), col("ub"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("wstart"), col("ub"))

  /** q_stream_session — 30-min-inactivity sessionization, batch twin of
    * session_window: a new session starts when the gap from the
    * previous event is strictly greater than 30 minutes (boundary
    * pinned '>' to match the oracle). Session ids are per-user ordinals
    * from a cumulative sum of break flags — one shuffle by user_id. */
  def session(s: SparkSession, d: String): DataFrame =
    sessionOn(Tables.events(s, d))

  /** Core of q_stream_session over any events-shaped frame. */
  def sessionOn(eventsDf: DataFrame): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eventsDf
      .withColumn("prev", lag(col("ts"), 1).over(order))
      .withColumn("brk",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(cum).cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        d2(sum(col("value").cast(D))).as("sum_value"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q_stream_join — stream-stream interval join, batch twin: every
    * purchase pairs with the same user's clicks in the trailing hour
    * (attribution join); per-purchase click count + first/last click.
    * Equi key (user) + time band → SMJ with a residual range predicate,
    * no nested loop. Streaming twin: two watermarked streams with the
    * same interval condition ([[graft.streaming.StreamingTwins
    * .clickAttribution]]) — the watermark + band bound the join state
    * to one hour per side. */
  def streamJoin(s: SparkSession, d: String): DataFrame =
    streamJoinPairsOn(Tables.events(s, d))
      .groupBy(col("p_id"), col("user_id"), col("p_us"))
      .agg(count(lit(1)).as("n_clicks"),
        min(col("c_us")).as("first_click_us"),
        max(col("c_us")).as("last_click_us"))
      .orderBy(col("p_id"))

  /** The purchase×click pair set both twins share (tests compare the
    * streaming join's pairs against exactly this). */
  def streamJoinPairsOn(eventsDf: DataFrame): DataFrame = {
    val clicks = eventsDf.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val purchases = eventsDf.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("user_id"),
        unix_micros(col("p_ts")).as("p_us"),
        unix_micros(col("c_ts")).as("c_us"), col("c_id"))
  }

  /** q_stream_dedup — duplicate handling on a composite key; the batch
    * projection keeps only the key columns so the result is
    * deterministic (dropDuplicates keeps an arbitrary survivor row).
    * Streaming twin: withWatermark + dropDuplicatesWithinWatermark. */
  def dedup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).as("hr"))
      .dropDuplicates("user_id", "event_type", "hr")
      .orderBy(col("user_id"), col("event_type"), col("hr"))

  /** q_stream_late — watermark LATE-ARRIVAL accounting, the batch twin
    * of the question every watermarked streaming job must answer before
    * choosing its delay: "with watermark = max-event-time-seen − 10 min,
    * how many events would arrive late, and by how much?" (Structured
    * Streaming silently DROPS those rows in append mode — this op makes
    * the loss measurable per event type.)
    *
    * Arrival order is SYNTHETIC and deterministic — md5(event_id) (the
    * DuckDB-replayable permutation trick the sampling family pins) — so
    * event-time order and arrival order genuinely diverge like a real
    * out-of-order stream, and both engines replay the identical stream.
    *
    * Scale shape: the watermark is a GLOBAL running max over arrival
    * order — inherently sequential, made distributed with the same
    * two-phase prefix the ranged shard packer uses: range-partition by
    * arrival key → per-partition running max (window, no shuffle) →
    * exclusive prefix-max of the O(partitions) per-range maxima
    * (constant-size single-task window) broadcast back. No task sees
    * more than one range; nothing data-sized crosses the driver.
    * DETERMINISM: all-integer µs arithmetic; the wire is exact counts
    * and an exact µs lateness sum. */
  def late(s: SparkSession, d: String): DataFrame =
    lateOn(Tables.events(s, d),
      s.sessionState.conf.numShufflePartitions)

  /** Core of q_stream_late over any events-shaped frame. */
  def lateOn(eventsDf: DataFrame, numRanges: Int): DataFrame = {
    val delayUs = 600000000L // 10 min
    val ranged = ScratchCache.cache(eventsDf
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"),
        md5(col("event_id").cast("string")).as("ak"))
      .repartitionByRange(numRanges, col("ak"), col("event_id"))
      .sortWithinPartitions(col("ak"), col("event_id"))
      .withColumn("pid", spark_partition_id()))
    val offsets = ranged.groupBy(col("pid")).agg(max(col("t")).as("m"))
      .withColumn("pmax",
        max(col("m")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("pid").as("opid"), col("pmax"))
    val localW = Window.partitionBy(col("pid"))
      .orderBy(col("ak"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("lmax", max(col("t")).over(localW))
      .join(broadcast(offsets), col("pid") === col("opid"))
      // greatest skips nulls; both null ⇔ first arrival ⇒ never late
      .withColumn("wm", greatest(col("lmax"), col("pmax")) - delayUs)
      .withColumn("is_late", col("t") < col("wm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_late"), 1L).otherwise(0L)).as("n_late"),
        coalesce(sum(when(col("is_late"), col("wm") - col("t"))), lit(0L))
          .as("late_us"))
      .orderBy(col("event_type"))
  }
}
