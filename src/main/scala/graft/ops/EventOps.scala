package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import scala.util.chaining._

/** Behavioral-analytics operators over the events table (SURVEY.md
  * §2.10 additions): ordered funnel conversion and cohort retention —
  * the two queries every product-telemetry warehouse runs daily,
  * absent from the reference (batch ETL only) but core to the north
  * star's analytics surface.
  *
  * Scale notes common to both: every stage keys by `user_id`, so the
  * per-user aggregates and the user-level joins all reuse ONE hash
  * partitioning of the events scan — Catalyst plans the min-aggregates
  * partial (map-side combine) and the joins as shuffle hash/SMJ on the
  * already-exchanged key, never a nested loop. Nothing here collects:
  * the only driver-visible values are the final few-row reports.
  */
object EventOps {

  /** q_events_funnel — strictly-ordered 3-stage funnel
    * (view → click → purchase): a user reaches stage k+1 only with an
    * event strictly LATER (µs) than their earliest stage-k arrival —
    * the "first-touch" funnel semantics analytics warehouses default
    * to. Output: one row per stage with the user count and the
    * conversion rate from stage 1.
    *
    * Plan shape: three per-user min-aggregates chained by equi joins
    * on user_id (each join's right side is the previous stage's
    * (user, first_ts) — same key, same partitioning, no extra
    * exchange of the big side), then three single-row counts unioned
    * with the stage-1 count broadcast for the rate. At 100 TB the
    * events scan shuffles ONCE by user_id; everything after is
    * partition-local. */
  def funnel(s: SparkSession, d: String): DataFrame =
    funnelOn(Tables.events(s, d))

  /** Core of q_events_funnel over any events-shaped frame. */
  def funnelOn(eventsDf: DataFrame): DataFrame = {
    val e = eventsDf.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    val counts = Seq(
        ("1_view", v), ("2_view_click", c), ("3_view_click_purchase", p))
      .map { case (stage, df) =>
        df.agg(count(lit(1)).cast("long").as("n_users"))
          .withColumn("stage", lit(stage)) }
      .reduce(_ unionByName _)
    // 3 rows × 1 row, joined on a non-foldable all-zeros key: a plain
    // crossJoin would plan as a (constant-size but census-breaking)
    // BroadcastNestedLoopJoin — the equi key keeps it a hash join
    val base = v.agg(count(lit(1)).cast("double").as("base"))
      .withColumn("k", pmod(hash(col("base")), lit(1)))
    counts.withColumn("k", pmod(hash(col("n_users")), lit(1)))
      .join(broadcast(base), "k")
      .select(col("stage"), col("n_users"),
        // explicit null (not engine-dependent 0/0) when nobody reached
        // stage 1 — funnelOn stays total on arbitrary events frames
        when(col("base") > 0,
          round(col("n_users") / col("base"), 6)).as("conv_rate"))
      .orderBy(col("stage"))
  }

  /** q_events_anomaly — hourly error-rate spike detection: flag every
    * hour whose error rate exceeds 1.2× the global baseline — the
    * ops-analytics sibling of the behavioral queries (and, for a
    * training pipeline, the "did a crawl source start erroring"
    * monitor). The comparison is a pure INTEGER cross-multiplication
    * (`e·tnₜₒₜ·5 > eₜₒₜ·n·6`, promoted to DECIMAL(38,0) so 100 TB row
    * counts cannot overflow a long) — no float accumulation anywhere,
    * so the flag set is exact and partition-order independent; the
    * one rate on the wire divides exact counts once and rounds.
    *
    * Plan shape: one hour-bucket hash aggregate, a 1-row global
    * aggregate broadcast back on the non-foldable all-zeros key (a
    * literal key would constant-fold the join into a BNLJ), row-local
    * flag filter. The hourly frame is bounded (8.8k rows/year) —
    * everything data-sized happens in the first aggregate. */
  def anomaly(s: SparkSession, d: String): DataFrame =
    anomalyOn(Tables.events(s, d))

  /** Core of q_events_anomaly over any events-shaped frame. */
  def anomalyOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val big = (c: Column) => c.cast(DecimalType(38, 0))
    val hourly = eventsDf
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errs"))
    val totals = hourly
      .agg(sum(col("n")).as("tn"), sum(col("errs")).as("te"))
      .withColumn("k", k0(col("tn")))
    hourly.withColumn("k", k0(col("n")))
      .join(broadcast(totals), "k")
      .filter(big(col("errs")) * big(col("tn")) * 5 >
        big(col("te")) * big(col("n")) * 6)
      .select(col("hr"), col("n"), col("errs"),
        round(col("errs").cast("double") / col("n"), 6).as("err_rate"))
      .orderBy(col("hr"))
  }

  /** q_events_sessionize — gap-based sessionization, THE prerequisite
    * of every behavioral pipeline (and, for training data, the
    * "group a user's crawl hits into browse sessions" pass): a new
    * session starts at a user's first event or after a >12 h silence;
    * sessions are then profiled by size (events per session, capped at
    * 10+) with the exact event count and mean duration per size class.
    *
    * Plan shape: ONE user-keyed exchange feeds both windows (lag +
    * running sum differ only in frame, so Catalyst stacks the two
    * Window operators directly on one shared exchange + sort) and the
    * per-(user, session) aggregate reuses the same partitioning; the
    * size-class rollup is a ≤10-row hash aggregate. At 100 TB the
    * events scan shuffles once; nothing else is data-sized.
    * DETERMINISM: ties are ordered by (us, event_id); durations are
    * exact integer µs summed in DECIMAL(38,0) (a long could overflow
    * at 100 TB session counts); the one division is exact-integer /
    * exact-integer → double, rounded to 6dp identically. */
  def sessionize(s: SparkSession, d: String): DataFrame =
    sessionizeOn(Tables.events(s, d))

  /** Core of q_events_sessionize over any events-shaped frame. */
  def sessionizeOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val gapUs = 43200000000L // 12 h
    val e = eventsDf.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val flagged = e
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = flagged
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"),
        (max(col("us")) - min(col("us"))).as("dur"))
    sessions
      .groupBy(least(col("n"), lit(10L)).as("size_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n")).cast("long").as("n_events"),
        // denominator promoted to decimal: count·10^6 would overflow a
        // long (ANSI throw) around 9e12 sessions — reachable at 100 TB
        round(sum(col("dur").cast(DecimalType(38, 0))).cast("double")
          / (count(lit(1)).cast(DecimalType(38, 0)) * 1000000L)
            .cast("double"), 6).as("avg_dur_sec"))
      .orderBy(col("size_bucket"))
  }

  /** q_events_sequence — SEQUENCE-PATTERN matching with an EXCLUSION
    * condition (r12), the MATCH_RECOGNIZE-shaped op plain funnels
    * can't express: a purchase MATCHES iff the same user had a `view`
    * within the preceding hour AND no `error` event intervened between
    * that view and the purchase. Funnels (q_events_funnel) check
    * ordered reachability; the exclusion ("no C between A and B") is
    * the extra power — the abandoned-cart / poisoned-session analysis
    * shape. Wire: per user-decile (n_purchases, n_matched, n_blocked
    * — a qualifying view existed but an error intervened, n_no_view).
    *
    * HOW: one user-keyed window ordered by (us, event_id) — the
    * deterministic total order both engines replay — carrying three
    * running facts per row via frame-bounded aggregates: the last
    * preceding view's µs, the last preceding view's POSITION and the
    * last preceding error's POSITION (positions = row_number in the
    * same order, so "error between view and purchase" is a pure
    * integer comparison, immune to timestamp ties). Purchases then
    * classify row-locally.
    *
    * Scale shape: ONE exchange by user feeds row_number + the three
    * frame aggregates (same window spec ⇒ Catalyst stacks them on one
    * sort), then a ≤10-row hash rollup. Nothing else is data-sized —
    * the same single-shuffle contract as sessionize. */
  def sequenceMatch(s: SparkSession, d: String): DataFrame =
    sequenceMatchOn(Tables.events(s, d))

  /** Core of q_events_sequence over any events-shaped frame. */
  def sequenceMatchOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val windowUs = 3600000000L // 1 h
    val e = eventsDf.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val flagged = e
      .withColumn("rn", row_number().over(w))
      .withColumn("lv_us",
        max(when(col("event_type") === "view", col("us"))).over(prior))
      .withColumn("lv_rn",
        max(when(col("event_type") === "view", col("rn"))).over(prior))
      .withColumn("le_rn",
        max(when(col("event_type") === "error", col("rn"))).over(prior))
    flagged.filter(col("event_type") === "purchase")
      .select((col("user_id") % 10).as("decile"),
        when(col("lv_us").isNull || col("lv_us") < col("us") - windowUs,
          "no_view")
          .when(col("le_rn").isNotNull && col("le_rn") > col("lv_rn"),
            "blocked")
          .otherwise("matched").as("cls"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_purchases"),
        sum((col("cls") === "matched").cast("long")).as("n_matched"),
        sum((col("cls") === "blocked").cast("long")).as("n_blocked"),
        sum((col("cls") === "no_view").cast("long")).as("n_no_view"))
      .orderBy(col("decile"))
  }

  /** q_events_attribution — last-touch conversion attribution: each
    * purchase is credited to the user's most recent PRECEDING
    * non-purchase event type (the "which touchpoint closed the sale"
    * report; '(none)' when the purchase is the user's first event),
    * with the purchase count, distinct converting users, and the mean
    * touch→purchase gap per touch type.
    *
    * Plan shape: a single IGNORE NULLS last_value window over the
    * user-keyed ordering — the classic "carry the last non-null
    * forward" formulation, ONE exchange + ONE sort, no self-join of
    * events against events (an events⋈events as-of per purchase would
    * shuffle the table twice and explode on hot users). The window's
    * frame excludes the current row, so a purchase never attributes to
    * itself even when a touch shares its timestamp.
    * DETERMINISM: (us, event_id) ordering; gaps are exact integer µs
    * in DECIMAL(38,0); the division is guarded (explicit NULL for the
    * '(none)' class, never an engine-dependent 0/0). */
  def attribution(s: SparkSession, d: String): DataFrame =
    attributionOn(Tables.events(s, d))

  /** Core of q_events_attribution over any events-shaped frame. */
  def attributionOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val e = eventsDf.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = e
      .withColumn("touch", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(w))
      .withColumn("touch_us", last(
        when(col("event_type") =!= "purchase", col("us")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
    touched
      .groupBy(coalesce(col("touch"), lit("(none)")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        when(count(col("touch_us")) > 0,
          round(sum((col("us") - col("touch_us"))
              .cast(DecimalType(38, 0))).cast("double")
            / (count(col("touch_us")).cast(DecimalType(38, 0))
              * 1000000L).cast("double"), 6)).as("avg_gap_sec"))
      .orderBy(col("touch_type"))
  }

  /** q_events_retention — cohort retention matrix: users cohorted by
    * first-seen day; cell (cohort, k) counts distinct cohort members
    * active k days after their first day, with the retention rate
    * against the cohort size. THE engagement query (and, for training
    * pipelines, the "does a crawl snapshot keep contributing docs
    * across dedup generations" twin).
    *
    * Plan shape: per-user min-day aggregate, joined back to the
    * per-(user, day) activity on user_id (one shared partitioning with
    * the aggregate), distinct to (user, cohort, offset), then a
    * cohort×offset hash aggregate; cohort sizes are a ≤(days)-row
    * frame that BROADCASTS back for the rate. The month of synthetic
    * data yields ≤ 30×30 cells; at 100 TB the matrix is still tiny —
    * only the user-keyed exchange scales with the data. */
  def retention(s: SparkSession, d: String): DataFrame =
    retentionOn(Tables.events(s, d))

  /** Core of q_events_retention over any events-shaped frame. */
  def retentionOn(eventsDf: DataFrame): DataFrame = {
    val days = eventsDf.select(col("user_id"), to_date(col("ts")).as("day"))
    val first = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val active = days.join(first, "user_id")
      .select(col("user_id"), col("cohort"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .distinct()
    val sizes = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    active.groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("day_offset"), col("n_active"),
        col("cohort_users"),
        round(col("n_active").cast("double") / col("cohort_users"), 6)
          .as("retention"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** q_events_dwell — time-to-next-event (dwell) statistics per event
    * type: for each event, the gap to the SAME user's next event (any
    * type); per starting type the count of non-terminal events, the
    * mean gap, and the max gap in seconds. The "how long do users sit
    * on this screen" report, and the timing complement of
    * [[transitions]]' type-to-type counts.
    *
    * Plan shape: the same single user-keyed sort+window pass as
    * transitions (lead instead of lag) into a ≤|types|-row hash
    * aggregate — one exchange, nothing after the aggregate scales with
    * the data. DETERMINISM: gaps are exact integer µs; the mean is an
    * exact DECIMAL(38,0) sum over µs divided as double (gap sums stay
    * far below 2^53 µs·rows for any month-long window — at a 100 TB
    * year-long log the sum still fits DECIMAL(38,0) exactly and the
    * double wire division is the only rounding step, 6 dp both
    * engines); max is a single µs value, exact in double. */
  def dwell(s: SparkSession, d: String): DataFrame =
    dwellOn(Tables.events(s, d))

  /** Core of q_events_dwell over any events-shaped frame. */
  def dwellOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val e = eventsDf.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    e.withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("gap_us", col("next_us") - col("us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("gap_us").cast(DecimalType(38, 0))).cast("double")
          / (count(lit(1)).cast(DecimalType(38, 0)) * 1000000L)
            .cast("double"), 6).as("avg_dwell_sec"),
        round(max(col("gap_us")).cast("double") / 1000000.0, 6)
          .as("max_dwell_sec"))
      .orderBy(col("event_type"))
  }

  /** q_events_ltv — cohort lifetime-value curve: users cohorted by
    * first-seen day (as [[retention]]); per (cohort, day_offset) the
    * purchase value that offset contributed and the RUNNING cumulative
    * value per cohort member — "how much has a day-k cohort user been
    * worth by day k+n", the monetized retention matrix.
    *
    * Plan shape: one user-keyed aggregate for cohorts, an equi-join
    * back to the purchase rows sharing that partitioning, a
    * (cohort × offset) hash aggregate down to ≤ days² rows, and the
    * running sum as a window over THAT matrix-sized frame — the
    * cumulative window never touches the event-sized data, so at
    * 100 TB only the cohort join scales. Cohort sizes broadcast back
    * (≤ days rows). DETERMINISM: values sum as exact DECIMAL(38,2)
    * (cents) through BOTH aggregation levels; the per-user division is
    * the only double step, rounded 6 dp on both engines. */
  def ltv(s: SparkSession, d: String): DataFrame =
    ltvOn(Tables.events(s, d))

  /** Core of q_events_ltv over any events-shaped frame. */
  def ltvOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val days = eventsDf.select(col("user_id"), to_date(col("ts")).as("day"),
      col("event_type"), col("value"))
    val first = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val sizes = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    val cells = days.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(sum(col("value").cast(DecimalType(12, 2)))
        .cast(DecimalType(38, 2)).as("day_value"))
    val cum = Window.partitionBy(col("cohort")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_value",
        sum(col("day_value")).over(cum).cast(DecimalType(38, 2)))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("day_offset"),
        col("day_value").cast("double").as("day_value"),
        col("cum_value").cast("double").as("cum_value"),
        round(col("cum_value").cast("double") / col("cohort_users"), 6)
          .as("ltv_per_user"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** q_events_rfm — RFM (recency / frequency / monetary) customer
    * segmentation, the classic marketing-analytics ledger: per
    * customer, days since last order (vs the corpus's max order date),
    * order count and total spend, each scored 1–5 on FIXED published
    * thresholds, then one row per (r, f, m) segment with volume and
    * exact means. Fixed thresholds (not data quantiles) are the
    * production choice — segment definitions must stay stable across
    * runs and data drift, and they keep every step exactly replayable
    * (an ntile variant would tie rank boundaries to engine sort
    * internals).
    *
    * DETERMINISM: spend is quantized once to DECIMAL(12,2) per order
    * and summed exactly; recency is exact integer datediff vs a 1-row
    * broadcast max date (all-zeros key); segment means divide exact
    * sums at the very end (round 6). Scale shape: one customer-keyed
    * hash agg + a 1-row broadcast + a ≤125-row segment agg — nothing
    * after the first agg is data-sized. */
  def rfm(s: SparkSession, d: String): DataFrame =
    rfmOn(Tables.orders(s, d))

  /** Core of q_events_rfm over any orders-shaped frame. */
  def rfmOn(ordersDf: DataFrame): DataFrame = {
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val D = DecimalType(38, 2)
    val ref = ordersDf.agg(max(to_date(col("o_orderdate"))).as("refd"))
      .withColumn("j", k0(col("refd")))
    ordersDf
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast(D)
          .as("monetary"))
      .withColumn("j", k0(col("o_custkey")))
      .join(broadcast(ref), "j")
      .withColumn("recency_days",
        datediff(col("refd"), col("last_order")).cast("long"))
      .withColumn("r_score",
        when(col("recency_days") < 90, 5L)
          .when(col("recency_days") < 180, 4L)
          .when(col("recency_days") < 365, 3L)
          .when(col("recency_days") < 730, 2L).otherwise(1L))
      .withColumn("f_score",
        when(col("frequency") >= 18, 5L)
          .when(col("frequency") >= 13, 4L)
          .when(col("frequency") >= 9, 3L)
          .when(col("frequency") >= 5, 2L).otherwise(1L))
      .withColumn("m_score",
        when(col("monetary") >= 4000000L, 5L)
          .when(col("monetary") >= 3000000L, 4L)
          .when(col("monetary") >= 2000000L, 3L)
          .when(col("monetary") >= 1000000L, 2L).otherwise(1L))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("recency_days")).cast("double") / count(lit(1)), 6)
          .as("avg_recency_days"),
        round(sum(col("frequency")).cast("double") / count(lit(1)), 6)
          .as("avg_frequency"),
        round(sum(col("monetary")).cast(D).cast("double")
          / count(lit(1)), 6).as("avg_monetary"))
      .orderBy(col("r_score").desc, col("f_score").desc,
        col("m_score").desc)
  }

  /** q_events_transitions — first-order Markov transition matrix over
    * the event-type alphabet: for each user's timeline (ordered by
    * event time, event_id breaking µs ties) count every consecutive
    * (from_type → to_type) pair and derive the row-conditional
    * probability p(to|from). The user-journey summary every product
    * warehouse keeps, and the event-sequence analogue of
    * q_text_ngram_lm's bigram statistics.
    *
    * Plan shape: ONE user-keyed sort+window pass (lag) over the events
    * scan, a data-sized hash aggregate down to the ≤|types|² matrix,
    * then a window over that vocabulary-sized table for the
    * conditioning totals — nothing after the first aggregate scales
    * with the data, and the one exchange is the same user_id
    * partitioning every other event op uses. */
  def transitions(s: SparkSession, d: String): DataFrame =
    transitionsOn(Tables.events(s, d))

  /** Core of q_events_transitions over any events-shaped frame. */
  def transitionsOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = eventsDf.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val pairs = e
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
    val matrix = pairs
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tw = Window.partitionBy(col("from_type"))
    matrix
      .withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(tw), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q_events_resample — time-series RESAMPLING with forward fill: per
    * user, a dense hourly grid from the first to the last event hour;
    * hours with events carry their latest event's value ((ts, event_id)
    * argmax — deterministic under duplicate timestamps), empty hours
    * carry the value FORWARD. The sparse→dense step every time-series
    * feature pipeline needs (sensor grids, account balances, rate
    * series) that plain SQL aggregation can't produce — missing hours
    * simply don't exist in the data. Wire: per-user hour counts (total /
    * observed) and the exact decimal sum of the filled series.
    *
    * Plan shape: per-(user, hour) hash agg → vocabulary-sized span agg
    * → `sequence`+`explode` grid (bounded by span-hours per user, 720
    * on this data) → left join back → ONE user-keyed forward-fill
    * window (`last(v, ignoreNulls)`). Everything shuffles on user_id
    * once each; the grid explode is the op's intrinsic output size, not
    * amplification. DETERMINISM: values are DECIMAL(12,2) before any
    * sum (order-independent), the argmax key is the same
    * within-hour-µs·10⁹+event_id composite long both engines build. */
  def resample(s: SparkSession, d: String): DataFrame =
    resampleOn(Tables.events(s, d))

  /** Core of q_events_resample over any events-shaped frame. */
  def resampleOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val hr = date_trunc("hour", col("ts"))
    val ord = (unix_micros(col("ts")) - unix_micros(hr)) * 1000000000L +
      col("event_id")
    val hourly = eventsDf
      .select(col("user_id"), hr.as("hr"),
        col("value").cast(DecimalType(12, 2)).as("v"), ord.as("ord"))
      .groupBy(col("user_id"), col("hr"))
      .agg(count(lit(1)).as("n"), max_by(col("v"), col("ord")).as("v"))
      .pipe(ScratchCache.cache)
    val grid = hourly
      .groupBy(col("user_id"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hr"))
    val filled = grid
      .join(hourly, Seq("user_id", "hr"), "left")
      .withColumn("fv", last(col("v"), ignoreNulls = true)
        .over(Window.partitionBy(col("user_id")).orderBy(col("hr"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hours"), count(col("n")).as("n_real"),
        sum(col("fv")).cast(DecimalType(38, 2)).cast("double")
          .as("sum_fill"))
      .orderBy(col("user_id"))
  }

  /** q_events_interp — LINEAR interpolation over the per-user hourly
    * series, summed WITHOUT materializing the dense grid: for a gap of
    * m hours between observations a and b, the interior interpolated
    * values sum to the closed form (m−1)(a+b)/2 — so the dense-series
    * total is Σ observed + Σ per-gap closed forms, computed in ONE
    * window-lag pass over the (user, hour) reduction.
    *
    * The plan contrast to q_events_resample (which must materialize the
    * grid because forward-fill has no closed form): at 100 TB a sparse
    * series with year-long gaps explodes a sequence() grid to
    * |span-hours| rows per user, while this stays at |observations|
    * rows end to end. Exactness: the DOUBLED total 2·Σobs +
    * Σ(m−1)(a+b) is integer×DECIMAL(12,2) arithmetic and stays at
    * DECIMAL(38,2) throughout; the exact /2 happens in binary only
    * after the final double cast (halving a binary float is exact), so
    * no decimal-division scale rules enter on either engine.
    */
  def interp(s: SparkSession, d: String): DataFrame =
    interpOn(Tables.events(s, d))

  /** Core of q_events_interp over any events-shaped frame. */
  def interpOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val hr = date_trunc("hour", col("ts"))
    val ord = (unix_micros(col("ts")) - unix_micros(hr)) * 1000000000L +
      col("event_id")
    val hourly = eventsDf
      .select(col("user_id"), hr.as("hr"),
        col("value").cast(DecimalType(12, 2)).as("v"), ord.as("ord"))
      .groupBy(col("user_id"), col("hr"))
      .agg(max_by(col("v"), col("ord")).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    val paired = hourly
      .withColumn("phr", lag(col("hr"), 1).over(w))
      .withColumn("pv", lag(col("v"), 1).over(w))
      // exact integer gap length (observations sit on exact hours)
      .withColumn("m",
        expr("(unix_micros(hr) - unix_micros(phr)) div 3600000000"))
    // ×2 trick: accumulate 2·Σobs + Σ(m−1)(a+b) as exact DECIMAL and
    // halve only after the double cast — /2 is exact in binary, so no
    // decimal-division scale rules enter on either engine
    paired
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_obs"),
        expr("(max(unix_micros(hr)) - min(unix_micros(hr)))" +
          " div 3600000000 + 1").as("n_hours"),
        ((sum(col("v")) * 2 +
          sum(when(col("phr").isNotNull,
            (col("m") - 1) * (col("pv") + col("v"))).otherwise(lit(0))
            .cast(DecimalType(38, 2))))
          .cast(DecimalType(38, 2)).cast("double") / 2).as("sum_dense"))
      .orderBy(col("user_id"))
  }

  /** q_events_sliding_uniques — EXACT distinct users per 3-hour window
    * sliding hourly. Distinct-over-sliding-windows is the one windowed
    * metric that is NOT sum-decomposable (hourly distinct counts don't
    * add — the same user spans hours), so the naive plan dedups the
    * raw event stream once per window it touches.
    *
    * Two-phase shape instead: first reduce events to (hour, user)
    * partial counts — map-side combinable, bounded by |hours|×|active
    * users| regardless of event volume — THEN explode only those
    * reduced rows into the 3 window-starts each hour serves, and let
    * one distinct aggregate per window finish the job. At 100 TB the
    * ×3 replication applies to the reduced key table, never the raw
    * stream, and every stage is a plain hash aggregate. Event counts
    * (sum-decomposable) ride along for free.
    */
  def slidingUniques(s: SparkSession, d: String): DataFrame =
    slidingUniquesOn(Tables.events(s, d))

  /** Core of q_events_sliding_uniques over any events-shaped frame. */
  def slidingUniquesOn(eventsDf: DataFrame): DataFrame = {
    val hu = eventsDf
      .select(date_trunc("hour", col("ts")).as("h"), col("user_id"))
      .groupBy(col("h"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    hu
      .select(explode(expr(
        "array(h, h - interval 1 hour, h - interval 2 hours)"))
        .as("wstart"), col("user_id"), col("n"))
      .groupBy(col("wstart"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("n")).as("n_events"))
      .orderBy(col("wstart"))
  }

  /** q_encode_delta — delta+varint STORAGE ADVISOR for the event-time
    * column: per user, sort events by time, take successive gaps in µs,
    * and price each gap at its LEB128 varint width (1 byte per started
    * 7-bit group) against the flat 8-byte raw encoding — the
    * sortedness/compressibility probe a columnar layout optimizer runs
    * before choosing an encoding at 100 TB.
    *
    * Integer-exact everywhere: widths come from a 10-arm threshold CASE
    * on the gap (shared verbatim with the oracle), not from float
    * log₂ — so the byte totals are engine-identical. One shuffle by
    * user_id feeding a window lag; the rollup reuses the same
    * partitioning.
    */
  def encodeDelta(s: SparkSession, d: String): DataFrame =
    encodeDeltaOn(Tables.events(s, d))

  /** Core of q_encode_delta over any events-shaped frame. */
  def encodeDeltaOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    // LEB128 width: smallest b with gap < 128^b (gap 0 → 1 byte);
    // explicit literals — 128^9 would saturate a Long
    val pow128 = Seq(128L, 16384L, 2097152L, 268435456L, 34359738368L,
      4398046511104L, 562949953421312L, 72057594037927936L)
    val width = pow128.zipWithIndex.foldLeft(when(lit(false), 0)) {
      case (acc, (t, i)) => acc.when(col("gap") < t, i + 1)
    }.otherwise(9)
    eventsDf
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .withColumn("vbytes",
        when(col("gap").isNull, 8L).otherwise(width.cast("long")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (count(lit(1)) * 8).as("raw_bytes"),
        sum(col("vbytes")).as("delta_bytes"),
        max(col("gap")).as("max_gap_us"))
      .orderBy(col("user_id"))
  }

  /** q_events_forecast — per-type OLS TREND + next-day forecast over
    * the daily event-count series (r12): slope/intercept of the
    * least-squares line through (epoch-day, n_events) plus the
    * one-step-ahead projection — the capacity-planning / trend-alarm
    * primitive (q_events_anomaly flags the past; this extrapolates).
    *
    * Exactness contract (the q_agg_corr pattern): the five
    * regression sums (n, Σx, Σy, Σxy, Σx²) ride exact DECIMAL
    * arithmetic, and slope/intercept/forecast are ONE shared IEEE
    * double expression tree over them — bit-identical in both engines,
    * no float accumulation across rows. Degenerate series (a single
    * day) emit NULL, not an engine-dependent Inf/NaN.
    *
    * Scale shape: one (type, day) hash agg collapses the scan, then a
    * ≤|types|-row moments agg — the same one-pass-moments plan as
    * q_agg_stats; nothing data-sized survives the first aggregate. */
  def forecast(s: SparkSession, d: String): DataFrame =
    forecastOn(Tables.events(s, d))

  /** Core of q_events_forecast over any events-shaped frame. */
  def forecastOn(eventsDf: DataFrame): DataFrame = {
    val daily = eventsDf
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
    val x = datediff(col("day"), lit("1970-01-01").cast("date"))
      .cast(DecimalType(12, 0))
    val y = col("y").cast(DecimalType(12, 0))
    daily
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"),
        max(x).as("mx"))
      .select(col("event_type"), col("n"),
        col("n").cast("double").as("dn"),
        col("sx").cast("double").as("dx"),
        col("sy").cast("double").as("dy"),
        col("sxy").cast("double").as("dxy"),
        col("sxx").cast("double").as("dxx"),
        col("mx").cast("double").as("dmx"))
      .select(col("event_type"), col("n"),
        // ANSI guard: a single-day series has zero x-variance; emit
        // NULL (propagates through intercept/forecast) instead of an
        // engine-dependent division error / Inf
        when(col("dn") * col("dxx") - col("dx") * col("dx") =!= 0.0,
          (col("dn") * col("dxy") - col("dx") * col("dy"))
            / (col("dn") * col("dxx") - col("dx") * col("dx")))
          .as("slope_raw"),
        col("dn"), col("dx"), col("dy"), col("dmx"))
      .select(col("event_type"), col("n").as("n_days"),
        when(col("n") > 1, round(col("slope_raw"), 6)).as("slope"),
        when(col("n") > 1, round((col("dy")
          - col("slope_raw") * col("dx")) / col("dn"), 6))
          .as("intercept"),
        when(col("n") > 1, round((col("dy")
          - col("slope_raw") * col("dx")) / col("dn")
          + col("slope_raw") * (col("dmx") + 1.0), 4))
          .as("forecast_next"))
      .orderBy(col("event_type"))
  }

  /** q_events_gaps — GAPS-AND-ISLANDS: per user, collapse the distinct
    * activity days into maximal runs of CONSECUTIVE days (streaks) and
    * report the streak profile — active days, streak count, longest
    * streak and the (earliest) day it started. The engagement-streak /
    * uptime-island analysis every product-metrics pipeline runs, and
    * the canonical use of the day − row_number() grouping trick: inside
    * one consecutive run the difference is constant, so islands fall
    * out of a plain hash aggregate instead of an iterative chase.
    *
    * Plan shape (Explain-audited): distinct (user, day) is one
    * partial+final hash agg on its own (user,day) exchange; then ONE
    * user_id exchange carries EVERYTHING else — the row_number window,
    * the streak agg (user_id ⊂ (user_id, grp) ⇒ clustering satisfied,
    * no re-exchange), the per-user MAX window and the final rollup all
    * ride that single partitioning. Day-level rows are ≤366/user/year,
    * so both wires are tiny relative to the event scan.
    * "Earliest start of a longest streak" is resolved with a per-user
    * MAX window + conditional MIN, not argmax-struct ordering, because
    * the two engines must agree on ties bit-for-bit. */
  def gapsIslands(s: SparkSession, d: String): DataFrame =
    gapsIslandsOn(Tables.events(s, d))

  /** Core of q_events_gaps over any events-shaped frame. */
  def gapsIslandsOn(eventsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = eventsDf
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val streaks = days
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date"))
          - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
    val tagged = streaks.withColumn("ml",
      max(col("len")).over(Window.partitionBy(col("user_id"))))
    tagged.groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        min(when(col("len") === col("ml"), col("start")))
          .as("longest_start"))
      .orderBy(col("user_id"))
  }
}
