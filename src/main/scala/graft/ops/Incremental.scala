package graft.ops

import java.nio.file.{Files, Paths, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Incremental source-version management — the reference's EP1 behavior
  * a daily user depends on most: each fetched source records its
  * version in a metadata sidecar (`Common/load_manager.py`
  * SourceMetadata [R]), and a load run skips any source whose recorded
  * version already matches, so a pipeline over N sources only pays for
  * the ones that actually changed.
  *
  * Spark shape: the materialized source is a parquet directory plus a
  * `_graft_source_meta.json` sidecar (underscore prefix: ignored by
  * parquet directory listings, like `_SUCCESS`). The sidecar is written
  * strictly AFTER the data commit, so a failed write leaves a stale or
  * absent sidecar and the next run simply rebuilds — no torn state.
  * At 100 TB the skip saves the full ingest+normalize cost of every
  * unchanged source; the check itself is one tiny driver-side read.
  */
object Incremental {

  /** Outcome of a [[loadIfStale]] call. */
  case class LoadStatus(source: String, version: String, rows: Long,
    skipped: Boolean, dataPath: String)

  private def metaPath(outDir: String): Path =
    Paths.get(outDir, "_graft_source_meta.json")

  private def dataPath(outDir: String): String =
    Paths.get(outDir, "data").toString

  // fixed-format sidecar; keys sorted, no timestamps → byte-stable for
  // unchanged (source, version, rows). Strings are JSON-ESCAPED: real
  // version tokens contain quotes (an RFC-7232 ETag is `"abc"`), and an
  // unescaped embed used to produce invalid JSON the parser rejected —
  // which silently disabled skip-if-fresh for every quoted version
  // (caught by the r10 SourceFetch→loadIfStale EP1 integration test).
  private def jesc(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  private def junesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case e => b.append(e); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def render(source: String, version: String, rows: Long): String =
    s"""{"rows":$rows,"source":"${jesc(source)}","version":"${jesc(version)}"}"""

  private val MetaRe =
    """\{"rows":(\d+),"source":"((?:[^"\\]|\\.)*)","version":"((?:[^"\\]|\\.)*)"\}""".r

  /** The recorded (version, rows) for a materialized source, if any. */
  def recordedVersion(outDir: String): Option[(String, Long)] = {
    val p = metaPath(outDir)
    if (!Files.exists(p)) None
    else Files.readString(p) match {
      case MetaRe(rows, _, version) =>
        // a corrupt escape (e.g. \uZZZZ) must mean REBUILD, not crash —
        // same contract as any other unreadable sidecar
        scala.util.Try((junesc(version), rows.toLong)).toOption
      case _ => None
    }
  }

  /** Materialize `build` into `outDir` unless the recorded version
    * already equals `version` (then: pure metadata read, `build` is
    * never evaluated — the skip-if-fresh contract). */
  def loadIfStale(spark: SparkSession, source: String, version: String,
      outDir: String)(build: => DataFrame): LoadStatus = {
    recordedVersion(outDir) match {
      case Some((v, rows)) if v == version =>
        LoadStatus(source, version, rows, skipped = true, dataPath(outDir))
      case _ =>
        Files.createDirectories(Paths.get(outDir))
        val dp = dataPath(outDir)
        build.write.mode("overwrite").parquet(dp)
        val rows = spark.read.parquet(dp).count()
        Files.writeString(metaPath(outDir), render(source, version, rows))
        LoadStatus(source, version, rows, skipped = false, dp)
    }
  }

  // Exact decimal internally; DOUBLE on the wire (see Relational.d2).
  private def d2(c: Column): Column = c.cast(DecimalType(38, 2)).cast("double")

  /** q_snapshot_diff — CDC-style snapshot comparison, the query a daily
    * incremental pipeline runs after [[loadIfStale]] detects a new
    * source version: classify every key of two snapshots as `added`
    * (new only), `deleted` (old only), `changed` (both, value differs)
    * or `unchanged`, with row counts and the new-side value sum per
    * class. The two snapshots are derived deterministically from the
    * orders table (old := keys ≢0 mod 10, new := keys ≢0 mod 7 with
    * every ≡0-mod-5 price bumped by 1.00), so the oracle value-checks
    * the full classification.
    *
    * Scale shape: ONE full-outer sort-merge join on the snapshot key —
    * both sides shuffle once, the classification is row-local, and the
    * report is a 4-row hash aggregate. No per-row lookups, no driver
    * state; at 100 TB this is the standard two-snapshot reconciliation
    * plan. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val oldSnap = orders.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v_old"))
    val newSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") +
            lit(new java.math.BigDecimal("1.00")).cast(DecimalType(12, 2)))
          .otherwise(col("o_totalprice")).as("v_new"))
    snapshotDiffOn(oldSnap, newSnap)
  }

  /** Core of q_snapshot_diff over any (k, v_old) / (k, v_new) pair of
    * snapshots. */
  def snapshotDiffOn(oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    oldSnap.join(newSnap, Seq("k"), "full_outer")
      .select(
        when(col("v_old").isNull, "added")
          .when(col("v_new").isNull, "deleted")
          .when(col("v_old") =!= col("v_new"), "changed")
          .otherwise("unchanged").as("status"),
        col("v_new"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        d2(sum(col("v_new").cast(DecimalType(18, 2)))).as("sum_new"))
      .orderBy(col("status"))

  /** q_scd2_history — SCD type-2 dimension-history build (the
    * gaps-and-islands collapse every warehouse runs to turn a change
    * LOG into validity INTERVALS): each customer's order-status
    * timeline is collapsed into maximal runs of equal status, each run
    * becoming one `[valid_from, valid_to)` row with `valid_to = NULL`
    * marking the current record. Wire = the per-status interval ledger
    * (interval count, open/current count, covered orders, mean run
    * length) so the oracle value-checks the whole collapse.
    *
    * Scale shape: the change-point marking and island numbering are two
    * window passes over ONE hash partitioning of the log by customer
    * (Catalyst plans them in a single sort+window stage — no second
    * exchange), then a per-(customer,island) hash aggregate and a
    * vocabulary-free lead() on the already-partitioned run table. At
    * 100 TB the log shuffles once by entity key; there is no self-join
    * and no driver state — the canonical distributed SCD-2 plan. */
  def scd2History(s: SparkSession, d: String): DataFrame =
    scd2HistoryOn(Tables.orders(s, d)
      .select(col("o_custkey").as("ent"), col("o_orderdate").as("ts"),
        col("o_orderkey").as("seq"), col("o_orderstatus").as("attr")))

  /** Core of q_scd2_history over any (ent, ts, seq, attr) change log
    * (`seq` breaks timestamp ties so windows are total orders). */
  def scd2HistoryOn(log: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ent")).orderBy(col("ts"), col("seq"))
    val prev = lag(col("attr"), 1).over(w)
    val marked = log.withColumn("chg",
      when(prev.isNull.or(prev =!= col("attr")), 1).otherwise(0))
    val runs = marked
      .withColumn("island", sum(col("chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("ent"), col("island"), col("attr"))
      .agg(count(lit(1)).as("n_rows"), min(col("ts")).as("valid_from"))
    val iv = runs.withColumn("valid_to",
      lead(col("valid_from"), 1)
        .over(Window.partitionBy(col("ent")).orderBy(col("island"))))
    iv.groupBy(col("attr"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).cast("long")
          .as("n_current"),
        sum(col("n_rows")).cast("long").as("n_rows"),
        round(sum(col("n_rows")).cast("double") / count(lit(1)), 6)
          .as("avg_run"))
      .orderBy(col("attr"))
  }

  /** q_cdc_apply — MERGE INTO (upsert/delete) application, the step
    * after [[snapshotDiff]] classifies: derive the changeset between
    * the base and target snapshots (insert / update / delete), apply
    * it to the base, and wire the per-op applied ledger plus the
    * resulting table's count+sum — value-proving the merged table,
    * not just the classification. All money stays DECIMAL end-to-end
    * (snapshots are cast once at the edge); the wire is the standard
    * exact-(38,2)→double cast.
    *
    * Scale shape: two full-outer sort-merge joins on the SAME snapshot
    * key (derive, then apply) — Catalyst reuses the exchange, the
    * per-row op logic is narrow, and the only outputs are a ≤3-row
    * ledger and a 1-row summary. No per-row lookups, no driver loops:
    * this is exactly how a lakehouse MERGE plans at 100 TB. */
  def cdcApply(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val money = (c: Column) => c.cast(DecimalType(12, 2))
    val base = orders.filter(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey").as("k"), money(col("o_totalprice")).as("v_old"))
    val target = orders.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 5 === 0, money(col("o_totalprice")) +
            lit(new java.math.BigDecimal("1.00")).cast(DecimalType(12, 2)))
          .otherwise(money(col("o_totalprice"))).as("v_new"))
    cdcApplyOn(base, target)
  }

  /** Core of q_cdc_apply over any (k, v_old) base / (k, v_new) target
    * snapshot pair. */
  def cdcApplyOn(base: DataFrame, target: DataFrame): DataFrame = {
    val chg = base.join(target, Seq("k"), "full_outer")
      .select(col("k"), col("v_old"), col("v_new"),
        when(col("v_old").isNull, "insert")
          .when(col("v_new").isNull, "delete")
          .when(col("v_old") =!= col("v_new"), "update").as("op"))
      .filter(col("op").isNotNull)
    val applied = base
      .join(chg.select(col("k"), col("op"), col("v_new")), Seq("k"),
        "full_outer")
      .filter(col("op").isNull.or(col("op") =!= "delete"))
      .select(when(col("op").isNotNull, col("v_new"))
        .otherwise(col("v_old")).as("v"))
    val perOp = chg.groupBy(col("op"))
      .agg(count(lit(1)).as("n"),
        d2(sum(when(col("op") === "delete", col("v_old"))
          .otherwise(col("v_new")).cast(DecimalType(18, 2)))).as("sum_v"))
    val result = applied
      .agg(count(lit(1)).as("n"),
        d2(sum(col("v").cast(DecimalType(18, 2)))).as("sum_v"))
      .withColumn("op", lit("result"))
    perOp.unionByName(result.select(col("op"), col("n"), col("sum_v")))
      .orderBy(col("op"))
  }

  /** q_incr_backfill — LATE-ARRIVAL backfill planner, the partition-
    * rewrite decision a day-partitioned 100 TB event store makes each
    * load: rows whose ARRIVAL day is later than their EVENT day landed
    * after their partition was already written, so that partition
    * needs a rewrite (partition-overwrite semantics — the batch twin
    * of streaming's watermark/allowed-lateness). Arrival is
    * synthesized deterministically (event_id % 5 days of delay — the
    * q_text_pii planting pattern) since the testdata carries no
    * ingest timestamp. Wire: per event-day partition — rows, late
    * rows, max lateness (days), needs_rewrite flag; exactly the
    * manifest a backfill job feeds its overwrite list.
    *
    * Scale shape: lateness is a row-local projection; ONE hash agg
    * keyed by event-day (the partition key the store already
    * shuffles by). The planner's output is partition-count-sized —
    * the 100 TB decision artifact, not data. */
  def incrBackfill(s: SparkSession, d: String): DataFrame =
    incrBackfillOn(graft.Tables.events(s, d)
      .withColumn("arrival_day",
        date_add(to_date(col("ts")), (col("event_id") % 5).cast("int"))))

  /** Core of q_incr_backfill over any frame with ts + arrival_day. */
  def incrBackfillOn(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("event_day"), col("arrival_day"))
      .withColumn("late_days",
        datediff(col("arrival_day"), col("event_day")))
      .groupBy(col("event_day"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("late_days") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_days")).cast("long").as("max_late_days"))
      .withColumn("needs_rewrite",
        (col("n_late") > 0).cast("int"))
      .orderBy(col("event_day"))

  /** q_agg_statemerge — incremental rollup via ALGEBRAIC AGGREGATE
    * STATE: phase 1 reduces raw rows to per-(shipdate, returnflag)
    * states (n / sum / min / max — each a commutative monoid, so states
    * re-merge in any order and any grouping), phase 2 consumes ONLY
    * those state rows to produce the flag-level rollup plus a ledger of
    * how many state rows (and how many from the post-1995-06-01 "new
    * batch" slice) were merged.
    *
    * This is the daily-job contract at 100 TB: yesterday's stored daily
    * states merge with today's micro-batch states without rescanning
    * history — O(|new day|) work instead of O(|history|), and the state
    * table (|days|×|flags| rows) is the only thing the merge shuffles.
    * Everything is exact (counts + DECIMAL sums), so the two-phase
    * result is bit-identical to a direct one-phase aggregate — which is
    * precisely what the DuckDB oracle twin checks.
    */
  def stateMerge(s: SparkSession, d: String): DataFrame =
    stateMergeOn(Tables.lineitem(s, d))

  /** Core of q_agg_statemerge over any lineitem-shaped frame. */
  def stateMergeOn(li: DataFrame): DataFrame = {
    val qty = col("l_quantity").cast(DecimalType(12, 2))
    val price = col("l_extendedprice").cast(DecimalType(12, 2))
    val daily = li
      .groupBy(col("l_shipdate"), col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(qty).as("sq"),
        min(qty).as("mn"),
        max(qty).as("mx"),
        sum(price).as("sp"))
    daily
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("n")).as("n"),
        d2(sum(col("sq"))).as("sum_qty"),
        d2(min(col("mn"))).as("min_qty"),
        d2(max(col("mx"))).as("max_qty"),
        d2(sum(col("sp"))).as("sum_price"),
        count(lit(1)).as("n_states"),
        sum(when(col("l_shipdate") >= lit("1995-06-01").cast("date"), 1L)
          .otherwise(0L)).as("n_batch_states"))
      .orderBy(col("l_returnflag"))
  }
}
