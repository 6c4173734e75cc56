package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Window-function surface (SURVEY.md §2.5). Reference capability:
  * "best record per entity" selection and cumulative counters while
  * streaming through KGX files. One shuffle per partitioning key; running
  * sums use exact decimals so results don't depend on partition count.
  */
object Windows {
  private val D = DecimalType(12, 2)
  private def dec(c: Column): Column = c.cast(D)
  // Exact decimal internally; DOUBLE on the wire (see Relational.d2).
  private def d2(c: Column): Column = c.cast(DecimalType(38, 2)).cast("double")

  /** q_win_rank — ranking family. rank/dense_rank/percent_rank are
    * ordered by a tie-bearing key (deterministic on ties by definition);
    * row_number/ntile need the total order including the unique key. */
  def winRank(s: SparkSession, d: String): DataFrame = {
    val tieW = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderpriority"))
    val totalW = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        row_number().over(totalW).cast("long").as("rn"),
        rank().over(tieW).cast("long").as("rnk"),
        dense_rank().over(tieW).cast("long").as("drnk"),
        ntile(4).over(totalW).cast("long").as("tile"),
        round(percent_rank().over(tieW), 6).as("prank"))
      .orderBy(col("o_orderstatus"), col("rn"))
  }

  /** q_win_topk_group — top-3 orders per customer (window + filter;
    * reference: best-evidence row per merged entity). */
  def winTopKGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        d2(col("o_totalprice")).as("price"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= 3)
      .orderBy(col("o_custkey"), col("rank"))
  }

  /** q_win_running — running decimal sum + count per customer across
    * order dates (cumulative counters, exact under reordering). */
  def winRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        d2(sum(dec(col("o_totalprice"))).over(w)).as("run_sum"),
        count(lit(1)).over(w).as("run_cnt"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** q_win_lag_lead — previous/next event timestamps + gap per user.
    * Timestamps exported as epoch-µs (ns parquet floors identically in
    * both engines). */
  def winLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(lag(col("ts"), 1).over(w)).as("prev_us"),
        unix_micros(lead(col("ts"), 1).over(w)).as("next_us"))
      .withColumn("gap_us", col("ts_us") - col("prev_us"))
      .orderBy(col("event_id"))
  }

  /** q_win_range_time — trailing-1-hour moving sum per user. Spark range
    * frames are numeric, so the frame runs over epoch-µs with a
    * 3.6e9 µs lookback — exactly DuckDB's RANGE BETWEEN INTERVAL
    * '1 hour' PRECEDING (both boundaries inclusive). */
  def winRangeTime(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        d2(sum(dec(col("value"))).over(w)).as("mov_sum"),
        count(lit(1)).over(w).as("mov_cnt"))
      .orderBy(col("event_id"))
  }
}
