package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational operator surface (SURVEY.md §2.1–§2.8).
  *
  * Mirrors the reference ETL's row-level capabilities (column-subset TSV
  * reads, per-row skip filters, lookup joins, per-category counters —
  * reference `parsers/&lt;SRC&gt;/src/load&lt;SRC&gt;.py`, `Common/merging.py`) re-expressed
  * as declarative DataFrame plans so Catalyst handles pushdown, pruning
  * and join selection. Every oracle-checked query ends in a total ORDER BY
  * with a unique tiebreak key and casts money to DECIMAL(18,2) *before*
  * aggregation (cross-engine determinism, SURVEY §7.4).
  */
object Relational {
  // Money columns → DECIMAL(12,2); small (1±x) factors → DECIMAL(4,2).
  // Narrow operand widths keep products within both engines' 38-digit
  // cap WITHOUT any scale-reducing cast afterwards — a 4dp→2dp cast hits
  // .xx50 ties where Spark rounds HALF_UP but DuckDB HALF_EVEN. Exact
  // full-scale results are the only cross-engine-safe decimals.
  private val D = DecimalType(12, 2)
  private val F = DecimalType(4, 2)
  private def dec(c: Column): Column = c.cast(D)
  private def fac(c: Column): Column = c.cast(F)
  // Final outputs: widen to DECIMAL(38,s) (never rounds; double inputs
  // round identically half-away-from-zero on both engines), then cast to
  // DOUBLE for the wire format. The internal aggregation stays exact
  // decimal; only the *output representation* is double — both engines
  // do correctly-rounded decimal→double, so the float64s are bitwise
  // equal, and the driver's pandas comparator sees float64 on both
  // sides instead of object(Decimal) vs float64.
  private def d2(c: Column): Column = c.cast(DecimalType(38, 2)).cast("double")
  private def d4(c: Column): Column = c.cast(DecimalType(38, 4)).cast("double")
  private def d6(c: Column): Column = c.cast(DecimalType(38, 6)).cast("double")

  /** q_sql_cte — SQL-DIALECT PARITY: one ANSI SQL text (CTE + dimension
    * join + window rank + aggregate) executed VERBATIM by `spark.sql`
    * over temp views of the tables — and, unchanged, by the DuckDB
    * oracle over the same-named tables. The `queries` surface is
    * DataFrame-first everywhere else; this key pins the other half of
    * the user contract: a SQL-speaking consumer can hand this library
    * the query text they run today. Kept to the dialect intersection
    * both engines parse identically (explicit CASTs, no QUALIFY, no
    * engine-specific functions); Catalyst plans it exactly like the
    * equivalent DataFrame chain (same pushdown/broadcast/window
    * physical ops). */
  val sqlCteText: String =
    """WITH bal AS (
      |  SELECT c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM customer WHERE c_mktsegment <> 'FURNITURE'
      |),
      |per_nation AS (
      |  SELECT n.n_regionkey, n.n_name,
      |    COUNT(*) AS n_cust,
      |    CAST(CAST(SUM(bal) AS DECIMAL(38,2)) AS DOUBLE) AS sum_bal
      |  FROM bal JOIN nation n ON bal.c_nationkey = n.n_nationkey
      |  GROUP BY n.n_regionkey, n.n_name
      |)
      |SELECT r_name, n_name, n_cust, sum_bal, rk FROM (
      |  SELECT r.r_name, p.n_name, p.n_cust, p.sum_bal,
      |    RANK() OVER (PARTITION BY p.n_regionkey
      |      ORDER BY p.sum_bal DESC, p.n_name) AS rk
      |  FROM per_nation p JOIN region r ON p.n_regionkey = r.r_regionkey
      |) t WHERE rk <= 2
      |ORDER BY r_name, rk, n_name""".stripMargin

  def sqlCte(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.region(s, d).createOrReplaceTempView("region")
    s.sql(sqlCteText)
  }

  /** q_sql_lateral — LATERAL correlated-subquery parity, the second
    * dialect-parity key next to [[sqlCteText]]: ONE SQL text with a
    * per-row dependent subquery (top-3 customers by balance PER
    * nation, ordered + limited INSIDE the lateral) runs verbatim on
    * both engines. LATERAL is the SQL surface for "for each outer row,
    * run this parameterized query" — the row-dependent top-k that a
    * plain join cannot express and the window-rank rewrite obscures.
    * Catalyst DECORRELATES it (DecorrelateInnerQuery): the planned
    * shape is a partitioned window-rank over one shuffle, not a
    * per-row re-execution — the 100 TB-safe plan for a construct that
    * reads like a nested loop. Exact-decimal balance on the wire. */
  val sqlLateralText: String =
    """SELECT n_name, c_name, bal FROM nation n,
      |LATERAL (
      |  SELECT c_name,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
      |  FROM customer c WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY bal DESC, c_name LIMIT 3
      |) t
      |ORDER BY n_name, bal DESC, c_name""".stripMargin

  def sqlLateral(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql(sqlLateralText)
  }

  /** §2.1 q_scan_project — pruned scan + rename + computed decimal col.
    * Catalyst pushes the projection into the parquet scan (ReadSchema
    * shows 5 of 11 cols); at 100 TB this is the difference between
    * reading 45% and 100% of the table bytes. */
  def scanProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("lnum"),
        d2(col("l_quantity")).as("qty"),
        d4(dec(col("l_extendedprice")) * fac(lit(1) - col("l_discount")))
          .as("revenue"))
      // (okey,lnum) is NOT unique in this data — total order needs every
      // output column so tie rows (identical tuples) can't flip order.
      .orderBy(col("okey"), col("lnum"), col("qty"), col("revenue"))

  /** §2.2 q_filter_pred — compound AND/OR, IN, BETWEEN (dates), LIKE,
    * IS NOT NULL, != . All predicates are Catalyst-native so they push
    * to the parquet row-group stats. */
  def filterPred(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        (col("l_returnflag") === "A" || col("l_returnflag") === "R") &&
        col("l_linestatus") =!= "O" &&
        col("l_quantity").between(10, 40) &&
        col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1998-12-31").cast("timestamp")) &&
        col("l_linenumber").isin(1, 2, 3, 4) &&
        col("l_returnflag").isNotNull &&
        col("l_returnflag").like("_%"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        d2(col("l_quantity")).as("qty"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))

  /** §2.2 q_project_expr — arithmetic, CASE WHEN, coalesce/nullif. */
  def projectExpr(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "done")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("other").as("status_word"),
        d2(col("o_totalprice")).as("price"),
        d2(dec(col("o_totalprice")) * lit(2)).as("double_price"),
        coalesce(nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")),
          lit("UNSPECIFIED")).as("prio"),
        (col("o_custkey") % 10).as("custmod"))
      .orderBy(col("o_orderkey"))

  /** §2.4 q_agg_group — flagship TPC-H-Q1 clone. Money sums in
    * DECIMAL(18,2) (exact, order-independent); averages derived from the
    * exact decimal sums then rounded — never float-summed. Partial
    * aggregation (map-side combine) keeps the shuffle at
    * |groups| × partitions rows regardless of input scale. */
  def aggGroup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        d2(sum(dec(col("l_quantity")))).as("sum_qty"),
        d2(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        // aggregated money sums ride the wire at scale 2 (cents): the
        // decimal→double hop is only exact while |value|·10^s < 2^53,
        // and a data-sized sum at scale 6 crosses that at ~5e10 (seen
        // as a 1-ulp oracle divergence at the 6M-row sweep) — scale 2
        // keeps the wire exact through ~9e13 per group. The scale drop
        // is an EXPLICIT round() (HALF_UP both engines), never a bare
        // decimal cast — cast-driven scale reduction ties break HALF_UP
        // in Spark vs HALF_EVEN in DuckDB
        d2(round(sum(dec(col("l_extendedprice"))
          * fac(lit(1) - col("l_discount"))), 2)).as("sum_disc_price"),
        d2(round(sum(dec(col("l_extendedprice"))
          * fac(lit(1) - col("l_discount"))
          * fac(lit(1) + col("l_tax"))), 2)).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty",
        round(col("sum_qty").cast("double") / col("count_order"), 4))
      .withColumn("avg_price",
        round(col("sum_base_price").cast("double") / col("count_order"), 4))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** §2.6 q_sort_multi — mixed ASC/DESC with explicit NULLS placement;
    * nulls injected via nullif. Tungsten external sort; the range
    * partitioner samples keys so the sort scales out. */
  def sortMulti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
        d2(col("c_acctbal")).as("bal"))
      .orderBy(col("seg").desc_nulls_last, col("bal").desc,
        col("c_custkey").asc)

  /** §2.6 q_topk — global top-k; Spark plans TakeOrderedAndProject
    * (per-partition heap + driver merge), never a full sort. */
  def topK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), d2(col("o_totalprice")).as("price"))
      .orderBy(col("price").desc, col("o_orderkey").asc)
      .limit(20)

  /** §2.7 q_union_all — concatenation of per-source slices (reference
    * merger fast path for disjoint sources). */
  def unionAll(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderstatus") === "F")
      .select(lit("A").as("tag"), col("o_totalprice"))
    val b = o.filter(col("o_orderstatus") === "O")
      .select(lit("B").as("tag"), col("o_totalprice"))
    a.unionByName(b)
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("cnt"),
        d2(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("tag"))
  }

  /** §2.7 q_union_distinct — node-id-set union during merge. */
  def unionDistinct(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val b = o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    a.union(b).distinct().orderBy(col("custkey"))
  }

  /** §2.7 q_intersect — customers active in both years. */
  def intersectYears(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val a = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey").as("custkey"))
    val b = o.filter(year(col("o_orderdate")) === 1997)
      .select(col("o_custkey").as("custkey"))
    a.intersect(b).orderBy(col("custkey"))
  }

  /** q_unpivot — wide→long melt of four lineitem measures via the
    * native `unpivot` (Spark 3.4+), then a per-metric profile — the
    * inverse of q_pivot and the standard first step of any
    * metric-catalog / feature-store export.
    *
    * Scale shape: unpivot is a row-local Expand (4 output rows per
    * input row, no shuffle), followed by ONE 4-group hash aggregate
    * with map-side partials — the scan stays pruned to the four
    * measure columns. DETERMINISM: measures are cast to exact
    * DECIMAL(12,2) BEFORE the melt (unpivot requires a common type;
    * doubles would also sum order-dependently), sums widen to
    * (38,2), and the mean divides exact operands once. */
  def unpivotMetrics(s: SparkSession, d: String): DataFrame =
    unpivotMetricsOn(Tables.lineitem(s, d))

  /** Core of q_unpivot over any lineitem-shaped frame. */
  def unpivotMetricsOn(lineitem: DataFrame): DataFrame = {
    val m = lineitem.select(
      col("l_quantity").cast(D).as("qty"),
      col("l_extendedprice").cast(D).as("price"),
      col("l_discount").cast(D).as("disc"),
      col("l_tax").cast(D).as("tax"))
    m.unpivot(Array.empty[Column],
        Array(col("qty"), col("price"), col("disc"), col("tax")),
        "metric", "value")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"),
        d2(sum(col("value"))).as("total"),
        round(sum(col("value")).cast("double") / count(lit(1)), 6)
          .as("mean"))
      .orderBy(col("metric"))
  }

  /** §2.7 q_except — customers active in 1996 but not 1997. */
  def exceptYears(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val a = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey").as("custkey"))
    val b = o.filter(year(col("o_orderdate")) === 1997)
      .select(col("o_custkey").as("custkey"))
    a.except(b).orderBy(col("custkey"))
  }

  /** q_set_ops_bag — BAG (multiset) set operations, the ALL-variant
    * surface [[exceptYears]]'s set semantics miss: `EXCEPT ALL` /
    * `INTERSECT ALL` respect MULTIPLICITY (a part ordered 5× in A and
    * 2× in B survives exceptAll 3×, where set EXCEPT drops it
    * entirely) — the semantics reconciliation and inventory-delta
    * queries actually need. Inputs: the (partkey, int quantity) bag of
    * 'A'-flag lines vs 'R'-flag lines; wire: per-op row and
    * distinct-key counts (op, n_rows, n_keys).
    *
    * Plan shape: Spark compiles exceptAll/intersectAll to a count-
    * per-key aggregate + replicate (generate) — one hash agg per side
    * on the natural key, no sort, no nested loop; same shape DuckDB
    * uses. Scale-safe: multiplicity arithmetic shuffles (key, count)
    * rows, never the raw bags. */
  def setOpsBag(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // floor-then-cast: Spark's decimal→int cast truncates while
    // DuckDB's rounds, so the rounding rule must be made explicit for
    // parity to survive non-integral quantities
    def side(flag: String) = li.filter(col("l_returnflag") === flag)
      .select(col("l_partkey").as("pk"),
        floor(col("l_quantity")).cast("int").as("qty"))
    val a = side("A")
    val b = side("R")
    def ledger(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col("pk"), col("qty")).as("n_keys"))
        .select(lit(name).as("op"), col("n_rows"), col("n_keys"))
    ledger("except_all", a.exceptAll(b))
      .unionByName(ledger("intersect_all", a.intersectAll(b)))
      .orderBy(col("op"))
  }

  /** q_pivot — long→wide reshape: per user-bucket event-type counts as
    * columns. Pivot values are EXPLICIT (the five known types) — the
    * values-less overload runs an extra distinct pass over the corpus
    * to discover them, which is a full scan you don't pay at 100 TB
    * when the dimension is known. Null cells (bucket never saw a type)
    * fill to 0 via the na API. */
  def pivotTypes(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy((col("user_id") % 100).as("user_bucket"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_bucket"))

  /** q_na_funcs — the DataFrameNaFunctions surface over deterministic
    * injected nulls: negative balances and the BUILDING segment null
    * out, then per-nation accounting of nulls, filled sums (fill 0),
    * replaced segments, and the na.drop survivor count. */
  def naFuncs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal"))
          .as("bal"),
        when(col("c_mktsegment") === "BUILDING", lit(null))
          .otherwise(col("c_mktsegment")).as("seg"))
    val filled = base.na.fill(Map("bal" -> 0.0, "seg" -> "UNKNOWN"))
    val dropped = base.na.drop(Seq("bal", "seg"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_complete"))
    filled
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("seg") === "UNKNOWN", 1).otherwise(0)).as("n_null_seg"),
        d2(sum(col("bal").cast(D))).as("sum_bal_filled"))
      .join(dropped, Seq("c_nationkey"), "left")
      .na.fill(Map("n_complete" -> 0L))
      .orderBy(col("c_nationkey"))
  }

  /** q_subquery_scalar — correlated scalar subqueries (orders above 2×
    * their customer's average) written AS subqueries so Catalyst's
    * decorrelation rules turn the per-row lookup into an aggregate +
    * join — the plan shape that survives 100 TB, from the query shape
    * users actually write. The comparison multiplies by the count
    * instead of dividing (exact decimal×int arithmetic, no float avg). */
  def subqueryScalar(s: SparkSession, d: String): DataFrame = {
    val v = "sq_orders_" + d.replaceAll("[^a-zA-Z0-9]", "_")
    Tables.orders(s, d).createOrReplaceTempView(v)
    s.sql(s"""
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(38,2)) AS DOUBLE) AS totalprice
      FROM $v o
      WHERE CAST(o_totalprice AS DECIMAL(12,2)) *
            (SELECT COUNT(*) FROM $v o2 WHERE o2.o_custkey = o.o_custkey)
          > 2 * (SELECT CAST(SUM(CAST(o3.o_totalprice AS DECIMAL(12,2)))
                   AS DECIMAL(38,2))
                 FROM $v o3 WHERE o3.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }
}
