package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import scala.util.chaining._

/** Aggregation surface beyond the flagship (SURVEY.md §2.4). Reference
  * capability: per-category node/edge counters and merge statistics
  * (`load_metadata` dicts, `Common/merging.py`). All hash aggregates with
  * map-side partials; money in exact decimals so results are independent
  * of partition count and combine order.
  */
object Aggregates {
  private val D = DecimalType(12, 2)
  private def dec(c: Column): Column = c.cast(D)
  // Exact decimal internally; DOUBLE on the wire (see Relational.d2).
  private def d2(c: Column): Column = c.cast(DecimalType(38, 2)).cast("double")
  private def d4(c: Column): Column = c.cast(DecimalType(38, 4)).cast("double")

  /** q_agg_global — ungrouped count/min/max/sum/count-distinct. */
  def aggGlobal(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n"),
        d2(min(col("l_quantity"))).as("min_qty"),
        d2(max(col("l_quantity"))).as("max_qty"),
        d2(sum(dec(col("l_extendedprice")))).as("sum_price"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  /** q_agg_having — group + post-aggregation filter. */
  def aggHaving(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        d2(sum(dec(col("l_quantity")))).as("sum_qty"))
      .filter(col("n") > 600)
      .orderBy(col("l_suppkey"))

  /** q_agg_distinct — multiple count-distincts in one aggregate
    * (Catalyst plans an Expand + two-phase agg). */
  def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("d_parts"),
        countDistinct(col("l_suppkey")).as("d_supps"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  // grouping() is only legal inside the agg over a rollup/cube grouping.
  private def groupedSetAgg(df: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
    df.agg(
      grouping(col("l_returnflag")).cast("int").as("g_flag"),
      grouping(col("l_linestatus")).cast("int").as("g_status"),
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast(D)).cast(DecimalType(38, 2)).cast("double")
        .as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("g_flag"), col("g_status"), col("n"), col("sum_qty"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** q_agg_rollup — hierarchical subtotals + grand total. */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    groupedSetAgg(Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus")))

  /** q_agg_cube — all grouping combinations. */
  def aggCube(s: SparkSession, d: String): DataFrame =
    groupedSetAgg(Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus")))

  /** q_agg_gsets — explicit GROUPING SETS via SQL. */
  def aggGsets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_gsets")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |COUNT(*) AS n,
        |CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        |FROM graft_lineitem_gsets
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** q_agg_collect — per-group sorted collected lists/sets (reference:
    * KGX merge accumulates publication lists & category sets). Lists are
    * sorted post-collection — collect order is partition-dependent, the
    * sorted result is not. */
  def aggCollect(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        // arrays sort numerically/lexically FIRST, then stringify — the
        // driver's pandas comparator can't hash ndarray cells, so the
        // wire format is a joined string (same on the oracle side)
        array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
          .as("prios"),
        array_join(transform(sort_array(collect_set(year(col("o_orderdate")))),
          _.cast("string")), ",").as("years"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** q_agg_stats — avg/var_samp/stddev_samp per group, derived from
    * EXACT decimal sums (sum x, sum x²) so the result is identical under
    * any partitioning — the builtin float stddev accumulates in
    * partition order and is not cross-engine/cross-parallelism stable.
    * l_quantity is small enough that the exact decimal sums convert to
    * double losslessly (< 2^53 scaled units) on both engines. */
  def aggStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).as("s"),
        sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("s2"))
      .select(
        col("l_returnflag"), col("n"),
        round(col("s").cast("double") / col("n"), 4).as("avg_qty"),
        round((col("s2").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n"))
          / (col("n") - 1), 4).as("var_qty"),
        round(sqrt((col("s2").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n"))
          / (col("n") - 1)), 4).as("std_qty"))
      .orderBy(col("l_returnflag"))

  /** q_agg_quantile — exact interpolated percentiles (median, p90, p99)
    * per group over doubles: Spark `percentile` sorts within the
    * aggregate (exact, unlike percentile_approx) and both engines use
    * linear interpolation over the same sorted order, so a 6dp round
    * absorbs any final-ulp divergence. At 100 TB the approx sketch
    * (q_agg_approx's HLL cousin, percentile_approx/t-digest) replaces
    * this when a full per-group sort is too dear; exact is the oracle
    * surface. */
  def aggQuantile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(q, 0.5)"), 6).as("p50"),
        round(expr("percentile(q, 0.9)"), 6).as("p90"),
        round(expr("percentile(q, 0.99)"), 6).as("p99"))
      .orderBy(col("l_returnflag"))

  /** q_agg_tdigest — MERGEABLE approximate-quantile state (no oracle:
    * approx by construction; tolerance + two-phase consistency asserted
    * in AggregatesSpec): phase 1 reduces each (shipdate, returnflag)
    * group to a constant-size t-digest sketch ([[TDigestBuildAggregator]]
    * — the classic Dunning merging digest, k₁ scale, δ=100); phase 2
    * merges ONLY those state rows per flag ([[TDigestMergeAggregator]])
    * and reads p50/p90/p99 off the merged digest.
    *
    * This is the documented 100 TB swap for q_agg_quantile's exact
    * per-group sort, in the q_agg_statemerge two-phase shape: daily
    * sketch rows (|days|×|flags|, ~1.6 KB each) re-aggregate to any
    * rollup level or date range without rescanning raw data — the
    * monitoring-pipeline staple (latency p99s from per-minute sketch
    * states). The wire between phases carries sketches, never values;
    * the k₁ scale function keeps tail centroids tiny so p99 stays
    * sharp while the middle compresses. */
  def aggTDigest(s: SparkSession, d: String): DataFrame =
    aggTDigestOn(Tables.lineitem(s, d))

  /** Core of q_agg_tdigest over any lineitem-shaped frame. */
  def aggTDigestOn(li: DataFrame): DataFrame = {
    val build = udaf(new TDigestBuildAggregator(100.0))
    val mergeAgg = udaf(new TDigestMergeAggregator(100.0))
    val daily = li
      .select(col("l_shipdate"), col("l_returnflag"),
        col("l_quantity").cast("double").as("q"))
      .groupBy(col("l_shipdate"), col("l_returnflag"))
      .agg(build(col("q")).as("st"))
    daily
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_states"), mergeAgg(col("st.sk")).as("qs"))
      .select(col("l_returnflag"), col("qs.n").as("n"), col("n_states"),
        round(col("qs.p50"), 4).as("p50"),
        round(col("qs.p90"), 4).as("p90"),
        round(col("qs.p99"), 4).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  /** q_agg_approx — sketch aggregates (no oracle: approx by
    * construction; tolerances asserted in tests): HyperLogLog++
    * distinct estimate plus the native Count-Min frequency aggregate
    * (`graft.functions.CountMinEstimate`, registered as
    * `count_min_est`) estimating the per-group frequency of three
    * planted quantity values. At 100 TB both replace Expand/shuffle-
    * heavy exact plans with constant-size mergeable sketches per
    * partition; Count-Min is deterministic (fixed seeds, commutative
    * counter merges), and the estimate array is wire-flattened to a
    * csv string because the harness comparator rejects array cells. */
  def aggApprox(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.registerFunctions(s)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count(lit(1)).as("n"),
        expr("array_join(count_min_est(cast(cast(l_quantity as int) as string), '1,25,50'), ',')")
          .as("cm_qty_est"))
      .orderBy(col("l_returnflag"))
  }

  /** q_agg_hll_rollup — the sketch ROLL-UP pattern: distinct-part
    * estimates served at TWO granularities from ONE scan. The finest
    * grain (returnflag × linestatus) aggregates `hll_sketch_agg`
    * sketches (Apache DataSketches HLL — mergeable, fixed-size); the
    * flag level then `hll_union_agg`s those sketches WITHOUT touching
    * the fact table again. At 100 TB this is how pre-aggregated sketch
    * tables answer distinct-count queries at every roll-up level from
    * a single pass — re-scanning per granularity (or an exact
    * count_distinct Expand) is the plan this replaces. Sketch merges
    * are commutative and the estimate deterministic, so the output is
    * partition-order independent; no oracle (approximate by
    * construction — DuckDB's HLL implementation would disagree in the
    * low bits), tolerance + roll-up-consistency asserted in
    * AggregatesSpec. Wire: per-flag estimates, with the finest-grain
    * sketch count and exact row count beside them. */
  def aggHllRollup(s: SparkSession, d: String): DataFrame = {
    val fine = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"),
        count(lit(1)).as("n"))
      // one scan feeds both the per-flag roll-up and the cell count
      .pipe(ScratchCache.cache)
    fine.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("n")).cast("long").as("n_rows"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_parts"))
      .orderBy(col("l_returnflag"))
  }

  /** q_agg_argmax — per-nation argmax/argmin (richest and poorest
    * customer by account balance) via `max_by`/`min_by`, the
    * "representative row per group" aggregate every report needs
    * without paying a row_number window over the whole table.
    *
    * Scale shape: ONE hash aggregate with full map-side partial
    * max_by/min_by combine (a window formulation would sort every
    * group; max_by keeps a single candidate per partition per group),
    * after a broadcast join against the 25-row nation dim.
    * DETERMINISM: `max_by` picks an ARBITRARY row on ordering ties, so
    * the ordering key is made unique by construction — exact integer
    * cents (the *100 round is exact: balances are 2dp) composited with
    * the unique custkey: (cents + 10^5)·10^7 + custkey. Fits a long
    * while custkey < 10^7 (true at every test SF; a 100 TB deployment
    * widens to DECIMAL(38,0) — same shape). */
  def aggArgmax(s: SparkSession, d: String): DataFrame =
    aggArgmaxOn(Tables.customer(s, d), Tables.nation(s, d))

  /** Core of q_agg_argmax over any customer/nation-shaped frames. */
  def aggArgmaxOn(customer: DataFrame, nation: DataFrame): DataFrame = {
    val ord = ((round(col("c_acctbal") * 100).cast("long") + 100000L)
      * 10000000L + col("c_custkey")).as("ord")
    customer
      .join(broadcast(nation),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal"), ord)
      .groupBy(col("n_name"))
      .agg(
        max_by(col("c_name"), col("ord")).as("top_cust"),
        d2(max(col("c_acctbal").cast(D))).as("top_bal"),
        min_by(col("c_name"), col("ord")).as("bottom_cust"),
        d2(min(col("c_acctbal").cast(D))).as("bottom_bal"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  /** q_udaf_topk — typed Aggregator UDAF: bounded top-5 orders per
    * priority class, exploded back to rows. Oracle twin: row_number
    * window filter. */
  def udafTopK(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new TopKAggregator(5))
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(
        col("o_orderpriority"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("o_orderkey"),
        d2(col("col._1")).as("price"))
      .orderBy(col("o_orderpriority"), col("rank"))
  }

  /** q_agg_histogram — data-driven equi-width histogram of
    * `o_totalprice` (16 buckets between the observed min and max):
    * the distribution profile every optimizer statistics pass and
    * data-quality monitor computes. Bucketing is INTEGER-exact: money
    * becomes exact cents (DECIMAL(12,2)·100 → BIGINT, fraction .00 so
    * the cast is exact in both engines), and the bucket index is the
    * integral `((cents−lo)·16) DIV (hi−lo+1)` — no float division, no
    * boundary ties, engine-identical by construction.
    *
    * Plan shape: one 1-row min/max aggregate over the cents column,
    * broadcast back onto the scan via the non-foldable all-zeros key
    * (pmod(hash,1) — a literal key would fold away and plan as a
    * BroadcastNestedLoopJoin), then ONE 16-group hash aggregate with
    * map-side partials. Two narrow passes over the data, no shuffle of
    * the fact table at any SF. */
  def aggHistogram(s: SparkSession, d: String): DataFrame = {
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val o = Tables.orders(s, d).select(
      (dec(col("o_totalprice")) * 100).cast("long").as("cents"),
      dec(col("o_totalprice")).as("v"))
    val bounds = o.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .withColumn("k", k0(col("lo")))
    o.withColumn("k", k0(col("cents")))
      .join(broadcast(bounds), "k")
      .select(expr("((cents - lo) * 16) div (hi - lo + 1)").as("bucket"),
        col("v"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        d2(sum(col("v").cast(DecimalType(18, 2)))).as("sum_price"))
      .orderBy(col("bucket"))
  }

  /** q_agg_percentile_exact — EXACT order statistics (p50/p90/p99 of
    * order price) WITHOUT a total sort, the 100 TB selection shape:
    * the naive exact percentile globally sorts the fact table (the one
    * operation a warehouse avoids at all costs) and the usual swap is
    * approximate (percentile_approx). This key shows exact is
    * affordable when the domain is bounded integers (money cents): the
    * classic two-pass BUCKET SELECTION —
    *   pass 1: one hash aggregate into 2¹⁶-cent-wide buckets (a
    *     DIMENSION-sized histogram, ≤ a few thousand rows), cumulative
    *     counts locate each percentile's target bucket and its offset
    *     within it (in-plan window over the tiny histogram, no driver
    *     collect);
    *   pass 2: the fact table filtered to the ≤3 target buckets
    *     (broadcast semi join — each bucket holds ~n/|buckets| rows),
    *     row_number within bucket picks the exact k-th value.
    * Total cost: two fact passes + a histogram shuffle, independent of
    * n·log n; deeper domains recurse the same split (radix selection).
    * k = ⌈p·n⌉ in pure integer arithmetic ((n·num + den − 1) div den),
    * so both engines select the identical order statistic; ties are
    * value-identical by construction (equal cents ⇒ equal output). */
  def aggPercentileExact(s: SparkSession, d: String): DataFrame =
    aggPercentileExactOn(Tables.orders(s, d)
      .select((dec(col("o_totalprice")) * 100).cast("long").as("cents")))

  /** Core of q_agg_percentile_exact over any single-column `cents`
    * long frame. */
  def aggPercentileExactOn(centsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val o = centsDf
    val hist = o.groupBy(expr("cents div 65536").as("b"))
      .agg(count(lit(1)).as("cnt"))
    // dimension-sized cumulative: the single-partition window runs over
    // ≤ |domain|/2^16 histogram rows, never the fact table
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = o.agg(count(lit(1)).as("n")).withColumn("k", k0(col("n")))
    // percentiles ride each histogram row as a ROW-LOCAL generator
    // (explode of a literal struct array) + the 1-row n broadcast on
    // the all-zeros key — an equi join, deliberately NOT a cum>=k
    // theta join, which would plan as the fleet's only nested loop
    val cumP = cum.withColumn("k", k0(col("b")))
      .join(broadcast(n), "k")
      .select(col("b"), col("cnt"), col("cum"),
        explode(array(
          struct(lit("p50").as("pct"), lit(1L).as("num"), lit(2L).as("den")),
          struct(lit("p90").as("pct"), lit(9L).as("num"), lit(10L).as("den")),
          struct(lit("p99").as("pct"), lit(99L).as("num"), lit(100L).as("den"))
        )).as("p"), col("n"))
      .select(col("b"), col("cnt"), col("cum"), col("p.pct").as("pct"),
        expr("(n * p.num + p.den - 1) div p.den").as("kth"))
    // target bucket per percentile: the minimum bucket whose cumulative
    // count reaches k; offset = kth − (cum − cnt) is the rank INSIDE it
    val tb = cumP.filter(col("cum") >= col("kth"))
      .groupBy(col("pct"), col("kth"))
      .agg(min_by(struct(col("b"), col("cum"), col("cnt")), col("b"))
        .as("t"))
      .select(col("pct"), col("kth"), col("t.b").as("b"),
        (col("kth") - (col("t.cum") - col("t.cnt"))).as("off"))
    val inTarget = o.withColumn("b", expr("cents div 65536"))
      .join(broadcast(tb.select(col("b")).distinct()), "b")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("cents"))))
    inTarget.join(broadcast(tb),
        inTarget("b") === tb("b") && col("rn") === col("off"))
      // exact cents → dollars on the wire via ONE shared IEEE division
      // (cents are integers; the same op on the same input is
      // bit-identical on both engines)
      .select(col("pct"), col("kth"),
        (col("cents").cast("double") / 100).as("value"))
      .orderBy(col("pct"))
  }

  /** q_agg_corr — Pearson correlation + sample covariance of quantity
    * vs discount per return flag, derived from EXACT decimal power
    * sums (Σx, Σy, Σxy, Σx², Σy²) so the result is identical under any
    * partitioning — the builtin float corr/covar_samp accumulate in
    * partition order and are not cross-engine/cross-parallelism stable
    * (same rationale as [[aggStats]]).
    *
    * The five sums are ONE map-side-combined hash aggregate; the
    * double conversions stay far below 2^53 scaled units through
    * ~sf10 (x ≤ 50, y ≤ 0.10: Σx² ≈ 1.5e9·sf at 4 dp), and every
    * arithmetic step after the casts is the same IEEE expression on
    * both engines, rounded 6 dp on the wire. */
  def aggCorr(s: SparkSession, d: String): DataFrame =
    aggCorrOn(Tables.lineitem(s, d))

  /** Core of q_agg_corr over any frame with (l_returnflag, l_quantity,
    * l_discount) — split out so the degenerate-group guards (n = 1,
    * zero variance) are spec-testable on planted frames. */
  private[graft] def aggCorrOn(li: DataFrame): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_discount"))
    li
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(
        col("l_returnflag"), col("n"),
        col("n").cast("double").as("dn"),
        col("sx").cast("double").as("dx"), col("sy").cast("double").as("dy"),
        col("sxy").cast("double").as("dxy"),
        col("sxx").cast("double").as("dxx"), col("syy").cast("double").as("dyy"))
      .select(
        col("l_returnflag"), col("n"), col("dn"),
        (col("dxx") / col("dn")
          - (col("dx") / col("dn")) * (col("dx") / col("dn"))).as("vx"),
        (col("dyy") / col("dn")
          - (col("dy") / col("dn")) * (col("dy") / col("dn"))).as("vy"),
        (col("dxy")
          - col("dn") * (col("dx") / col("dn")) * (col("dy") / col("dn")))
          .as("cps"), // centered product sum
        (col("dxy") / col("dn")
          - (col("dx") / col("dn")) * (col("dy") / col("dn"))).as("cm"))
      .select(
        col("l_returnflag"), col("n"),
        // degenerate-group guards (ADVICE r8): a single-row group
        // divides by n-1 = 0 and a zero-variance group by sqrt(0) —
        // Inf/NaN whose wire form is engine-settings-dependent; both
        // engines emit NULL deterministically instead. The guarded
        // arithmetic is UNCHANGED (same IEEE expression shapes), so
        // non-degenerate values are bit-identical to before.
        when(col("n") > 1,
          round(col("cps") / (col("dn") - 1.0), 6)).as("covar_qty_disc"),
        when(col("n") > 1 && col("vx") > 0 && col("vy") > 0,
          round(col("cm") / sqrt(col("vx") * col("vy")), 6))
          .as("corr_qty_disc"))
      .orderBy(col("l_returnflag"))
  }

  /** q_agg_linreg — per-group simple OLS regression (slope, intercept,
    * r²) of extended price on quantity — the trend-fit companion of
    * [[aggCorr]]: same exact-decimal moment discipline (five sums ride
    * DECIMAL, partition-order free), same one-shot double formulas at
    * the end, same degenerate-group NULL guards (n ≤ 1 or zero x/y
    * variance). The closed-form moment formulation is what makes OLS a
    * one-pass distributed aggregate — no iterative solver, no second
    * data pass, so it runs at any scale a hash aggregate runs. */
  def aggLinreg(s: SparkSession, d: String): DataFrame =
    aggLinregOn(Tables.lineitem(s, d))

  /** Core of q_agg_linreg over any frame with (l_returnflag,
    * l_quantity, l_extendedprice). */
  private[graft] def aggLinregOn(li: DataFrame): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    li
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(
        col("l_returnflag"), col("n"),
        col("n").cast("double").as("dn"),
        col("sx").cast("double").as("dx"), col("sy").cast("double").as("dy"),
        col("sxy").cast("double").as("dxy"),
        col("sxx").cast("double").as("dxx"), col("syy").cast("double").as("dyy"))
      .select(
        col("l_returnflag"), col("n"), col("dn"), col("dx"), col("dy"),
        (col("dn") * col("dxy") - col("dx") * col("dy")).as("sp"),
        (col("dn") * col("dxx") - col("dx") * col("dx")).as("ssx"),
        (col("dn") * col("dyy") - col("dy") * col("dy")).as("ssy"))
      .select(
        col("l_returnflag"), col("n"),
        when(col("n") > 1 && col("ssx") > 0,
          round(col("sp") / col("ssx"), 6)).as("slope"),
        when(col("n") > 1 && col("ssx") > 0,
          round((col("dy") - (col("sp") / col("ssx")) * col("dx"))
            / col("dn"), 6)).as("intercept"),
        when(col("n") > 1 && col("ssx") > 0 && col("ssy") > 0,
          round((col("sp") * col("sp")) / (col("ssx") * col("ssy")), 6))
          .as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** q_agg_mode — per-group mode (most frequent l_quantity per return
    * flag) with a deterministic lowest-value tie-break: a value-level
    * hash aggregate (map-side partials collapse each partition to
    * ≤ |distinct values| rows) followed by a row_number window over the
    * ≤ groups×values aggregate — the window never sees the raw data,
    * so only the first aggregate scales. The builtin `mode()` breaks
    * ties arbitrarily in both engines; the explicit (count DESC, value
    * ASC) ordering is what makes the result an oracle surface. */
  def aggMode(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), dec(col("l_quantity")).as("qty"))
      .agg(count(lit(1)).as("n_mode"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n_mode").desc, col("qty").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("qty").cast("double").as("mode_qty"),
        col("n_mode"))
      .orderBy(col("l_returnflag"))
  }

  /** q_agg_bitmap — RE-MERGEABLE exact-distinct state: daily per-type
    * user bitmaps (typed [[RoaringBuildAggregator]]), OR-merged across
    * days per type ([[RoaringOrAggregator]]) — against the per-day
    * distinct sum that (wrongly) adds.
    *
    * This is the exact-distinct sibling of q_agg_statemerge: plain
    * COUNT(DISTINCT) results are a dead end for incremental pipelines
    * (distincts don't add), but bitmap states OR together — commutative
    * AND idempotent, so overlapping inputs never double-count — which
    * is how a 100 TB warehouse answers "uniques over any date range"
    * from daily states without rescanning raw events. The wire between
    * the two levels carries |days|×|types| COMPRESSED bitmaps
    * ([[Roaring64]] canonical bytes — O(distinct ids), any 64-bit id
    * space; the r11 dense bitset's 2^26 cap is gone), never raw ids.
    * Each state lands with its cardinality precomputed in the
    * aggregator's `finish` ([[BitmapState]]), so the popcounts are
    * struct-field reads, not a decode pass.
    */
  def aggBitmap(s: SparkSession, d: String): DataFrame =
    aggBitmapOn(Tables.events(s, d))

  /** Core of q_agg_bitmap over any events-shaped frame. */
  def aggBitmapOn(ev: DataFrame): DataFrame = {
    val build = udaf(new RoaringBuildAggregator())
    val orAgg = udaf(new RoaringOrAggregator())
    val daily = ev
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(build(col("user_id")).as("st"))
    daily
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("st.card")).as("sum_daily_uniques"),
        orAgg(col("st.bm")).as("merged"))
      .select(col("event_type"), col("n_days"),
        col("sum_daily_uniques").cast("long").as("sum_daily_uniques"),
        col("merged.card").as("n_uniques"))
      .orderBy(col("event_type"))
  }

  /** q_agg_kmv — KMV (k-minimum-values, bottom-k) distinct sketch per
    * event type PLUS the union sketch merged across all types (r12):
    * each audience reduces to its k=256 smallest distinct md5-derived
    * 60-bit hashes ([[KmvAggregator]]); cardinality estimate =
    * (k−1)/u_(k) (u_(k) = k-th smallest hash normalized to [0,1]); a
    * saturating set (n < k) reports exactly.
    *
    * The sketch-family slot this fills: HLL states
    * (q_agg_approx/q_agg_hll_rollup) estimate cardinality but can't
    * intersect; bitmaps (q_agg_bitmap) are exact set algebra at
    * O(distinct) bytes. KMV is O(k) bytes with LOSSLESS union merge —
    * k-min(A∪B) = k-min(k-min(A) ∪ k-min(B)) exactly, which is what
    * the ALL_UNION row demonstrates: the merged sketch over all types
    * equals the sketch of the union, per construction.
    *
    * Uniquely among the sketch keys this one is FULLY ORACLE-CHECKED,
    * estimate included: the k smallest elements of a set don't depend
    * on partitioning or merge order, and the hash is md5-derived, so
    * DuckDB replays hash → k-min → estimator bit-for-bit (the other
    * sketches are declared oracle-N precisely because their hash or
    * float accumulation isn't engine-replayable).
    *
    * Scale shape: the distinct-hash projection is one hash agg; the
    * sketch is a bounded-state typed UDAF (map-side partials carry ≤ k
    * longs, merge is union+trim) — no per-group sort, no window; the
    * DuckDB twin affords the full ROW_NUMBER sort the sketch avoids. */
  def aggKmv(s: SparkSession, d: String): DataFrame =
    aggKmvOn(Tables.events(s, d), k = 256)

  /** Core of q_agg_kmv over any events-shaped frame. */
  def aggKmvOn(ev: DataFrame, k: Int): DataFrame = {
    val kmv = udaf(new KmvAggregator(k))
    val hashed = ScratchCache.cache(ev
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long").as("h"))
      .distinct())
    val per = hashed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"), kmv(col("h")).as("mins"))
    val all = hashed.select(col("h")).distinct()
      .select(lit("ALL_UNION").as("event_type"), col("h"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"), kmv(col("h")).as("mins"))
    per.unionByName(all)
      .select(col("event_type").as("scope"), col("n_exact"),
        size(col("mins")).cast("long").as("kmv_k"),
        round(when(size(col("mins")) < k,
            size(col("mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60.0)) /
            element_at(col("mins"), k).cast("double")), 4).as("kmv_est"))
      .orderBy(col("scope"))
  }

  /** q_agg_ab_test — WELCH'S T-TEST between two user cohorts (r12):
    * the A/B significance readout every experimentation pipeline
    * computes — cohort A = even user_id, B = odd; per event type the
    * unequal-variance t statistic over the event `value` metric plus
    * a two-sided 5% significance flag (|t| > 1.96, the z-approx
    * appropriate at experiment n). q_agg_corr measures association
    * between metrics; this tests DIFFERENCE between populations.
    *
    * Exactness: values quantize once to DECIMAL(12,2) (double→decimal
    * rounds identically in both engines), the six cohort sums are
    * exact decimals, and mean/variance/t are ONE shared double tree —
    * bit-identical engines; degenerate cohorts (n ≤ 1 or zero
    * pooled variance) emit NULL, never Inf/NaN.
    *
    * Scale shape: ONE hash agg with conditional partials down to
    * ≤|types| rows — map-side combine carries six numbers per type;
    * nothing else touches the wire (the q_agg_stats one-pass-moments
    * plan with a cohort split). */
  def aggAbTest(s: SparkSession, d: String): DataFrame =
    aggAbTestOn(Tables.events(s, d))

  /** Core of q_agg_ab_test over any events-shaped frame. */
  def aggAbTestOn(ev: DataFrame): DataFrame = {
    val v = col("value").cast(DecimalType(12, 2))
    val isA = col("user_id") % 2 === 0
    ev.groupBy(col("event_type"))
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("na"),
        sum(when(!isA, 1L).otherwise(0L)).as("nb"),
        sum(when(isA, v)).as("sa"),
        sum(when(!isA, v)).as("sb"),
        sum(when(isA, (v * v).cast(DecimalType(38, 4)))).as("qa"),
        sum(when(!isA, (v * v).cast(DecimalType(38, 4)))).as("qb"))
      .select(col("event_type"), col("na"), col("nb"),
        col("na").cast("double").as("dna"),
        col("nb").cast("double").as("dnb"),
        col("sa").cast("double").as("dsa"),
        col("sb").cast("double").as("dsb"),
        col("qa").cast("double").as("dqa"),
        col("qb").cast("double").as("dqb"))
      .select(col("event_type"), col("na"), col("nb"),
        // ANSI guards: Spark 4 raises on x/0 even for doubles, so an
        // empty or single-row cohort must short-circuit to NULL here
        when(col("na") > 0, col("dsa") / col("dna")).as("ma"),
        when(col("nb") > 0, col("dsb") / col("dnb")).as("mb"),
        when(col("na") > 1,
          (col("dqa") - col("dsa") * col("dsa") / col("dna"))
            / (col("dna") - 1.0)).as("va"),
        when(col("nb") > 1,
          (col("dqb") - col("dsb") * col("dsb") / col("dnb"))
            / (col("dnb") - 1.0)).as("vb"),
        col("dna"), col("dnb"))
      .select(col("event_type"),
        col("na").as("n_a"), col("nb").as("n_b"),
        round(col("ma"), 6).as("mean_a"),
        round(col("mb"), 6).as("mean_b"),
        when(col("na") > 1 && col("nb") > 1
            && col("va") / col("dna") + col("vb") / col("dnb") > 0.0,
          round((col("ma") - col("mb"))
            / sqrt(col("va") / col("dna") + col("vb") / col("dnb")), 4))
          .as("t_stat"),
        when(col("na") > 1 && col("nb") > 1
            && col("va") / col("dna") + col("vb") / col("dnb") > 0.0,
          (abs((col("ma") - col("mb"))
            / sqrt(col("va") / col("dna") + col("vb") / col("dnb")))
            > 1.96).cast("int").cast("long")).as("significant"))
      .orderBy(col("event_type"))
  }

  /** q_agg_theta — SET-INTERSECTION estimation from KMV/theta sketches
    * (r12): the capability q_agg_kmv's scaladoc claims over HLL made
    * concrete. For every audience pair (A < B) sharing ≥1 user: θ =
    * min(θ_A, θ_B) (θ_X = the k-th smallest hash when the sketch
    * saturated, else the full hash range), C = |mins_A ∩ mins_B ∩
    * [0,θ)|, and the theta estimator |A∩B| ≈ C·2⁶⁰/θ — reported next
    * to the EXACT intersection so the estimate is self-auditing. The
    * "audience overlap without re-scanning either audience" op: at
    * 100 TB the stored 2 KB sketch rows answer any pair query.
    *
    * ORACLE-CHECKED, estimate included, for the same reason as
    * q_agg_kmv: k-min sets, θ and the common-below-θ count are
    * partition/merge-order invariant exact integers, and the
    * estimator is one shared double expression over them.
    *
    * Scale shape: the sketch table is one bounded-state typed UDAF
    * pass (≤ k longs per partial); the exact pair table is one
    * user-keyed equi self-join of the distinct (type,user) projection
    * (never a cross join — the pair frame then picks up the 5-row
    * sketch table via two broadcast hash joins, no BNLJ). */
  def aggTheta(s: SparkSession, d: String): DataFrame =
    aggThetaOn(Tables.events(s, d), k = 256)

  /** Core of q_agg_theta over any events-shaped frame. */
  def aggThetaOn(ev: DataFrame, k: Int): DataFrame = {
    val range = 1152921504606846976L // 2^60 — the md5-derived hash span
    val kmv = udaf(new KmvAggregator(k))
    val du = ScratchCache.cache(ev
      .select(col("event_type"),
        col("user_id").cast("string").as("uid"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long").as("h"))
      .distinct())
    val sk = du.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), kmv(col("h")).as("mins"))
      .withColumn("theta", when(col("n") >= k,
        element_at(col("mins"), k)).otherwise(lit(range)))
    val exact = du.as("x").join(du.as("y"),
        col("x.uid") === col("y.uid")
          && col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    exact
      .join(broadcast(sk.select(col("event_type").as("type_a"),
        col("mins").as("ma"), col("theta").as("tha"))), "type_a")
      .join(broadcast(sk.select(col("event_type").as("type_b"),
        col("mins").as("mb"), col("theta").as("thb"))), "type_b")
      .withColumn("theta", least(col("tha"), col("thb")))
      .withColumn("c", expr(
        "size(filter(array_intersect(ma, mb), x -> x < theta))")
        .cast("long"))
      .select(col("type_a"), col("type_b"), col("exact_inter"),
        col("c").as("common_below_theta"),
        round(col("c").cast("double") * lit(range).cast("double")
          / col("theta").cast("double"), 4).as("theta_est"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** q_agg_freq — EXACT corpus heavy hitters via the two-pass
    * Misra–Gries plan (r12): pass 1 reduces the token stream to a
    * ≤ k=200-counter MG sketch ([[FreqAggregator]] — bounded state,
    * mergeable, NO data-sized shuffle: map-side partials carry ≤ k
    * entries each and merge at the driver-bound final agg); the
    * sketch's guarantee (every token with freq > n/(k+1) survives)
    * makes its candidate array a SUPERSET of the true heavy hitters,
    * so pass 2 — a broadcast semi-filter of the token stream down to
    * candidates + exact hash-agg recount + the exact threshold
    * n_tok·(k+1) > n_total (integer arithmetic, no division) —
    * returns EXACTLY the tokens above 1/(k+1) corpus share, with
    * exact counts, invariant to partitioning/merge order. The classic
    * "find the stopwords/boilerplate tokens without shuffling the
    * vocabulary" plan: at 100 TB pass 2's exchange carries ≤ k
    * distinct tokens' partial counts instead of the full vocabulary.
    *
    * Oracle-checked DESPITE the sketch core — the sketch only
    * prunes; every surviving row is exactly recounted (the DuckDB
    * twin affords the full-vocabulary GROUP BY the sketch avoids). */
  def aggFreq(s: SparkSession, d: String): DataFrame =
    aggFreqOn(Tables.documents(s, d), k = 200)

  /** Core of q_agg_freq over any documents-shaped frame. */
  def aggFreqOn(docs: DataFrame, k: Int): DataFrame = {
    val mg = udaf(new FreqAggregator(k))
    val k0 = (c: Column) => pmod(hash(c), lit(1))
    val toks = ScratchCache.cache(docs.select(
      explode(split(lower(col("text")), " ")).as("token")))
    val cand = toks.agg(mg(col("token")).as("cand"))
      .select(explode(col("cand")).as("token"))
    val total = toks.agg(count(lit(1)).as("total"))
      .withColumn("jk", k0(col("total")))
    toks.join(broadcast(cand), Seq("token"), "leftsemi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("jk", k0(col("token")))
      .join(broadcast(total), Seq("jk"))
      .filter(col("n") * (k + 1) > col("total"))
      .select(col("token"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6)
          .as("share"))
      .orderBy(col("n").desc, col("token"))
  }

  /** q_agg_bitmap_retention — exact DAY-OVER-DAY RETENTION read
    * entirely from the stored bitmap STATE table (r12): the daily
    * per-type roaring states q_agg_bitmap builds, self-joined on
    * consecutive days, intersected with the native `roaring_and_card`
    * expression — n_retained = |users(day) ∩ users(day−1)|, exact.
    *
    * This is the AND half of the state algebra (OR answers "uniques
    * over any range"; AND answers "uniques in BOTH periods") and the
    * reason a warehouse stores bitmap states at all: retention,
    * churn, and audience-overlap questions over ANY period pair
    * become state-table lookups — no raw-event rescan, no
    * COUNT(DISTINCT CASE...) double scan. At 100 TB the state table
    * is |days|×|types| rows of O(distinct-ids) compressed bytes; the
    * consecutive-day self-join and the intersect run at that
    * granularity, never over events.
    *
    * Wire: (event_type, day, n_active, n_retained) for every day with
    * a preceding active day — exact integers, fully oracle-checked
    * (DuckDB replays the intersection as a distinct-pair join). */
  def aggBitmapRetention(s: SparkSession, d: String): DataFrame =
    aggBitmapRetentionOn(Tables.events(s, d))

  /** Core of q_agg_bitmap_retention over any events-shaped frame. */
  def aggBitmapRetentionOn(ev: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.registerFunctions(ev.sparkSession)
    val build = udaf(new RoaringBuildAggregator())
    // the state table feeds both sides of the consecutive-day join
    val daily = ScratchCache.cache(ev
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(build(col("user_id")).as("st")))
    val prev = daily.select(col("event_type").as("et_p"),
      col("day").as("day_p"), col("st.bm").as("bm_p"))
    val curr = daily.select(col("event_type"), col("day"),
      col("st.bm").as("bm"), col("st.card").as("n_active"))
    curr.join(prev,
        col("event_type") === col("et_p") &&
        col("day") === col("day_p") + expr("INTERVAL 1 DAY"))
      .select(col("event_type"), col("day"), col("n_active"),
        expr("roaring_and_card(bm_p, bm)").as("n_retained"))
      .orderBy(col("event_type"), col("day"))
  }

  /** q_agg_countmin — COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005)
    * point-frequency estimation, the guaranteed-overestimate sibling
    * of the Misra–Gries [[aggFreqOn]] (which underestimates): d=4
    * hash rows × w=64 counters, est(x) = min_i counter[i][h_i(x)] ≥
    * true(x) always, E[overcount] ≤ 2N/w per row. Hashes are
    * DETERMINISTIC affine maps h_i(x) = ((a_i·((x+1) mod p) + b_i)
    * mod p) mod w with p = 2^31−1 — integer-exact in both engines, so
    * unlike the xxhash-based native aggregate
    * ([[graft.functions.CountMinEstimate]], the codegen'd production
    * path, spec-bounded in CountMinSpec) this ledger is fully DuckDB-
    * replayable and the oracle checks estimate VALUES, not just
    * bounds. Scale shape: the sketch build is one posexplode(×d) +
    * hash-agg with map-side combine down to ≤ d·w=256 partial rows
    * per task — constant-size state at any input scale, and two
    * sketches merge by (row, bucket) counter addition (spec-proved),
    * the mergeability that makes it a per-shard → global rollup at
    * 100 TB. Probes (suppkeys 1..15) broadcast against the sketch.
    * Wire: (k, exact_cnt, cms_est, overcount) — overcount ≥ 0 is the
    * CMS invariant, exact equality for lightly-loaded buckets. */
  def aggCountMin(s: SparkSession, d: String): DataFrame =
    aggCountMinOn(Tables.lineitem(s, d)
      .select(col("l_suppkey").cast("long").as("x")))

  /** Core of q_agg_countmin over any single-long-column (x) frame. */
  def aggCountMinOn(xs: DataFrame): DataFrame = {
    val p = 2147483647L // 2^31 − 1; a·((x+1) mod p) + b < 10^5·2^31 « 2^63
    val w = 64L
    val as = Seq(31L, 131L, 1031L, 10007L)
    val bs = Seq(7L, 17L, 29L, 47L)
    def bucket(i: Int, x: Column): Column =
      pmod(pmod(lit(as(i)) * pmod(x + lit(1L), lit(p)) + lit(bs(i)), lit(p)),
        lit(w))
    val sketch = xs
      .select(posexplode(array(as.indices.map(i => bucket(i, col("x"))): _*)))
      .groupBy(col("pos").as("hrow"), col("col").as("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val probes = xs.filter(col("x") <= 15)
      .groupBy(col("x").as("k")).agg(count(lit(1)).as("exact_cnt"))
    probes
      .select(col("k"), col("exact_cnt"),
        posexplode(array(as.indices.map(i => bucket(i, col("k"))): _*)))
      .join(broadcast(sketch),
        col("pos") === col("hrow") && col("col") === col("bkt"))
      .groupBy(col("k"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("exact_cnt"))
      .orderBy(col("k"))
  }
}
