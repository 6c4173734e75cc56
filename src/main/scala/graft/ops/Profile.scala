package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Table profiling — the data-quality pass a 100 TB ingest runs before
  * anything else touches the data (the reference's per-source QC
  * counters generalized to a schema-driven profile; SURVEY §2.9's
  * curation family). One operator, exact answers: per column the null
  * count, EXACT distinct count, and numeric min/max.
  *
  * Plan shape (the part that matters at scale): the frame is MELTED —
  * one narrow (col_name, value-as-string, value-as-double, is_null)
  * row per cell via a single generator — then aggregated in TWO
  * explicit phases:
  *
  *   1. groupBy(col_name, v)  — dedups values; map-side partial
  *      aggregation collapses each column's repeated values before the
  *      only wide shuffle, so shuffle volume is Σ per-column distinct,
  *      not rows × columns;
  *   2. groupBy(col_name)     — 11 groups; folds phase-1's partial
  *      null counts and min/max.
  *
  * This is deliberately NOT `agg(countDistinct, sum, min, max)` on the
  * unmelted frame: mixing distinct and non-distinct aggregates makes
  * Catalyst plan an Expand (one duplicated row stream per aggregate
  * branch), which multiplies the scan output by the branch count. The
  * manual two-phase form ships one generator + two hash aggregates and
  * stays entirely in whole-stage codegen.
  *
  * Exactness contract: n_distinct counts native values via their
  * string image (injective for every profiled type, including the
  * shortest-roundtrip double format); min/max are computed on doubles
  * (single values, no accumulation — cross-engine safe); timestamps
  * profile as epoch micros. At 100 TB the same plan holds — swap the
  * exact phase-1 dedup for approx_count_distinct only if the Σdistinct
  * shuffle itself is the bottleneck (it is the profile's floor).
  *
  * Nulls are PLANTED deterministically (every 7th l_quantity, every
  * 13th l_returnflag) so the null path is genuinely exercised and
  * oracle-able — the TPC-H-shaped testdata itself ships no NULLs.
  */
object Profile {

  /** q_profile_table — exact per-column profile of lineitem (with two
    * deterministically null-planted columns). Wire: (col_name,
    * n_nulls, n_distinct, min_num, max_num) ordered by col_name. */
  def profileTable(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .withColumn("l_quantity",
        when(col("l_linenumber") % 7 === 0, lit(null)).otherwise(col("l_quantity")))
      .withColumn("l_returnflag",
        when(col("l_orderkey") % 13 === 0, lit(null)).otherwise(col("l_returnflag")))
    profileOn(li)
  }

  /** q_profile_drift — SNAPSHOT-TO-SNAPSHOT drift monitoring, the
    * data-quality check a recurring 100 TB ingest runs between loads
    * (the reference re-fetches sources per release; "did this release
    * move under us" is the first question): profile two snapshots of
    * the same table ([[profileOn]] twice — orders 1996 vs 1997 here)
    * and emit the per-column drift ledger — null counts, distinct
    * counts and their delta, and the min/max shifts of the numeric
    * image. A schema change surfaces as a one-sided (null-padded) row
    * via the FULL join; a distribution change surfaces as
    * distinct/min/max movement.
    *
    * Scale shape: exactly two [[profileOn]] passes (each one generator
    * + two hash aggregates, shuffle volume Σ per-column distinct) and
    * an 11-row join — drift adds nothing data-sized to the profile
    * cost. Shift arithmetic is single subtractions on exact doubles
    * (no accumulation), cross-engine safe. */
  def profileDrift(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    profileDriftOn(
      o.filter(year(col("o_orderdate")) === 1996),
      o.filter(year(col("o_orderdate")) === 1997))
  }

  /** Core of q_profile_drift over any two same-shaped frames. */
  def profileDriftOn(a: DataFrame, b: DataFrame): DataFrame = {
    val pa = profileOn(a).select(col("col_name"),
      col("n_nulls").as("nulls_a"), col("n_distinct").as("distinct_a"),
      col("min_num").as("min_a"), col("max_num").as("max_a"))
    val pb = profileOn(b).select(col("col_name"),
      col("n_nulls").as("nulls_b"), col("n_distinct").as("distinct_b"),
      col("min_num").as("min_b"), col("max_num").as("max_b"))
    pa.join(pb, Seq("col_name"), "full")
      .select(col("col_name"),
        col("nulls_a"), col("nulls_b"),
        col("distinct_a"), col("distinct_b"),
        (col("distinct_b") - col("distinct_a")).as("distinct_delta"),
        (col("min_b") - col("min_a")).as("min_shift"),
        (col("max_b") - col("max_a")).as("max_shift"))
      .orderBy(col("col_name"))
  }

  /** Core of q_profile_table over any frame — split out so tests can
    * profile hand-built fixtures. Numeric image: integral/floating
    * columns cast to double, timestamps to epoch micros, strings none. */
  def profileOn(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val cells: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val num: Column = f.dataType match {
        case _: NumericType => c.cast("double")
        case _: TimestampType => unix_micros(c).cast("double")
        // NTZ carries a wall-clock; the session zone is pinned UTC
        // (Graft.init / the harness builders assert it), so the cast
        // to instant is the identity on the micros value — same
        // contract Tables.events documents.
        case _: TimestampNTZType =>
          unix_micros(c.cast(TimestampType)).cast("double")
        case _ => lit(null).cast("double")
      }
      struct(lit(f.name).as("col_name"), c.cast("string").as("v"),
        num.as("x"), c.isNull.cast("long").as("isn"))
    }
    val melted = df
      .select(explode(array(cells: _*)).as("cell"))
      .select(col("cell.*"))
    melted
      .groupBy(col("col_name"), col("v"))
      .agg(sum(col("isn")).as("nn"), min(col("x")).as("mn"),
        max(col("x")).as("mx"))
      .groupBy(col("col_name"))
      .agg(sum(col("nn")).as("n_nulls"),
        count(col("v")).as("n_distinct"),
        min(col("mn")).as("min_num"), max(col("mx")).as("max_num"))
      .orderBy(col("col_name"))
  }

  /** q_validate_rules — declarative data-quality expectations engine
    * (r12): a 13-rule contract over orders/lineitem/customer evaluated
    * in one report — not_null, accepted_values, range, key uniqueness
    * and cross-table referential integrity — each rule a row of
    * (n_rows, n_viol, viol_rate, pass/fail). The "expectations" pass a
    * 100 TB warehouse gates every load on (and the reference's
    * per-source QC counters generalized to reusable rule kinds).
    *
    * Plan contract: ALL row-local rules for a table fold into ONE scan
    * of it (conditional-sum partials collapse map-side; the 1-row
    * aggregate then explodes into that table's rule rows) — 3 scans
    * for 9 row-local rules, not 9. Uniqueness rules are dedicated
    * count-distinct branches (kept OUT of the shared scan: mixing
    * distinct and conditional aggregates would make Catalyst plan an
    * Expand that multiplies the scan output — the q_profile_table
    * lesson). Referential rules are broadcast LEFT joins against the
    * distinct parent key, violations and totals counted in the same
    * pass. Everything lands as a ≤13-row union — wire cost is the
    * scans, never the report.
    *
    * The planted expectations are deliberately a mix: r05/r06/r08/r10
    * FAIL on the shipped testdata (oversized quantities, deep
    * discounts, duplicate (l_orderkey, l_linenumber) pairs — the
    * documented non-unique key — and negative balances), the rest
    * pass; both branches of the status logic are therefore
    * oracle-exercised. */
  def validateRules(s: SparkSession, d: String): DataFrame =
    validateRulesOn(Tables.orders(s, d), Tables.lineitem(s, d),
      Tables.customer(s, d))

  /** Core of q_validate_rules over orders/lineitem/customer frames. */
  def validateRulesOn(ord: DataFrame, li: DataFrame,
      cust: DataFrame): DataFrame = {
    def ruleRow(id: String, tbl: String, rule: String, n: Column,
        v: Column): Column =
      struct(lit(id).as("rule_id"), lit(tbl).as("tbl"),
        lit(rule).as("rule"), n.cast("long").as("n_rows"),
        v.cast("long").as("n_viol"))
    def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    // one scan per table: every row-local rule is a conditional sum
    val oRules = ord.agg(count(lit(1)).as("n"),
        viol(col("o_custkey").isNull).as("v1"),
        viol(!col("o_orderstatus").isin("F", "O", "P")).as("v2"),
        viol(col("o_totalprice") <= 0d).as("v3"))
      .select(explode(array(
        ruleRow("r01", "orders", "not_null:o_custkey", col("n"), col("v1")),
        ruleRow("r02", "orders", "accepted:o_orderstatus", col("n"), col("v2")),
        ruleRow("r03", "orders", "range:o_totalprice>0", col("n"), col("v3"))
      )).as("r"))
    val lRules = li.agg(count(lit(1)).as("n"),
        viol(col("l_quantity") > 45d).as("v1"),
        viol(col("l_discount") > 0.08d).as("v2"),
        viol(col("l_shipdate").isNull).as("v3"))
      .select(explode(array(
        ruleRow("r05", "lineitem", "range:l_quantity<=45", col("n"), col("v1")),
        ruleRow("r06", "lineitem", "range:l_discount<=0.08", col("n"), col("v2")),
        ruleRow("r07", "lineitem", "not_null:l_shipdate", col("n"), col("v3"))
      )).as("r"))
    val cRules = cust.agg(count(lit(1)).as("n"),
        viol(col("c_name").isNull).as("v1"),
        viol(col("c_acctbal") < 0d).as("v2"),
        viol(!col("c_mktsegment").isin("AUTOMOBILE", "BUILDING",
          "FURNITURE", "HOUSEHOLD", "MACHINERY")).as("v3"))
      .select(explode(array(
        ruleRow("r09", "customer", "not_null:c_name", col("n"), col("v1")),
        ruleRow("r10", "customer", "range:c_acctbal>=0", col("n"), col("v2")),
        ruleRow("r11", "customer", "accepted:c_mktsegment", col("n"), col("v3"))
      )).as("r"))
    // uniqueness: dedicated distinct branches (violations = excess rows)
    val oUniq = ord.agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("nd"))
      .select(ruleRow("r04", "orders", "unique:o_orderkey",
        col("n"), col("n") - col("nd")).as("r"))
    val lUniq = li.agg(count(lit(1)).as("n"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd"))
      .select(ruleRow("r08", "lineitem", "unique:l_orderkey,l_linenumber",
        col("n"), col("n") - col("nd")).as("r"))
    // referential integrity: broadcast LEFT join against the distinct
    // parent key — total and orphan count in the same pass. A NULL
    // child key is NOT an orphan (that is the not_null rule's charge;
    // SQL FK semantics ignore NULLs).
    val oFk = ord.join(
        broadcast(cust.select(col("c_custkey")).distinct()),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n"),
        viol(col("o_custkey").isNotNull && col("c_custkey").isNull).as("v"))
      .select(ruleRow("r12", "orders", "fk:o_custkey->customer.c_custkey",
        col("n"), col("v")).as("r"))
    val lFk = li.join(
        broadcast(ord.select(col("o_orderkey").as("pk")).distinct()),
        col("l_orderkey") === col("pk"), "left")
      .agg(count(lit(1)).as("n"),
        viol(col("l_orderkey").isNotNull && col("pk").isNull).as("v"))
      .select(ruleRow("r13", "lineitem", "fk:l_orderkey->orders.o_orderkey",
        col("n"), col("v")).as("r"))
    Seq(oRules, lRules, cRules, oUniq, lUniq, oFk, lFk)
      .reduce(_.unionAll(_))
      .select(col("r.*"))
      .select(col("rule_id"), col("tbl"), col("rule"), col("n_rows"),
        col("n_viol"),
        round(col("n_viol").cast("double") / col("n_rows"), 6)
          .as("viol_rate"),
        when(col("n_viol") === 0, "pass").otherwise("fail").as("status"))
      .orderBy(col("rule_id"))
  }
}
