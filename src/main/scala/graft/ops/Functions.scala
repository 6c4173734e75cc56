package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.8): string / date / math /
  * json / array / map / UDF / generator. Reference capability: CURIE
  * string surgery, release-date parsing, p-value transforms, JSON
  * payload parsing (`Common/normalization.py`, parsers). Everything here
  * is row-level and codegen'd — stays inside WholeStageCodegen, no
  * shuffle except where a groupBy is the point of the query.
  *
  * Cross-engine float rules (probed against DuckDB 1.0.0):
  *  - double→decimal casts round half-away-from-zero in BOTH engines →
  *    safe; decimal→decimal scale reduction is NOT (HALF_EVEN there).
  *  - round(double, n) in both engines rounds the shortest decimal repr
  *    half-up → safe on any deterministic double.
  *  - row-level double arithmetic is IEEE-identical → raw double
  *    outputs are safe; only multi-row float accumulation needs the
  *    exact-decimal treatment.
  */
object Functions {
  private def d2(c: Column): Column = c.cast(DecimalType(38, 2))
  /** Exact carrier for float aggregation: float→double is exact, then
    * double→DECIMAL(25,12) rounds identically in both engines. */
  private def emb(c: Column): Column =
    c.cast("double").cast(DecimalType(25, 12))

  /** q_str_funcs — string expression pack over part. */
  def strFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        expr("replace(p_name, ' ', '_')").as("name_us"),
        lpad(col("p_size").cast("string"), 4, "0").as("size4"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        col("p_type").like("PROMO%").as("is_promo"))
      .orderBy(col("p_partkey"))

  /** q_date_funcs — datetime pack over orders. Spark dayofweek is
    * 1=Sunday; the oracle uses DuckDB dayofweek()+1 (0=Sunday there). */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("plus30"),
        datediff(lit("2000-01-01").cast("date"),
          col("o_orderdate")).as("days_to_y2k"))
      .orderBy(col("o_orderkey"))

  /** q_math_funcs — math pack over lineitem. Row-level doubles are
    * IEEE-identical cross-engine → emitted raw; only ln/log10 (libm,
    * 1-ulp divergence possible) round to 6dp. */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_extendedprice")).as("ceil_p"),
        floor(col("l_extendedprice")).as("floor_p"),
        (col("l_partkey") % 7).as("pmod7"),
        pow(col("l_quantity"), lit(2)).as("qty_sq"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
        round(log(col("l_extendedprice")), 6).as("ln_p"),
        round(log10(col("l_extendedprice")), 6).as("log10_p"),
        signum(col("l_discount") - 0.05).cast("int").as("sgn"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("qty_sq"),
        col("sqrt_p"), col("abs_d"), col("pmod7"))

  /** q_json_funcs — extract int from the JSON props bag, filter and
    * aggregate on it (reference: node-norm JSON response parsing). */
  def jsonFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k") >= 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** q_array_funcs — size/element_at guard + slice + posexplode over
    * embeddings; per-(label, dim) exact-decimal average of the first 8
    * dims. The float sum rides DECIMAL(25,12) so it is independent of
    * partition order (a raw double sum would not be). */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(size(col("embedding")) === 64 &&
        element_at(col("embedding"), 1).isNotNull)
      .select(col("label"), col("vec_id"),
        posexplode(slice(col("embedding"), 1, 8)))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        emb(col("col")).as("v"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("v")).as("sv"))
      .select(col("label"), col("dim"), col("n_vecs"),
        round(col("sv").cast("double") / col("n_vecs"), 6).as("avg_v"))
      .orderBy(col("label"), col("dim"))

  /** q_map_funcs — per-user map<event_type,count> built with
    * map_from_entries, then exploded back to rows (reference: open
    * property bags on KGX nodes/edges). The oracle twin is the
    * relational groupBy — identical rows prove the map roundtrip. */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(col("user_id"), explode(col("m")).as(Seq("event_type", "cnt")))
      .orderBy(col("user_id"), col("event_type"))

  /** q_udf_scalar — Scala UDF extracting a CURIE prefix. Opaque to
    * Catalyst (no pushdown through it) — documented cost of the UDF
    * escape hatch; the built-in twin would be substring_index. */
  def udfScalar(s: SparkSession, d: String): DataFrame = {
    val curiePrefix = udf((id: String) =>
      if (id == null) null else id.split(":", 2)(0))
    Tables.customer(s, d)
      .select(curiePrefix(
        concat(col("c_mktsegment"), lit(":"), col("c_custkey")))
        .as("prefix"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prefix"))
  }

  /** q_udtf_tokens — generator: one row per token with position
    * (reference: Python generator row-emitters; north-star text
    * analysis). posexplode is Spark's native UDTF surface here. */
  def udtfTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("token"))
      .orderBy(col("doc_id"), col("pos"))
}
