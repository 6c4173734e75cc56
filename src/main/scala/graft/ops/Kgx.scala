package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** KGX node: id (CURIE), display name, Biolink category list, open
  * property bag (SURVEY.md §1.1 — reference `Common/kgxmodel.py`
  * kgxnode). */
case class KgxNode(id: String, name: String, category: Seq[String],
  props: Map[String, String])

/** KGX edge: subject/predicate/object CURIEs + provenance bag
  * (reference kgxedge; `object` backticked — KGX requires that exact
  * field name in the JSON Lines output). */
case class KgxEdge(subject: String, predicate: String, `object`: String,
  publications: Seq[String], props: Map[String, String])

/** Typed KGX layer (SURVEY.md §1.2): `Dataset[KgxNode]`/`Dataset[KgxEdge]`
  * with case-class Encoders where type safety helps (merge logic,
  * programmatic construction); the untyped DataFrame path in
  * GraphOps/Sources stays the Catalyst-optimal route for bulk SQL-shaped
  * work. Both produce identical KGX JSON Lines.
  */
object Kgx {

  /** Customers ∪ parts as typed nodes. */
  def nodes(s: SparkSession, d: String): Dataset[KgxNode] = {
    import s.implicits._
    val customers = Tables.customer(s, d)
      .select(
        concat(lit("CUST:"), col("c_custkey")).as("id"),
        col("c_name").as("name"),
        array(lit("biolink:Agent"), lit("customer")).as("category"),
        map(lit("mktsegment"), col("c_mktsegment")).as("props"))
    val parts = Tables.part(s, d)
      .select(
        concat(lit("PART:"), col("p_partkey")).as("id"),
        col("p_name").as("name"),
        array(lit("biolink:ChemicalEntity"), lit("part")).as("category"),
        map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
          .as("props"))
    customers.unionByName(parts).as[KgxNode]
  }

  /** Order→part lines as typed edges. */
  def edges(s: SparkSession, d: String): Dataset[KgxEdge] = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(
        concat(lit("ORDER:"), col("l_orderkey")).as("subject"),
        lit("biolink:related_to").as("predicate"),
        concat(lit("PART:"), col("l_partkey")).as("object"),
        array().cast("array<string>").as("publications"),
        map(lit("quantity"), col("l_quantity").cast("string")).as("props"))
      .as[KgxEdge]
  }

  /** Typed merge — same-id nodes merge categories (sorted union) and
    * property bags, reference GraphMerger.merge_nodes semantics on the
    * typed API (groupByKey + reduceGroups). The untyped twin is
    * GraphOps.nodeMerge; this one keeps compile-time row types. */
  def mergeNodes(ds: Dataset[KgxNode]): Dataset[KgxNode] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.id)
      .reduceGroups { (a: KgxNode, b: KgxNode) =>
        KgxNode(a.id,
          if (a.name >= b.name) a.name else b.name,
          (a.category ++ b.category).distinct.sorted,
          a.props ++ b.props)
      }
      .map(_._2)
  }

  /** KGX JSON Lines serialization of either typed dataset. */
  def toJsonl(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(to_json(struct(df.columns.map(col): _*))).as[String]
  }
}
