package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One node extraction rule: which column carries the id, how to build
  * the CURIE, the Biolink category, and an optional row filter
  * (SQL boolean expression over the RAW columns — compiled to a
  * Catalyst predicate, so it pushes into the scan). `props` carries
  * source columns along as node properties (output name → raw
  * column), emitted as a deterministic JSON object column — the
  * reference's parsers all keep per-source property bags (scores,
  * taxa, publications) beside the KGX core. */
case class NodeRule(
  idCol: String,
  idPrefix: String,
  category: String,
  nameCol: Option[String] = None,
  filter: Option[String] = None,
  props: Map[String, String] = Map.empty)

/** One edge extraction rule. The predicate is either the constant
  * `predicate`, or — when `predicateCol` is set — a lookup of that
  * column through `predicateMap` with unmapped values RETAINED as
  * `raw:<lower>` (the same norm-failure retention rule the rest of
  * the engine uses; see GraphOps.normalizeEdges). */
case class EdgeRule(
  subjectCol: String,
  subjectPrefix: String,
  objectCol: String,
  objectPrefix: String,
  predicate: String = "biolink:related_to",
  predicateCol: Option[String] = None,
  predicateMap: Map[String, String] = Map.empty,
  filter: Option[String] = None,
  props: Map[String, String] = Map.empty)

/** Declarative per-source parser spec — the reference's dominant
  * extension pattern made data instead of code. The reference ships
  * ~30 `parsers/<SRC>/src/load<SRC>.py` variants that all do the same
  * thing: read a delimited/JSON file, map columns to KGX node/edge
  * fields, filter rows, prefix CURIEs. A [[SourceSpec]] captures that
  * shape as a value, so adding a source means writing a spec (which
  * could itself be loaded from config), not new Scala.
  *
  *  - `format`: tsv | csv | jsonl | parquet.
  *  - `columns`: pins a headerless delimited schema (all strings —
  *    these formats are untyped; pinning also means NO inference pass,
  *    which at 100 TB would be a second full read).
  *  - `options`: passed straight to the DataFrameReader (e.g.
  *    `header -> true`, `comment -> "!"`).
  *
  * Everything compiles to column expressions over one scan — filters
  * and projections push down; nothing is row-at-a-time. */
case class SourceSpec(
  name: String,
  format: String = "tsv",
  options: Map[String, String] = Map.empty,
  columns: Seq[String] = Nil,
  nodes: Seq[NodeRule] = Nil,
  edges: Seq[EdgeRule] = Nil)

object SourceSpec {
  /** Parse a spec from JSON — the "add a source without writing
    * Scala" path: a user drops a config file next to the data and
    * the pipeline picks it up. Uses json4s (bundled inside Spark, no
    * extra dependency); unknown keys are ignored, absent keys take
    * the case-class defaults, so specs stay forward-compatible.
    * {{{
    * {"name": "mysrc", "format": "tsv",
    *  "columns": ["gene", "disease", "score"],
    *  "nodes": [{"idCol": "gene", "idPrefix": "NCBIGene:",
    *             "category": "biolink:Gene"}],
    *  "edges": [{"subjectCol": "gene", "subjectPrefix": "NCBIGene:",
    *             "objectCol": "disease", "objectPrefix": "MONDO:",
    *             "filter": "score > '0.5'"}]}
    * }}} */
  def fromJson(json: String): SourceSpec = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val formats: Formats = DefaultFormats
    JsonMethods.parse(json).extract[SourceSpec]
  }

  /** [[fromJson]] over a config file on the driver's filesystem —
    * specs are KBs of config, never data, so a driver-side read is
    * the right tool. */
  def fromJsonFile(path: String): SourceSpec =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Scan the source file(s) per the spec (schema pinned, no
    * inference when `columns` is given). */
  def read(s: SparkSession, spec: SourceSpec, path: String): DataFrame = {
    val pinned =
      if (spec.columns.isEmpty) None
      else Some(StructType(spec.columns.map(StructField(_, StringType))))
    spec.format.toLowerCase match {
      case f @ ("tsv" | "csv") =>
        val r = s.read.options(spec.options)
          .option("sep", if (f == "tsv") "\t" else ",")
        pinned match {
          case Some(sc) => r.schema(sc).csv(path)
          // header names the columns; values stay strings (no
          // inference pass unless the spec opts in via options)
          case None => r.option("header", "true").csv(path)
        }
      case "jsonl" | "json" =>
        pinned.fold(s.read.options(spec.options))(
          s.read.options(spec.options).schema(_)).json(path)
      case "parquet" => s.read.options(spec.options).parquet(path)
      case other => throw new IllegalArgumentException(
        s"SourceSpec '${spec.name}': unsupported format '$other'")
    }
  }

  private def prefixed(prefix: String, c: Column): Column =
    if (prefix.isEmpty) c.cast("string")
    else concat(lit(prefix), c.cast("string"))

  /** A rule's property bag as ONE deterministic JSON-object column:
    * keys in sorted order (map field order would otherwise depend on
    * spec authoring order), values as strings, absent → `{}`. A
    * single string column keeps every rule union-compatible whatever
    * properties each declares. */
  private def propsJson(props: Map[String, String]): Column =
    if (props.isEmpty) lit("{}")
    else to_json(map(props.toSeq.sortBy(_._1).flatMap {
      case (out, src) => Seq(lit(out), col(src).cast("string"))
    }: _*))

  /** Fail fast with the spec/rule/column named when a rule references
    * a column the scanned data doesn't have — a config typo should
    * read as a config error, not a planner stack trace. (Filter
    * expressions stay Spark-validated: they're arbitrary SQL.) */
  private def validate(raw: DataFrame, spec: SourceSpec): Unit = {
    val have = raw.columns.toSet
    def miss(rule: String, cols: Seq[String]): Unit =
      cols.filterNot(have.contains) match {
        case Nil => ()
        case bad => throw new IllegalArgumentException(
          s"SourceSpec '${spec.name}' $rule references " +
            s"column(s) ${bad.mkString("'", "', '", "'")} not in the " +
            s"source (available: ${raw.columns.sorted.mkString(", ")})")
      }
    spec.nodes.zipWithIndex.foreach { case (r, i) =>
      miss(s"nodes[$i]", r.idCol +: (r.nameCol.toSeq ++ r.props.values))
    }
    spec.edges.zipWithIndex.foreach { case (r, i) =>
      miss(s"edges[$i]", Seq(r.subjectCol, r.objectCol) ++
        r.predicateCol.toSeq ++ r.props.values)
    }
  }

  /** KGX-shaped nodes (id, name, category, source) from every node
    * rule — one scan, unioned extractions, null ids dropped. */
  def nodes(raw: DataFrame, spec: SourceSpec): DataFrame = {
    require(spec.nodes.nonEmpty,
      s"SourceSpec '${spec.name}' declares no node rules")
    validate(raw, spec.copy(edges = Nil))
    spec.nodes.map { r =>
      raw.filter(r.filter.map(expr).getOrElse(lit(true)))
        .select(
          prefixed(r.idPrefix, col(r.idCol)).as("id"),
          r.nameCol.map(col(_).cast("string"))
            .getOrElse(prefixed(r.idPrefix, col(r.idCol))).as("name"),
          lit(r.category).as("category"),
          lit(spec.name).as("source"),
          propsJson(r.props).as("props"))
        .filter(col("id").isNotNull)
    }.reduce(_ unionByName _).distinct()
  }

  /** KGX-shaped edges (subject, predicate, object, source) from every
    * edge rule; rows with a null endpoint are dropped (they would be
    * dangling by construction). */
  def edges(raw: DataFrame, spec: SourceSpec): DataFrame = {
    validate(raw, spec.copy(nodes = Nil))
    spec.edges match {
      case Nil =>
        raw.limit(0).select(
          lit(null).cast("string").as("subject"),
          lit(null).cast("string").as("predicate"),
          lit(null).cast("string").as("object"),
          lit(null).cast("string").as("source"),
          lit(null).cast("string").as("props"))
      case rules => rules.map { r =>
        val pred = r.predicateCol match {
          case None => lit(r.predicate): Column
          case Some(pc) =>
            r.predicateMap.foldLeft(
              concat(lit("raw:"), lower(col(pc))): Column) {
              case (acc, (k, v)) => when(col(pc) === k, lit(v)).otherwise(acc)
            }
        }
        raw.filter(r.filter.map(expr).getOrElse(lit(true)))
          .select(
            prefixed(r.subjectPrefix, col(r.subjectCol)).as("subject"),
            pred.as("predicate"),
            prefixed(r.objectPrefix, col(r.objectCol)).as("object"),
            lit(spec.name).as("source"),
            propsJson(r.props).as("props"))
          .filter(col("subject").isNotNull && col("object").isNotNull)
      }.reduce(_ unionByName _).distinct()
    }
  }

  /** One-call spec → (nodes, edges). */
  def load(s: SparkSession, spec: SourceSpec, path: String)
      : (DataFrame, DataFrame) = {
    val raw = read(s, spec, path)
    (nodes(raw, spec), edges(raw, spec))
  }
}
