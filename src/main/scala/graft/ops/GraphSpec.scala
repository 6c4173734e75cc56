package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-spec layer (reference EP3: `graph_specs` YAML →
  * `KGXFileMerger` — a named graph composed from N normalized sources).
  *
  * The reference describes a graph as YAML: a name plus the source ids
  * to merge. No YAML dependency ships in this environment, so the
  * parser accepts the minimal indented-list subset those spec files
  * actually use (see [[GraphSpec.parse]]); the spec itself is plain
  * case classes, matching SURVEY §1.1's "config case classes, not a
  * runtime data structure".
  */
case class GraphSource(sourceId: String)
case class GraphSpec(graphId: String, sources: Seq[GraphSource])

object GraphSpec {
  /** Parse the minimal spec format:
    * {{{
    * graph_id: my_graph
    * sources:
    *   - source_a
    *   - source_b
    * }}} */
  def parse(text: String): GraphSpec = {
    val lines = text.linesIterator.map(_.stripTrailing)
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#")).toList
    // FAIL LOUDLY on anything outside the declared subset: a quoted
    // value, nested mapping, or inline list from a fuller YAML would
    // otherwise silently mis-parse into a wrong-but-plausible spec
    lines.foreach { l =>
      val t = l.trim
      // A list item may contain ':' (CURIE ids like CHEBI:1234, URLs)
      // but not the ': ' key-value shape of a nested mapping; a bare
      // '-' (empty id) is rejected too
      val isItem = t.startsWith("-") && !t.startsWith("--")
      val ok = t.startsWith("graph_id:") || t == "sources:" ||
        (isItem && !t.contains(": ") &&
          t.stripPrefix("-").trim.nonEmpty)
      require(ok, s"graph_spec line not in the supported subset " +
        s"(graph_id:, sources:, '- <id>'): '$t' — quoted values, " +
        "nested mappings, inline lists and empty ids are not supported")
      require(!t.contains("\"") && !t.contains("'"),
        s"graph_spec quoting is not supported: '$t'")
    }
    val graphId = lines.collectFirst {
      case l if l.trim.startsWith("graph_id:") =>
        l.trim.stripPrefix("graph_id:").trim
    }.getOrElse(throw new IllegalArgumentException("graph_id missing"))
    val sources = lines.dropWhile(!_.trim.startsWith("sources:"))
      .drop(1).takeWhile(_.trim.startsWith("-"))
      .map(l => GraphSource(l.trim.stripPrefix("-").trim))
    GraphSpec(graphId, sources)
  }

  /** Parse a MULTI-graph spec file: sequential `graph_id:` blocks,
    * each in the [[parse]] subset — the flat form of the reference's
    * graph_specs listing several named graphs built in one run over
    * shared sources:
    * {{{
    * graph_id: graph_a
    * sources:
    *   - src_1
    *   - src_2
    * graph_id: graph_b
    * sources:
    *   - src_2
    * }}}
    * Graph ids must be unique; every block revalidates through
    * [[parse]], so the loud-failure contract is identical. */
  def parseMulti(text: String): Seq[GraphSpec] = {
    val lines = text.linesIterator.toList
    val starts = lines.zipWithIndex
      .collect { case (l, i) if l.trim.startsWith("graph_id:") => i }
    require(starts.nonEmpty, "multi-graph spec: no graph_id blocks")
    // blocks slice from the FIRST graph_id, so anything before it
    // (leading garbage, a misspelled first key) would silently vanish
    // without this — the loud-failure contract single-spec parse has
    lines.take(starts.head).find(_.trim.nonEmpty).foreach { l =>
      throw new IllegalArgumentException(
        s"multi-graph spec: content before the first graph_id block " +
          s"is not allowed: '${l.trim}'")
    }
    val blocks = starts.zipAll(starts.drop(1), -1, lines.length)
      .map { case (a, b) => lines.slice(a, b).mkString("\n") }
    val specs = blocks.map(parse)
    val dup = specs.groupBy(_.graphId).collect {
      case (id, xs) if xs.length > 1 => id }
    require(dup.isEmpty,
      s"multi-graph spec: duplicate graph_id(s) ${dup.mkString(", ")}")
    specs
  }
}

/** EP3 composition: given a spec and a node frame per source id, build
  * the merged graph the way `KGXFileMerger` does — union the selected
  * sources, merge same-id nodes (category-set union, max name, source
  * provenance list). One hash aggregate; at 100 TB this is exactly the
  * distributed form of the reference's external merge sort.
  */
object GraphBuilder {
  def mergeNodes(spec: GraphSpec,
      sources: Map[String, DataFrame]): DataFrame = {
    val selected = spec.sources.map { gs =>
      val df = sources.getOrElse(gs.sourceId,
        throw new IllegalArgumentException(s"unknown source ${gs.sourceId}"))
      df.select(col("id"), col("category"), col("name"),
        lit(gs.sourceId).as("provenance"))
    }
    selected.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(
        sort_array(collect_set(col("category"))).as("cats"),
        max(col("name")).as("name"),
        sort_array(collect_set(col("provenance"))).as("provenance"),
        count(lit(1)).as("n_srcs"))
      .orderBy(col("id"))
  }
}
