package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.chaining._
import graft.Tables
import java.nio.file.Paths

/** q_pipeline_kgx — the reference's daily artifact, EP1→EP2→EP3 as ONE
  * composed run (SURVEY.md §3.1): parse sources → normalize node ids
  * (broadcast mapping, failures retained + logged) → normalize edges
  * (predicate remap + endpoint drop/log via
  * [[GraphOps.normalizeEdgesSplit]]) → merge nodes/edges → write KGX
  * JSON Lines + the norm-failure log. The returned frame is the
  * per-stage count ledger — the reference's `load_metadata` /
  * normalization-metadata JSON as wire rows (stage, n), every value an
  * exact integer.
  *
  * The synthetic "node-normalization service response" is the nation
  * mapping: customers in a mapped nation (< 20) get canonical id
  * `CANON:<key>`; event users normalize iff their id is a mapped
  * customer key — so two RAW id spaces (`CUST:`, `USER:`) collapse
  * onto one canonical id and the merge stage genuinely merges
  * (category set union), exactly the reference's equivalent-identifier
  * story. Parts normalize on a size predicate (`CANONP:<key>`).
  *
  * Scale shape: the mapping is dimension-sized (broadcast); endpoint
  * checks are the same equi joins normalizeEdges always uses; merges
  * are hash aggregates; the sink is a straight columnar write. Nothing
  * in the composition adds a shuffle the stages didn't already have.
  */
object Pipeline {
  private def tmp(name: String, d: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_${name}_${d.replaceAll("[^a-zA-Z0-9]", "_")}").toString

  /** Spec-driven EP1→EP3: every (spec, path) source parses through
    * [[SourceSpec]] (the declarative replacement for the reference's
    * ~30 per-source loader scripts), same-id nodes merge (sorted
    * category-set union, max name, distinct-source count),
    * same-(subject, predicate, object) edges merge with multiplicity
    * and provenance, and KGX node/edge JSON Lines land under
    * `outDir/nodes` and `outDir/edges`. Returns the (stage, n) ledger.
    *
    * Scale shape is identical to [[pipelineKgx]]: per-source scans
    * with pushed filters, hash-aggregate merges, columnar writes —
    * adding a source adds a scan, never a new shuffle pattern. */
  def pipelineFromSpecs(s: SparkSession, sources: Seq[(SourceSpec, String)],
      outDir: String): DataFrame = {
    require(sources.nonEmpty, "pipelineFromSpecs: no sources given")
    val parsed = sources.map { case (sp, p) => SourceSpec.load(s, sp, p) }
    // nodes/edges each feed a merge AND a ledger aggregate; merges
    // each feed a sink write AND a ledger aggregate — cache all four,
    // released by the harness via ScratchCache (same contract as
    // pipelineKgx)
    val nodes = parsed.map(_._1).reduce(_ unionByName _)
      .pipe(ScratchCache.cache)
    val edges = parsed.map(_._2).reduce(_ unionByName _)
      .pipe(ScratchCache.cache)
    // property bags merge as the sorted set of per-source JSON bags —
    // the reference's merge keeps every source's properties; `{}`
    // (no props declared) is dropped from the set so prop-less rules
    // don't pad every merged node
    val mergedNodes = nodes.groupBy(col("id"))
      .agg(
        array_join(sort_array(collect_set(col("category"))), ",").as("cats"),
        max(col("name")).as("name"),
        countDistinct(col("source")).as("n_srcs"),
        sort_array(collect_set(when(col("props") =!= "{}", col("props"))))
          .as("props_set"))
      .pipe(ScratchCache.cache)
    val mergedEdges = edges
      .groupBy(col("subject"), col("predicate"), col("object"))
      .agg(count(lit(1)).as("n"),
        array_join(sort_array(collect_set(col("source"))), ",").as("sources"),
        sort_array(collect_set(when(col("props") =!= "{}", col("props"))))
          .as("props_set"))
      .pipe(ScratchCache.cache)
    mergedNodes
      .select(to_json(struct(col("id"), col("name"),
        col("cats").as("category"), col("n_srcs"), col("props_set"))))
      .write.mode("overwrite").text(s"$outDir/nodes")
    mergedEdges
      .select(to_json(struct(col("subject"), col("predicate"),
        col("object"), col("n"), col("sources"), col("props_set"))))
      .write.mode("overwrite").text(s"$outDir/edges")
    val nodeRows = nodes.agg(count(lit(1)).as("p"))
      .select(explode(map(lit("parsed_nodes"), col("p")))
        .as(Seq("stage", "n")))
    val edgeRows = edges.agg(count(lit(1)).as("p"))
      .select(explode(map(lit("parsed_edges"), col("p")))
        .as(Seq("stage", "n")))
    val mNodeRows = mergedNodes.agg(
        count(lit(1)).as("m"),
        sum(when(col("n_srcs") >= 2, 1L).otherwise(0L)).as("multi"))
      .select(explode(map(
        lit("merged_nodes"), col("m"),
        lit("merged_multi_source_nodes"), col("multi"),
        lit("written_nodes"), col("m"))).as(Seq("stage", "n")))
    val mEdgeRows = mergedEdges.agg(count(lit(1)).as("m"))
      .select(explode(map(
        lit("merged_edges"), col("m"),
        lit("written_edges"), col("m"))).as(Seq("stage", "n")))
    nodeRows.unionByName(edgeRows).unionByName(mNodeRows)
      .unionByName(mEdgeRows)
      .orderBy(col("stage"))
  }

  /** q_source_spec — the config-file extension path run as a query:
    * two sources declared as JSON (parsed by [[SourceSpec.fromJson]],
    * exactly what a user's dropped-in config goes through), loaded
    * through [[pipelineFromSpecs]] over the parquet tables. The
    * customers spec also emits its nations as a second node rule, so
    * the NATION ids arrive from BOTH sources and the merge stage
    * genuinely merges (n_srcs = 2) — the reference's
    * equivalent-identifier story, declared in config. Returns the
    * (stage, n) ledger; every value is an exact integer DuckDB
    * recomputes from `customer`/`nation`. */
  /** The two declarative sources [[pipelineSpecs]] and
    * [[pipelineMultiGraph]] share. */
  private[graft] def customersSpec: SourceSpec = SourceSpec.fromJson(
      s"""{"name": "customers", "format": "parquet",
         |  "nodes": [
         |    {"idCol": "c_custkey", "idPrefix": "CUST:",
         |     "category": "biolink:Agent", "nameCol": "c_name"},
         |    {"idCol": "c_nationkey", "idPrefix": "NATION:",
         |     "category": "customer_nation"}],
         |  "edges": [
         |    {"subjectCol": "c_custkey", "subjectPrefix": "CUST:",
         |     "objectCol": "c_nationkey", "objectPrefix": "NATION:",
         |     "predicate": "biolink:located_in"}]}""".stripMargin)

  private[graft] def nationsSpec: SourceSpec = SourceSpec.fromJson(
      s"""{"name": "nations", "format": "parquet",
         |  "nodes": [
         |    {"idCol": "n_nationkey", "idPrefix": "NATION:",
         |     "category": "biolink:NamedThing", "nameCol": "n_name"}],
         |  "edges": [
         |    {"subjectCol": "n_nationkey", "subjectPrefix": "NATION:",
         |     "objectCol": "n_regionkey", "objectPrefix": "REGION:",
         |     "predicate": "biolink:part_of"}]}""".stripMargin)

  def pipelineSpecs(s: SparkSession, d: String): DataFrame =
    pipelineFromSpecs(s, Seq(
      customersSpec -> s"$d/customer.parquet",
      nationsSpec -> s"$d/nation.parquet"),
      tmp("spec_kgx", d))

  /** q_pipeline_multigraph — the reference's graph_specs MULTI-graph
    * reality: one spec file names SEVERAL graphs built in ONE run over
    * SHARED sources ([[GraphSpec.parseMulti]]); every referenced
    * source is parsed ONCE (its node/edge frames are ScratchCache'd
    * and every graph that lists it reuses the same InMemoryRelation —
    * the second graph's scan is a cache hit, not a re-parse), each
    * graph merges and sinks its own KGX artifact, and the wire is the
    * per-graph (stage, n) ledger PLUS the sharing proof:
    * `shared_sources_loaded` (distinct sources actually parsed) vs
    * `graph_source_refs` (total references across graphs) — refs >
    * loads IS the shared scan, as an oracle-checked integer.
    *
    * Scale shape: unchanged from [[pipelineFromSpecs]] per graph (hash
    * aggregate merges, columnar sinks); the sharing turns the
    * dominant cost — N graphs × source parse — into max(1 parse per
    * source), which is exactly why the reference batches its graphs
    * into one run. */
  def pipelineMultiGraph(s: SparkSession, d: String): DataFrame = {
    val graphs = GraphSpec.parseMulti(
      """graph_id: commerce_graph
        |sources:
        |  - customers
        |  - nations
        |graph_id: geo_graph
        |sources:
        |  - nations
        |""".stripMargin)
    pipelineMultiGraphs(s, graphs, Map(
      "customers" -> (customersSpec, s"$d/customer.parquet"),
      "nations" -> (nationsSpec, s"$d/nation.parquet")),
      tmp("multigraph_kgx", d))
  }

  /** q_merge_precedence — source-PRECEDENCE property conflation, the
    * merge rule [[pipelineFromSpecs]]'s symmetric merges (category
    * set-union, max name) deliberately don't express: when the same
    * node arrives from several sources with CONFLICTING property
    * values, a real merge resolves each property from the
    * highest-priority source present (the reference's authoritative-
    * source ordering), not by value maximum. Here the NATION ids
    * arrive from both declared sources with different names
    * (customers says `NATION:<k>`, nations says the real n_name);
    * priority nations=2 > customers=1, so the authoritative name wins
    * exactly on the contested ids. Wire: per winning source, nodes
    * won and contested-node count.
    *
    * Scale shape: one hash agg per id with `max(struct(priority,
    * source, name))` — the arg-max rides the existing merge shuffle,
    * no extra pass; the priority map is a tiny literal (broadcast by
    * value into the expression). */
  def mergePrecedence(s: SparkSession, d: String): DataFrame = {
    val (cn, _) = SourceSpec.load(s, customersSpec, s"$d/customer.parquet")
    val (nn, _) = SourceSpec.load(s, nationsSpec, s"$d/nation.parquet")
    mergePrecedenceOn(cn.unionByName(nn),
      Map("customers" -> 1, "nations" -> 2))
  }

  /** Core of q_merge_precedence over any unioned node frame with
    * (id, name, source) and a source→priority map; unknown sources
    * rank 0. Ties break by (source, name) descending — total and
    * engine-identical. */
  def mergePrecedenceOn(nodes: DataFrame,
      priority: Map[String, Int]): DataFrame = {
    val prio = priority.foldLeft(lit(0)) { case (acc, (src, p)) =>
      when(col("source") === src, lit(p)).otherwise(acc)
    }
    nodes
      .select(col("id"), col("name"), col("source"), prio.as("prio"))
      .groupBy(col("id"))
      .agg(max(struct(col("prio"), col("source"), col("name"))).as("w"),
        countDistinct(col("source")).as("n_srcs"))
      .groupBy(col("w.source").as("winner_source"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("n_srcs") >= 2, 1L).otherwise(0L)).as("n_contested"))
      .orderBy(col("winner_source"))
  }

  /** Build every graph in `graphs` over the shared `sources` and
    * return the combined ledger; see [[pipelineMultiGraph]]. */
  def pipelineMultiGraphs(s: SparkSession, graphs: Seq[GraphSpec],
      sources: Map[String, (SourceSpec, String)],
      outDir: String): DataFrame = {
    val (perGraph, nLoaded) = multiGraphBuild(s, graphs, sources)
    perGraph.foreach { case (gid, _, _, mergedNodes, mergedEdges) =>
      mergedNodes
        .select(to_json(struct(col("id"), col("name"),
          col("cats").as("category"), col("n_srcs"))))
        .write.mode("overwrite").text(s"$outDir/$gid/nodes")
      mergedEdges
        .select(to_json(struct(col("subject"), col("predicate"),
          col("object"), col("sources"))))
        .write.mode("overwrite").text(s"$outDir/$gid/edges")
    }
    def one(stage: String, df: DataFrame): DataFrame =
      df.select(lit(stage).as("stage"), col(df.columns.head).as("n"))
    val graphRows = perGraph.flatMap {
      case (gid, nodes, edges, mergedNodes, mergedEdges) => Seq(
        one(s"$gid:parsed_nodes", nodes.agg(count(lit(1)))),
        one(s"$gid:parsed_edges", edges.agg(count(lit(1)))),
        one(s"$gid:merged_nodes", mergedNodes.agg(count(lit(1)))),
        one(s"$gid:multi_source_nodes", mergedNodes
          .agg(coalesce(sum(when(col("n_srcs") >= 2, 1L).otherwise(0L)),
            lit(0L)))),
        one(s"$gid:merged_edges", mergedEdges.agg(count(lit(1)))))
    }
    val refs = graphs.map(_.sources.size).sum
    val shared = s.range(1).select(explode(map(
      lit("shared_sources_loaded"), lit(nLoaded.toLong),
      lit("graph_source_refs"), lit(refs.toLong)))
      .as(Seq("stage", "n")))
    (graphRows :+ shared).reduce(_ unionByName _).orderBy(col("stage"))
  }

  /** Test-visible core: loads each referenced source ONCE (cached),
    * returns per-graph (graphId, unioned nodes, unioned edges, merged
    * nodes, merged edges) plus the distinct-source load count. */
  private[graft] def multiGraphBuild(s: SparkSession,
      graphs: Seq[GraphSpec], sources: Map[String, (SourceSpec, String)])
      : (Seq[(String, DataFrame, DataFrame, DataFrame, DataFrame)], Int) = {
    require(graphs.nonEmpty, "pipelineMultiGraphs: no graphs given")
    val referenced = graphs.flatMap(_.sources.map(_.sourceId)).distinct
    // the shared scan: ONE SourceSpec.load per distinct source id,
    // cached so every consuming graph hits the same InMemoryRelation
    val loaded = referenced.map { id =>
      val (sp, path) = sources.getOrElse(id,
        throw new IllegalArgumentException(
          s"multi-graph spec references unknown source '$id'"))
      val (n, e) = SourceSpec.load(s, sp, path)
      id -> (ScratchCache.cache(n), ScratchCache.cache(e))
    }.toMap
    val perGraph = graphs.map { g =>
      val nodes = g.sources.map(x => loaded(x.sourceId)._1)
        .reduce(_ unionByName _)
      val edges = g.sources.map(x => loaded(x.sourceId)._2)
        .reduce(_ unionByName _)
      val mergedNodes = ScratchCache.cache(nodes.groupBy(col("id"))
        .agg(
          array_join(sort_array(collect_set(col("category"))), ",")
            .as("cats"),
          max(col("name")).as("name"),
          countDistinct(col("source")).as("n_srcs")))
      val mergedEdges = ScratchCache.cache(edges
        .groupBy(col("subject"), col("predicate"), col("object"))
        .agg(count(lit(1)).as("n"),
          array_join(sort_array(collect_set(col("source"))), ",")
            .as("sources")))
      (g.graphId, nodes, edges, mergedNodes, mergedEdges)
    }
    (perGraph, loaded.size)
  }

  def pipelineKgx(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ---- EP1 parse: three node sources + one edge source ----
    val customers = Par.spread(Tables.customer(s, d), col("c_custkey"))
      .select(col("c_custkey").as("key"), col("c_nationkey"))
    val users = Tables.events(s, d)
      .select(col("user_id").as("key")).distinct()
    val parts = Par.spread(Tables.part(s, d), col("p_partkey"))
      .select(col("p_partkey").as("key"), col("p_size"))
    val edgesRaw = Par.spread(Tables.lineitem(s, d), col("l_orderkey"))
      .join(Par.spread(Tables.orders(s, d), col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("CUST:"), col("o_custkey")).as("subject"),
        col("l_returnflag").as("predicate"),
        concat(lit("PART:"), col("l_partkey")).as("object"))
    // ---- EP2 node normalization (broadcast mapping; unmapped ids keep
    // their raw form and go to the failure log, never silently dropped)
    val mappedNations = Tables.nation(s, d)
      .filter(col("n_nationkey") < 20).select(col("n_nationkey").as("mk"))
    val custNorm = customers
      .join(broadcast(mappedNations), col("c_nationkey") === col("mk"), "left")
      .select(concat(lit("CUST:"), col("key")).as("raw_id"),
        when(col("mk").isNotNull, concat(lit("CANON:"), col("key")))
          .as("canonical"), // null = normalization failure
        lit("customer").as("category"))
    val custOk = customers
      .join(broadcast(mappedNations), col("c_nationkey") === col("mk"))
      .select(col("key").as("ck"))
    val userNorm = users
      .join(custOk, col("key") === col("ck"), "left")
      .select(concat(lit("USER:"), col("key")).as("raw_id"),
        when(col("ck").isNotNull, concat(lit("CANON:"), col("key")))
          .as("canonical"),
        lit("user").as("category"))
    val partNorm = parts
      .select(concat(lit("PART:"), col("key")).as("raw_id"),
        when(col("p_size") <= 45, concat(lit("CANONP:"), col("key")))
          .as("canonical"),
        lit("part").as("category"))
    val nodesNorm = custNorm.unionByName(userNorm).unionByName(partNorm)
    // ---- EP2 edge normalization: predicate remap + endpoint checks
    // against the ids that SURVIVED node normalization ----
    val pm = Seq(("A", "biolink:affects"), ("R", "biolink:related_to"))
      .toDF("raw", "pred")
    val subjIds = custNorm.filter(col("canonical").isNotNull)
      .select(col("raw_id").as("id"))
    val objIds = partNorm.filter(col("canonical").isNotNull)
      .select(col("raw_id").as("id"))
    // annotated (not yet split) edge set: ONE pass feeds the
    // retained/dropped counts, the failure log, and the merge input
    val annotated =
      GraphOps.normalizeEdges(edgesRaw, subjIds, objIds, pm)
    val retained = annotated.filter(col("status") === "retained").drop("status")
    val dropped = annotated.filter(col("status") =!= "retained")
    // ---- EP3 merge: same-canonical nodes union their category sets;
    // same-(s,p,o) edges collapse with multiplicity ----
    val mergedNodes = nodesNorm.filter(col("canonical").isNotNull)
      .groupBy(col("canonical"))
      .agg(array_join(sort_array(collect_set(col("category"))), ",").as("cats"),
        count(lit(1)).as("n_srcs"))
    val mergedEdges = retained
      .groupBy(col("subject"), col("predicate"), col("object"))
      .agg(count(lit(1)).as("n"))
    // Each stage frame has multiple consumers below (sink write + one
    // or more ledger aggregates): cache so the stage runs once — the
    // exact intra-pipeline materialization the reference gets from its
    // on-disk inter-stage files, minus the disk round-trip. (At 100 TB
    // the swap is checkpoint/parquet between stages, same shape.)
    // Registered with ScratchCache so harnesses free them post-query.
    Seq(nodesNorm, annotated, mergedNodes, mergedEdges)
      .foreach(ScratchCache.cache)
    // ---- sink: KGX node/edge JSON Lines + the failure log ----
    mergedNodes
      .select(to_json(struct(col("canonical").as("id"), col("cats"),
        col("n_srcs"))))
      .write.mode("overwrite").text(tmp("pipe_nodes", d))
    mergedEdges
      .select(to_json(struct(col("subject"), col("predicate"),
        col("object"), col("n"))))
      .write.mode("overwrite").text(tmp("pipe_edges", d))
    dropped
      .select(to_json(struct(col("subject"), col("predicate"),
        col("object"), col("status"))))
      .write.mode("overwrite").text(tmp("pipe_failures", d))
    // ---- the wire rows: per-stage ledger. ONE conditional-sum
    // aggregate per cached stage frame, unpivoted to (stage, n) rows —
    // not one count job per ledger row ----
    val nodeRows = nodesNorm.agg(
        count(lit(1)).as("parsed"),
        count(col("canonical")).as("norm"))
      .select(explode(map(
        lit("parsed_nodes"), col("parsed"),
        lit("normalized_nodes"), col("norm"),
        lit("norm_failed_nodes"), col("parsed") - col("norm")))
        .as(Seq("stage", "n")))
    val edgeRows = annotated.agg(
        count(lit(1)).as("parsed"),
        sum(when(col("status") === "retained", 1L).otherwise(0L))
          .as("kept"))
      .select(explode(map(
        lit("parsed_edges"), col("parsed"),
        lit("retained_edges"), col("kept"),
        lit("dropped_edges"), col("parsed") - col("kept")))
        .as(Seq("stage", "n")))
    val mergedNodeRows = mergedNodes.agg(
        count(lit(1)).as("m"),
        sum(when(col("n_srcs") >= 2, 1L).otherwise(0L)).as("multi"))
      .select(explode(map(
        lit("merged_nodes"), col("m"),
        lit("merged_multi_source_nodes"), col("multi"),
        lit("written_nodes"), col("m")))
        .as(Seq("stage", "n")))
    val mergedEdgeRows = mergedEdges.agg(count(lit(1)).as("m"))
      .select(explode(map(
        lit("merged_edges"), col("m"),
        lit("written_edges"), col("m")))
        .as(Seq("stage", "n")))
    nodeRows.unionByName(edgeRows)
      .unionByName(mergedNodeRows).unionByName(mergedEdgeRows)
      .orderBy(col("stage"))
  }
}
