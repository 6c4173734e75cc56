package graft

import graft.ops.Pipeline

class PipelineSpec extends GraftSuite {

  test("pipeline ledger is internally consistent and writes its artifacts") {
    val ledger = Pipeline.pipelineKgx(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    // conservation: normalization partitions parse output; edge
    // classification partitions the edge set; the sink writes exactly
    // the merged sets
    assert(ledger("parsed_nodes") ==
      ledger("normalized_nodes") + ledger("norm_failed_nodes"))
    assert(ledger("parsed_edges") ==
      ledger("retained_edges") + ledger("dropped_edges"))
    assert(ledger("written_nodes") == ledger("merged_nodes"))
    assert(ledger("written_edges") == ledger("merged_edges"))
    // merging only ever collapses rows
    assert(ledger("merged_nodes") <= ledger("normalized_nodes"))
    assert(ledger("merged_edges") <= ledger("retained_edges"))
    assert(ledger("merged_multi_source_nodes") > 0) // users ∩ mapped customers
    assert(ledger("retained_edges") > 0 && ledger("dropped_edges") > 0)
    // artifacts on disk: nodes, edges, failure log — all valid JSON lines
    for (suffix <- Seq("pipe_nodes", "pipe_edges", "pipe_failures")) {
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft_${suffix}_" + sf.replaceAll("[^a-zA-Z0-9]", "_"))
      val files = java.nio.file.Files.list(dir).toArray.map(_.toString)
        .filter(_.endsWith(".txt"))
      assert(files.nonEmpty, s"$suffix written")
      val first = scala.io.Source.fromFile(files.head).getLines()
        .take(1).toSeq
      first.foreach(l => assert(l.startsWith("{") && l.endsWith("}")))
    }
  }

  test("multi-graph run: sources parse once (cache-backed), ledgers " +
      "consistent, both KGX artifacts written") {
    import graft.ops.{GraphSpec, SourceSpec}
    // parseMulti: two blocks, shared source, dup ids rejected
    val specs = GraphSpec.parseMulti(
      "graph_id: a\nsources:\n  - s1\n  - s2\n" +
        "graph_id: b\nsources:\n  - s2\n")
    assert(specs.map(_.graphId) == Seq("a", "b"))
    assert(specs(1).sources.map(_.sourceId) == Seq("s2"))
    intercept[IllegalArgumentException] {
      GraphSpec.parseMulti(
        "graph_id: a\nsources:\n  - x\ngraph_id: a\nsources:\n  - y\n")
    }
    // leading garbage (e.g. a misspelled first graph_id key) must fail
    // loudly, not silently vanish before the first block slice
    val leadErr = intercept[IllegalArgumentException] {
      GraphSpec.parseMulti(
        "graphid: oops\nsources:\n  - x\ngraph_id: a\nsources:\n  - y\n")
    }
    assert(leadErr.getMessage.contains("before the first graph_id"))
    // the keyed run: ledger arithmetic + sharing proof + artifacts
    val ledger = Pipeline.pipelineMultiGraph(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(ledger("shared_sources_loaded") == 2L)
    assert(ledger("graph_source_refs") == 3L) // refs > loads = sharing
    // geo_graph is the nations source alone
    assert(ledger("geo_graph:parsed_nodes") ==
      ledger("geo_graph:merged_nodes"))
    assert(ledger("geo_graph:multi_source_nodes") == 0L)
    // commerce_graph genuinely merges NATION ids from both sources
    assert(ledger("commerce_graph:multi_source_nodes") > 0L)
    assert(ledger("commerce_graph:merged_nodes") <
      ledger("commerce_graph:parsed_nodes"))
    for (g <- Seq("commerce_graph", "geo_graph");
         part <- Seq("nodes", "edges")) {
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_multigraph_kgx_" + sf.replaceAll("[^a-zA-Z0-9]", "_"),
        g, part)
      assert(java.nio.file.Files.exists(dir), s"$g/$part written")
    }
    // the SHARED-SCAN proof at the plan level: build the graphs again
    // un-written and check the second graph's node union reads the
    // cached InMemoryRelation, not the parquet source
    val (perGraph, nLoaded) = Pipeline.multiGraphBuild(spark,
      GraphSpec.parseMulti(
        "graph_id: g1\nsources:\n  - customers\n  - nations\n" +
          "graph_id: g2\nsources:\n  - nations\n"),
      Map(
        "customers" -> (Pipeline.customersSpec -> s"$sf/customer.parquet"),
        "nations" -> (Pipeline.nationsSpec -> s"$sf/nation.parquet")))
    assert(nLoaded == 2)
    val g2nodes = perGraph.find(_._1 == "g2").get._2
    assert(g2nodes.queryExecution.optimizedPlan.toString
      .contains("InMemoryRelation"))
    graft.ops.ScratchCache.releaseAll()
  }

  test("merge precedence: the authoritative source wins contested " +
      "properties; unknown sources rank last") {
    import spark.implicits._
    val nodes = Seq(
      ("X:1", "alpha-from-a", "src_a"),
      ("X:1", "alpha-from-b", "src_b"), // contested: b has priority
      ("X:2", "beta-from-a", "src_a"),  // uncontested
      ("X:3", "gamma-unknown", "src_z"), // unknown source, prio 0
      ("X:3", "gamma-from-a", "src_a")) // known beats unknown
      .toDF("id", "name", "source")
    val out = Pipeline.mergePrecedenceOn(nodes,
      Map("src_a" -> 1, "src_b" -> 2)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // src_b wins X:1 (contested); src_a wins X:2 and X:3 (X:3
    // contested against the rank-0 unknown source)
    assert(out == Map("src_a" -> (2L, 1L), "src_b" -> (1L, 1L)))
  }

  test("pipeline multi-source merge matches the mapped-user overlap") {
    import org.apache.spark.sql.functions.col
    val mappedCust = Tables.customer(spark, sf)
      .filter(col("c_nationkey") < 20).select(col("c_custkey").as("k"))
    val overlap = Tables.events(spark, sf)
      .select(col("user_id").as("k")).distinct()
      .join(mappedCust, "k").count()
    val ledger = Pipeline.pipelineKgx(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(ledger("merged_multi_source_nodes") == overlap)
  }
}
