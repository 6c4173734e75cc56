package graft

import graft.ops._

class GraphOpsSpec extends GraftSuite {
  import spark.implicits._

  test("node merge: merged node count = customers; overlap = distinct users") {
    val rows = GraphOps.nodeMerge(spark, sf).collect()
    assert(rows.length == 150) // every user_id collides with a custkey
    val merged = rows.filter(_.getAs[Long]("n_srcs") == 2L)
    assert(merged.length == 15) // 15 distinct users at sf0.001
    merged.foreach { r =>
      assert(r.getAs[String]("cats") == "customer,user")
    }
  }

  test("edge merge: multiplicities sum back to lineitem count") {
    import org.apache.spark.sql.functions.sum
    val total = GraphOps.edgeMerge(spark, sf)
      .agg(sum("n")).first().getLong(0)
    assert(total == 6000L)
  }

  test("norm remap: unmapped ids are retained as RAW, none dropped") {
    import org.apache.spark.sql.functions.sum
    val rows = GraphOps.normRemap(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 150L)
    assert(rows.exists(_.getString(0).startsWith("RAW:")))
    assert(rows.exists(_.getString(0).startsWith("NATION:")))
  }

  test("connected components on a hand-built graph") {
    // Two components: {1,2,3} via edges 1-2, 2-3; {10,11} via 10-11.
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val g = org.apache.spark.graphx.Graph.fromEdgeTuples(edges, 1)
    val cc = org.apache.spark.graphx.lib.ConnectedComponents.run(g)
      .vertices.map(_._2).distinct().count()
    assert(cc == 2)
  }

  test("cc size histogram sums to the vertex count") {
    import org.apache.spark.sql.functions.{col, sum}
    val hist = GraphOps.connectedComponents(spark, sf)
    val nodesInHist = hist.select(sum(col("size") * col("n_components")))
      .first().getLong(0)
    val vertices = Tables.lineitem(spark, sf).select("l_orderkey").distinct().count() +
      Tables.lineitem(spark, sf).select("l_partkey").distinct().count()
    assert(nodesInHist == vertices)
  }

  test("kgx sink writes valid JSON lines and counts per category") {
    val counts = Sources.sinkKgx(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_nodes")).toMap
    assert(counts("customer") == 150L)
    assert(counts("part") == 200L)
    assert(counts("biolink:Agent") == 150L)
    val nodesDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_kgx_nodes_" + sf.replaceAll("[^a-zA-Z0-9]", "_"))
    val first = java.nio.file.Files.list(nodesDir).toArray
      .map(_.toString).filter(_.endsWith(".txt"))
    assert(first.nonEmpty, "kgx node files written")
  }

  test("csv and jsonl roundtrips agree with each other") {
    val a = Sources.sourceCsv(spark, sf).collect().map(_.toString).toSeq
    val b = Sources.sourceJsonl(spark, sf).collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
