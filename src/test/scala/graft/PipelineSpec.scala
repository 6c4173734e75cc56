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
