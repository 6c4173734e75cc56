package graft

import graft.ops.{Kgx, KgxNode}

class KgxSpec extends GraftSuite {
  import spark.implicits._

  test("typed node/edge datasets have KGX schemas and full coverage") {
    val nodes = Kgx.nodes(spark, sf)
    val edges = Kgx.edges(spark, sf)
    assert(nodes.columns.toSeq == Seq("id", "name", "category", "props"))
    assert(edges.columns.toSeq ==
      Seq("subject", "predicate", "object", "publications", "props"))
    assert(nodes.count() == 350) // 150 customers + 200 parts
    assert(edges.count() == 6000)
  }

  test("typed merge unions categories and keeps one node per id") {
    val dup = Seq(
      KgxNode("X:1", "alpha", Seq("customer"), Map("a" -> "1")),
      KgxNode("X:1", "beta", Seq("user"), Map("b" -> "2")),
      KgxNode("X:2", "gamma", Seq("part"), Map.empty)).toDS()
    val merged = Kgx.mergeNodes(dup).collect().sortBy(_.id)
    assert(merged.length == 2)
    val x1 = merged.head
    assert(x1.category == Seq("customer", "user"))
    assert(x1.name == "beta") // max-name rule
    assert(x1.props == Map("a" -> "1", "b" -> "2"))
  }

  test("jsonl serialization emits the KGX field names") {
    val line = Kgx.toJsonl(Kgx.edges(spark, sf).limit(1).toDF()).head()
    assert(line.contains("\"subject\"") && line.contains("\"object\"") &&
      line.contains("\"predicate\""))
  }
}
