package graft

import graft.ops.{GraphBuilder, GraphSpec, GraphSource}

class GraphSpecSpec extends GraftSuite {
  import spark.implicits._

  test("parses the minimal spec format") {
    val spec = GraphSpec.parse(
      """# a comment
        |graph_id: test_graph
        |sources:
        |  - src_a
        |  - src_b
        |""".stripMargin)
    assert(spec == GraphSpec("test_graph",
      Seq(GraphSource("src_a"), GraphSource("src_b"))))
  }

  test("builder merges the selected sources with provenance") {
    val a = Seq(("X:1", "customer", "alice"), ("X:2", "customer", "bob"))
      .toDF("id", "category", "name")
    val b = Seq(("X:1", "user", "alice2"))
      .toDF("id", "category", "name")
    val c = Seq(("X:9", "ghost", "zed")).toDF("id", "category", "name")
    val spec = GraphSpec("g", Seq(GraphSource("a"), GraphSource("b")))
    val merged = GraphBuilder
      .mergeNodes(spec, Map("a" -> a, "b" -> b, "c" -> c))
      .collect()
    assert(merged.length == 2) // source c not in spec → excluded
    val x1 = merged.find(_.getString(0) == "X:1").get
    assert(x1.getAs[scala.collection.Seq[String]]("cats").toSeq ==
      Seq("customer", "user"))
    assert(x1.getAs[scala.collection.Seq[String]]("provenance").toSeq ==
      Seq("a", "b"))
    assert(x1.getAs[Long]("n_srcs") == 2L)
  }

  test("lines outside the supported subset fail loudly, not silently") {
    // nested mapping under sources — a fuller YAML shape the minimal
    // parser must reject rather than mis-parse
    intercept[IllegalArgumentException] {
      GraphSpec.parse(
        """graph_id: g
          |sources:
          |  - id: src_a
          |""".stripMargin)
    }
    // quoted value
    intercept[IllegalArgumentException] {
      GraphSpec.parse("graph_id: \"g\"\nsources:\n  - a\n")
    }
    // unknown top-level key
    intercept[IllegalArgumentException] {
      GraphSpec.parse("graph_id: g\nedges:\n  - a\n")
    }
  }

  test("CURIE / URL source ids pass; bare '-' (empty id) is rejected") {
    // ids with ':' but no ': ' are data, not key-value structure
    val spec = GraphSpec.parse(
      """graph_id: g
        |sources:
        |  - CHEBI:1234
        |  - https://example.org/nodes.tsv
        |""".stripMargin)
    assert(spec.sources.map(_.sourceId) ==
      Seq("CHEBI:1234", "https://example.org/nodes.tsv"))
    // a bare '-' would parse to an empty source id — reject at validation
    intercept[IllegalArgumentException] {
      GraphSpec.parse("graph_id: g\nsources:\n  -\n")
    }
  }

  test("unknown source id in spec fails loudly") {
    val spec = GraphSpec("g", Seq(GraphSource("missing")))
    intercept[IllegalArgumentException] {
      GraphBuilder.mergeNodes(spec, Map.empty)
    }
  }

  test("kgx sink writes the metadata sidecar") {
    graft.ops.Sources.sinkKgx(spark, sf).collect()
    val metaDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_kgx_meta_" + sf.replaceAll("[^a-zA-Z0-9]", "_"))
    val meta = spark.read.json(metaDir.toString)
    assert(meta.count() >= 2)
    assert(meta.columns.toSet == Set("category", "n_nodes"))
  }
}
