package graft

import graft.ops.Neo4jSink
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class Neo4jSinkSpec extends GraftSuite {

  test("neo4j bulk-load layout: header sidecars + headerless data CSVs") {
    val root = java.nio.file.Files.createTempDirectory("graft_neo4j").toString
    val (nodesDir, edgesDir) = Neo4jSink.write(spark, sf, root)

    val nodesHeader = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "nodes.header.csv")).trim
    val edgesHeader = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "edges.header.csv")).trim
    assert(nodesHeader == "id:ID,name,:LABEL")
    assert(edgesHeader == ":START_ID,:TYPE,:END_ID,quantity:double")

    val nCust = Tables.customer(spark, sf).count()
    val nPart = Tables.part(spark, sf).count()
    val nLine = Tables.lineitem(spark, sf).count()
    val nodeLines = spark.read.text(nodesDir)
    assert(nodeLines.count() == nCust + nPart)
    assert(spark.read.text(edgesDir).count() == nLine)

    // data rows are headerless (no line repeats the header) and carry
    // multi-valued `;`-separated labels in the :LABEL position
    assert(nodeLines.filter(col("value").startsWith("id:ID")).count() == 0)
    val first = nodeLines.limit(1).collect()(0).getString(0)
    val fields = first.split(",", -1)
    assert(fields.length == 3 && fields(2).contains(";"))
  }

  test("bulk-load CSV quoting: commas/quotes/newlines in names survive") {
    import spark.implicits._
    val nodes = Seq(
      ("N:1", "plain name", "Thing"),
      ("N:2", "comma, separated, name", "Thing"),
      ("N:3", "a \"quoted\" name", "Thing")).toDF("id", "name", "labels")
    val edges = Seq(("N:1", "REL", "N:2", 1.0))
      .toDF("start_id", "rel_type", "end_id", "quantity")
    val root = java.nio.file.Files
      .createTempDirectory("graft_neo4j_q").toString
    val (nodesDir, _) = Neo4jSink.writeGraph(nodes, edges, root)
    val back = Neo4jSink.readNodes(spark, nodesDir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == Map(
      "N:1" -> "plain name",
      "N:2" -> "comma, separated, name",
      "N:3" -> "a \"quoted\" name"))
    // RFC-4180 on the wire: embedded quotes doubled inside a quoted
    // field — the layout neo4j-admin import parses
    val raw = spark.read.text(nodesDir)
      .collect().map(_.getString(0)).mkString("\n")
    assert(raw.contains("\"a \"\"quoted\"\" name\""))
  }

  test("sinkNeo4j roundtrip counts match the source tables") {
    val rows = Neo4jSink.sinkNeo4j(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, sf).count()
    val nPart = Tables.part(spark, sf).count()
    val nLine = Tables.lineitem(spark, sf).count()
    assert(rows == Map(
      "Agent" -> nCust, "customer" -> nCust,
      "ChemicalEntity" -> nPart, "part" -> nPart,
      "rel:RELATED_TO" -> nLine))
  }

  test("import command pins the neo4j-admin contract for the written layout") {
    val cmd = graft.ops.Neo4jSink.importCommand("/data/g", "graphdb")
    assert(cmd.head == "neo4j-admin")
    assert(cmd.slice(1, 4) == Seq("database", "import", "full"))
    assert(cmd.contains(
      "--nodes=/data/g/nodes.header.csv,/data/g/nodes/part-.*\\.csv"))
    assert(cmd.contains(
      "--relationships=/data/g/edges.header.csv,/data/g/edges/part-.*\\.csv"))
    assert(cmd.contains("--array-delimiter=;")) // multi-label ';' contract
    assert(cmd.last == "graphdb")
  }

  test("runImport invokes the binary with exactly the constructed args") {
    val dir = java.nio.file.Files.createTempDirectory("graft_neo4j_admin")
    val log = dir.resolve("args.log")
    val fake = dir.resolve("fake-neo4j-admin")
    java.nio.file.Files.writeString(fake,
      s"#!/bin/sh\nprintf '%s\\n' \"$$@\" > $log\nexit 0\n")
    fake.toFile.setExecutable(true)
    val got = graft.ops.Neo4jSink.runImport("/data/g",
      neo4jAdmin = fake.toString)
    assert(got == Some(0))
    val logged = java.nio.file.Files.readAllLines(log)
    assert(logged.asScala.toSeq ==
      graft.ops.Neo4jSink.importCommand("/data/g").tail)
    // no binary on the machine → None, never an exception
    assert(graft.ops.Neo4jSink.runImport("/data/g",
      neo4jAdmin = dir.resolve("missing").toString).isEmpty)
  }
}
