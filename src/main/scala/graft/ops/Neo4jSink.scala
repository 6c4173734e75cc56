package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** q_sink_neo4j — graph-DB bulk-load sink: the neo4j-admin import CSV
  * layout (the reference's downstream load target after KGX; the
  * ORION-era `Common/neo4j_tools.py` drives `neo4j-admin database
  * import` over exactly this shape [R, SURVEY §3.1 EP3]).
  *
  * Bulk-import contract (public `neo4j-admin import` format):
  *  - node rows with an `:ID` column and a `:LABEL` column whose
  *    multi-valued labels are `;`-separated;
  *  - relationship rows with `:START_ID` / `:TYPE` / `:END_ID`;
  *  - headers may live in a SEPARATE one-line file passed as
  *    `--nodes=<header>,<data>` — the only layout that works with a
  *    distributed writer, because executors emit many headerless
  *    part files and the single header line is driver-side metadata.
  *
  * Layout written under a temp root:
  * {{{
  *   nodes.header.csv      id:ID,name,:LABEL          (one line, driver)
  *   nodes/part-*.csv      headerless data            (executors)
  *   edges.header.csv      :START_ID,:TYPE,:END_ID,quantity:double
  *   edges/part-*.csv      headerless data            (executors)
  * }}}
  *
  * Scale shape: both writes are straight columnar scans → CSV encode —
  * no shuffle at all (narrow select from the source tables); the
  * header files are O(1) driver writes. The returned frame re-reads
  * the data files with a pinned schema and counts per exploded label
  * (plus one `rel:<TYPE>` row per relationship type), so the oracle
  * checks the on-disk roundtrip end-to-end against DuckDB computing
  * the same counts from the source tables.
  */
object Neo4jSink {
  val nodesHeader = "id:ID,name,:LABEL"
  val edgesHeader = ":START_ID,:TYPE,:END_ID,quantity:double"

  private def tmp(name: String, d: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_${name}_${d.replaceAll("[^a-zA-Z0-9]", "_")}").toString

  private val nodeSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("labels", StringType)))
  private val edgeSchema = StructType(Seq(
    StructField("start_id", StringType),
    StructField("rel_type", StringType),
    StructField("end_id", StringType),
    StructField("quantity", DoubleType)))

  /** Write ANY (id, name, labels) / (start_id, rel_type, end_id,
    * quantity) graph in the bulk-load layout under `root`; returns
    * (nodesDir, edgesDir). Spark's CSV writer quotes fields containing
    * separators/quotes/newlines (RFC-4180 doubling), which
    * `neo4j-admin import` accepts — names with commas survive the
    * roundtrip (asserted in Neo4jSinkSpec). */
  def writeGraph(nodes: DataFrame, edges: DataFrame, root: String)
      : (String, String) = {
    val nodesDir = s"$root/nodes"
    val edgesDir = s"$root/edges"
    // escape = quote char → RFC-4180 doubled quotes on the wire
    // (Spark's default is backslash escaping, which the bulk importer
    // only accepts behind a legacy flag)
    nodes.write.mode("overwrite").option("header", "false")
      .option("escape", "\"").csv(nodesDir)
    edges.write.mode("overwrite").option("header", "false")
      .option("escape", "\"").csv(edgesDir)
    val rootPath = Paths.get(root)
    Files.createDirectories(rootPath)
    Files.write(rootPath.resolve("nodes.header.csv"),
      (nodesHeader + "\n").getBytes(StandardCharsets.UTF_8))
    Files.write(rootPath.resolve("edges.header.csv"),
      (edgesHeader + "\n").getBytes(StandardCharsets.UTF_8))
    (nodesDir, edgesDir)
  }

  /** Read a written node dir back with the pinned bulk-load schema
    * (RFC-4180 quoting, matching [[writeGraph]]). */
  def readNodes(s: SparkSession, nodesDir: String): DataFrame =
    s.read.schema(nodeSchema).option("escape", "\"").csv(nodesDir)

  /** Write the bulk-load layout for the customer/part/lineitem graph
    * under `root`; returns (nodesDir, edgesDir). */
  def write(s: SparkSession, d: String, root: String): (String, String) = {
    val nodes = Tables.customer(s, d)
      .select(
        concat(lit("CUST:"), col("c_custkey")).as("id"),
        col("c_name").as("name"),
        lit("Agent;customer").as("labels"))
      .unionByName(Tables.part(s, d)
        .select(
          concat(lit("PART:"), col("p_partkey")).as("id"),
          col("p_name").as("name"),
          lit("ChemicalEntity;part").as("labels")))
    val edges = Tables.lineitem(s, d)
      .select(
        concat(lit("ORDER:"), col("l_orderkey")).as("start_id"),
        lit("RELATED_TO").as("rel_type"),
        concat(lit("PART:"), col("l_partkey")).as("end_id"),
        col("l_quantity").cast("double").as("quantity"))
    writeGraph(nodes, edges, root)
  }

  /** The exact `neo4j-admin database import full` invocation for a
    * layout written by [[writeGraph]] — the ORION-era
    * `neo4j_tools.py` call, reconstructed as a pure argument list so
    * it is unit-testable without a Neo4j install. `neo4j-admin`
    * accepts comma-joined `<header>,<data-glob>` pairs; executors'
    * part files ride a glob, the driver-side one-line headers ride
    * first. */
  def importCommand(root: String, database: String = "neo4j",
      neo4jAdmin: String = "neo4j-admin"): Seq[String] = Seq(
    neo4jAdmin, "database", "import", "full",
    s"--nodes=$root/nodes.header.csv,$root/nodes/part-.*\\.csv",
    s"--relationships=$root/edges.header.csv,$root/edges/part-.*\\.csv",
    "--delimiter=,", "--array-delimiter=;", "--overwrite-destination",
    database)

  /** Run the bulk load for a written layout. Returns the importer's
    * exit code, or None when `neo4jAdmin` is not on this machine (the
    * zero-egress build container has no Neo4j; the command
    * CONSTRUCTION is what the spec pins — a deployment points
    * `neo4jAdmin` at its install and this wrapper is the whole load
    * step). Output streams to the caller's stdout/stderr so import
    * diagnostics are never swallowed. */
  def runImport(root: String, database: String = "neo4j",
      neo4jAdmin: String = "neo4j-admin"): Option[Int] = {
    val cmd = importCommand(root, database, neo4jAdmin)
    try {
      val p = new ProcessBuilder(cmd: _*).inheritIO().start()
      Some(p.waitFor())
    } catch {
      case _: java.io.IOException => None // binary not present
    }
  }

  /** The query surface: write, then re-read the data files and return
    * per-label node counts + per-type relationship counts — the bulk
    * loader's admission report, verified against the source tables by
    * the DuckDB oracle. */
  def sinkNeo4j(s: SparkSession, d: String): DataFrame = {
    val (nodesDir, edgesDir) = write(s, d, tmp("neo4j", d))
    val labelCounts = readNodes(s, nodesDir)
      .select(explode(split(col("labels"), ";")).as("label"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
    val relCounts = s.read.schema(edgeSchema).option("escape", "\"")
      .csv(edgesDir)
      .groupBy(concat(lit("rel:"), col("rel_type")).as("label"))
      .agg(count(lit(1)).as("n"))
    labelCounts.unionByName(relCounts).orderBy(col("label"))
  }
}
