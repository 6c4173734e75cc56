package graft.ops

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Graph / ETL operator surface (SURVEY.md §2.11) — the reference's core
  * business re-expressed over the testdata-derived graph (nodes :=
  * customers ∪ event users; edges := order→part lines).
  *
  * Reference mapping: id normalization with failure retention
  * (`Common/normalization.py` NodeNormalizer + `kgx_file_normalizer.py`),
  * node/edge merging (`Common/merging.py` GraphMerger/DiskGraphMerger),
  * pre-load QC stats. The reference normalizes via batched HTTP calls to
  * a remote service and merges via external sort on one machine; here
  * normalization is a broadcast join against the mapping table and the
  * merge is Spark's native shuffle — the same external-merge-sort
  * algorithm, distributed.
  */
object GraphOps {
  private val D = DecimalType(12, 2)
  // Exact decimal internally; DOUBLE on the wire (see Relational.d2).
  private def d2(c: Column): Column = c.cast(DecimalType(38, 2)).cast("double")

  /** q_norm_remap — canonical-id remap through a broadcast mapping with
    * failure retention: ids the mapping doesn't cover keep a RAW: form
    * instead of being dropped (exactly the reference's norm-failure
    * handling). The mapping table broadcasts; the fact side never
    * shuffles for the join. */
  def normRemap(s: SparkSession, d: String): DataFrame = {
    val mapping = Tables.nation(s, d).filter(col("n_nationkey") < 20)
    Tables.customer(s, d)
      .join(broadcast(mapping),
        col("c_nationkey") === col("n_nationkey"), "left")
      .select(coalesce(
        concat(lit("NATION:"), col("n_name")),
        concat(lit("RAW:"), col("c_nationkey"))).as("canonical"))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("canonical"))
  }

  /** q_graph_node_merge — same-id nodes from two sources merge into one
    * node with the union of category sets (sorted for determinism) and
    * max name — GraphMerger.merge_nodes semantics as one hash
    * aggregate. */
  def nodeMerge(s: SparkSession, d: String): DataFrame = {
    val customers = Tables.customer(s, d)
      .select(col("c_custkey").as("id"),
        lit("customer").as("category"),
        col("c_name").as("name"))
    val users = Tables.events(s, d)
      .select(col("user_id").as("id")).distinct()
      .select(col("id"), lit("user").as("category"),
        concat(lit("user_"), col("id")).as("name"))
    customers.unionByName(users)
      .groupBy(col("id"))
      .agg(
        // stringified for the comparator wire format (see Aggregates)
        array_join(sort_array(collect_set(col("category"))), ",").as("cats"),
        max(col("name")).as("name"),
        count(lit(1)).as("n_srcs"))
      .orderBy(col("id"))
  }

  /** q_graph_edge_merge — duplicate (subject,object) edges merge:
    * decimal-sum of quantities, sorted supplier set, multiplicity —
    * GraphMerger.merge_edges as one hash aggregate. */
  def edgeMerge(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("subject"),
        col("l_partkey").as("object"))
      .agg(
        d2(sum(col("l_quantity").cast(D))).as("sum_qty"),
        // numeric sort FIRST, then stringify ("10" < "2" lexically)
        array_join(transform(sort_array(collect_set(col("l_suppkey"))),
          _.cast("string")), ",").as("supps"),
        count(lit(1)).as("n"))
      .orderBy(col("subject"), col("object"))

  /** q_graph_degree — per-node degree over the order→part edge set,
    * top-20 (pre-load QC stats). TakeOrderedAndProject, no full sort. */
  def degree(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val outDeg = li.groupBy(col("l_orderkey").as("node"))
      .agg(count(lit(1)).as("degree"))
      .select(lit("order").as("ntype"), col("node"), col("degree"))
    val inDeg = li.groupBy(col("l_partkey").as("node"))
      .agg(count(lit(1)).as("degree"))
      .select(lit("part").as("ntype"), col("node"), col("degree"))
    outDeg.unionByName(inDeg)
      .orderBy(col("degree").desc, col("ntype"), col("node"))
      .limit(20)
  }

  /** q_graph_cc — connected components of the bipartite order–part
    * graph via GraphX (Pregel label propagation); returns the component
    * size histogram. No oracle (iterative); invariants asserted in
    * tests: Σ(size × n_components) = node count.
    * Part vertex ids offset by 2^31 so the two id spaces don't collide.
    * At 100 TB one would switch to the large-star/small-star algorithm
    * over DataFrames with checkpointing; Pregel CC is fine at bench
    * scale and the surface (edge list in, labeled vertices out) is
    * identical. */
  def connectedComponents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val offset = 1L << 31
    val edges = Tables.lineitem(s, d)
      .select(col("l_orderkey"), (col("l_partkey") + offset).as("part"))
      .distinct()
      // cap partitions: Pregel pays per-partition overhead every
      // iteration, and 600k edges want a few fat partitions, not 32
      .coalesce(math.min(8, s.sparkContext.defaultParallelism))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val graph = GXGraph.fromEdgeTuples(edges, 1)
    val cc = org.apache.spark.graphx.lib.ConnectedComponents.run(graph)
    cc.vertices.map { case (_, comp) => comp }.toDF("comp")
      .groupBy(col("comp")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_components"))
      .orderBy(col("size"))
  }
}
