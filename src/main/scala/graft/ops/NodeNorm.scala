package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Pluggable transport for one normalization-service batch: POST a
  * chunk of raw CURIEs, get the service's JSON response body back
  * (the [[NodeNorm.responseSchema]] contract). Implementations must be
  * serializable — they ship to executors inside `mapPartitions`. The
  * tests and [[NodeNorm.normBatch]] use deterministic in-JVM services
  * (this container has zero egress); a production deployment would
  * drop in an HTTP client with the same signature. */
trait NormTransport extends Serializable {
  def post(ids: Seq[String]): String
}

/** Node-normalization service RESPONSE parsing — the data contract of
  * the reference's EP2: batched CURIE lookups return a JSON object
  * mapping each raw id to `{id: {identifier, label},
  * equivalent_identifiers: [...], type: [biolink categories]}` or
  * `null` when normalization failed. The reference consumes these
  * responses over HTTP per 2.5–5k-id batch; at 100 TB the same payloads
  * land as JSONL files and this parser turns them into the broadcastable
  * mapping TABLE that [[GraphOps.normRemap]] / [[Pipeline]] join against
  * — the batched-HTTP boundary becomes a scan + `from_json`, all
  * Catalyst, no per-row calls.
  */
object NodeNorm {
  /** One response entry (the service's per-CURIE value). */
  private val entry = StructType(Seq(
    StructField("id", StructType(Seq(
      StructField("identifier", StringType),
      StructField("label", StringType)))),
    StructField("equivalent_identifiers", ArrayType(StructType(Seq(
      StructField("identifier", StringType),
      StructField("label", StringType))))),
    StructField("type", ArrayType(StringType))))

  /** A whole response body: raw CURIE → entry (or null on failure). */
  val responseSchema: DataType = MapType(StringType, entry)

  /** Parse a column of response-body JSON strings into the mapping
    * table: (raw_id, canonical_id, canonical_label, categories,
    * equivalent_ids). Failed ids survive with NULL canonical columns —
    * the caller's retained/failure split, same as normalizeEdgesSplit.
    */
  def parseResponses(responses: DataFrame, jsonCol: String): DataFrame =
    responses
      // explode_OUTER: a malformed/truncated body makes from_json
      // return a NULL map, which must surface as one NULL-raw_id row —
      // a visible "this batch failed to parse" marker — rather than
      // silently deleting every CURIE the batch contained
      .select(explode_outer(from_json(col(jsonCol), responseSchema))
        .as(Seq("raw_id", "norm")))
      .select(col("raw_id"),
        col("norm.id.identifier").as("canonical_id"),
        col("norm.id.label").as("canonical_label"),
        col("norm.type").as("categories"),
        transform(col("norm.equivalent_identifiers"),
          (e: Column) => e("identifier")).as("equivalent_ids"))

  /** The successful subset, ready to broadcast into a remap join. */
  def mappingTable(responses: DataFrame, jsonCol: String): DataFrame =
    parseResponses(responses, jsonCol)
      .filter(col("canonical_id").isNotNull)

  private val batchSchema = StructType(Seq(
    StructField("body", StringType),
    StructField("batch_ids", ArrayType(StringType)),
    StructField("n_ids", IntegerType),
    StructField("err", StringType)))

  /** The reference's EP2 transport shape: distinct raw ids stream
    * through `mapPartitions`, grouped into ≤`batchSize` chunks (the
    * reference posts 2.5–5k CURIEs per request), ONE `transport.post`
    * per chunk. Output: one row per batch — `(body, batch_ids, n_ids,
    * err)`; a throwing post yields `body = null` + the error message,
    * so no id is ever silently lost (the failed batch's ids ride along
    * for the failure file).
    *
    * Scale shape: batching is partition-local (no shuffle beyond the
    * caller's `distinct`), service calls run from all executors in
    * parallel, and the output is batch-granular — |ids|/batchSize rows,
    * not |ids| — so the downstream `from_json` parse touches each
    * response body exactly once. */
  def fetchResponses(ids: DataFrame, idCol: String, batchSize: Int,
      transport: NormTransport): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = ids.sparkSession
    val raw = ids.select(col(idCol).cast("string")).na.drop()
    val rows = raw.rdd.mapPartitions { it =>
      it.map(_.getString(0)).grouped(batchSize).map { batch =>
        try Row(transport.post(batch), batch, batch.size, null)
        catch {
          case e: Exception =>
            Row(null, batch, batch.size, String.valueOf(e.getMessage))
        }
      }
    }
    spark.createDataFrame(rows, batchSchema)
  }

  /** EP2 end-to-end: batch-fetch + parse + failure-file twin. Distinct
    * ids are batched through `transport`; successful bodies parse into
    * the per-id mapping table ([[parseResponses]] — service-declined
    * ids surface with NULL canonical columns); batches whose POST threw
    * are exploded back to one id per line and written to
    * `failureDir` — the reference's `norm_failures` sidecar, so a
    * partial outage loses nothing and the failed ids can be replayed.
    * The batch frame has two consumers (parse + failure write) and is
    * registered with [[ScratchCache]] so each service call happens
    * exactly once. */
  def normalizeBatched(ids: DataFrame, idCol: String, batchSize: Int,
      transport: NormTransport, failureDir: String): DataFrame = {
    val batches = ScratchCache.cache(
      fetchResponses(ids.select(col(idCol)).distinct(), idCol, batchSize,
        transport))
    batches.filter(col("err").isNotNull)
      .select(explode(col("batch_ids")).as("raw_id"), col("err"))
      .write.mode("overwrite").json(failureDir)
    parseResponses(batches.filter(col("err").isNull), "body")
  }

  /** Deterministic in-JVM normalization service over `CUST:<k>` ids:
    * keys not divisible by 3 normalize to `CANON:<k>` with label
    * `cust <k>`, category `biolink:Agent`, and equivalents
    * `[CANON:<k>, ALT:<k>]`; every third key returns `null` (the
    * service's "unknown CURIE" answer). Pure arithmetic on the id
    * suffix, so the DuckDB oracle replicates it exactly. */
  class CustNormService extends NormTransport {
    def post(ids: Seq[String]): String =
      ids.map { id =>
        val k = id.substring(id.indexOf(':') + 1).toLong
        val v =
          if (k % 3 != 0)
            s"""{"id":{"identifier":"CANON:$k","label":"cust $k"},""" +
              s""""equivalent_identifiers":[{"identifier":"CANON:$k"},""" +
              s"""{"identifier":"ALT:$k"}],"type":["biolink:Agent"]}"""
          else "null"
        s""""$id":$v"""
      }.mkString("{", ",", "}")
  }

  /** Deterministic in-JVM service whose equivalence sets OVERLAP across
    * keys — the structure that makes transitive merge real: key k
    * answers equivalents {EQ:k} ∪ {EQ:k+1 unless k ≡ 7 (mod 8)}, so
    * CUST:k and CUST:k+1 share EQ:k+1 and chain into blocks of 8 —
    * while CUST:k and CUST:k+2 share NOTHING directly and merge only
    * through the chain. Keys divisible by 7 return `null` (unknown
    * CURIE), which BREAKS the chain at that key — the
    * failure/partial-outage interplay a real normalization run has.
    * Pure arithmetic on the id suffix, so DuckDB replicates it. */
  class EquivNormService extends NormTransport {
    def post(ids: Seq[String]): String =
      ids.map { id =>
        val k = id.substring(id.indexOf(':') + 1).toLong
        val v =
          if (k % 7 != 0) {
            val eqs = Seq(s"EQ:$k") ++
              (if (k % 8 != 7) Seq(s"EQ:${k + 1}") else Seq.empty)
            s"""{"id":{"identifier":"EQ:$k","label":"cust $k"},""" +
              eqs.map(e => s"""{"identifier":"$e"}""")
                .mkString(""""equivalent_identifiers":[""", ",", "],") +
              s""""type":["biolink:Agent"]}"""
          } else "null"
        s""""$id":$v"""
      }.mkString("{", ",", "}")
  }

  /** q_norm_equiv — equivalent-identifier COLLAPSE through the
    * equivalence GRAPH, the reference's actual kgx_file_normalizer
    * merge semantic (SURVEY §3.1 EP2 step 3): two raw ids must land in
    * one merged node when their `equivalent_identifiers` sets overlap
    * TRANSITIVELY (A≡B, B≡C ⇒ {A,B,C} even though A∩C = ∅) — direct
    * canonical-id equality (q_graph_node_merge) under-merges exactly
    * those chains. Raw ids and equivalent ids form a bipartite graph
    * (raw k → node 2k, equivalent n → node 2n+1 — disjoint long
    * encodings DuckDB mirrors with arithmetic); connected components
    * over it ARE the merge groups. Per merged node: canonical
    * `NORM:<min raw key>`, raw-member count, distinct equivalent-id
    * count, and the sorted member list (the merge ledger).
    *
    * Scale shape: the service fetch is the batched EP2 transport
    * (partition-local batches), pairs are |ids|×(≤2) rows, CC runs on
    * the pair graph via the alternating-star [[GraphOps.ccLabels]]
    * (O(log n) rounds, hash aggs + equi joins only), and the ledger is
    * one hash agg per component. Components are bounded by the
    * equivalence structure (a CURIE's synonym set), never corpus-sized,
    * so the collect_list member roster stays task-safe at 100 TB. */
  def normEquiv(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.customer(s, d)
      .select(concat(lit("CUST:"), col("c_custkey")).as("raw_id"))
    val failDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_equivfail_${d.replaceAll("[^a-zA-Z0-9]", "_")}").toString
    normEquivOn(
      normalizeBatched(ids, "raw_id", 500, new EquivNormService, failDir))
  }

  /** Core of q_norm_equiv over any parsed mapping table with string
    * `raw_id` (`PREFIX:<long>`) and `equivalent_ids` columns. */
  def normEquivOn(parsed: DataFrame): DataFrame = {
    val key = (c: Column) => split(c, ":").getItem(1).cast("long")
    val pairs = parsed
      .filter(col("canonical_id").isNotNull)
      .select((key(col("raw_id")) * 2).as("a"),
        explode(col("equivalent_ids")).as("eq"))
      .select(col("a"), (key(col("eq")) * 2 + 1).as("b"))
    val labels = ScratchCache.cache(GraphOps.ccLabels(pairs))
    val raw = labels.filter(col("node") % 2 === 0)
      .select(col("comp"), expr("node div 2").as("k"))
    val eqn = labels.filter(col("node") % 2 === 1)
      .groupBy(col("comp")).agg(count(lit(1)).as("n_equiv"))
    raw.groupBy(col("comp"))
      .agg(concat(lit("NORM:"), min(col("k"))).as("merged_id"),
        count(lit(1)).as("n_raw"),
        array_join(transform(array_sort(collect_list(col("k"))),
          (k: Column) => concat(lit("CUST:"), k)), ",").as("members"))
      .join(eqn, "comp")
      .select(col("merged_id"), col("n_raw"), col("n_equiv"),
        col("members"))
      .orderBy(col("merged_id"))
  }

  /** q_norm_batch — the batched transport run end-to-end on customer
    * CURIEs (batch size 400) against [[CustNormService]], returning
    * the per-id normalization outcome (retained AND failed rows, the
    * reference's split) with arrays flattened for the wire. Oracle:
    * DuckDB recomputes the service's arithmetic straight from
    * `customer`. */
  def normBatch(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.customer(s, d)
      .select(concat(lit("CUST:"), col("c_custkey")).as("raw_id"))
    val failDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_normfail_${d.replaceAll("[^a-zA-Z0-9]", "_")}").toString
    normalizeBatched(ids, "raw_id", 400, new CustNormService, failDir)
      .select(col("raw_id"), col("canonical_id"), col("canonical_label"),
        array_join(col("categories"), ",").as("cats"),
        when(col("equivalent_ids").isNotNull,
          size(col("equivalent_ids")).cast("long")).as("n_equiv"))
      .orderBy(col("raw_id"))
  }
}
