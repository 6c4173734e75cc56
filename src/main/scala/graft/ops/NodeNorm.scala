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
