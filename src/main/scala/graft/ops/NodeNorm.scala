package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
}
