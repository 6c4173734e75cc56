package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PSI-MITAB-style ingest (reference capability: the IntAct/BioGRID
  * interaction parsers read PSI-MITAB 2.5+ — a headerless TSV whose
  * cells are pipe-delimited `prefix:value(desc)` lists; GAF is the same
  * shape for gene annotations).
  *
  * Spark-first reading: schema-pinned TSV scan, then column expressions
  * (split / regexp_extract) turn the packed cells into typed columns —
  * no custom InputFormat needed, the row-level surgery is all Catalyst.
  */
object Mitab {
  /** The first 6 MITAB columns (enough to build interaction edges). */
  val schema: StructType = StructType(Seq(
    StructField("id_a", StringType),
    StructField("id_b", StringType),
    StructField("alt_a", StringType),
    StructField("alt_b", StringType),
    StructField("aliases_a", StringType),
    StructField("aliases_b", StringType)))

  /** Read a MITAB-ish TSV and extract typed interaction edges:
    * the CURIE of each interactor (first entry of the pipe-list),
    * its prefix, and the alias list exploded to an array. */
  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", "\t")
      .option("comment", "#")
      .csv(path)
      .select(
        split(col("id_a"), "\\|").getItem(0).as("subject"),
        split(col("id_b"), "\\|").getItem(0).as("object"),
        regexp_extract(col("id_a"), "^([A-Za-z0-9]+):", 1).as("subject_prefix"),
        regexp_extract(col("id_b"), "^([A-Za-z0-9]+):", 1).as("object_prefix"),
        split(col("aliases_a"), "\\|").as("subject_aliases"),
        split(col("aliases_b"), "\\|").as("object_aliases"))
      .filter(col("subject") =!= "" && col("object") =!= "")
}
