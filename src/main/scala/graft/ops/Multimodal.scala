package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column surface (north star: treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample as batched partition-level transforms).
  *
  * The container has no media codecs and the testdata has no real media,
  * so the DECODE STEP IS A DETERMINISTIC STUB (clearly marked below):
  * media bytes are the UTF-8 encoding of documents.text. Everything
  * around the stub — the binary column type, the metadata struct schema,
  * the mapPartitions batching shape (one decoder init per partition, the
  * Scala analogue of a Pandas-UDF batch), frame slicing and sampling on
  * binary columns — is real, tested Spark plumbing that a real codec
  * drops into.
  *
  * Scale notes: binary payloads ride the same columnar parquet path as
  * any column (with `maxPartitionBytes` keeping splits bounded); decode
  * is embarrassingly parallel per partition with zero shuffle; metadata
  * extraction pushes column pruning down so a metadata-only query never
  * reads the payload bytes if stored as a separate column/file.
  */
object Multimodal {

  /** The typed media row produced by [[decodePartition]]. */
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
    magic: String, checksum: Long)

  /** Documents with a synthetic binary `media` column + declared type.
    * (Deterministic stand-in for read-binary-files ingestion.) */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("media_type"),
        col("source"))

  /** ===== STUB ===== The "decoder": a real implementation would call a
    * codec (libpng/ffmpeg/...) here, once-initialized per partition.
    * This deterministic fake extracts byte length, a "magic" prefix and
    * an additive checksum — enough to prove the batching shape, schema
    * and partition behavior without a codec. */
  private def decodeStub(mediaType: String, bytes: Array[Byte]): (String, Long) = {
    val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    (magic, sum)
  }

  /** q_mm_decode — partition-batched decode: mapPartitions with one
    * (stubbed) decoder per partition, aggregated per media type. The
    * aggregate (count, total bytes, checksum sum) is deterministic, so
    * this IS oracle-checked — the oracle recomputes the same stub in
    * SQL (length / additive byte checksum). */
  def decode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = mediaTable(s, d)
      .select(col("doc_id"), col("media_type"), col("media"))
      .as[(Long, String, Array[Byte])]
    val decoded = src.mapPartitions { rows =>
      // one decoder init per partition would go here
      rows.map { case (id, mt, bytes) =>
        val (magic, sum) = decodeStub(mt, bytes)
        MediaMeta(id, mt, bytes.length.toLong, magic, sum)
      }
    }
    decoded.toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("checksum")).as("total_checksum"))
      .orderBy(col("media_type"))
  }

  /** q_mm_meta — metadata-only query: typed metadata (length, declared
    * type) without decoding. Column pruning means the payload column
    * never leaves the scan in a real split-column layout. */
  def meta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("source"), col("media_type"),
        length(col("media")).cast("long").as("n_bytes"))
      .groupBy(col("source"), col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy(col("source"), col("media_type"))

  /** q_mm_features — batched feature extraction: binary payload → a
    * fixed-length numeric vector per item, the plumbing every
    * embedding/feature model needs (one extractor init per partition,
    * batch in, vectors out). ===== STUB ===== the "model" is a 16-bin
    * byte histogram — deterministic and oracle-checkable; a real
    * deployment swaps `featureStub` for a codec+model call with the
    * identical batching shape. Output explodes the vector to
    * (media_type, bin, n) rows so the wire format stays
    * comparator-friendly (no array columns). */
  def features(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def featureStub(bytes: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1; i += 1 }
      hist
    }
    val src = mediaTable(s, d)
      .select(col("media_type"), col("media"))
      .as[(String, Array[Byte])]
    val feats = src.mapPartitions { rows =>
      // one extractor/model init per partition would go here
      rows.map { case (mt, bytes) => (mt, featureStub(bytes)) }
    }
    feats.toDF("media_type", "hist")
      .select(col("media_type"), posexplode(col("hist")))
      .groupBy(col("media_type"), col("pos").as("bin"))
      .agg(sum(col("col")).as("n"))
      .orderBy(col("media_type"), col("bin"))
  }

  /** q_mm_frame_sample — frame sampling plumbing: treat the binary as
    * fixed-64-byte frames, keep every 4th frame, count sampled frames
    * and bytes per media type. substr on binary columns — the real
    * video case swaps the fixed stride for codec frame boundaries. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val frameSize = 64
    val stride = 4
    mediaTable(s, d)
      .withColumn("n_frames",
        ceil(length(col("media")).cast("double") / frameSize).cast("long"))
      .filter(col("n_frames") > 0) // sequence(0,-1) would run backwards
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1)))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame",
        expr(s"substring(media, cast(frame_idx * $frameSize + 1 as int), $frameSize)"))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_sampled_frames"),
        sum(length(col("frame"))).cast("long").as("sampled_bytes"))
      .orderBy(col("media_type"))
  }
}
