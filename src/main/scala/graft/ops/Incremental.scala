package graft.ops

import java.nio.file.{Files, Paths, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental source-version management — the reference's EP1 behavior
  * a daily user depends on most: each fetched source records its
  * version in a metadata sidecar (`Common/load_manager.py`
  * SourceMetadata [R]), and a load run skips any source whose recorded
  * version already matches, so a pipeline over N sources only pays for
  * the ones that actually changed.
  *
  * Spark shape: the materialized source is a parquet directory plus a
  * `_graft_source_meta.json` sidecar (underscore prefix: ignored by
  * parquet directory listings, like `_SUCCESS`). The sidecar is written
  * strictly AFTER the data commit, so a failed write leaves a stale or
  * absent sidecar and the next run simply rebuilds — no torn state.
  * At 100 TB the skip saves the full ingest+normalize cost of every
  * unchanged source; the check itself is one tiny driver-side read.
  */
object Incremental {

  /** Outcome of a [[loadIfStale]] call. */
  case class LoadStatus(source: String, version: String, rows: Long,
    skipped: Boolean, dataPath: String)

  private def metaPath(outDir: String): Path =
    Paths.get(outDir, "_graft_source_meta.json")

  private def dataPath(outDir: String): String =
    Paths.get(outDir, "data").toString

  // fixed-format sidecar; keys sorted, no timestamps → byte-stable for
  // unchanged (source, version, rows)
  private def render(source: String, version: String, rows: Long): String =
    s"""{"rows":$rows,"source":"$source","version":"$version"}"""

  private val MetaRe =
    """\{"rows":(\d+),"source":"([^"]*)","version":"([^"]*)"\}""".r

  /** The recorded (version, rows) for a materialized source, if any. */
  def recordedVersion(outDir: String): Option[(String, Long)] = {
    val p = metaPath(outDir)
    if (!Files.exists(p)) None
    else Files.readString(p) match {
      case MetaRe(rows, _, version) => Some((version, rows.toLong))
      case _ => None
    }
  }

  /** Materialize `build` into `outDir` unless the recorded version
    * already equals `version` (then: pure metadata read, `build` is
    * never evaluated — the skip-if-fresh contract). */
  def loadIfStale(spark: SparkSession, source: String, version: String,
      outDir: String)(build: => DataFrame): LoadStatus = {
    recordedVersion(outDir) match {
      case Some((v, rows)) if v == version =>
        LoadStatus(source, version, rows, skipped = true, dataPath(outDir))
      case _ =>
        Files.createDirectories(Paths.get(outDir))
        val dp = dataPath(outDir)
        build.write.mode("overwrite").parquet(dp)
        val rows = spark.read.parquet(dp).count()
        Files.writeString(metaPath(outDir), render(source, version, rows))
        LoadStatus(source, version, rows, skipped = false, dp)
    }
  }
}
