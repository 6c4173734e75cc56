package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Standing-index MAINTENANCE: small-file compaction for the
  * append-style partitioned artifacts.
  *
  * Every incremental-admission index in this library that appends
  * (`q_sim_ann_ivf_append`'s inverted lists, the daily-ingest shape in
  * general) accumulates ONE small parquet file per append per touched
  * partition directory. At 100 TB ops cadence that is the classic
  * small-files problem: the probe's partition-pruned scan stays cheap,
  * but the object-store LISTING of a hot list's directory grows
  * linearly with appends and eventually eats the probe advantage — a
  * real pipeline compacts hot partitions on a cadence. [[compact]]
  * rewrites every partition directory holding ≥ `minFiles` data files
  * into a single file via a sibling staging write + per-partition
  * atomic rename swap (untouched partitions keep their files
  * byte-for-byte, and a kill at any point is detected and repaired on
  * the next call — see the compact scaladoc) and returns the audit
  * ledger; AnnLshSpec proves probe-result equality before/after over
  * the REAL `q_sim_ann_ivf_append` artifact, that appends keep
  * working after a compaction, and the kill-mid-swap recovery.
  */
object IndexMaint {

  /** Data files per partition directory of a `partitionBy(partCol)`
    * parquet artifact: (partition value → .parquet file count). One
    * driver-side filesystem LIST — O(directories), exactly the cost
    * compaction exists to bound. */
  private[graft] def partFileCounts(s: SparkSession, dir: String,
      partCol: String): Map[Long, Int] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Map.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(partCol + "="))
      .map { st =>
        val v = st.getPath.getName.stripPrefix(partCol + "=").toLong
        val n = fs.listStatus(st.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        v -> n
      }.toMap
  }

  /** Rewrite every partition directory of `dir` holding ≥ `minFiles`
    * data files into ONE file. Only the hot partitions' rows are
    * rewritten; the rewrite repartitions by the partition column so
    * each directory lands as a single file. Returns the hot partition
    * values that were compacted.
    *
    * CRASH SAFETY (r16 ADVICE): the rewrite never reads and
    * overwrites the live path in one job. The compacted hot
    * partitions are written to a SIBLING staging directory first;
    * only after that write commits does the swap run, one atomic
    * directory rename pair per partition (live → aside, staged →
    * live). Every kill point leaves each partition wholly pre- or
    * wholly post-compaction except the instant between a pair's two
    * renames — and that window is DETECTED and repaired by
    * [[recoverInterrupted]] on the next compact() call AND on every
    * index open ([[openIndex]], which all standing-index read paths
    * use — the parked aside copy is restored when the live dir is
    * missing), so a partial failure can never be silently served as
    * a thinner index by this library's own readers. A second
    * compact() after success is a no-op: every compacted directory
    * holds one file, below any sane `minFiles`. */
  def compact(s: SparkSession, dir: String, partCol: String,
      minFiles: Int): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(dir + ".compact-staging")
    val aside = new org.apache.hadoop.fs.Path(dir + ".compact-old")
    recoverInterrupted(fs, root, staging, aside)
    val hot = partFileCounts(s, dir, partCol)
      .filter(_._2 >= minFiles).keys.toSeq.sorted
    if (hot.nonEmpty) {
      s.read.parquet(dir)
        .filter(col(partCol).isInCollection(hot))
        .repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol)
        .parquet(staging.toString)
      // pin the one-file-per-directory contract instead of assuming it
      // (r16 ADVICE): an ambient spark.sql.files.maxRecordsPerFile (or
      // a future writer change) that splits task output fails HERE,
      // loudly, before any live directory is touched
      val staged = partFileCounts(s, staging.toString, partCol)
      require(hot.forall(p => staged.get(p).contains(1)),
        "compaction staging wrote more than one file for some " +
        s"partition (counts ${staged.filter(_._2 != 1)}) — is " +
        "spark.sql.files.maxRecordsPerFile set? The single-file " +
        "contract of compact() does not hold under output splitting")
      fs.mkdirs(aside)
      hot.foreach { p =>
        val live = new org.apache.hadoop.fs.Path(root, s"$partCol=$p")
        rename(fs, live, new org.apache.hadoop.fs.Path(aside, s"$partCol=$p"))
        rename(fs, new org.apache.hadoop.fs.Path(staging, s"$partCol=$p"),
          live)
      }
      fs.delete(aside, true)
      fs.delete(staging, true)
      ()
    }
    hot
  }

  private def rename(fs: org.apache.hadoop.fs.FileSystem,
      from: org.apache.hadoop.fs.Path,
      to: org.apache.hadoop.fs.Path): Unit =
    require(fs.rename(from, to), s"rename $from -> $to failed")

  /** Repair state left by a compact() killed mid-flight. Aside copies
    * whose live directory is missing (killed between a swap pair's two
    * renames) are restored; everything else in the aside/staging dirs
    * is leftover garbage from partitions already swapped (or a staging
    * write that never got to swap) and is dropped. After this, every
    * partition of `root` is wholly pre- or wholly post-compaction. */
  private[graft] def recoverInterrupted(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      staging: org.apache.hadoop.fs.Path,
      aside: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(aside)) {
      fs.listStatus(aside).filter(_.isDirectory).foreach { st =>
        val live = new org.apache.hadoop.fs.Path(root, st.getPath.getName)
        if (!fs.exists(live)) rename(fs, st.getPath, live)
      }
      fs.delete(aside, true)
    }
    if (fs.exists(staging)) { fs.delete(staging, true); () }
  }

  /** Open a compactable partitioned index artifact for reading,
    * repairing any state a killed compact() left behind FIRST. Without
    * this, any reader between a kill-mid-swap and the next compact()
    * call would silently serve the index with the parked partition's
    * rows missing — parquet partition discovery just skips the absent
    * directory (r17 ADVICE). The happy path costs two driver-side
    * existence probes; repair work only runs when the aside/staging
    * sibling dirs actually exist. Every standing-index read path
    * (the ANN probes, the append ledger, the incr-semantic admit)
    * goes through here rather than a bare `read.parquet`.
    *
    * CONCURRENCY ASSUMPTION (r18 ADVICE): repair makes every reader a
    * potential MUTATOR of the shared aside/staging state, so this
    * artifact assumes NO compact() (or second repairing reader) runs
    * concurrently — a reader racing a live compact could restore or
    * delete aside directories mid-swap and trip compact's
    * require(rename) (partitions stay wholly pre- or post-compaction
    * either way; an abort loses no data, it just fails the compact).
    * That single-maintainer regime is the same one the compact demo
    * and the standing ANN indexes already operate under (one driver
    * owns an index artifact); a future concurrent caller needs a
    * lock around compact+repair, not a change to the swap protocol. */
  private[graft] def openIndex(s: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    recoverInterrupted(fs, root,
      new org.apache.hadoop.fs.Path(dir + ".compact-staging"),
      new org.apache.hadoop.fs.Path(dir + ".compact-old"))
    s.read.parquet(dir)
  }

  /** q_index_compact — the oracle-checked COMPACTION DEMO: builds a
    * standing embedding index partitioned by a PROJECTION BUCKET
    * (floor(16·⟨v̂, 1/√d·𝟙⟩) — pure sequential-fold double arithmetic,
    * so DuckDB replays the bucket of every vector bit-for-bit, unlike
    * the learned k-means quantizer of the ANN keys), ingests history
    * plus three planted daily appends, compacts the hot directories,
    * and returns the per-bucket audit ledger
    *   (bucket, n_files_before, n_files_after, n_rows).
    * The file counts are REAL filesystem listings of the artifact the
    * writes actually produced; the oracle recomputes them closed-form
    * — history contributes one file per populated bucket (the build
    * repartitions by bucket, so each directory is written by exactly
    * one task), and each append contributes one more to every bucket
    * its batch rows land in; after-compaction, every directory at
    * ≥ 3 files holds exactly 1. The REAL write/list/rewrite path is
    * thus verified against pure arithmetic (the q_mm_decode pattern).
    *
    * History = vectors with vec_id % 4 ≠ 3; appends b ∈ {0,1,2} =
    * vec_id % 4 = 3 ∧ vec_id % 3 = b.
    *
    * Idempotence: the artifact directory is fingerprint-named (the
    * [[DedupSim.datasetFingerprint]] discipline) and the ledger is
    * persisted beside it — a re-run returns the stored ledger instead
    * of re-compacting an already-compacted index (which would measure
    * different before-counts). A regenerated corpus rebuilds from
    * scratch.
    *
    * Scale shape: build/appends/compaction are all repartition-by-
    * bucket writes (one shuffle each, no driver-side data); the
    * before/after file counts are one directory listing each; the
    * ledger aggregate is a hash agg over the index rows. At 100 TB
    * only the HOT directories' rows are ever rewritten — untouched
    * partitions keep their files byte-for-byte (asserted in
    * AnnLshSpec via modification times). */
  def indexCompact(s: SparkSession, d: String): DataFrame = {
    val pfx = DedupSim.indexPrefix("graft_compact_demo", d)
    val name = pfx + DedupSim.datasetFingerprint(s, s"$d/embeddings.parquet")
    val dir = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"), name).toString
    val ledgerPath = s"$dir/_ledger"
    if (!new java.io.File(s"$ledgerPath/_SUCCESS").exists()) {
      Tables.refresh(s, d, "embeddings") // see dedupIncr (ADVICE r15)
      DedupSim.dropStaleIndexDirs(pfx, name)
      // the oracle's closed-form file counts assume one file per
      // repartition(bucket) write per directory — pin the conf that
      // assumption rides on instead of inheriting it (r16 ADVICE)
      val mrKey = "spark.sql.files.maxRecordsPerFile"
      val mrBefore = s.conf.getOption(mrKey)
      s.conf.set(mrKey, "0")
      try indexCompactBuild(s, d, dir)
      finally mrBefore match {
        case Some(v) => s.conf.set(mrKey, v)
        case None => s.conf.unset(mrKey)
      }
    }
    s.read.parquet(ledgerPath).orderBy(col("bucket"))
  }

  /** The cold path of [[indexCompact]]: build + 3 appends + compact +
    * ledger write. Separated out so the conf pin wraps exactly the
    * writes. */
  private def indexCompactBuild(s: SparkSession, d: String,
      dir: String): Unit = {
    val ledgerPath = s"$dir/_ledger"
    val bucketed = withBucket(Tables.embeddings(s, d))
    // history: one write, one file per populated bucket directory
    bucketed.filter(col("vec_id") % 4 =!= 3)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/index")
    // three planted daily appends: one more file per touched dir
    (0 until 3).foreach { b =>
      bucketed.filter(col("vec_id") % 4 === 3 && col("vec_id") % 3 === b)
        .repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$dir/index")
    }
    val beforeCounts = partFileCounts(s, s"$dir/index", "bucket")
    compact(s, s"$dir/index", "bucket", minFiles = 3)
    val afterCounts = partFileCounts(s, s"$dir/index", "bucket")
    import s.implicits._
    val files = beforeCounts.toSeq.sorted
      .map { case (bk, nb) => (bk, nb, afterCounts.getOrElse(bk, 0)) }
      .toDF("bucket", "n_files_before", "n_files_after")
    s.read.parquet(s"$dir/index")
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .join(files, Seq("bucket"))
      .select(col("bucket"),
        col("n_files_before").cast("long").as("n_files_before"),
        col("n_files_after").cast("long").as("n_files_after"),
        col("n_rows"))
      .write.mode("overwrite").parquet(ledgerPath)
  }

  /** The DuckDB-replayable projection bucket: floor(16 · Σvᵢ /
    * (√(Σvᵢ²) · √d)) — the same sequential-fold double shape the
    * embcos oracle proves bit-parity for. */
  private[graft] def withBucket(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("den",
        sqrt(expr("aggregate(v, 0d, (acc, x) -> acc + x * x)")) *
        sqrt(expr("cast(size(v) as double)")))
      .withColumn("bucket", when(col("den") === 0d, lit(0L)).otherwise(
        floor(expr("aggregate(v, 0d, (acc, x) -> acc + x)") /
          col("den") * lit(16d))))
      .select(col("vec_id"), col("v"), col("bucket"))
}
