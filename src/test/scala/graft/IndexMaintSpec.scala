package graft

import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import graft.ops.IndexMaint

/** Crash-safety contract of IndexMaint.compact (r16 verdict ask #4 +
  * the r16 ADVICE in-place-overwrite finding): a compaction killed at
  * ANY point leaves every partition wholly pre- or wholly
  * post-compaction after the next call's recovery, the re-run
  * completes the compaction, and a further run is a no-op. The
  * probe-equality / append-after-compact / ledger-idempotence proofs
  * over the real ivf-append artifact live in AnnLshSpec. */
class IndexMaintSpec extends GraftSuite {

  test("compaction crash recovery: kill mid-swap is detected and " +
      "repaired, re-run completes, further run is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_kill").toString + "/index"
    val df = (0L until 40L).map(i => (i, i % 4)).toDF("vec_id", "bucket")
    // 1 build + 2 appends -> every bucket directory holds 3 files
    df.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(dir)
    (1 to 2).foreach { _ =>
      df.repartition(col("bucket")).write.mode("append")
        .partitionBy("bucket").parquet(dir)
    }
    val before = IndexMaint.partFileCounts(spark, dir, "bucket")
    assert(before == Map(0L -> 3, 1L -> 3, 2L -> 3, 3L -> 3), before)
    val rowsBefore = spark.read.parquet(dir)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"),
        sum(col("vec_id")).as("sv"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet

    // SIMULATED KILL, exactly the states compact() can die in: the
    // staging write has committed, bucket=0 is fully swapped
    // (compacted dir live, old copy parked aside), bucket=1 died
    // BETWEEN its two renames (live dir missing, old copy aside),
    // buckets 2 and 3 untouched
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dir + ".compact-staging")
    val aside = new Path(dir + ".compact-old")
    spark.read.parquet(dir)
      .filter(col("bucket").isInCollection(Seq(0, 1, 2, 3)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(staging.toString)
    fs.mkdirs(aside)
    assert(fs.rename(new Path(root, "bucket=0"), new Path(aside, "bucket=0")))
    assert(fs.rename(new Path(staging, "bucket=0"), new Path(root, "bucket=0")))
    assert(fs.rename(new Path(root, "bucket=1"), new Path(aside, "bucket=1")))
    // the torn state is VISIBLE, not silently served: bucket=1 missing
    assert(!fs.exists(new Path(root, "bucket=1")))

    // re-run: recovery restores bucket=1 pre-compaction (3 files, so
    // still hot) and drops the stale staging/aside; the compaction
    // then completes over the remaining hot dirs (0 already holds 1)
    val hot = IndexMaint.compact(spark, dir, "bucket", minFiles = 3)
    assert(hot == Seq(1L, 2L, 3L), hot)
    assert(!fs.exists(staging) && !fs.exists(aside))
    val after = IndexMaint.partFileCounts(spark, dir, "bucket")
    assert(after == Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 1), after)
    val rowsAfter = spark.read.parquet(dir)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"),
        sum(col("vec_id")).as("sv"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(rowsAfter == rowsBefore, s"$rowsAfter vs $rowsBefore")

    // a compacted index is below any minFiles threshold: no-op
    assert(IndexMaint.compact(spark, dir, "bucket", minFiles = 3).isEmpty)
    assert(IndexMaint.partFileCounts(spark, dir, "bucket") == after)
  }

  test("openIndex repairs a kill-mid-swap on the READ path: a reader " +
      "between the kill and the next compact sees every row") {
    // r17 ADVICE: without read-path recovery, partition discovery
    // silently skips the parked directory and serves a thinner index
    // until someone happens to call compact() again.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_open_kill").toString + "/index"
    val df = (0L until 40L).map(i => (i, i % 4)).toDF("vec_id", "bucket")
    df.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(dir)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val aside = new Path(dir + ".compact-old")
    // kill between bucket=2's two renames: live dir gone, copy parked
    fs.mkdirs(aside)
    assert(fs.rename(new Path(root, "bucket=2"), new Path(aside, "bucket=2")))
    // a BARE read silently loses bucket=2's rows — the failure mode
    assert(spark.read.parquet(dir).count() == 30)
    // openIndex restores the parked partition before reading
    val opened = IndexMaint.openIndex(spark, dir)
    assert(opened.count() == 40)
    assert(opened.groupBy(col("bucket")).count().collect().length == 4)
    assert(!fs.exists(aside))
    // happy path: no aside/staging dirs, openIndex is a plain read
    assert(IndexMaint.openIndex(spark, dir).count() == 40)
  }

  test("compaction staging enforces the one-file-per-directory " +
      "contract instead of assuming it") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_mrpf").toString + "/index"
    val df = (0L until 40L).map(i => (i, i % 2)).toDF("vec_id", "bucket")
    df.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(dir)
    (1 to 2).foreach { _ =>
      df.repartition(col("bucket")).write.mode("append")
        .partitionBy("bucket").parquet(dir)
    }
    val key = "spark.sql.files.maxRecordsPerFile"
    spark.conf.set(key, "5") // splits every staged directory's output
    try {
      val e = intercept[IllegalArgumentException] {
        IndexMaint.compact(spark, dir, "bucket", minFiles = 3)
      }
      assert(e.getMessage.contains("maxRecordsPerFile"), e.getMessage)
      // it failed BEFORE touching any live directory
      val counts = IndexMaint.partFileCounts(spark, dir, "bucket")
      assert(counts == Map(0L -> 3, 1L -> 3), counts)
    } finally spark.conf.unset(key)
    // and with the conf cleared the same compaction sails through
    // (recovery first drops the failed staging dir)
    val hot = IndexMaint.compact(spark, dir, "bucket", minFiles = 3)
    assert(hot == Seq(0L, 1L))
    assert(IndexMaint.partFileCounts(spark, dir, "bucket") ==
      Map(0L -> 1, 1L -> 1))
  }
}
