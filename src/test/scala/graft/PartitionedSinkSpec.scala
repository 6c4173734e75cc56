package graft

import graft.ops.Sources
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** q_sink_partitioned: the written hive-style layout must value-match
  * the source table AND the year-filtered read-back must plan as
  * partition pruning (2 of ~7 directories listed), not a full scan. */
class PartitionedSinkSpec extends GraftSuite {

  test("partitioned roundtrip matches the source table") {
    val out = Sources.sinkPartitioned(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n"),
        r.getAs[Double]("sum_price"))).toMap
    val direct = Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .filter(col("o_year").isin(1996, 1998))
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 2)).cast("double").as("sum_price"))
      .collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n"),
        r.getAs[Double]("sum_price"))).toMap
    assert(out == direct)
    assert(out.keySet == Set(1996, 1998))
  }

  test("year filter prunes to exactly the two selected directories") {
    // sinkPartitioned above already wrote the layout for this sf dir
    Sources.sinkPartitioned(spark, sf).collect()
    val pruned = Sources.readPartitionedYears(spark,
      Sources.partitionedDir(sf), Seq(1996, 1998))
    val scans = pruned.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("o_year")),
      s"no o_year partition filter in: ${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned directories, scanned " +
        s"${scan.selectedPartitions.partitionCount}")
    // and the full read without the filter sees every year directory
    val all = spark.read.parquet(Sources.partitionedDir(sf))
    val nYears = all.select(col("o_year")).distinct().count()
    assert(nYears > 2)
  }

  test("morton z interleaves bits exactly (known codes)") {
    import spark.implicits._
    // morton(a, b): a at even bit positions, b at odd.
    // morton(3,1)=0b0111=7; morton(5,2)=0b11001=25; morton(0,7)=0b101010=42
    val out = Seq((3L, 1L), (5L, 2L), (0L, 7L), (65535L, 0L))
      .toDF("o", "p")
      .select(Sources.mortonZ(col("o"), col("p")).as("z"))
      .as[Long].collect().toSeq
    assert(out == Seq(7L, 25L, 42L, 0x55555555L))
  }

  test("zorder files keep BOTH key ranges narrow on a planted grid") {
    import spark.implicits._
    // 64x64 grid: a z-split into 16 files must bound each file's o and
    // p spans near sqrt(cells/16) = 16, where a linear sort by o gives
    // p-span 63 in every file — the pruning win the advisor surfaces
    val grid = (0 until 64).flatMap(o => (0 until 64).map(p =>
      (o.toLong, p.toLong))).toDF("o", "p")
    val files = Sources.layoutZorderOn(grid).collect()
    assert(files.map(_.getAs[Long]("n_rows")).sum == 4096L)
    files.foreach { r =>
      val oSpan = r.getAs[Long]("o_max") - r.getAs[Long]("o_min")
      val pSpan = r.getAs[Long]("p_max") - r.getAs[Long]("p_min")
      // 4096 codes / 16 files = 256 consecutive z codes per file = one
      // exact 16x16 Morton tile: BOTH spans are 15, where a linear
      // o-sort leaves p-span 63 in every file
      assert(oSpan == 15 && pSpan == 15,
        s"file ${r.getAs[Long]("file_id")}: oSpan=$oSpan pSpan=$pSpan")
    }
  }
}
