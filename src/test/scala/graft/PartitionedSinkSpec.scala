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
}
