package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev utility: run ONE registered key and write its result parquet to
  * an output dir (the Verify shape without the full 213-key pass) —
  * for iterating on a single key against the DuckDB oracle.
  * Usage: runMain graft.tools.OneKey <sfDir> <outDir> <key> [key ...] */
object OneKey {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").parquet(s"$outDir/$n")
        println(s"OK $n")
      } catch {
        case e: Throwable => println(s"FAIL $n: ${e.getMessage}")
      } finally graft.ops.ScratchCache.releaseAll()
    }
    // the check.py-consumable oracle map, restricted to the keys run
    val sqls = SparkEntry.oracleSql.filter { case (k, _) => names.contains(k) }
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\\", "\\\\")
        .replace("\"", "\\\"").replace("\n", "\\n") + "\""
    }.mkString("{", ",\n", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
