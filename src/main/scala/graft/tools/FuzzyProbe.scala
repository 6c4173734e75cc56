package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev probe: decompose q_join_fuzzy's candidate volume — raw variant
  * join rows, distinct pairs, and the identity-pair share — to target
  * the candidate-stream work. Usage: runMain graft.tools.FuzzyProbe <sfDir> */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val canon = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"))
    def variants(nameC: org.apache.spark.sql.Column) = array_union(
      array(nameC),
      transform(sequence(lit(1), length(nameC)), i =>
        concat(substring(nameC, lit(1), (i - 1).cast("int")),
          substring(nameC, (i + 1).cast("int"), lit(64)))))
    val cv = canon.select(col("c_custkey"),
      explode(variants(col("c_name"))).as("vs"))
      .select(col("c_custkey"), xxhash64(col("vs")).as("v")).cache()
    val n = canon.count()
    val raw = cv.as("a").join(cv.as("b"), "v")
      .filter(col("a.c_custkey") <= col("b.c_custkey")).count()
    val ident = cv.as("a").join(cv.as("b"), "v")
      .filter(col("a.c_custkey") === col("b.c_custkey")).count()
    val dist = cv.as("a").join(cv.as("b"), "v")
      .filter(col("a.c_custkey") <= col("b.c_custkey"))
      .select(col("a.c_custkey"), col("b.c_custkey")).distinct().count()
    println(s"n=$n rawPairRows=$raw identityRows=$ident distinctPairs=$dist")
    spark.stop()
  }
}
