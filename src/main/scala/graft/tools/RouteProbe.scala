package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev probe: stage-time the r16 (single-pool + distinct) vs r17
  * (flagged-pool route-split) q_join_fuzzy candidate pipelines to
  * locate a regression. Usage: runMain graft.tools.RouteProbe <sfDir> */
object RouteProbe {
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
    def sub(nameC: Column, fromEnd: Column, ch: String): Column = {
      val len = length(nameC)
      val pos = len - fromEnd
      concat(substring(nameC, lit(1), (pos - 1).cast("int")), lit(ch),
        substring(nameC, (pos + 1).cast("int"), lit(64)))
    }
    val q = canon.select(col("c_custkey").as("q_id"),
      when(col("c_custkey") % 13 === 0,
        sub(sub(col("c_name"), (col("c_custkey") % 5) + 1, "x"),
          (col("c_custkey") % 5) + 4, "y"))
        .when(col("c_custkey") % 7 === 0,
          sub(col("c_name"), (col("c_custkey") % 5) + 1, "x"))
        .otherwise(col("c_name")).as("qname"))
    def variants(nameC: Column): Column = array_union(
      array(nameC),
      transform(sequence(lit(1), length(nameC)), i =>
        concat(substring(nameC, lit(1), (i - 1).cast("int")),
          substring(nameC, (i + 1).cast("int"), lit(64)))))
    def delVariants(nameC: Column): Column = array_distinct(
      transform(sequence(lit(1), length(nameC)), i =>
        concat(substring(nameC, lit(1), (i - 1).cast("int")),
          substring(nameC, (i + 1).cast("int"), lit(64)))))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  n=$n")
    }

    // ---- r16 shape ----
    val qv = q.select(col("q_id"),
      explode(variants(col("qname"))).as("vs"))
      .select(col("q_id"), xxhash64(col("vs")).as("v")).cache()
    val cv = canon.select(col("c_custkey"),
      explode(variants(col("c_name"))).as("vs"))
      .select(col("c_custkey"), xxhash64(col("vs")).as("v")).cache()
    t("r16 pool build")(qv.count() + cv.count())
    t("r16 join")(qv.join(cv, "v").count())
    t("r16 join+distinct")(qv.join(cv, "v")
      .select(col("q_id"), col("c_custkey")).distinct().count())
    t("r16 full verify")(qv.join(cv, "v")
      .select(col("q_id"), col("c_custkey")).distinct()
      .join(broadcast(q), "q_id").join(broadcast(canon), "c_custkey")
      .withColumn("dist", levenshtein(col("qname"), col("c_name")))
      .filter(col("dist") <= 1).count())
    qv.unpersist(true); cv.unpersist(true)

    // ---- r17 shape ----
    val qPool = q.select(col("q_id"), xxhash64(col("qname")).as("qf"),
        lit(false).as("q_del"), xxhash64(col("qname")).as("v"))
      .unionByName(q.select(col("q_id"),
          xxhash64(col("qname")).as("qf"), lit(true).as("q_del"),
          explode(delVariants(col("qname"))).as("vs"))
        .select(col("q_id"), col("qf"), col("q_del"),
          xxhash64(col("vs")).as("v"))).cache()
    val cPool = canon.select(col("c_custkey"),
        xxhash64(col("c_name")).as("cf"),
        lit(false).as("c_del"), xxhash64(col("c_name")).as("v"))
      .unionByName(canon.select(col("c_custkey"),
          xxhash64(col("c_name")).as("cf"), lit(true).as("c_del"),
          explode(delVariants(col("c_name"))).as("vs"))
        .select(col("c_custkey"), col("cf"), col("c_del"),
          xxhash64(col("vs")).as("v"))).cache()
    t("r17 pool build")(qPool.count() + cPool.count())
    t("r17 join")(qPool.join(cPool, "v").count())
    t("r17 join+filter")(qPool.join(cPool, "v")
      .filter(!(col("q_del") && col("c_del") && col("qf") === col("cf")))
      .count())
    t("r17 full verify")(qPool.join(cPool, "v")
      .filter(!(col("q_del") && col("c_del") && col("qf") === col("cf")))
      .select(col("q_id"), col("c_custkey"))
      .join(broadcast(q), "q_id").join(broadcast(canon), "c_custkey")
      .withColumn("dist", levenshtein(col("qname"), col("c_name")))
      .filter(col("dist") <= 1).count())
    t("r17 verify repart(q_id)")(qPool.join(cPool, "v")
      .filter(!(col("q_del") && col("c_del") && col("qf") === col("cf")))
      .select(col("q_id"), col("c_custkey"))
      .repartition(col("q_id"))
      .join(broadcast(q), "q_id").join(broadcast(canon), "c_custkey")
      .withColumn("dist", levenshtein(col("qname"), col("c_name")))
      .filter(col("dist") <= 1).count())
    t("r17 agg repart(q_id)")(qPool.join(cPool, "v")
      .filter(!(col("q_del") && col("c_del") && col("qf") === col("cf")))
      .select(col("q_id"), col("c_custkey"))
      .repartition(col("q_id"))
      .join(broadcast(q), "q_id").join(broadcast(canon), "c_custkey")
      .withColumn("dist", levenshtein(col("qname"), col("c_name")))
      .filter(col("dist") <= 1)
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_cands"), min(col("dist")).as("best_dist"))
      .count())
    qPool.unpersist(true); cPool.unpersist(true)
    spark.stop()
  }
}
