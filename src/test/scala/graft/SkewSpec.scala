package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends GraftSuite {

  test("salted join equals the plain join on skewed real data") {
    val li = Tables.lineitem(spark, sf)
    val part = Tables.part(spark, sf).select(col("p_partkey"), col("p_brand"))
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .orderBy(col("p_brand")).collect().map(_.toString).toSeq
    val salted = Skew.saltedJoin(li, part, "l_partkey",
        saltSource = "l_orderkey", salts = 8)
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .orderBy(col("p_brand")).collect().map(_.toString).toSeq
    assert(salted == plain)
  }

  test("salt values actually spread rows across buckets") {
    val li = Tables.lineitem(spark, sf)
    val buckets = li.select(
        pmod(xxhash64(col("l_orderkey")), lit(8)).cast("int").as("s"))
      .groupBy("s").count().collect()
    assert(buckets.length == 8)
    val counts = buckets.map(_.getLong(1))
    assert(counts.max < counts.sum / 2, "one bucket must not dominate")
  }
}
