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

  test("planted hot key: salted equals plain row-for-row, spread 8 ways") {
    import spark.implicits._
    // one hub key (0) carries 5000 of 5200 rows — the pathological
    // distribution AQE's byte-size splitting can miss when the hot
    // partition is one giant key
    val big = ((0L until 5000L).map(i => (0L, i)) ++
        (1L to 200L).map(i => (i % 20 + 1, i)))
      .toDF("key", "payload").repartition(8)
    val small = (0L to 20L).map(i => (i, s"dim$i")).toDF("key", "name")
    val plain = big.join(small, Seq("key"))
      .select(col("key"), col("payload"), col("name"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "key",
        saltSource = "payload", salts = 8)
      .select(col("key"), col("payload"), col("name"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain) // row-for-row, duplicates included
    // the hot key's 5000 rows really occupy all 8 salt buckets
    val hotBuckets = big.filter(col("key") === 0L)
      .select(pmod(xxhash64(col("payload")), lit(8)).as("s"))
      .distinct().count()
    assert(hotBuckets == 8L)
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
