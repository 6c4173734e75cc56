package graft

class GraftFacadeSpec extends GraftSuite {

  test("init + registerTables makes everything reachable from SQL") {
    Graft.init(spark)
    Graft.registerTables(spark, sf)
    assert(spark.sql("SELECT count(*) FROM lineitem").first().getLong(0) == 6000L)
    // native function from SQL over a registered table
    val cos = spark.sql(
      """SELECT cosine_sim(
        |  transform(embedding, x -> cast(x as double)),
        |  transform(embedding, x -> cast(x as double))) AS c
        |FROM embeddings LIMIT 1""".stripMargin).first().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    // sketch aggregate from SQL
    val est = spark.sql(
      """SELECT count_min_est(l_returnflag, 'A') AS e FROM lineitem""")
      .first().getAs[scala.collection.Seq[Long]](0)
    assert(est.head >= 1900L) // exact count is 1962 at sf0.001
    // events view carries the µs-converted timestamp
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01'")
      .first().getLong(0)
    assert(n == 1000L)
  }
}
