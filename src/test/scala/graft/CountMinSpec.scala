package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class CountMinSpec extends GraftSuite {
  import spark.implicits._

  test("count-min estimates bound the exact counts from above") {
    GraftExtensions.registerFunctions(spark)
    val tok = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("term"))
    val targets = Seq("data", "spark", "merge", "the")
    val est = tok.selectExpr(
        s"count_min_est(term, '${targets.mkString(",")}') as est")
      .first().getAs[scala.collection.Seq[Long]](0)
    val exact = tok.filter(col("term").isin(targets: _*))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = tok.count()
    targets.zip(est).foreach { case (t, e) =>
      val truth = exact.getOrElse(t, 0L)
      assert(e >= truth, s"$t: estimate $e < exact $truth")
      // depth=4, width=256 → expected overcount per row ≈ N/256
      assert(e <= truth + 4 * n / 256,
        s"$t: estimate $e way above exact $truth (n=$n)")
    }
  }

  test("count-min is deterministic across repeated runs") {
    GraftExtensions.registerFunctions(spark)
    val tok = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("term"))
    val runs = (1 to 2).map { _ =>
      tok.repartition(7).selectExpr("count_min_est(term, 'data,index')")
        .first().getAs[scala.collection.Seq[Long]](0).toSeq
    }
    assert(runs.head == runs.last)
  }
}
