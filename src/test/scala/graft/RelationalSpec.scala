package graft

import graft.ops._

/** Golden-value tests at sf0.001 (values from FIXTURES.md, computed
  * independently with DuckDB). */
class RelationalSpec extends GraftSuite {

  test("q_agg_group matches FIXTURES golden values at sf0.001") {
    val rows = Relational.aggGroup(spark, sf).collect()
    assert(rows.length == 6)
    val af = rows.find(r => r.getString(0) == "A" && r.getString(1) == "F").get
    assert(af.getAs[Double]("sum_qty") == 24851.00)
    assert(af.getAs[Double]("sum_base_price") == 50132697.39)
    assert(af.getAs[Long]("count_order") == 977L)
    val nf = rows.find(r => r.getString(0) == "N" && r.getString(1) == "F").get
    assert(nf.getAs[Long]("count_order") == 1066L)
  }

  test("q_scan_project keeps all rows and is totally ordered") {
    val df = Relational.scanProject(spark, sf)
    assert(df.count() == 6000L)
    assert(df.columns.toSeq == Seq("okey", "lnum", "qty", "revenue"))
  }

  test("q_topk returns 20 rows in strictly decreasing price order") {
    val prices = Relational.topK(spark, sf).collect()
      .map(_.getAs[Double]("price"))
    assert(prices.length == 20)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("set ops partition consistently: |A∩B| + |A\\B| = |A|") {
    import org.apache.spark.sql.functions.year
    val o = Tables.orders(spark, sf)
    val a = o.filter(year(o("o_orderdate")) === 1996)
      .select(o("o_custkey")).distinct().count()
    val inter = Relational.intersectYears(spark, sf).count()
    val diff = Relational.exceptYears(spark, sf).count()
    assert(inter + diff == a)
  }

  test("bag set ops respect multiplicity: |A except_all B| + " +
      "|A intersect_all B| = |A|") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf)
    val nA = li.filter(col("l_returnflag") === "A").count()
    val out = Relational.setOpsBag(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_rows")).toMap
    // the multiset identity that SET except/intersect break on dups
    assert(out("except_all") + out("intersect_all") == nA)
  }

  test("q_sort_multi puts injected nulls last") {
    val segs = Relational.sortMulti(spark, sf).collect().map(r => Option(r.getString(1)))
    val firstNull = segs.indexWhere(_.isEmpty)
    assert(firstNull > 0 && segs.drop(firstNull).forall(_.isEmpty))
  }

  test("entry flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared oracle key has a query implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("unpivot melts to exact per-metric profiles") {
    import spark.implicits._
    val li = Seq((10.0, 100.50, 0.05, 0.02), (20.0, 200.50, 0.10, 0.04))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Relational.unpivotMetricsOn(li).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("total"),
          r.getAs[Double]("mean"))).toMap
    assert(out("qty") == ((2L, 30.0, 15.0)))
    assert(out("price") == ((2L, 301.0, 150.5)))
    assert(out("disc") == ((2L, 0.15, 0.075)))
    assert(out("tax") == ((2L, 0.06, 0.03)))
  }

  test("q_sql_cte: the verbatim SQL text yields top-2 nations per region") {
    val rows = Relational.sqlCte(spark, sf).collect()
    val perRegion = rows.groupBy(_.getString(0))
    assert(perRegion.size == 5)
    perRegion.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rk")).distinct.sorted.toSeq.forall(_ <= 2))
      assert(rs.length >= 2) // rank<=2 keeps >=2 rows (more only on ties)
    }
    // descending sum within region, rank consistent
    perRegion.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.sliding(2).forall(p => p.length < 2 ||
        p(0).getAs[Double]("sum_bal") >= p(1).getAs[Double]("sum_bal")))
    }
  }

  test("q_sql_lateral: decorrelated to a window-group-limit plan, " +
      "top-3 per nation, never a nested loop") {
    val df = Relational.sqlLateral(spark, sf)
    // Catalyst must DECORRELATE the lateral: the physical plan is a
    // rank-pushdown (WindowGroupLimit) + equi join — a per-row
    // re-execution or BroadcastNestedLoopJoin would be the 100 TB
    // scale-killer this key guards against
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    val rows = df.collect()
    val perNation = rows.groupBy(_.getString(0))
    perNation.values.foreach { rs =>
      assert(rs.length <= 3)
      // descending balance within each nation's top-3
      val bals = rs.map(_.getAs[Double]("bal")).toSeq
      assert(bals == bals.sorted.reverse)
    }
  }
}
