package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Profile operator: exact metrics on a hand-built fixture plus shape
  * invariants on the sf0.001 lineitem profile. */
class ProfileSpec extends GraftSuite {

  test("profileOn computes exact nulls/distincts/minmax on a fixture") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(1L), None, Some(2.5)),
      (Some(3L), Some("b"), None),
      (None, Some("a"), Some(-1.0))
    ).toDF("k", "s", "x")
    val rows = Profile.profileOn(df).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k", "s", "x"))
    val byName = rows.map(r => r.getString(0) -> r).toMap
    val k = byName("k")
    assert(k.getAs[Long]("n_nulls") == 1L)
    assert(k.getAs[Long]("n_distinct") == 2L)
    assert(k.getAs[Double]("min_num") == 1.0)
    assert(k.getAs[Double]("max_num") == 3.0)
    val s = byName("s")
    assert(s.getAs[Long]("n_nulls") == 1L)
    assert(s.getAs[Long]("n_distinct") == 2L)
    assert(s.isNullAt(s.fieldIndex("min_num")))
    val x = byName("x")
    assert(x.getAs[Long]("n_nulls") == 1L)
    assert(x.getAs[Long]("n_distinct") == 2L)
    assert(x.getAs[Double]("min_num") == -1.0)
    assert(x.getAs[Double]("max_num") == 2.5)
  }

  test("profileDrift: known distribution shift and schema change " +
      "surface on the drift ledger") {
    import spark.implicits._
    val a = Seq((1L, 10.0, "x"), (2L, 20.0, "y"), (3L, 30.0, "x"))
      .toDF("k", "v", "s")
    // snapshot b: k range shifts up, v gains a null + wider range,
    // s collapses to one value, and a NEW column appears
    val b = Seq((5L, Some(5.0), "x", true), (6L, None, "x", false),
      (7L, Some(99.0), "x", true))
      .toDF("k", "v", "s", "extra")
    val out = Profile.profileDriftOn(a, b).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getAs[Long]("distinct_delta") == 0L)
    assert(k.getAs[Double]("min_shift") == 4.0) // 5 - 1
    assert(k.getAs[Double]("max_shift") == 4.0) // 7 - 3
    val v = out("v")
    assert(v.getAs[Long]("nulls_a") == 0L && v.getAs[Long]("nulls_b") == 1L)
    assert(v.getAs[Double]("min_shift") == -5.0) // 5 - 10
    assert(v.getAs[Double]("max_shift") == 69.0) // 99 - 30
    val sCol = out("s")
    assert(sCol.getAs[Long]("distinct_a") == 2L &&
      sCol.getAs[Long]("distinct_b") == 1L &&
      sCol.getAs[Long]("distinct_delta") == -1L)
    // schema change: 'extra' exists only in b -> one-sided row
    val extra = out("extra")
    assert(extra.isNullAt(extra.fieldIndex("distinct_a")) &&
      extra.getAs[Long]("distinct_b") == 2L)
  }

  test("q_profile_table plants the declared nulls and profiles every column") {
    val rows = Profile.profileTable(spark, sf).collect()
    assert(rows.length == 11) // every lineitem column, none dropped
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // planted: every 7th linenumber nulls quantity, every 13th orderkey
    // nulls returnflag — recompute the expected counts independently
    val li = Tables.lineitem(spark, sf)
    val expQty = li.filter(col("l_linenumber") % 7 === 0).count()
    val expRf = li.filter(col("l_orderkey") % 13 === 0).count()
    assert(byName("l_quantity").getAs[Long]("n_nulls") == expQty)
    assert(byName("l_returnflag").getAs[Long]("n_nulls") == expRf)
    assert(byName("l_orderkey").getAs[Long]("n_nulls") == 0L)
    // distincts: orderkey distinct matches an independent exact count
    val expOk = li.select(col("l_orderkey")).distinct().count()
    assert(byName("l_orderkey").getAs[Long]("n_distinct") == expOk)
    // timestamp profiles as epoch micros, strings carry no numeric image
    assert(byName("l_shipdate").getAs[Double]("min_num") > 0)
    assert(byName("l_linestatus").isNullAt(rows.head.fieldIndex("min_num")))
  }

  test("validateRulesOn: every rule kind fires exactly on planted " +
      "violations and the report is repartition-invariant") {
    import spark.implicits._
    // orders: one NULL custkey (r01), one bad status (r02), one
    // non-positive price (r03), one duplicated orderkey (r04), one
    // orphan custkey 99 (r12)
    val ord = Seq(
      (1L, Option(10L), "F", 100.0),
      (1L, Option(11L), "O", 50.0),  // dup orderkey
      (2L, None, "P", 75.0),         // null custkey
      (3L, Option(10L), "X", 20.0),  // bad status
      (4L, Option(99L), "F", 0.0)    // orphan fk + price <= 0
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    // lineitem: qty 46 (r05), discount 0.09 (r06), null shipdate (r07),
    // duplicate (orderkey, linenumber) (r08), orphan orderkey 9 (r13)
    val li = Seq(
      (1L, 1, 46.0, 0.00, Option(java.sql.Date.valueOf("2024-01-01"))),
      (1L, 2, 10.0, 0.09, Option(java.sql.Date.valueOf("2024-01-02"))),
      (1L, 2, 10.0, 0.00, None), // dup key + null shipdate
      (9L, 1, 5.0, 0.01, Option(java.sql.Date.valueOf("2024-01-03")))
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
      "l_shipdate")
    // customer: null name (r09), negative balance (r10), bad segment (r11)
    val cust = Seq(
      (10L, Option("alice"), 5.0, "BUILDING"),
      (11L, None, -2.0, "MACHINERY"),    // null name + negative
      (12L, Option("carol"), 1.0, "BOATS") // bad segment
    ).toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val out = Profile.validateRulesOn(ord, li, cust).collect()
    assert(out.length == 13)
    val v = out.map(r => r.getString(0) ->
      ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_viol"),
        r.getAs[String]("status")))).toMap
    assert(v("r01") == ((5L, 1L, "fail")))
    assert(v("r02") == ((5L, 1L, "fail")))
    assert(v("r03") == ((5L, 1L, "fail")))
    assert(v("r04") == ((5L, 1L, "fail"))) // 5 rows, 4 distinct keys
    assert(v("r05") == ((4L, 1L, "fail")))
    assert(v("r06") == ((4L, 1L, "fail")))
    assert(v("r07") == ((4L, 1L, "fail")))
    assert(v("r08") == ((4L, 1L, "fail")))
    assert(v("r09") == ((3L, 1L, "fail")))
    assert(v("r10") == ((3L, 1L, "fail")))
    assert(v("r11") == ((3L, 1L, "fail")))
    assert(v("r12") == ((5L, 1L, "fail"))) // custkey 99 orphaned
    assert(v("r13") == ((4L, 1L, "fail"))) // orderkey 9 orphaned
    // a clean child passes fk: rate 0 and status pass come through
    val out2 = Profile.validateRulesOn(ord.repartition(5),
      li.repartition(3), cust.repartition(2)).collect()
    assert(out.map(_.toString).sorted.toSeq ==
      out2.map(_.toString).sorted.toSeq)
  }
}
