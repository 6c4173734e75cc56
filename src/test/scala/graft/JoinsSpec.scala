package graft

import java.sql.Timestamp
import graft.ops._

class JoinsSpec extends GraftSuite {
  import spark.implicits._

  test("inner join preserves referential integrity: every lineitem matches") {
    val n = Joins.joinInner(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_lines")).first().getLong(0)
    assert(n == 6000L)
  }

  test("semi + anti partition customers") {
    val semi = Joins.joinSemi(spark, sf).count()
    val anti = Joins.joinAnti(spark, sf).count()
    assert(semi + anti == 150L)
  }

  test("broadcast join plan actually broadcasts the dimensions") {
    val plan = Joins.joinBroadcast(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ in:\n$plan")
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of join: inclusive boundary, most-recent-prior, inner semantics") {
    // user 1: signup at 10:00. Events: 09:59 (before any signup → drop),
    // 10:00 (exactly at signup → matches, boundary inclusive),
    // 11:00 (after → matches 10:00). Second signup 11:30; event 11:45
    // must pick 11:30, not 10:00.
    val events = Seq(
      (1L, ts("2024-01-01 09:59:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0),
      (3L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (4L, ts("2024-01-01 11:00:00"), 1L, "click", 0.0),
      (5L, ts("2024-01-01 11:30:00"), 1L, "signup", 0.0),
      (6L, ts("2024-01-01 11:45:00"), 1L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Joins.joinAsofOn(events).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val us10 = ts("2024-01-01 10:00:00").getTime * 1000
    val us1130 = ts("2024-01-01 11:30:00").getTime * 1000
    assert(!out.contains(1L), "event before any signup must drop")
    assert(out(2L) == us10, "a signup event matches itself")
    assert(out(3L) == us10, "event at exactly signup ts matches (inclusive)")
    assert(out(4L) == us10)
    assert(out(6L) == us1130, "must pick most recent prior signup")
  }

  test("bucketed join plans zero exchanges between the bucketed scans") {
    // force SMJ (no auto-broadcast) so the assertion tests the bucket
    // layout, not a broadcast fallback
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = Joins.joinBucketed(spark, sf)
      // results equal the plain inner join
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_lines"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == plain)
      // the join subtree must contain NO shuffle: bucket layout
      // satisfies the required distribution at read time. (The final
      // groupBy above the join still exchanges — on o_orderpriority,
      // never on a join key.) AQE wraps the plan, so assert on the
      // final plan text.
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size >= 2,
        s"both scans must be bucketed:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle on the join key:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("range join honors the band predicate") {
    val bad = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf),
        $"l_partkey" === $"p_partkey" &&
        $"l_quantity".between($"p_size" - 2, $"p_size" + 2))
      .filter(!($"l_quantity" >= $"p_size" - 2 && $"l_quantity" <= $"p_size" + 2))
      .count()
    assert(bad == 0L)
  }

  test("fuzzy join: brute-force levenshtein ledger matches at sf0.001") {
    import org.apache.spark.sql.functions.col
    // independent reference: same planting in plain Scala, all-pairs
    val names = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def sub(s: String, fromEnd: Int, ch: Char): String = {
      // Spark side uses 1-based position len - fromEnd -> 0-based -1
      val pos = s.length - fromEnd - 1
      s.updated(pos, ch)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val queries = names.map { case (k, n) =>
      k -> (if (k % 13 == 0) sub(sub(n, (k % 5 + 1).toInt, 'x'), (k % 5 + 4).toInt, 'y')
            else if (k % 7 == 0) sub(n, (k % 5 + 1).toInt, 'x')
            else n)
    }
    val expected = queries.map { case (qid, qn) =>
      val ds = names.map { case (ck, cn) => (ck, lev(qn, cn)) }
        .filter(_._2 <= 1)
      val outcome =
        if (ds.isEmpty) "miss"
        else if (ds.map(_._2).min == 0) "exact"
        else if (ds.length == 1) "fuzzy_unique" else "fuzzy_ambiguous"
      (outcome, ds.length.toLong)
    }.groupBy(_._1).map { case (o, xs) => o -> (xs.length.toLong, xs.map(_._2).sum) }
    val all = Joins.joinFuzzy(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = all.filter(!_._1.startsWith("density_"))
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.contains("fuzzy_unique") || got.contains("fuzzy_ambiguous"))
    assert(got.contains("miss") && got.contains("exact"))
    // density wire rows vs an independent all-pairs bucket count:
    // per-name DEDUPED variant multiset (array_union semantics),
    // bucket product = q-side count × c-side count (q = c here up to
    // the planted dirt)
    def vset(n: String): Seq[String] =
      (n +: n.indices.map(i => n.take(i) + n.drop(i + 1))).distinct
    val cCounts = names.toSeq.flatMap(x => vset(x._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    val qCounts = queries.toSeq.flatMap(x => vset(x._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    val products = qCounts.collect { case (v, nq) if cCounts.contains(v) =>
      nq * cCounts(v) }.toSeq
    val hot = products.filter(_ > 256L)
    assert(all("density_hot_buckets") ==
      (hot.length.toLong, hot.sum))
    assert(all("density_max_bucket") ==
      (1L, if (products.isEmpty) 0L else products.max))
  }

  test("fuzzy join: planted hot bucket surfaces on the density wire " +
      "and trips the guarded cap") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 20 same-length names differing ONLY in the last char: deleting
    // that char lands ALL of them in one variant bucket -> pair
    // product 20*20 = 400 (> the 256 hot threshold). Keys 91i+1 are
    // never %7==0 or %13==0, so no dirt is planted and q == canon.
    val hotDf = (0 until 20)
      .map(i => (91L * i + 1, f"bucket_test_${('a' + i).toChar}"))
      .toDF("c_custkey", "c_name")
    val out = Joins.joinFuzzyOn(hotDf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every query matches itself (dist 0) -> exact, plus 19 dist-1
    // neighbors -> 20 candidates each
    assert(out("exact") == (20L, 400L))
    assert(out("density_hot_buckets") == (1L, 400L))
    assert(out("density_max_bucket") == (1L, 400L))
    // the hard cap refuses the join BEFORE paying it...
    val e = intercept[IllegalStateException] {
      Joins.joinFuzzyGuarded(hotDf, failAbovePairs = 256L)
    }
    assert(e.getMessage.contains("400"))
    // ...and a cap above the density lets it through unchanged
    val ok = Joins.joinFuzzyGuarded(hotDf, failAbovePairs = 1000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(ok == out)
  }

  test("interval join: bin-grid equi join == brute-force overlap, boundaries exact") {
    import java.time.LocalDate
    // planted shapes: exact-boundary overlaps (a1 == p_start, a0 == p_end),
    // a long interval spanning several promos/bins, a bin-sharing
    // non-overlap, and intervals fully outside every promo
    val rows = Seq(
      ("1992-01-14", "1992-01-14", 1.0), // a1 == p_end of promo 1
      ("1992-01-01", "1992-01-01", 2.0), // a0 == p_start of promo 1
      ("1992-01-15", "1992-01-20", 4.0), // after promo 1, same 30-day bin
      ("1992-02-25", "1992-03-10", 8.0), // crosses into promo 2 (03-01)
      ("1992-01-10", "1992-05-20", 16.0), // long span: promos 1..3
      ("1991-11-01", "1991-12-31", 32.0)) // before the calendar entirely
      .map { case (a, b, q) =>
        (java.sql.Date.valueOf(a), java.sql.Date.valueOf(b), new java.math.BigDecimal(q)) }
      .toDF("l_shipdate", "l_receiptdate", "l_quantity")
    val promos = Iterator.iterate(LocalDate.parse("1992-01-01"))(_.plusDays(60))
      .takeWhile(!_.isAfter(LocalDate.parse("1998-12-01")))
      .map(s => (s, s.plusDays(13))).toSeq
    val expected = promos.flatMap { case (p0, p1) =>
      val hits = rows.collect().filter { r =>
        val a0 = r.getDate(0).toLocalDate; val a1 = r.getDate(1).toLocalDate
        !a0.isAfter(p1) && !a1.isBefore(p0)
      }
      if (hits.isEmpty) None
      else Some(p0.toString ->
        ((hits.length.toLong, hits.map(_.getDecimal(2).doubleValue).sum)))
    }.toMap
    val got = Joins.joinIntervalOn(spark, rows).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected, s"got=$got expected=$expected")
    // the long span must have matched 3 distinct promos exactly once each
    assert(expected.size == 3)
  }
}
