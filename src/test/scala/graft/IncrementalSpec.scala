package graft

import java.nio.file.{Files, Paths}
import graft.ops.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends GraftSuite {
  import spark.implicits._

  test("skip-if-fresh: unchanged version is a no-op, bump rebuilds") {
    val dir = Files.createTempDirectory("graft_inc").toString
    var builds = 0
    def build = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }

    val first = Incremental.loadIfStale(spark, "src1", "2024-01", dir)(build)
    assert(!first.skipped && first.rows == 2L && builds == 1)
    assert(Files.exists(Paths.get(dir, "_graft_source_meta.json")))
    // the materialized data is readable parquet
    assert(spark.read.parquet(first.dataPath).count() == 2L)

    val again = Incremental.loadIfStale(spark, "src1", "2024-01", dir)(build)
    assert(again.skipped, "same version must skip")
    assert(builds == 1, "build must not be evaluated on skip")
    assert(again.rows == 2L && again.dataPath == first.dataPath)

    val bumped = Incremental.loadIfStale(spark, "src1", "2024-02", dir) {
      builds += 1
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    }
    assert(!bumped.skipped && bumped.rows == 3L && builds == 2)
    assert(Incremental.recordedVersion(dir).contains(("2024-02", 3L)))
  }

  test("corrupt or missing sidecar rebuilds instead of trusting state") {
    val dir = Files.createTempDirectory("graft_inc2").toString
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "_graft_source_meta.json"), "not json")
    var builds = 0
    val st = Incremental.loadIfStale(spark, "src2", "v1", dir) {
      builds += 1; Seq(1L).toDF("id")
    }
    assert(!st.skipped && builds == 1 && st.rows == 1L)
    assert(Incremental.recordedVersion(dir).contains(("v1", 1L)))
    // a quoted (RFC-7232 ETag) version survives the sidecar roundtrip
    val dir2 = Files.createTempDirectory("graft_inc2q").toString
    val s1 = Incremental.loadIfStale(spark, "src2", "\"e\\tag\"", dir2) {
      Seq(1L).toDF("id")
    }
    assert(!s1.skipped)
    val s2 = Incremental.loadIfStale(spark, "src2", "\"e\\tag\"", dir2) {
      Seq(1L).toDF("id")
    }
    assert(s2.skipped)
    // a corrupt ESCAPE inside otherwise-valid JSON also rebuilds
    Files.writeString(Paths.get(dir2, "_graft_source_meta.json"),
      "{\"rows\":1,\"source\":\"src2\",\"version\":\"" +
        "\\" + "uZZZZ\"}")
    assert(Incremental.recordedVersion(dir2).isEmpty)
  }

  test("snapshot diff classifies added/deleted/changed/unchanged exactly") {
    val oldSnap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("k", "v_old")
    val newSnap = Seq((2L, 20.0), (3L, 35.0), (4L, 40.0))
      .toDF("k", "v_new")
    val out = Incremental.snapshotDiffOn(oldSnap, newSnap).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n"), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out("added") == ((1L, Some(40.0))))
    assert(out("deleted") == ((1L, None))) // no new-side value to sum
    assert(out("changed") == ((1L, Some(35.0))))
    assert(out("unchanged") == ((1L, Some(20.0))))
    assert(out.size == 4)
  }

  test("backfill planner flags exactly the partitions with late rows") {
    import org.apache.spark.sql.functions.{col, to_date}
    // day 1: all on-time -> no rewrite; day 2: one row 3 days late ->
    // rewrite with max_late_days 3; day 3: two late rows
    val events = Seq(
      ("2024-01-01", "2024-01-01"),
      ("2024-01-01", "2024-01-01"),
      ("2024-01-02", "2024-01-05"),
      ("2024-01-02", "2024-01-02"),
      ("2024-01-03", "2024-01-04"),
      ("2024-01-03", "2024-01-04"))
      .toDF("ts_s", "arr_s")
      .select(to_date(col("ts_s")).cast("timestamp").as("ts"),
        to_date(col("arr_s")).as("arrival_day"))
    val out = Incremental.incrBackfillOn(events).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(out("2024-01-01") == ((2L, 0L, 0L, 0)))
    assert(out("2024-01-02") == ((2L, 1L, 3L, 1)))
    assert(out("2024-01-03") == ((2L, 2L, 1L, 1)))
  }

  test("scd2 collapses runs into intervals with one open record per entity") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // ent 1: A,A,B,A (3 intervals, last A open); ent 2: C,C (1 open)
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "A"),
      (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "A"),
      (2L, ts("2024-01-01 00:00:00"), 5L, "C"),
      (2L, ts("2024-01-05 00:00:00"), 6L, "C"))
      .toDF("ent", "ts", "seq", "attr")
    val out = Incremental.scd2HistoryOn(log).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_intervals"),
        r.getAs[Long]("n_current"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("avg_run")))).toMap
    assert(out("A") == ((2L, 1L, 3L, 1.5)))
    assert(out("B") == ((1L, 0L, 1L, 1.0)))
    assert(out("C") == ((1L, 1L, 2L, 2.0)))
    assert(out.size == 3)
  }

  test("cdc apply merges insert/update/delete and proves the result table") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v_old")
    val target = Seq((2L, 20.0), (3L, 35.0), (4L, 40.0)).toDF("k", "v_new")
    val out = Incremental.cdcApplyOn(base, target).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("sum_v")))).toMap
    assert(out("insert") == ((1L, 40.0)))
    assert(out("update") == ((1L, 35.0)))
    assert(out("delete") == ((1L, 10.0))) // ledger sums the dropped value
    // applied table == target snapshot: 3 rows, 20+35+40
    assert(out("result") == ((3L, 95.0)))
    assert(out.size == 4)
  }

  test("state merge: two-phase algebraic rollup == direct one-phase aggregate") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val li = graft.Tables.lineitem(spark, sf)
    val merged = Incremental.stateMergeOn(li).collect()
      .map(r => r.getString(0) -> r).toMap
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(12, 2)))
          .cast(DecimalType(38, 2)).cast("double").as("sum_qty"),
        min(col("l_quantity").cast(DecimalType(12, 2)))
          .cast(DecimalType(38, 2)).cast("double").as("min_qty"),
        max(col("l_quantity").cast(DecimalType(12, 2)))
          .cast(DecimalType(38, 2)).cast("double").as("max_qty"),
        sum(col("l_extendedprice").cast(DecimalType(12, 2)))
          .cast(DecimalType(38, 2)).cast("double").as("sum_price"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(merged.keySet == direct.keySet && merged.nonEmpty)
    for ((f, m) <- merged; d = direct(f)) {
      assert(m.getAs[Long]("n") == d.getAs[Long]("n"))
      assert(m.getAs[Double]("sum_qty") == d.getAs[Double]("sum_qty"))
      assert(m.getAs[Double]("min_qty") == d.getAs[Double]("min_qty"))
      assert(m.getAs[Double]("max_qty") == d.getAs[Double]("max_qty"))
      assert(m.getAs[Double]("sum_price") == d.getAs[Double]("sum_price"))
      // state ledger: more than one state merged, batch slice non-empty
      // and strictly smaller than the whole history
      val (ns, nb) = (m.getAs[Long]("n_states"), m.getAs[Long]("n_batch_states"))
      assert(ns > 1L && nb > 0L && nb < ns)
    }
  }
}
