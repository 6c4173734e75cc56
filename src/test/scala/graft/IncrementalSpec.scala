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
}
