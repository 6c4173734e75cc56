package graft

import java.sql.Timestamp
import graft.plans.Asof
import graft.ops.Joins
import org.apache.spark.sql.functions._

class AsofStrategySpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("native as-of (the q_join_asof default) equals the union+window rewrite") {
    val native = Joins.joinAsof(spark, sf) // native Asof.join since round 3
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    val rewrite = Joins.joinAsofOn(Tables.events(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(native == rewrite)
  }

  test("native as-of boundary semantics: inclusive, most recent, inner") {
    val events = Seq(
      (1L, ts("2024-01-01 09:59:00"), 1L),
      (2L, ts("2024-01-01 10:00:00"), 1L),
      (3L, ts("2024-01-01 11:45:00"), 1L),
      (4L, ts("2024-01-01 09:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val signups = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:30:00"))
    ).toDF("user_id", "ts")
    val out = Asof.join(events, signups, "user_id", "ts")
      .select($"event_id", unix_micros($"asof_ts").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val us10 = ts("2024-01-01 10:00:00").getTime * 1000
    val us1130 = ts("2024-01-01 11:30:00").getTime * 1000
    assert(!out.contains(1L), "pre-signup event must drop (inner)")
    assert(out(2L) == us10, "ts == signup ts matches (inclusive)")
    assert(out(3L) == us1130, "most recent prior signup wins")
    assert(!out.contains(4L), "user with no signups drops")
  }

  test("native as-of: NULL keys and timestamps never match") {
    // right row with NULL key and left rows with NULL key/ts: SQL join
    // semantics say NULL matches nothing — they must neither pair with
    // key 0 (the getLong-on-null trap) nor appear in the output
    val events = Seq(
      (1L, Some(ts("2024-01-01 10:30:00")), Some(0L)),   // key 0, real
      (2L, Some(ts("2024-01-01 10:30:00")), None),       // null key
      (3L, None, Some(0L))                                // null ts
    ).toDF("event_id", "ts", "user_id")
    val signups = Seq(
      (Some(0L), Some(ts("2024-01-01 10:00:00"))),
      (None, Some(ts("2024-01-01 09:00:00"))),           // null key
      (Some(0L), None)                                   // null ts
    ).toDF("user_id", "ts")
    val out = Asof.join(events, signups, "user_id", "ts")
      .select($"event_id", unix_micros($"asof_ts").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val us10 = ts("2024-01-01 10:00:00").getTime * 1000
    assert(out == Map(1L -> us10),
      s"null keys/timestamps must drop, got $out")
  }

  test("physical plan contains the custom exec, not a window") {
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
    val signups = Tables.events(spark, sf)
      .filter($"event_type" === "signup").select($"user_id", $"ts")
    val plan = Asof.join(ev, signups, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in:\n$plan")
    assert(!plan.contains("Window"), "native path must not plan a window")
  }
}
