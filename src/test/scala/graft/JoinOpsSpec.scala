package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Edge-case specs for the time-series join operators (their main-line
  * behavior is oracle-checked by q58/q59). */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: equal timestamps match (>=), no prior row yields nulls") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // equal-ts right row exists
      (2L, 10L, ts("2024-01-01 09:00:00")),  // before any right row
      (3L, 20L, ts("2024-01-01 12:00:00"))   // key with no right rows
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.5),
      (10L, ts("2024-01-01 11:00:00"), 2.5)).toDF("k", "ts", "v")
    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", "ts", Seq("v"))
      .select("id", "matched_ts", "v").orderBy("id")
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), Some(1.5)), // >= includes equal ts
      (2L, None, None),
      (3L, None, None)))
  }

  test("asof: picks the latest prior row, not just any prior row") {
    val left = Seq((1L, 10L, ts("2024-01-01 11:30:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (10L, ts("2024-01-01 12:00:00"), 3.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", "ts", Seq("v"))
      .select("v").as[Double].head()
    assert(out == 2.0)
  }

  test("range join: inclusive bounds, multi-bucket intervals, no duplicate pairs") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start (inclusive)
      (2L, ts("2024-01-01 13:00:00")), // strictly inside, 3 buckets from start
      (3L, ts("2024-01-01 14:00:00")), // == end (inclusive)
      (4L, ts("2024-01-01 14:00:01"))  // just outside
    ).toDF("event_id", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00")))
      .toDF("iid", "start_ts", "end_ts")
    val out = RangeJoin.containmentJoin(events, "ts", intervals, "start_ts", "end_ts")
      .select("event_id", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 100L), (2L, 100L), (3L, 100L))) // exactly once each
  }

  test("q168 PIT join: each event enriched exactly once with its interval's version") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.RelationalQueries.queries("q168_pit_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.length.toLong == nEvents, "temporal tiling must match every event once")
    assert(rows.map(_._1).distinct.length == rows.length, "an event matched twice")
    val tsById = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "CAST(ts AS STRING)").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (eid, uid, v, tier) =>
      val ts = tsById(eid)
      val want =
        if (ts < "2024-01-10") 1L else if (ts < "2024-01-20") 2L else 3L
      assert(v == want, s"event $eid: version $v for ts $ts")
      assert(tier == (uid + v) % 5, s"event $eid: tier arithmetic")
    }
  }
}
