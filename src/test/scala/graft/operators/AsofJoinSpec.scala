package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** As-of join + sessionization semantics on hand-built timelines. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks the latest right row at/before each left row, per key") {
    val quotes = Seq(
      (1L, ts("2024-06-01 10:00:00"), 100.0),
      (1L, ts("2024-06-01 10:05:00"), 101.0),
      (1L, ts("2024-06-01 10:10:00"), 102.0),
      (2L, ts("2024-06-01 10:07:00"), 55.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-06-01 10:03:00"), 10),  // -> 100.0
      (1L, ts("2024-06-01 10:05:00"), 20),  // tie -> 101.0
      (1L, ts("2024-06-01 10:30:00"), 30),  // -> 102.0
      (2L, ts("2024-06-01 10:06:00"), 40),  // before any quote -> null
      (2L, ts("2024-06-01 10:08:00"), 50)   // -> 55.0
    ).toDF("sym", "qts", "qty")

    val got = AsofJoin.asof(trades, quotes, "sym", "qts")
      .select(col("sym"), col("qty"), col("asof_price"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> Option(r.get(2))).toMap
    assert(got((1L, 10)).contains(100.0))
    assert(got((1L, 20)).contains(101.0)) // equal timestamps match
    assert(got((1L, 30)).contains(102.0))
    assert(got((2L, 40)).isEmpty)         // left-outer null, no earlier quote
    assert(got((2L, 50)).contains(55.0))
  }

  test("asof plan is one shuffle + window, no join node") {
    val l = Seq((1L, ts("2024-06-01 10:00:00"), 1)).toDF("k", "t", "v")
    val r = Seq((1L, ts("2024-06-01 09:00:00"), 2)).toDF("k", "t", "w")
    val plan = AsofJoin.asof(l, r, "k", "t").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asof should not plan a join:\n$plan")
    assert(plan.contains("Window"), "asof should plan a window")
  }

  test("sessionize splits on gaps > threshold and rolls up per session") {
    val ev = Seq(
      (7L, ts("2024-06-01 10:00:00"), 1L, 1.0),
      (7L, ts("2024-06-01 10:10:00"), 2L, 2.0),  // same session (10 min)
      (7L, ts("2024-06-01 11:00:00"), 3L, 4.0),  // 50-min gap -> new session
      (8L, ts("2024-06-01 10:00:00"), 4L, 8.0)   // other user
    ).toDF("user_id", "ts", "event_id", "value")

    val ids = Sessionize.withSessionIds(ev, "user_id", "ts", Seq("event_id"), 1800)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(ids(1L) == 1 && ids(2L) == 1 && ids(3L) == 2 && ids(4L) == 1)

    val sess = Sessionize.sessions(ev, "user_id", "ts", "value", Seq("event_id"), 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(sess((7L, 1L)) == ((2L, 3.0)))
    assert(sess((7L, 2L)) == ((1L, 4.0)))
    assert(sess((8L, 1L)) == ((1L, 8.0)))
  }

  test("NTZ timestamps sessionize identically under a non-UTC session zone (DST fold)") {
    // 2024-11-03 01:30 happens TWICE in America/New_York (fall-back);
    // a session-zone NTZ cast would collapse/shift gaps across the
    // fold. Wall-clock arithmetic must see a plain 30-minute gap.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ev = Seq(
        (1L, "2024-11-03 01:00:00", 1L, 1.0),
        (1L, "2024-11-03 01:30:00", 2L, 1.0),  // 30 min wall-clock, inside gap
        (1L, "2024-11-03 03:00:00", 3L, 1.0)   // 90 min -> new session
      ).toDF("user_id", "ts_s", "event_id", "value")
        .withColumn("ts", col("ts_s").cast("timestamp_ntz"))
      val ids = Sessionize.withSessionIds(ev, "user_id", "ts", Seq("event_id"), 3600)
        .select("event_id", "session_id").as[(Long, Long)].collect().toMap
      assert(ids(1L) == 1 && ids(2L) == 1 && ids(3L) == 2, s"got $ids")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("boundary: gap exactly equal to threshold stays in the session") {
    val ev = Seq(
      (1L, ts("2024-06-01 10:00:00"), 1L, 1.0),
      (1L, ts("2024-06-01 10:30:00"), 2L, 1.0)  // exactly 1800 s
    ).toDF("user_id", "ts", "event_id", "value")
    val ids = Sessionize.withSessionIds(ev, "user_id", "ts", Seq("event_id"), 1800)
      .select("session_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
