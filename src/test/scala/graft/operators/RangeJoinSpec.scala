package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join (RangeJoin). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("matches the naive inequality join, including bucket-boundary edges") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")),  // exactly at a day boundary
      (2L, ts("2024-01-01 23:59:59")),
      (3L, ts("2024-01-03 12:00:00")),
      (4L, ts("2024-01-07 00:00:00")),
      (5L, ts("2024-02-01 08:30:00"))).toDF("pid", "ts")
    val intervals = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 23:59:59")), // sub-bucket
      (101L, ts("2024-01-01 12:00:00"), ts("2024-01-05 00:00:00")), // multi-bucket
      (102L, ts("2024-01-07 00:00:00"), ts("2024-01-07 00:00:00")), // zero-length
      (103L, ts("2024-03-01 00:00:00"), ts("2024-03-02 00:00:00"))) // no matches
      .toDF("iid", "start_ts", "end_ts")

    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("pid"), r.getAs[Long]("iid"))
    val naive = points.crossJoin(intervals)
      .where(col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .collect().map(key).toSet
    assert(naive.nonEmpty && naive.contains((4L, 102L)), "fixture must exercise matches")

    for (bucketSeconds <- Seq(3600L, 86400L, 7L * 86400L)) {
      val got = RangeJoin.pointInInterval(points, "ts", intervals, "start_ts", "end_ts",
        bucketSeconds).collect().map(key)
      assert(got.toSet == naive, s"bucket=$bucketSeconds")
      assert(got.length == got.toSet.size, s"bucket=$bucketSeconds must emit no duplicates")
    }
  }

  test("plans as an equi-join, not a nested loop") {
    val points = (1 to 100).map(i => (i.toLong, ts(f"2024-01-${i % 28 + 1}%02d 10:00:00"))).toDF("pid", "ts")
    val intervals = (1 to 20).map(i =>
      (i.toLong, ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"), ts(f"2024-01-${i % 28 + 1}%02d 23:00:00")))
      .toDF("iid", "start_ts", "end_ts")
    val joined = RangeJoin.pointInInterval(points, "ts", intervals, "start_ts", "end_ts", 86400L)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not nested-loop:\n$plan")
  }

  test("matches naive join on a deterministic random workload") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    val points = (1 to 500).map(i =>
      (i.toLong, new java.sql.Timestamp(base + rnd.nextInt(30 * 86400) * 1000L))).toDF("pid", "ts")
    val intervals = (1 to 80).map { i =>
      val s = base + rnd.nextInt(30 * 86400) * 1000L
      (i.toLong, new java.sql.Timestamp(s), new java.sql.Timestamp(s + rnd.nextInt(5 * 86400) * 1000L))
    }.toDF("iid", "start_ts", "end_ts")
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("pid"), r.getAs[Long]("iid"))
    val naive = points.crossJoin(intervals)
      .where(col("ts") >= col("start_ts") && col("ts") <= col("end_ts"))
      .collect().map(key).toSet
    val got = RangeJoin.pointInInterval(points, "ts", intervals, "start_ts", "end_ts", 86400L)
      .collect().map(key)
    assert(got.toSet == naive && got.length == naive.size)
  }
}
