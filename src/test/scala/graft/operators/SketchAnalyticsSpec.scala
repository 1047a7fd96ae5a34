package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable HLL sketch analytics: merge-equivalence (union of daily
  * sketches ≡ one pass over the whole range), error bound vs exact,
  * roll-up composition, parquet persistence round-trip. */
class SketchAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** 3 "days" × overlapping user sets (user u active on day d iff
    * u % (d+2) == 0) — overlap is what makes naive per-day count sums
    * wrong and sketch union right. */
  private def activity = {
    val rows = for {
      d <- 0 until 3
      u <- 0 until 2000
      if u % (d + 2) == 0
    } yield (d, s"u$u")
    rows.toDF("day", "user")
  }

  test("estimate(union(daily sketches)) == estimate(single whole-range sketch) exactly") {
    val daily = SketchAnalytics.distinctSketch(activity, "user", Seq("day"))
    assert(daily.count() == 3)
    val merged = SketchAnalytics.estimateDistinct(daily, Nil)
      .as[Long].head()
    val onePass = SketchAnalytics.estimateDistinct(
      SketchAnalytics.distinctSketch(activity, "user", Nil), Nil).as[Long].head()
    // HLL register state is order/partition-insensitive: max per
    // register — so the two MUST agree exactly, not just approximately
    assert(merged == onePass, s"union-of-dailies $merged != one-pass $onePass")
  }

  test("estimate within the lgK=12 error envelope of the exact distinct count") {
    val exact = activity.select("user").distinct().count()
    val est = SketchAnalytics.estimateDistinct(
      SketchAnalytics.distinctSketch(activity, "user", Nil), Nil).as[Long].head()
    // 2^12 registers → RSE ~1.04/sqrt(4096) ≈ 1.6%; assert 3 sigma
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est vs exact $exact")
  }

  test("roll-up: mergeSketches dailies -> one sketch row, same estimate; parquet round-trip") {
    val daily = SketchAnalytics.distinctSketch(activity, "user", Seq("day"))
    val dir = tmpDir("sketches")
    daily.write.mode("overwrite").parquet(dir)            // the persisted dashboard table
    val reloaded = spark.read.parquet(dir)
    val rolled = SketchAnalytics.mergeSketches(reloaded, Nil)
    assert(rolled.count() == 1)
    val est = SketchAnalytics.estimateDistinct(rolled, Nil).as[Long].head()
    val direct = SketchAnalytics.estimateDistinct(reloaded, Nil).as[Long].head()
    assert(est == direct, "estimating a rolled-up sketch must equal estimating the dailies")
  }

  test("grouped estimates: per-group sketches stay independent") {
    val df = Seq(("a", "u1"), ("a", "u2"), ("a", "u1"), ("b", "u1")).toDF("g", "user")
    val est = SketchAnalytics.estimateDistinct(
        SketchAnalytics.distinctSketch(df, "user", Seq("g")), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }
}
