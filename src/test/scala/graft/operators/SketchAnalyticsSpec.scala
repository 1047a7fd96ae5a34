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

  test("quantile labels are the shortest decimal: 0.999 -> p99_9, 0.07 -> p7 (r17 review)") {
    // BigDecimal(p * 100) took the double product's full binary
    // expansion: 0.999 labeled p99_90000000000000568... and any
    // consumer selecting the documented name failed
    import spark.implicits._
    graft.expr.GraftFunctions.ensure(spark)
    val sk = Seq(1.0, 2.0, 3.0).toDF("v")
      .agg(graft.expr.GraftFunctions.kllSketchAgg(col("v"), 200).as("sketch"))
    val cols = SketchAnalytics.estimateQuantiles(sk, Nil, Seq(0.5, 0.999, 0.07, 0.29)).columns.toSeq
    assert(cols == Seq("p50", "p99_9", "p7", "p29"), cols.toString)
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

  test("topItems exact mode: capacity >= distinct items reproduces the exact top-k, any partitioning") {
    // skewed: item i appears (40 - i) times, i = 0..39
    val rows = for { i <- 0 until 40; _ <- 0 until (40 - i) } yield s"item$i"
    val df = rows.toDF("item")
    val want = rows.groupBy(identity).map { case (it, xs) => (it, xs.size.toLong) }
      .toSeq.sortBy { case (it, c) => (-c, it) }.take(10)
    for (parts <- Seq(1, 13)) {
      val got = SketchAnalytics.topItems(df.repartition(parts), "item", Nil,
          k = 10, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == want, s"parts=$parts: $got")
    }
  }

  test("topItems approximate mode: heavy hitters guaranteed present, undercount bounded") {
    // n = 1000 + 10*50 = 1500; capacity 49 -> threshold n/50 = 30:
    // the ten 100-count items are far above it and MUST survive
    val heavy = for { i <- 0 until 10; _ <- 0 until 100 } yield s"heavy$i"
    val noise = (0 until 500).flatMap(i => Seq(s"noise${i}a", s"noise${i}b"))
    val df = scala.util.Random.shuffle(heavy ++ noise).toDF("item")
    val n = heavy.size + noise.size
    val cap = 49
    val got = SketchAnalytics.topItems(df.repartition(7), "item", Nil,
        k = 10, capacity = cap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    (0 until 10).foreach { i =>
      val c = got.get(s"heavy$i")
      assert(c.isDefined, s"heavy$i above n/(cap+1) must be tracked: $got")
      assert(c.get <= 100L && c.get >= 100L - n / (cap + 1),
        s"heavy$i count ${c.get} outside [${100 - n / (cap + 1)}, 100]")
    }
  }

  test("topItems: map-side partial aggregation bounds the shuffle; grouped variant works") {
    val df = (0 until 200).map(i => (s"g${i % 2}", s"it${i % 5}")).toDF("g", "item")
    val top = SketchAnalytics.topItems(df, "item", Seq("g"), k = 2, capacity = 32)
    val rows = top.collect()
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_top_items"),
      s"map-side partial summary must bound the shuffle:\n$plan")
    assert(rows.length == 4, s"2 groups x top-2: ${rows.toSeq}")
    // per group every item appears 20 times — a full tie, so the
    // top-2 is decided purely by the item-asc tie-break
    val gA = rows.filter(_.getString(0) == "g0").map(r => (r.getString(1), r.getLong(2)))
    assert(gA.forall(_._2 == 20L) && gA.map(_._1).toSeq == Seq("it0", "it1"),
      s"deterministic (count desc, item asc) order: ${gA.toSeq}")
  }

  test("value sketches exact regime: below compaction, merged dailies give order statistics") {
    // 150 values < k=200: no compaction, the sketch holds everything
    val rows = for { d <- 0 until 3; i <- 0 until 50 } yield (d, (d * 50 + i).toDouble)
    val df = rows.toDF("day", "v")
    val daily = SketchAnalytics.valueSketch(df, "v", Seq("day"))
    assert(daily.count() == 3)
    val q = SketchAnalytics.estimateQuantiles(daily, Nil, Seq(0.5, 1.0)).head()
    // INCLUSIVE median of 0..149 is the rank-75 order statistic
    assert(q.getDouble(0) == 74.0 || q.getDouble(0) == 75.0, s"median ${q.getDouble(0)}")
    assert(q.getDouble(1) == 149.0, "max is exact")
  }

  test("value sketches big-n: quantiles within the k=200 rank-error envelope; per-group") {
    val n = 100000
    val df = (0 until n).map(i => (s"g${i % 2}", ((i.toLong * 48271L) % n).toDouble))
      .toDF("g", "v")
    val est = SketchAnalytics.estimateQuantiles(
        SketchAnalytics.valueSketch(df.repartition(8), "v", Seq("g")),
        Seq("g"), Seq(0.5, 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // values are a permutation-ish spread of 0..n; true p50 ~ n/2, p99 ~ 0.99n
    Seq("g0", "g1").foreach { g =>
      val (p50, p99) = est(g)
      assert(math.abs(p50 - n / 2.0) < 0.05 * n, s"$g p50=$p50")
      assert(math.abs(p99 - 0.99 * n) < 0.05 * n, s"$g p99=$p99")
    }
  }

  test("merging preserves the producers' k (no silent downgrade to the default)") {
    // k=800 sketches carry ~2x the default accuracy; a merge buffer
    // created at the default k=200 would adopt the coarser k and
    // discard it. Exactness regime makes the check crisp: 300 values
    // fit k=800 EXACTLY but overflow a k=200 sketch's exact region.
    val rows = (0 until 300).map(i => (i % 3, i.toDouble)).toDF("day", "v")
    val daily = SketchAnalytics.valueSketch(rows, "v", Seq("day"), k = 800)
    val q = SketchAnalytics.estimateQuantiles(daily.repartition(5), Nil, Seq(0.5, 1.0))
      .head()
    // 0..299 merged exactly: INCLUSIVE median is the rank-150 order
    // statistic, max is exact
    assert(q.getDouble(0) == 149.0 || q.getDouble(0) == 150.0, s"median ${q.getDouble(0)}")
    assert(q.getDouble(1) == 299.0)
    // label scheme: fractional ranks don't collide or mislabel
    val cols = SketchAnalytics.estimateQuantiles(daily, Nil, Seq(0.999, 1.0)).columns
    assert(cols.toSeq == Seq("p99_9", "p100"), cols.toSeq.toString)
  }

  test("value sketches: all-null group yields a null quantile, not an error") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("b", None))
      .toDF("g", "v")
    val out = SketchAnalytics.estimateQuantiles(
        SketchAnalytics.valueSketch(df, "v", Seq("g")), Seq("g"), Seq(0.5))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out("a").contains(2.0) || out("a").contains(1.0))
    assert(out("b").isEmpty, "empty sketch must read as null")
  }

  test("grouped estimates: per-group sketches stay independent") {
    val df = Seq(("a", "u1"), ("a", "u2"), ("a", "u1"), ("b", "u1")).toDF("g", "user")
    val est = SketchAnalytics.estimateDistinct(
        SketchAnalytics.distinctSketch(df, "user", Seq("g")), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }
}
