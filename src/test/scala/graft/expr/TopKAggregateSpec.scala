package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `top_k_rows`: the bounded partial-aggregating per-group top-k that
  * replaces the corpus-shuffling window formulation in multi-query ANN. */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def ensure(): Unit = GraftFunctions.ensure(spark)

  private lazy val scored = {
    val rnd = new scala.util.Random(7)
    // ~40 groups × ~250 rows, scores drawn from a SMALL set so rank
    // ties are common and the id tie-break is genuinely exercised
    (1L to 10000L).map(i => (i % 40, math.floor(rnd.nextDouble() * 50) / 50.0, i))
      .toDF("query_id", "cosine", "id").cache()
  }

  test("matches the window row_number formulation exactly (incl. ties)") {
    ensure()
    val k = 7
    val got = scored
      .select(col("query_id"), struct(col("cosine"), col("id")).as("_s"))
      .groupBy("query_id")
      .agg(GraftFunctions.topKRows(col("_s"), k).as("_tk"))
      .select(col("query_id"), explode(col("_tk")).as("_e"))
      .select(col("query_id"), col("_e.id").as("id"), col("_e.cosine").as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id"))
    val want = scored.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= k)
      .select("query_id", "id", "cosine")
    assert(got.count() == 40L * k)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("output is best-first per group (explode preserves rank order)") {
    ensure()
    val rows = scored
      .select(col("query_id"), struct(col("cosine"), col("id")).as("_s"))
      .groupBy("query_id")
      .agg(GraftFunctions.topKRows(col("_s"), 5).as("_tk"))
      .where(col("query_id") === 3)
      .select(explode(col("_tk")).as("_e"))
      .select(col("_e.cosine"), col("_e.id"))
      .collect()
    val pairs = rows.map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(pairs == pairs.sortBy { case (c, id) => (-c, id) },
      s"explode order must be (cosine desc, id asc): $pairs")
  }

  test("groups smaller than k return all their rows; null scores are skipped") {
    ensure()
    val df = Seq(
      (1L, Some(0.9), 10L), (1L, Some(0.8), 11L), (1L, None, 12L),
      (2L, Some(0.5), 20L)
    ).toDF("query_id", "cosine", "id")
    val got = df.select(col("query_id"),
        struct(col("cosine").cast("double").as("cosine"), col("id")).as("_s"))
      .groupBy("query_id")
      .agg(GraftFunctions.topKRows(col("_s"), 10).as("_tk"))
      .select(col("query_id"), explode(col("_tk")).as("_e"))
      .collect().map(r => (r.getLong(0), r.getStruct(1).getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 20L)))
  }

  test("plan is a partial ObjectHashAggregate — no window, shuffle bounded at k/group/partition") {
    ensure()
    val df = scored.repartition(4)
      .select(col("query_id"), struct(col("cosine"), col("id")).as("_s"))
      .groupBy("query_id")
      .agg(GraftFunctions.topKRows(col("_s"), 7).as("_tk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_rows"),
      s"map-side partial aggregation must run (bounds the shuffle):\n$plan")
    assert(!plan.contains("Window"), s"no window exchange allowed:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("serialize/deserialize roundtrip across a real shuffle keeps exact rows") {
    ensure()
    // 64 input partitions force genuinely independent partial buffers
    val df = scored.repartition(64)
      .select(col("query_id"), struct(col("cosine"), col("id")).as("_s"))
      .groupBy("query_id")
      .agg(GraftFunctions.topKRows(col("_s"), 3).as("_tk"))
      .select(col("query_id"), explode(col("_tk")).as("_e"))
      .select(col("query_id"), col("_e.id").as("id"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id"))
    val want = scored.withColumn("_rk", row_number().over(w)).where(col("_rk") <= 3)
      .select("query_id", "id")
    assert(df.exceptAll(want).isEmpty && want.exceptAll(df).isEmpty)
  }

  test("window-frame use: repeated eval on one buffer is non-destructive (r6 eval-copy fix)") {
    ensure()
    // a running frame evaluates the SAME buffer once per row — before
    // the r6 fix the first eval drained the heap, so every later row
    // saw an empty array. Pin the fix.
    val df = Seq((1L, 0.9, 10L), (1L, 0.8, 11L), (1L, 0.7, 12L))
      .toDF("query_id", "cosine", "id")
    df.createOrReplaceTempView("tk_scored")
    val rows = spark.sql(
      """SELECT id, size(top_k_rows(struct(cosine, id), 2)
        |  OVER (PARTITION BY query_id ORDER BY id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS n
        |FROM tk_scored""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows == Map(10L -> 1, 11L -> 2, 12L -> 2),
      s"running-frame sizes must grow (capped at k): $rows")
  }

  test("string tie-break fields order ascending") {
    ensure()
    val df = Seq((1L, 0.5, "b"), (1L, 0.5, "a"), (1L, 0.5, "c"))
      .toDF("query_id", "cosine", "name")
    val got = df.select(col("query_id"), struct(col("cosine"), col("name")).as("_s"))
      .groupBy("query_id")
      .agg(GraftFunctions.topKRows(col("_s"), 2).as("_tk"))
      .select(explode(col("_tk")).as("_e"))
      .select(col("_e.name")).as[String].collect().toSeq
    assert(got == Seq("a", "b"))
  }

  test("rejects non-struct input and non-double score at analysis") {
    ensure()
    val df = Seq((1L, 0.5)).toDF("q", "c")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("q").agg(GraftFunctions.topKRows(col("c"), 3)).collect()
    }
    assert(e1.getMessage.contains("top_k_rows"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("q").agg(GraftFunctions.topKRows(struct(col("q")), 3)).collect()
    }
    assert(e2.getMessage.contains("top_k_rows"))
  }
}
