package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: accuracy bounds against exact answers on real
  * data — the gate backing q_approx_agg's rows-only check. */
class ApproxAggSpec extends SparkSpec {

  private lazy val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").cache()

  test("approx_count_distinct is within the configured rsd of exact") {
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"HLL error $err (exact=$exact approx=$approx)") // 3x rsd
  }

  test("percentile_approx brackets the exact percentile") {
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact_p50"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_p50"),
      expr("percentile(l_extendedprice, 0.99)").as("exact_p99"),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("approx_p99")).head()
    assert(math.abs(r.getDouble(1) - r.getDouble(0)) <= 1.0,
      s"p50 qty: approx ${r.getDouble(1)} vs exact ${r.getDouble(0)}")
    val relErr = math.abs(r.getDouble(3) - r.getDouble(2)) / r.getDouble(2)
    assert(relErr < 0.01, s"p99 price rel err $relErr")
  }

  test("sketches aggregate with partial (map-side) combine — one shuffle") {
    val df = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("n"))
    df.collect()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val extra: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ extra).flatMap(nodes)
    }
    val ns = nodes(df.queryExecution.executedPlan)
    val shuffles = ns.count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    val aggs = ns.count(_.getClass.getSimpleName.contains("HashAggregate"))
    assert(shuffles == 1, s"sketch agg should shuffle once, got $shuffles")
    assert(aggs >= 2, "sketch agg should have partial+final stages")
  }
}
