package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed tables: the join and the aggregation on the bucket key
  * must plan with ZERO shuffle exchanges. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children ++ extra).flatMap(nodes)
  }

  test("bucketed-by-key join and groupBy plan without any shuffle") {
    val orders = (1L to 2000L).map(i => (i % 97, i, i * 1.5)).toDF("custkey", "orderkey", "price")
    val customers = (0L until 97L).map(i => (i, s"cust$i")).toDF("custkey", "name")
    Bucketing.saveBucketed(orders, "b_orders", 8, Seq("custkey"), Seq("custkey"))
    Bucketing.saveBucketed(customers, "b_cust", 8, Seq("custkey"), Seq("custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a real join
    try {
      val joined = Bucketing.read(spark, "b_orders")
        .join(Bucketing.read(spark, "b_cust"), "custkey")
        .groupBy("custkey").agg(count(lit(1)).as("n"), sum("price").as("total"))
      assert(joined.count() == 97)
      joined.collect()
      val shuffles = nodes(joined.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed join+agg must not shuffle:\n${joined.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("salted join equals the plain join on heavily skewed data and spreads the hot key") {
    // 90% of the fact rows share one key — the pathological case
    val fact = ((1L to 9000L).map(_ => (7L, "hot")) ++ (1L to 1000L).map(i => (i % 50, "cold")))
      .toDF("k", "tag")
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain, "salted join must equal the plain join")
    assert(salted(7L) == 9000L + 1000 / 50) // hot key fully matched

    // the hot key's IDENTICAL rows really spread across salt values —
    // position-based salting (content hashing would collapse them to 1)
    val saltSpread = fact.where(col("k") === 7L)
      .select(pmod(monotonically_increasing_id(), lit(8L)).as("s"))
      .distinct().count()
    assert(saltSpread == 8, s"identical hot rows must spread over all salts, got $saltSpread")
  }

  test("unbucketed equivalent DOES shuffle (the baseline the bucketing removes)") {
    val a = (1L to 2000L).map(i => (i % 97, i)).toDF("k", "v")
    val b = (0L until 97L).map(i => (i, s"x$i")).toDF("k", "w")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = a.join(b, "k").groupBy("k").count()
      joined.collect()
      val shuffles = nodes(joined.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.nonEmpty, "plain join should need a shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
