package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `vector_sum`: the O(1)-in-dim array-summing aggregate that backs the
  * k-means centroid update (replaces `dim` separate
  * `sum(element_at(vec, i))` aggregate expressions, which put the
  * embedding dimensionality into the Catalyst plan). */
class VectorSumSpec extends SparkSpec {
  import spark.implicits._

  private def ensure(): Unit = GraftFunctions.ensure(spark)

  test("property: equals the per-element sum formulation at dim 256 (float input)") {
    ensure()
    val dim = 256
    val rnd = new scala.util.Random(31)
    val rows = (0 until 500).map(i =>
      (i % 7, Array.fill(dim)((rnd.nextGaussian() * 10).toFloat)))
    // 16 partitions force genuinely independent partial buffers
    val df = rows.toDF("g", "v").repartition(16).cache()

    val got = df.groupBy("g").agg(GraftFunctions.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val want = df.groupBy("g")
      .agg(array((0 until dim).map(i => sum(element_at(col("v"), i + 1))): _*).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap

    assert(got.keySet == want.keySet)
    got.keySet.foreach { g =>
      got(g).zip(want(g)).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-6, s"group $g elem $i: $a vs $b")
      }
    }
    df.unpersist()
  }

  test("double input sums exactly; null rows skipped; null elements contribute 0") {
    ensure()
    val df = Seq(
      (1, Some(Seq(Some(1.0), Some(2.0), None))),
      (1, Some(Seq(Some(10.0), None, Some(30.0)))),
      (1, None),
      (2, None)
    ).toDF("g", "v")
    val got = df.groupBy("g").agg(GraftFunctions.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Double](1))).toMap
    assert(got(1).get == Seq(11.0, 2.0, 30.0))
    assert(got(2).isEmpty, "all-null group must yield null, not zeros")
  }

  test("ragged input throws (a mixed-dim embedding table is corrupt)") {
    ensure()
    val df = Seq((1, Seq(1.0, 2.0)), (1, Seq(1.0, 2.0, 3.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.repartition(1).groupBy("g").agg(GraftFunctions.vectorSum(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("plan runs map-side partial aggregation (shuffle carries one row per group/partition)") {
    ensure()
    val df = (0 until 100).map(i => (i % 3, Seq.fill(8)(i.toDouble))).toDF("g", "v")
      .repartition(4).groupBy("g").agg(GraftFunctions.vectorSum(col("v")).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_vector_sum"),
      s"map-side partial aggregation must run:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("k-means at dim 256 stays driver-cheap (no per-dim expression blowup)") {
    ensure()
    // the point of vector_sum: at production dims the centroid update
    // is ONE aggregate expression, so plan analysis is O(1) in dim —
    // this fit would stall Catalyst/Janino under the old per-element
    // formulation and completes in seconds now
    val dim = 256
    val rnd = new scala.util.Random(17)
    val emb = (0L until 300L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cents = graft.operators.AnnSearch.kmeansCentroids(emb, "embedding", k = 4, iters = 2)
    assert(cents.length == 4 && cents.forall(_.length == dim))
    assert(cents.exists(_.exists(_ != 0.0)))
  }
}
