package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The counting exact median must agree with Spark's `median()`
  * bit-for-bit on every shape — it replaces the one stats aggregate
  * whose buffer is O(group size) in the hot gate, so any divergence
  * would silently flip an oracle hash. */
class StatsAggSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: Seq[(String, java.lang.Double)]): Unit = {
    val df = rows.toDF("g", "v")
    val expected = df.groupBy("g").agg(median(col("v")).as("m"))
      .where(col("m").isNotNull)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = StatsAgg.groupedExactMedian(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected, s"counting median diverged:\ngot      $got\nexpected $expected")
  }

  test("matches median() on odd/even counts, duplicates, negatives, singletons") {
    check(Seq(
      ("odd", 3.0), ("odd", 1.0), ("odd", 2.0),
      ("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 10.0),
      ("dup", 5.0), ("dup", 5.0), ("dup", 5.0), ("dup", 7.0),
      ("neg", -4.5), ("neg", -1.0), ("neg", 2.0), ("neg", -4.5),
      ("one", 42.0)).map { case (g, v) => (g, java.lang.Double.valueOf(v)) })
  }

  test("nulls are ignored like median(); an all-null group yields no row") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("a", java.lang.Double.valueOf(1.0)), ("a", null), ("a", java.lang.Double.valueOf(3.0)),
      ("allnull", null), ("allnull", null))
    check(rows)
    val got = StatsAgg.groupedExactMedian(rows.toDF("g", "v"), "g", "v")
      .select("g").as[String].collect().toSet
    assert(got == Set("a"), s"all-null group must vanish: $got")
  }

  test("property: agrees with median() on seeded random bounded-domain data, multi-column keys") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 2000).map { _ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(3), (rnd.nextInt(50) + 1).toDouble)
    }
    val df = rows.toDF("g1", "g2", "v")
    val expected = df.groupBy("g1", "g2").agg(median(col("v")).as("m"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val got = StatsAgg.groupedExactMedian(df, Seq("g1", "g2"), "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == expected)
  }

  test("withExactMedian composes into a wider aggregate by broadcast join") {
    val df = Seq(("a", 1.0, 10L), ("a", 3.0, 20L), ("b", 5.0, 30L)).toDF("g", "v", "x")
    val agg = df.groupBy("g").agg(sum("x").as("sx"))
    val out = StatsAgg.withExactMedian(agg, df, Seq("g"), "v", "med")
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(("a", 30L, 2.0), ("b", 30L, 5.0)), out.toString)
  }
}
