package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable-sketch analytics: per-partition (per info-date) HLL
 * sketches persisted as tiny binary rows, merged at question time —
 * "distinct users over any date range" becomes an O(days) read of
 * kilobyte sketches instead of an O(data) rescan of the range. This is
 * the incremental-analytics companion to the metastore's info-date
 * partitioning: each day's ingest saves its sketch row alongside the
 * data, and dashboards union sketches instead of scanning 100 TB.
 *
 * Built on Spark's Apache DataSketches HLL aggregates
 * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) — the
 * sketch column is a portable DataSketches blob, and HLL register
 * state is order- and partition-insensitive, so
 * estimate(union(daily sketches)) ≡ estimate(one pass over the whole
 * range) exactly (pinned in spec, with the error bound vs exact).
 */
object SketchAnalytics {

  /** Per-(group) HLL sketch rows for one slice of data — typically
    * called once per ingest day and saved to a sketch table. `lgK`
    * trades size for accuracy (2^lgK registers; 12 → ~1.6 KB / ~2.5%
    * RSE, 14 → ~6.5 KB / ~1.2%). One groupBy shuffle of (group, sketch
    * blob) pairs — never the underlying rows. */
  def distinctSketch(df: DataFrame, targetCol: String, groupCols: Seq[String],
                     lgK: Int = 12): DataFrame = {
    val agg = hll_sketch_agg(col(targetCol), lit(lgK)).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Merge previously-built sketch rows down to per-group estimates.
    * Input volume is sketches (days × groups), not data — this is the
    * query a dashboard runs. */
  def estimateDistinct(sketches: DataFrame, groupCols: Seq[String],
                       sketchCol: String = "sketch"): DataFrame = {
    val est = hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(true)))
      .as("distinct_est")
    if (groupCols.isEmpty) sketches.agg(est)
    else sketches.groupBy(groupCols.map(col): _*).agg(est)
  }

  /** One combined sketch per group (for re-saving a rolled-up sketch —
    * e.g. monthly from dailies — without touching data). */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String],
                    sketchCol: String = "sketch"): DataFrame = {
    val m = hll_union_agg(col(sketchCol), lit(true)).as(sketchCol)
    if (groupCols.isEmpty) sketches.agg(m)
    else sketches.groupBy(groupCols.map(col): _*).agg(m)
  }

  /** Per-group KLL quantile sketch rows for one slice of data — the
    * quantile member of the summary family (same save-per-day,
    * merge-at-question-time contract as [[distinctSketch]]). ~1.65%
    * normalized rank error at k=200; exact until compaction fires. */
  def valueSketch(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  k: Int = 200): DataFrame = {
    graft.expr.GraftFunctions.ensure(df.sparkSession)
    val agg = graft.expr.GraftFunctions.kllSketchAgg(col(valueCol), k).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Merge previously-built value-sketch rows down to per-group
    * quantile estimates, one output column per requested rank. */
  def estimateQuantiles(sketches: DataFrame, groupCols: Seq[String],
                        probs: Seq[Double],
                        sketchCol: String = "sketch"): DataFrame = {
    graft.expr.GraftFunctions.ensure(sketches.sparkSession)
    // faithful, collision-free labels: p50, p99, p99_9 — integer
    // rounding would label 0.999 as "p100" and collide with 1.0
    def label(p: Double): String = {
      // BigDecimal.valueOf (the double's SHORTEST decimal rendering),
      // then an exact decimal point-shift: BigDecimal(p * 100) took
      // the product's full binary expansion, so 0.999 labeled as
      // p99_9000000000000056... instead of p99_9 (r17 review)
      val s = BigDecimal.valueOf(p).underlying.movePointRight(2)
        .stripTrailingZeros.toPlainString
      "p" + s.replace(".", "_").replace("-", "m")
    }
    val labels = probs.map(label)
    require(labels.distinct.size == labels.size,
      s"estimateQuantiles: duplicate probabilities: $probs")
    val merged = graft.expr.GraftFunctions.kllMergeAgg(col(sketchCol)).as("_m")
    val aggregated =
      if (groupCols.isEmpty) sketches.agg(merged)
      else sketches.groupBy(groupCols.map(col): _*).agg(merged)
    val qCols = probs.zip(labels).map { case (p, l) =>
      graft.expr.GraftFunctions.kllQuantile(col("_m"), p).as(l)
    }
    aggregated.select(groupCols.map(col) ++ qCols: _*)
  }

  /** Heavy hitters (Misra-Gries) in one pass with BOUNDED state —
    * the frequency twin of [[distinctSketch]]: top-`k` items per group
    * as (item, count) rows, counts exact when `capacity` ≥ the
    * distinct-item count and otherwise lower bounds with undercount
    * ≤ n/(capacity+1); every item above that frequency is guaranteed
    * present. The map side keeps ≤ capacity counters and the one
    * shuffle moves ≤ capacity pairs per partition — cardinality-
    * independent, unlike `groupBy(item).count` whose shuffle is the
    * whole vocabulary. */
  def topItems(df: DataFrame, itemCol: String, groupCols: Seq[String],
               k: Int, capacity: Int): DataFrame = {
    graft.expr.GraftFunctions.ensure(df.sparkSession)
    val agg = graft.expr.GraftFunctions.approxTopItems(col(itemCol), k, capacity).as("_top")
    val aggregated =
      if (groupCols.isEmpty) df.agg(agg)
      else df.groupBy(groupCols.map(col): _*).agg(agg)
    aggregated
      .select(groupCols.map(col) :+ explode(col("_top")).as("_e"): _*)
      .select(groupCols.map(col) :+ col("_e.item").as("item") :+
        col("_e.count").as("count"): _*)
  }
}
