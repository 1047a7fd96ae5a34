package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed EXACT statistics where the naive aggregate is a
 * scale-killer.
 *
 * Spark's exact `median`/`percentile` buffers EVERY group value in
 * the aggregation state: a low-cardinality groupBy over a 100 TB fact
 * table concentrates the whole table into a handful of executor
 * buffers — the one aggregate in the stats surface whose memory is
 * O(group size), not O(1) (measured: the q_stats_agg gate's exact
 * median was 27 s at sf1 vs ~4 s for every other aggregate in the
 * same scan). When the VALUE domain is bounded (quantities, ratings,
 * prices in cents, ages — the common case for exact-median asks),
 * the same exact number falls out of a count table:
 *
 *   groupBy(key, value).count                 — one partial-agg shuffle,
 *                                               O(distinct values) rows
 *   cumulative counts over value order        — a window over those rows
 *   median = avg of the values at positions ⌊(n+1)/2⌋ and ⌊(n+2)/2⌋
 *
 * Memory is O(distinct values per group) everywhere; nothing buffers
 * raw rows. Matches `median()` bit-for-bit (the low/high midpoint
 * average is exactly percentile-0.5 interpolation at even counts,
 * and the value itself at odd counts). For unbounded/continuous
 * domains where the count table itself would be O(rows), use the
 * sketch path ([[SketchAnalytics]] / `percentile_approx`) — this
 * operator trades on bounded domains only.
 */
object StatsAgg {

  /**
   * Exact per-group median of `valueCol` as (groupCols*, median) —
   * the counting formulation above. Output column: `median`.
   * Null values are ignored (matching `median()`); a group with only
   * nulls yields no row (callers left-join if they need it).
   */
  def groupedExactMedian(df: DataFrame, groupCols: Seq[String],
                         valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedExactMedian needs at least one group column")
    val gcols = groupCols.map(col)
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(gcols :+ col(valueCol).as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(gcols: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gcols: _*)
    val positioned = counts
      .withColumn("_end", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
      .withColumn("_start", col("_end") - col("_c") + 1)
      // 1-based middle positions: equal at odd n, adjacent at even n
      .withColumn("_lo", floor((col("_n") + 1) / 2))
      .withColumn("_hi", floor((col("_n") + 2) / 2))
    positioned.groupBy(gcols: _*)
      .agg(((sum(when(col("_lo").between(col("_start"), col("_end")), col("_v")))
        + sum(when(col("_hi").between(col("_start"), col("_end")), col("_v"))))
        / 2.0).as("median"))
  }

  /** The median column for composing into a wider agg result: the
    * counting median joined back on the group keys (groups are few by
    * premise, so the join side broadcasts). */
  def withExactMedian(aggregated: DataFrame, source: DataFrame,
                      groupCols: Seq[String], valueCol: String,
                      outCol: String = "median"): DataFrame = {
    val med = groupedExactMedian(source, groupCols, valueCol)
      .withColumnRenamed("median", outCol)
    aggregated.join(broadcast(med), groupCols, "left")
  }

  /** Convenience for one group column. */
  def groupedExactMedian(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame =
    groupedExactMedian(df, Seq(groupCol), valueCol)
}
