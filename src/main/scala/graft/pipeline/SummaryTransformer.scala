package graft.pipeline

import graft.meta.MetastoreReader
import graft.operators.SketchAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.time.LocalDate

/**
 * Daily summary-sketch tables as a config-runnable pipeline stage —
 * the metastore wiring for the mergeable-summary family (L52): each
 * info-date's run lands ONE row per group carrying the day's HLL
 * distinct sketch, KLL value sketch and Misra-Gries top-items
 * summary (each a few KB). A dashboard asking "distinct users / p99
 * value / top items over any date range" reads the summary table's
 * date range and merges sketches — it never rescans the data table,
 * which at production scale is the difference between kilobytes and
 * terabytes per question.
 *
 * Options:
 *   `input.table`     (required) the data table
 *   `group.columns`   optional comma list — one summary row per group
 *   `distinct.column` optional — adds an HLL sketch of this column
 *   `distinct.lgk`    default 12
 *   `value.column`    optional — adds a KLL sketch of this column
 *   `value.k`         default 200
 *   `item.column`     optional — adds a top-items summary (stored
 *                     exploded-free as `array<struct<item,count>>`)
 *   `item.k`          default 20; `item.capacity` default 4096
 * At least one of the three summary columns must be configured.
 */
final class SummaryTransformer extends Transformer {

  override def validate(ms: MetastoreReader, infoDate: LocalDate,
                        options: Map[String, String]): Reason =
    if (!options.contains("input.table"))
      Reason.NotReady("option 'input.table' is required")
    else if (!Seq("distinct.column", "value.column", "item.column")
      .exists(options.contains))
      Reason.NotReady(
        "at least one of distinct.column / value.column / item.column is required")
    else Reason.Ready

  override def run(ms: MetastoreReader, infoDate: LocalDate,
                   options: Map[String, String]): DataFrame = {
    val df = ms.getTable(options("input.table"), Some(infoDate), Some(infoDate))
    graft.expr.GraftFunctions.ensure(df.sparkSession)
    val groups = options.get("group.columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

    val aggs = Seq(
      options.get("distinct.column").map(c =>
        hll_sketch_agg(col(c),
          lit(options.getOrElse("distinct.lgk", "12").toInt)).as("distinct_sketch")),
      options.get("value.column").map(c =>
        graft.expr.GraftFunctions.kllSketchAgg(col(c),
          options.getOrElse("value.k", "200").toInt).as("value_sketch")),
      options.get("item.column").map(c =>
        graft.expr.GraftFunctions.approxTopItems(col(c),
          options.getOrElse("item.k", "20").toInt,
          options.getOrElse("item.capacity", "4096").toInt).as("top_items"))
    ).flatten

    if (groups.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

/** Question-time helpers over a summary table built by
  * [[SummaryTransformer]] (typically `metastore.getTable(summary,
  * from, to)` — the partition-pruned DATE-RANGE read of sketch rows). */
object SummaryQueries {

  /** Per-group distinct estimate across every summary row in `range`. */
  def distinctOverRange(range: DataFrame, groupCols: Seq[String]): DataFrame =
    SketchAnalytics.estimateDistinct(range, groupCols, "distinct_sketch")

  /** Per-group value quantiles across every summary row in `range`. */
  def quantilesOverRange(range: DataFrame, groupCols: Seq[String],
                         probs: Seq[Double]): DataFrame =
    SketchAnalytics.estimateQuantiles(range, groupCols, probs, "value_sketch")

  /** Per-group top items across `range`. The inputs are PRE-BOUNDED
    * summaries (days × groups × k rows — kilobytes), so the merge is
    * an exact groupBy-sum over stored (item, count) pairs followed by
    * one bounded rank: at this altitude exact aggregation IS the
    * scale-correct plan; the summed counts remain valid lower bounds
    * of the true range counts (each day's MG count is one). */
  def topItemsOverRange(range: DataFrame, groupCols: Seq[String],
                        k: Int): DataFrame = {
    val exploded = range.select(
      groupCols.map(col) :+ explode(col("top_items")).as("_e"): _*)
    val summed = exploded
      .groupBy((groupCols.map(col) :+ col("_e.item").as("item")): _*)
      .agg(sum(col("_e.count")).as("count"))
    graft.expr.GraftFunctions.ensure(range.sparkSession)
    val ranked = summed
      .select((groupCols.map(col) :+
        struct(col("count").cast("double").as("score"), col("item")).as("_scored")): _*)
    val grouped =
      if (groupCols.isEmpty) ranked.agg(graft.expr.GraftFunctions.topKRows(col("_scored"), k).as("_tk"))
      else ranked.groupBy(groupCols.map(col): _*)
        .agg(graft.expr.GraftFunctions.topKRows(col("_scored"), k).as("_tk"))
    grouped
      .select(groupCols.map(col) :+ explode(col("_tk")).as("_e"): _*)
      .select(groupCols.map(col) :+ col("_e.item").as("item") :+
        col("_e.score").cast("long").as("count"): _*)
  }
}
