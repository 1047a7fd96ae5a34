package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (backward) join: for every left row, the most recent right
 * row with `right.ts <= left.ts` within the same key — the
 * time-series join Spark has no built-in operator for.
 *
 * Implementation is a tagged union + one window pass, not a range
 * join: both sides shuffle ONCE on the key, are sorted by (ts, side)
 * within each key partition, and a `last(_, ignoreNulls)` running
 * window carries the latest right payload forward onto left rows.
 * Cost is one shuffle + one sort — O(n log n) per key, zero per-row
 * probing, no broadcast requirement on either side; at 100 TB both
 * sides stream through executors exactly once. (An AQE-planned range
 * join would re-probe per row; the union trick is the canonical
 * scalable formulation.)
 *
 * Ties (`right.ts == left.ts`) match, like DuckDB/`pandas.merge_asof`
 * default: the right side sorts before the left at equal timestamps.
 */
object AsofJoin {

  /**
   * @return left rows (original columns) plus the matched right row's
   *         columns prefixed with `rightPrefix`; unmatched left rows
   *         keep nulls (left-outer semantics). Use `.where` on a
   *         prefixed column for inner semantics.
   */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightPrefix: String = "asof_"): DataFrame = {
    val leftType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rightType = org.apache.spark.sql.types.StructType(right.schema.fields)

    val l = left.select(
      left(keyCol).as("_k"), left(tsCol).as("_ts"), lit(1).as("_side"),
      struct(left.columns.toIndexedSeq.map(left(_)): _*).as("_l"), lit(null).cast(rightType).as("_r"))
    val r = right.select(
      right(keyCol).as("_k"), right(tsCol).as("_ts"), lit(0).as("_side"),
      lit(null).cast(leftType).as("_l"), struct(right.columns.toIndexedSeq.map(right(_)): _*).as("_r"))

    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    val leftCols = left.columns.map(c => col(s"_l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"_match.$c").as(s"$rightPrefix$c"))
    matched.select((leftCols ++ rightCols).toIndexedSeq: _*)
  }
}

/**
 * Gap-based sessionization: events of a key belong to one session
 * until a silence longer than `gap` splits them — the standard
 * clickstream/session-window operator.
 *
 * One window pass: `lag` marks session starts, a running sum numbers
 * them. Single shuffle on the key; state is O(1) per row. (Structured
 * Streaming's `session_window` is the streaming analog; this is the
 * batch formulation that also backs the oracle.)
 */
object Sessionize {

  /** Microseconds-since-epoch for gap arithmetic, tolerant of BOTH
   * timestamp flavors: `unix_micros` requires `TIMESTAMP`, but parquet
   * `timestamp[us]` without a zone arrives as `TIMESTAMP_NTZ` (the
   * current events testdata shape), which it rejects at analysis.
   * NTZ columns use zone-FREE wall-clock arithmetic
   * (`timestamp_diff` against the epoch in NTZ space), so gaps are
   * stable even under a non-UTC session zone — a session-zone cast
   * would shift NTZ gaps across DST folds, and `PipelineConfig`
   * deliberately lets a pipeline set a non-UTC `timeZone`. For zoned
   * `TIMESTAMP` the cast is a no-op and `unix_micros` is already an
   * instant, zone-independent by construction. */
  private def micros(dt: org.apache.spark.sql.types.DataType)(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = dt match {
    case org.apache.spark.sql.types.TimestampNTZType =>
      timestamp_diff("MICROSECOND",
        lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c)
    case _ => unix_micros(c.cast("timestamp"))
  }

  /** Adds `session_id` (1-based per key) to each event row. */
  def withSessionIds(events: DataFrame, keyCol: String, tsCol: String,
                     orderCols: Seq[String], gapSeconds: Long): DataFrame = {
    val micros = this.micros(events.schema(tsCol).dataType) _
    val order = (col(tsCol) +: orderCols.map(col)): Seq[org.apache.spark.sql.Column]
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSession = when(prevTs.isNull ||
      micros(col(tsCol)) - micros(prevTs) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: start/end, event count, value sum. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, orderCols: Seq[String], gapSeconds: Long): DataFrame =
    withSessionIds(events, keyCol, tsCol, orderCols, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol).cast("decimal(18,4)")), 2).cast("double").as("total_value"))
}
