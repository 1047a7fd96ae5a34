package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval (range) join: rows of `points` matched to every
 * row of `intervals` whose [start, end] contains the point's
 * timestamp (bounds inclusive).
 *
 * Spark plans a pure inequality join as BroadcastNestedLoopJoin —
 * O(points × intervals) comparisons, a wall at 100 TB. This operator
 * makes the join an EQUI-join on a time bucket: each interval is
 * exploded into the buckets it covers, each point belongs to exactly
 * one bucket, and the residual `start <= ts <= end` filter runs only
 * within bucket-collocated pairs. Cost is
 * O(points + intervals × buckets-per-interval + true-matches):
 * shuffle-partitioned by bucket, AQE-skew-splittable, no nested loop
 * anywhere (the explode is `sequence` + `explode` — codegen'd, no
 * UDF).
 *
 * Pick `bucketSeconds` near the typical interval length: much
 * smaller multiplies the exploded interval rows; much larger packs
 * unrelated rows into one bucket and pushes work into the residual
 * filter. Each (point, interval) pair co-occurs in exactly one bucket
 * — the point's own — so no post-join dedup is needed.
 */
object RangeJoin {

  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    def bucketOf(c: Column): Column = floor(unix_timestamp(c) / bucketSeconds)
    val p = points.withColumn("_rj_bucket", bucketOf(col(tsCol)))
    val iv = intervals
      .withColumn("_rj_bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(iv, Seq("_rj_bucket"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_rj_bucket")
  }
}
