package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Bucketed catalog tables: pre-shuffle data ONCE at write time by the
 * join/aggregation key, so every later join or groupBy on that key
 * runs shuffle-free — the standard strategy for repeated fact-fact
 * joins at 100 TB, where a single avoided shuffle pays for the write.
 *
 * Uses Spark's native datasource bucketing (`bucketBy` +
 * `saveAsTable`): both sides bucketed by the same key with the same
 * bucket count join with zero `ShuffleExchange` nodes (asserted in
 * `BucketingSpec`).
 */
object Bucketing {

  /** Write `df` as a bucketed (and bucket-sorted) catalog table. */
  def saveBucketed(df: DataFrame, tableName: String, buckets: Int,
                   keyCols: Seq[String], sortCols: Seq[String] = Seq.empty,
                   format: String = "parquet",
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keyCols.nonEmpty, "bucketing needs at least one key column")
    val w = df.write.format(format).mode(mode)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(tableName)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def read(spark: org.apache.spark.sql.SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
