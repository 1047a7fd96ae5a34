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

/**
 * Salted join for skewed keys: when one key holds a large fraction of
 * the fact side, a plain hash join sends that whole key to ONE
 * reducer. Salting splits each fact row across `salts` sub-keys and
 * replicates the (small) build side once per salt, so the hot key
 * spreads over `salts` reducers. AQE's skew-join handles moderate
 * skew automatically; explicit salting is the tool when one key is
 * pathological (null ids, empty documents, bot traffic).
 */
object SkewJoin {
  import org.apache.spark.sql.functions._

  /**
   * Inner equi-join of a skewed `fact` with a small `dim`, salted
   * `salts` ways. Result equals `fact.join(dim, keys)` exactly; the
   * dim side is exploded `salts`× (keep it the small side).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    // salt by row POSITION, not row content: a degenerate hot key
    // usually carries thousands of IDENTICAL rows, and any
    // content-derived salt would map them all to the same reducer —
    // exactly the skew we're breaking. monotonically_increasing_id is
    // per-row-unique and rand()-free (no re-evaluation jitter on
    // retried tasks within a stage).
    val salted = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(explodedDim, keys :+ "_salt").drop("_salt")
  }
}
