package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Dataset splitting / sampling / mixing for training-data pipelines.
 *
 * Splits are DETERMINISTIC — a hash of the id column, not `rand()` —
 * so membership is stable across re-runs, retries, partitioning
 * changes and cluster sizes: the property a training pipeline needs
 * to guarantee no val/test leakage when any upstream stage is
 * recomputed. Everything is a column expression over one scan; no
 * shuffle is introduced by splitting or sampling.
 */
object Sampling {

  private val Buckets = 1000000L

  private def bucket(idCol: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), idCol), lit(Buckets))

  /**
   * Adds a `split` label ("train"/"val"/... per `names`) chosen by
   * hash bucket according to `weights` (normalized). Same id → same
   * split, always.
   */
  def withSplitLabel(df: DataFrame, idCol: String,
                     weights: Seq[Double], names: Seq[String],
                     seed: Long = 42L): DataFrame = {
    require(weights.length == names.length && weights.nonEmpty,
      "weights and names must align")
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(w => (w / total * Buckets).toLong)
    val b = bucket(col(idCol), seed)
    val label = names.zip(cum).reverse.foldLeft(lit(names.last): Column) {
      case (acc, (name, upper)) => when(b < upper, name).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** The split DataFrames in `names` order (one scan each, pruned by
    * the same deterministic predicate). */
  def deterministicSplit(df: DataFrame, idCol: String,
                         weights: Seq[Double], names: Seq[String],
                         seed: Long = 42L): Seq[DataFrame] = {
    val labeled = withSplitLabel(df, idCol, weights, names, seed)
    names.map(n => labeled.where(col("split") === n).drop("split"))
  }

  /** Seeded stratified sampling: per-stratum fractions (absent keys
    * drop to 0). Thin wrapper over Spark's `stat.sampleBy`. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /**
   * Cap rows per key (dedupe-adjacent "balance the dataset" op):
   * keeps the first `maxPerKey` rows per key ordered by `orderCol` —
   * one hash shuffle on the key, the standard guard against a few
   * huge domains dominating a corpus.
   */
  def capPerKey(df: DataFrame, keyCol: String, maxPerKey: Int,
                orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxPerKey)
      .drop("_rn")
  }

  /**
   * Weighted corpus mixing: deterministically sample each source at
   * its rate (rates > 1 replicate whole copies plus a sampled
   * remainder — epoch up-weighting) and union. The building block of
   * training-mixture recipes.
   */
  def weightedMix(sources: Seq[(DataFrame, Double)], idCol: String,
                  seed: Long = 42L): DataFrame = {
    require(sources.nonEmpty, "weightedMix needs at least one source")
    val parts = sources.zipWithIndex.map { case ((df, rate), i) =>
      require(rate >= 0, s"negative rate for source $i")
      val whole = rate.toInt
      val frac = rate - whole
      val copies = Seq.fill(whole)(df) ++
        (if (frac > 0)
          Seq(df.where(bucket(col(idCol), seed + i) < (frac * Buckets).toLong))
        else Seq.empty)
      copies.reduceOption(_ unionByName _)
    }
    parts.flatten.reduce(_ unionByName _)
  }
}
