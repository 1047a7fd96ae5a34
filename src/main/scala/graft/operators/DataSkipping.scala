package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data-skipping layout (Z-order / Morton curve — the
 * lakehouse OPTIMIZE ZORDER idea): interleave the bits of several
 * columns' bucket ranks into one sort key, range-partition + sort the
 * write by it, and parquet's per-row-group min/max footers become a
 * multi-column index — a selective filter on ANY of the layout columns
 * skips most row groups at scan time. A plain linear sort gives this
 * for its leading column only; Z-order trades a little locality on
 * each column for locality on all of them, which is what a 100 TB
 * table queried by several independent predicates needs.
 *
 * Cost shape: one tiny min/max aggregate (per layout column), then
 * exactly ONE range-partitioned exchange + in-partition sort — the
 * same cost floor as any global re-layout (and the same shape as
 * `Sampling.globalShuffle`). The bit-interleave is a static
 * shiftleft/or composition over `width_bucket` ranks — codegen'd
 * built-ins, no UDF, no per-row allocation.
 *
 * Ranks are linear (min/max) buckets; heavily skewed columns get most
 * rows in few buckets and keep only coarse skipping — production
 * pipelines pre-transform such columns (log, hash-prefix) or feed
 * quantile ranks instead; `zorderKey` accepts ANY rank columns in
 * [0, 2^bits).
 */
object DataSkipping {

  /** Morton key: round-robin bit interleave of `ranks` (each already
    * in [0, 2^bits)), highest bits first so the curve orders globally.
    * With n columns × `bits` bits the key uses n·bits ≤ 63 bits. */
  def zorderKey(ranks: Seq[Column], bits: Int): Column = {
    require(ranks.nonEmpty, "zorderKey: at least one rank column")
    require(ranks.size * bits <= 63,
      s"zorderKey: ${ranks.size} cols x $bits bits exceeds a long")
    val n = ranks.size
    // output bit (bits-1-i)*n + (n-1-j) takes bit (bits-1-i) of rank j:
    // i.e. the most significant rank bits interleave into the most
    // significant key bits, first column outermost
    val terms =
      for { i <- 0 until bits; j <- 0 until n } yield {
        val srcBit = bits - 1 - i
        val dstBit = (bits - 1 - i) * n + (n - 1 - j)
        shiftleft(shiftright(ranks(j).cast("long"), srcBit).bitwiseAND(lit(1L)), dstBit)
      }
    terms.reduce[Column]((a, b) => a.bitwiseOR(b))
  }

  /** Linear bucket rank of `c` over [min, max] into [0, 2^bits):
    * nulls and out-of-range clamp to the edge buckets. */
  def linearRank(c: Column, min: Double, max: Double, bits: Int): Column = {
    val buckets = 1 << bits
    // width_bucket is 1-based with 0/buckets+1 as under/overflow
    val wb = width_bucket(c.cast("double"), lit(min), lit(max), lit(buckets))
    least(greatest(coalesce(wb, lit(1L)) - 1L, lit(0L)), lit((buckets - 1).toLong))
  }

  /** Quantile bucket rank: boundaries from `approxQuantile` (one
    * bounded job, ≤ 2^bits-1 doubles on the driver), rank = how many
    * boundaries the value clears — equal-POPULATION buckets, so a
    * heavily skewed column still discriminates (a linear rank puts
    * 90% of a zipf column in bucket 0 and its dimension stops pruning
    * anything inside the dense mass). The per-row cost is a fold over
    * the boundary literal — trivial comparisons, bounded by 2^bits;
    * keep bits modest (≤ 8) for quantile ranks. */
  def quantileRank(df: DataFrame, c: String, bits: Int,
                   relativeError: Double = 0.001): Column = {
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    rankFromBounds(c, df.stat.approxQuantile(c, probs, relativeError), bits)
  }

  /** Rank from precomputed quantile boundaries (see [[quantileRank]];
    * [[zorderWrite]] fits every column's boundaries in ONE pass). */
  private def rankFromBounds(c: String, rawBounds: Array[Double], bits: Int): Column = {
    val buckets = 1 << bits
    val bounds = rawBounds.distinct.sorted
    // an all-null (or empty) column has no boundaries and no
    // information — a constant rank keeps the key total and the
    // arithmetic below divide-by-zero-free
    if (bounds.isEmpty) return lit(0L)
    val arr = array(bounds.map(lit(_)): _*)
    val raw = aggregate(arr, lit(0),
      (acc, b) => acc + when(col(c).cast("double") >= b, 1).otherwise(0))
      .cast("long")
    // rescale to the FULL [0, buckets) range: heavy ties collapse the
    // distinct boundary list, and a column whose ranks occupy only the
    // low values would surrender every high-order interleaved bit to
    // the other dimensions (its selectivity would never reach file
    // granularity)
    raw * (buckets - 1).toLong / bounds.length.toLong
  }

  /**
   * Re-layout `df` Z-ordered on `cols` and write it as `files` parquet
   * files at `path`. One bounded fit job (min/max, or approx-quantiles
   * when `quantileRanks` — the skew-robust mode) + one range exchange.
   * Files are written in Morton-key order, each covering a compact
   * hyper-rectangle-ish region, so every layout column's min/max
   * footer stats are tight.
   */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  files: Int, bits: Int = 12,
                  quantileRanks: Boolean = false): Unit = {
    require(cols.nonEmpty, "zorderWrite: at least one layout column")
    val ranks =
      if (quantileRanks) {
        val qBits = math.min(bits, 8)
        val probs = (1 until (1 << qBits)).map(_.toDouble / (1 << qBits)).toArray
        // ONE pass fits every column's boundaries (the per-column
        // overload would scan the corpus once per layout column)
        val allBounds = df.stat.approxQuantile(cols.toArray, probs, 0.001)
        cols.zip(allBounds).map { case (c, b) => rankFromBounds(c, b, qBits) }
      }
      else {
        val stats = df.agg(
          array(cols.flatMap(c =>
            Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*).as("s"))
          .head().getSeq[Double](0)
        cols.zipWithIndex.map { case (c, i) =>
          linearRank(col(c), stats(2 * i), stats(2 * i + 1), bits)
        }
      }
    val effBits = if (quantileRanks) math.min(bits, 8) else bits
    df.withColumn("_zkey", zorderKey(ranks, effBits))
      .repartitionByRange(files, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Write with parquet Bloom filters on `bloomCols` — the EQUALITY-
   * predicate complement of the Z-order layout: min/max footers can
   * never prune a point lookup on a high-cardinality unsorted column
   * (every row group's range covers everything), but a per-row-group
   * Bloom filter excludes the groups that definitely don't hold the
   * value, so `id = x` reads ~1 row group instead of the table. This
   * is storage-side admission control in the same spirit as L31's
   * query-side Bloom decontamination — the filter bounds IO, the scan
   * still verifies exactly. `ndvPerGroup` sizes the filters (expected
   * distinct values per row group).
   */
  def writeWithBloomFilters(df: DataFrame, bloomCols: Seq[String], path: String,
                            ndvPerGroup: Long = 100000L,
                            rowGroupBytes: Long = 8L * 1024 * 1024): Unit = {
    require(bloomCols.nonEmpty, "writeWithBloomFilters: at least one column")
    val w = df.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
    bloomCols.foldLeft(w) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndvPerGroup.toString)
    }.parquet(path)
  }
}
