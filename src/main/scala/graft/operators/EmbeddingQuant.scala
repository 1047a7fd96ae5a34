package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Int8 embedding quantization: store each vector as one float scale +
 * an array<tinyint> of codes — 4× smaller than float32, which at
 * 100 TB of embeddings is the difference between a table that fits
 * the page cache and one that doesn't. Symmetric max-abs scheme
 * (code = round(x / maxAbs * 127)), the same shape faiss/SQ8 and
 * every int8 inference stack use.
 *
 * Cosine similarity is scale-invariant, so ANN over the quantized
 * table computes cosine DIRECTLY on the int8 codes (cast to double
 * lane-wise inside the codegen'd loop) — no dequantization pass, no
 * extra memory; the only cost is the quantization error (|Δcos|
 * ≤ ~1/127 per the spec's measured bound).
 *
 * All pure column compositions (transform/aggregate HOFs + the native
 * cosine expression) — no UDFs, one scan to quantize, one scan to
 * probe.
 */
object EmbeddingQuant {

  /** Per-vector scale: maxAbs / 127 (0-vectors quantize to scale 0,
    * codes all-0, and dequantize back to exact zeros). */
  def scaleOf(vec: Column): Column =
    array_max(transform(vec, x => abs(x))).cast("double") / 127.0d

  /** array<tinyint> codes given an ALREADY-MATERIALIZED scale column.
    * The scale must be a bound column, not a recomputed expression —
    * an inline `scaleOf(vec)` here would re-run the O(d) array_max for
    * every element, turning quantization O(d²). */
  def codesOf(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0d, lit(0))
        .otherwise(round(x.cast("double") / scale)).cast("tinyint"))

  /** Quantize an embedding table: keeps `idCol`, adds `scale` +
    * `codes`. Write THIS as the stored index table. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), scaleOf(col(vecCol)).as("scale"), col(vecCol).as("_v"))
      .select(col(idCol), col("scale"), codesOf(col("_v"), col("scale")).as("codes"))

  /** Reconstruct approximate float vectors (for rescoring pipelines). */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => (c.cast("double") * scale).cast("float"))

  /**
   * IVF-SQ8: the cell-partitioned IVF index stored with int8 codes —
   * the faiss IVF+scalar-quantizer composition. A probe prunes to
   * `nprobe` of k partition directories AND reads a quarter of the
   * bytes per row; at 100 TB of embeddings the probe cost is
   * (nprobe/k) × (1/4) of a brute-force float scan, with zero
   * per-query cell assignments.
   */
  def writeIvfIndexQuantized(embeddings: DataFrame, idCol: String, vecCol: String,
                             path: String, centroids: Array[Array[Double]]): Unit = {
    graft.expr.GraftFunctions.ensure(embeddings.sparkSession)
    // cells are assigned on the ORIGINAL float vectors (exact — cell
    // choice must not inherit quantization error), codes stored int8
    embeddings
      .withColumn("cell", AnnSearch.nearestCentroid(col(vecCol), centroids))
      .select(col(idCol), col("cell"), scaleOf(col(vecCol)).as("scale"), col(vecCol).as("_v"))
      .select(col(idCol), col("cell"), col("scale"),
        codesOf(col("_v"), col("scale")).as("codes"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell").parquet(path)
  }

  /** Probe an IVF-SQ8 index: partition-pruned cells, cosine on codes. */
  def ivfTopKQuantized(indexed: DataFrame, idCol: String,
                       query: Array[Double], k: Int,
                       centroids: Array[Array[Double]], nprobe: Int = 2): DataFrame = {
    graft.expr.GraftFunctions.ensure(indexed.sparkSession)
    val cells = AnnSearch.probeCells(query, centroids, nprobe)
    topK(indexed.where(col("cell").isin(cells: _*)), idCol, query, k)
  }

  /** Driver-side query quantization, bit-matching `codesOf`.
    * Same operation ORDER as codesOf (x / (maxAbs/127), then round):
    * a*127/b and a/(b/127) differ in the last ulp, which matters when
    * a twin implementation (the correctness oracle) must bit-match.
    * HALF_UP (away from zero), matching SQL round() — math.round
    * would round -2.5 to -2 and silently skew negative codes by one. */
  private[graft] def quantizeQuery(query: Array[Double]): Array[Double] = {
    val qscale = math.max(query.map(math.abs).max, Double.MinPositiveValue) / 127.0d
    query.map(x =>
      BigDecimal(x / qscale).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /**
   * Batched probe of an IVF-SQ8 index: same plan shape as
   * [[AnnSearch.ivfTopKIndexedMulti]] (static union-of-cells pruning,
   * broadcast probe join, bounded `top_k_rows` shuffle), with cosine
   * computed on the int8 codes against per-query quantized codes.
   */
  def ivfTopKQuantizedMulti(indexed: DataFrame, idCol: String,
                            queries: Seq[(Long, Array[Double])], k: Int,
                            centroids: Array[Array[Double]], nprobe: Int = 2): DataFrame = {
    val spark = indexed.sparkSession
    graft.expr.GraftFunctions.ensure(spark)
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, q) =>
      val qc = quantizeQuery(q).toSeq
      AnnSearch.probeCells(q, centroids, nprobe).map(c => (qid, c, qc))
    }
    val allCells = probeRows.map(_._2).distinct
    val probes = probeRows.toDF("query_id", "cell", "_qc")
    val scored = indexed.where(col("cell").isin(allCells: _*))
      .join(broadcast(probes), "cell")
      .select(col("query_id"),
        struct(round(VectorMath.cosineFast(
          transform(col("codes"), c => c.cast("double")), col("_qc")), 6).as("cosine"),
          col(idCol)).as("_scored"))
    AnnSearch.topKPerQuery(scored, idCol, k)
  }

  /** Exact top-k by cosine over the QUANTIZED table for one query
    * vector (the query is quantized with the same scheme, so both
    * sides pay the same rounding): one scan + TakeOrdered, no shuffle
    * of the table — the same plan as AnnSearch.bruteForce, on a table
    * a quarter the size. */
  def topK(quantized: DataFrame, idCol: String,
           query: Array[Double], k: Int): DataFrame = {
    graft.expr.GraftFunctions.ensure(quantized.sparkSession)
    val qCodes = quantizeQuery(query)
    quantized.select(col(idCol),
        round(VectorMath.cosineFast(
          transform(col("codes"), c => c.cast("double")),
          VectorMath.vecLit(qCodes)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
