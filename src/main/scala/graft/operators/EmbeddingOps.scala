package graft.operators

import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PCA dimensionality reduction for embedding columns — the rung BEFORE
 * the quantizers on the memory/compute ladder: projecting 1024-dim
 * embeddings to 128 PCA dims cuts every downstream ANN scan,
 * k-means fit and pair join by 8× while keeping most cosine geometry
 * (the OPQ/ scaNN preprocessing step). Train/serve split as
 * everywhere: the fit runs on a bounded DETERMINISTIC sample (hash-
 * ordered — the PQ-codebook discipline; PCA saturates long before the
 * corpus ends) through MLlib's distributed Gramian + driver-side
 * eigendecomposition; serving never touches MLlib — the (k×d)
 * component matrix and mean ride the plan as one binary literal
 * probed row-locally by the native `mat_vec_mul` expression
 * (whole-stage codegen, zero shuffle, no feature vectors
 * materialized).
 *
 * Projection is y = W·(x − mean): MLlib's own PCA transformer skips
 * the centering (a known quirk); an uncentered projection leaks the
 * corpus mean into every component and distorts cosine geometry, so
 * the model carries the mean explicitly.
 */
object EmbeddingOps {

  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]]) {
    def k: Int = components.length
    def dim: Int = mean.length
    lazy val bytes: Array[Byte] = graft.expr.MatVecMul.serialize(mean, components)
  }

  /** Fit on a hash-ordered sample of ≤ `sampleSize` vectors (ONE
    * bounded job for the sample + the distributed Gramian; the
    * eigendecomposition is a driver-side d×d solve). `whiten` scales
    * each component to unit sample variance (1/σ_i — measured on the
    * projected sample, one extra bounded job), which is what
    * quantizers downstream want: without it the first component
    * dominates every k-means distance and the codebooks collapse
    * onto it. Near-degenerate components (σ ≈ 0) are left unscaled —
    * amplifying noise by 1/ε is worse than a non-unit variance. */
  def fitPca(emb: DataFrame, vecCol: String, idCol: String, k: Int,
             sampleSize: Int = 10000, whiten: Boolean = false): PcaModel = {
    require(k >= 1, s"fitPca: k must be >= 1, got $k")
    val sample = emb
      .select(col(idCol), col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(sampleSize)
      .select(col(vecCol))
    val rows = sample.rdd
      .map(r => Vectors.dense(r.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray))
      .cache()
    try {
      val mat = new RowMatrix(rows)
      val d = mat.numCols().toInt
      require(k <= d, s"fitPca: k ($k) exceeds embedding dim ($d)")
      val mean = mat.computeColumnSummaryStatistics().mean.toArray
      val pc = mat.computePrincipalComponents(k) // d×k, covariance centered internally
      val components = Array.tabulate(k)(c => Array.tabulate(d)(r => pc(r, c)))
      if (!whiten) PcaModel(mean, components)
      else {
        // per-component stddev measured on the projected SAMPLE —
        // robust to however the eigensolver normalizes, and exactly
        // the variance the downstream data will exhibit
        val raw = PcaModel(mean, components)
        val projected = rows.map { v =>
          val x = v.toArray
          components.map(row =>
            row.indices.map(i => (x(i) - mean(i)) * row(i)).sum)
        }
        val n = projected.count().toDouble
        val sums = projected.aggregate(new Array[Double](2 * k))(
          (acc, p) => { var i = 0; while (i < k) { acc(i) += p(i); acc(k + i) += p(i) * p(i); i += 1 }; acc },
          (a, b) => { var i = 0; while (i < 2 * k) { a(i) += b(i); i += 1 }; a })
        val scaled = components.zipWithIndex.map { case (row, i) =>
          val varI = sums(k + i) / n - math.pow(sums(i) / n, 2)
          val sd = math.sqrt(math.max(varI, 0.0))
          if (sd < 1e-9) row else row.map(_ / sd)
        }
        PcaModel(mean, scaled)
      }
    } finally { rows.unpersist(); () }
  }

  /** Row-local projection column (array<float> of length model.k). */
  def project(vec: Column, model: PcaModel): Column =
    graft.expr.GraftFunctions.matVecMul(vec, model.bytes)

  /** Project a whole table's embedding column in place. */
  def projectTable(emb: DataFrame, vecCol: String, model: PcaModel): DataFrame = {
    graft.expr.GraftFunctions.ensure(emb.sparkSession)
    emb.withColumn(vecCol, project(col(vecCol), model))
  }
}
