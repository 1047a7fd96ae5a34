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
    * eigendecomposition is a driver-side d×d solve). */
  def fitPca(emb: DataFrame, vecCol: String, idCol: String, k: Int,
             sampleSize: Int = 10000): PcaModel = {
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
      PcaModel(mean, components)
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
