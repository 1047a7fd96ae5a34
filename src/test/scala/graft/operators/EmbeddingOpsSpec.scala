package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA embedding reduction: dominant-direction recovery, orthonormal
  * components, native-vs-driver projection parity, variance ordering,
  * neighbor preservation on real embeddings, codegen'd serving plan. */
class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  test("recovers the dominant direction of a 2D line (up to sign), centered") {
    // points on y = 2x, mean deliberately off origin
    val pts = (0 until 200).map { i =>
      val t = i / 100.0
      (i.toLong, Seq((10 + t).toFloat, (20 + 2 * t + math.sin(i) * 0.01).toFloat))
    }.toDF("id", "vec")
    val m = EmbeddingOps.fitPca(pts, "vec", "id", k = 1)
    val c = m.components(0)
    val norm = math.sqrt(c(0) * c(0) + c(1) * c(1))
    val (dx, dy) = (c(0) / norm, c(1) / norm)
    // direction (1,2)/sqrt(5) up to sign
    val want = (1 / math.sqrt(5), 2 / math.sqrt(5))
    val aligned = math.abs(dx * want._1 + dy * want._2)
    assert(aligned > 0.999, s"component ($dx,$dy) vs $want: |cos|=$aligned")
    assert(math.abs(m.mean(0) - 11.0) < 0.1 && math.abs(m.mean(1) - 22.0) < 0.1)
  }

  test("components are orthonormal; projected variance is ordered") {
    val m = EmbeddingOps.fitPca(emb, "embedding", "vec_id", k = 3)
    for (i <- 0 until 3; j <- i until 3) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-8, s"unit norm $i: $dot")
      else assert(math.abs(dot) < 1e-8, s"orthogonal $i,$j: $dot")
    }
    val proj = EmbeddingOps.projectTable(emb, "embedding", m)
      .select((0 until 3).map(i => element_at(col("embedding"), i + 1)): _*)
    val vars = proj.agg(variance(col(proj.columns(0))),
      variance(col(proj.columns(1))), variance(col(proj.columns(2)))).head()
    assert(vars.getDouble(0) >= vars.getDouble(1) && vars.getDouble(1) >= vars.getDouble(2),
      s"variance order: $vars")
  }

  test("native projection equals the driver-side affine transform; plan stays codegen'd") {
    val m = EmbeddingOps.fitPca(emb, "embedding", "vec_id", k = 4)
    val q = EmbeddingOps.projectTable(emb, "embedding", m)
    val rows = q.orderBy("vec_id").limit(5).collect()
    val raw = emb.orderBy("vec_id").limit(5).collect()
    rows.zip(raw).foreach { case (p, r) =>
      val x = r.getSeq[Float](1).map(_.toDouble).toArray
      val want = m.components.map(row =>
        row.indices.map(i => (x(i) - m.mean(i)) * row(i)).sum)
      val got = p.getSeq[Float](1)
      want.zip(got).foreach { case (w, g) =>
        assert(math.abs(w - g) < 1e-4, s"vec ${p.getLong(0)}: $g vs $w") }
    }
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && plan.contains("*(1)"),
      s"serving must be one codegen'd scan:\n$plan")
  }

  test("whitening: every projected component has unit variance (anisotropic input)") {
    // strongly anisotropic 3D data: without whitening the first
    // component's variance dwarfs the rest
    val pts = (0 until 2000).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Seq((r.nextGaussian() * 50).toFloat,
        (r.nextGaussian() * 5).toFloat, (r.nextGaussian() * 0.5).toFloat))
    }.toDF("id", "vec")
    val m = EmbeddingOps.fitPca(pts, "vec", "id", k = 3, whiten = true)
    val proj = EmbeddingOps.projectTable(pts, "vec", m)
    val vars = proj.select((0 until 3).map(i =>
        variance(element_at(col("vec"), i + 1))): _*).head()
    (0 until 3).foreach { i =>
      assert(math.abs(vars.getDouble(i) - 1.0) < 0.15,
        s"whitened component $i variance: ${vars.getDouble(i)}") }
  }

  test("planted near-dups stay nearest neighbors in the reduced space") {
    // the synthetic corpus is near-isotropic (no low-rank structure to
    // preserve), so generic top-k overlap is the wrong contract; the
    // semantic that matters downstream is that REAL near-duplicates
    // (cos ≈ 0.978 planted pairs) still find each other after the
    // projection — i.e. SemDeDup/EmbedDedup keep working in PCA space
    val planted = graft.SparkEntry.withPlantedNearDups(emb, "vec_id", "embedding")
    val m = EmbeddingOps.fitPca(planted, "embedding", "vec_id", k = 16)
    val reduced = EmbeddingOps.projectTable(planted, "embedding", m)
      .localCheckpoint(true)
    val pairs = (0 until 5).map(i => (i * 10L, i * 10L + 1000000L))
    pairs.foreach { case (src, copy) =>
      val q = reduced.where(col("vec_id") === copy).select("embedding")
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val top = AnnSearch.bruteForce(reduced, "embedding", "vec_id", q, 2)
        .collect().map(_.getLong(0)).filterNot(_ == copy)
      assert(top.headOption.contains(src),
        s"copy $copy's nearest PCA-16 neighbor must be its source $src, got ${top.toSeq}")
    }
  }
}
