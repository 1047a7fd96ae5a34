package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L6–L8: ANN search — brute force exactness, LSH recall, IVF probing. */
class AnnSearchSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(11)
  private def randVec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)

  private lazy val vecs: Seq[(Long, Array[Float])] =
    (0L until 200L).map(i => (i, randVec()))
  private lazy val emb = vecs.toDF("vec_id", "embedding").cache()

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    d / (na * nb)
  }

  test("L6 brute-force top-k matches driver-side ground truth exactly") {
    val q = vecs(5)._2.map(_.toDouble)
    val got = AnnSearch.bruteForce(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    val want = vecs.map { case (id, v) => (id, cosine(v, vecs(5)._2)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    assert(got == want)
  }

  test("L6 multi-query brute force ranks per query") {
    val queries = Seq((100L, vecs(0)._2), (200L, vecs(1)._2)).toDF("qid", "qvec")
    val res = AnnSearch.bruteForceMulti(emb, "embedding", "vec_id", queries, "qvec", "qid", 3)
    val byQuery = res.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(100L, 200L))
    assert(byQuery.values.forall(_.length == 3))
    // each query's own vector is its top hit at cosine ~1
    assert(byQuery(100L).map(_.getLong(1)).contains(0L))
    assert(byQuery(200L).map(_.getLong(1)).contains(1L))
  }

  test("hard negatives: exact top-k AMONG different-label rows, anchor never returned") {
    // anchor 0 (label "a") sits in a label-pure neighborhood: vectors
    // 1-3 (label "a") are nearly identical to it, so top-k-overall-
    // then-filter would return NOTHING hard; the label-aware heap must
    // still find the true nearest "b" rows
    val base = Array(1f, 0f, 0f, 0f)
    def tilt(eps: Float) = Array(1f, eps, 0f, 0f)
    val rows = Seq(
      (0L, base, "a"),
      (1L, tilt(0.01f), "a"), (2L, tilt(0.02f), "a"), (3L, tilt(0.03f), "a"),
      (10L, tilt(0.3f), "b"), (11L, tilt(0.5f), "b"),
      (12L, Array(0f, 1f, 0f, 0f), "b"), (13L, Array(0f, 0f, 1f, 0f), "c"))
      .toDF("vec_id", "embedding", "label")
    val anchors = rows.where(col("vec_id") === 0)
      .select(col("vec_id").as("aid"), col("embedding").as("avec"), col("label").as("albl"))
    val got = AnnSearch.hardNegatives(rows, "embedding", "vec_id", "label",
        anchors, "avec", "aid", "albl", k = 3)
      .orderBy(col("cosine").desc, col("vec_id"))
      .collect().map(r => r.getLong(1)).toList
    // nearest different-label: 10 (cos~0.96), 11 (~0.89), then 12/13 at 0 —
    // tie broken by id asc → 12
    assert(got == List(10L, 11L, 12L), s"got $got")
    // same-label near-twins and the anchor itself are excluded by construction
    assert(!got.exists(Set(0L, 1L, 2L, 3L).contains), s"no same-label rows: $got")
  }

  test("L7 LSH probe returns the query's own vector and only bucket-mates") {
    val q = vecs(7)._2.map(_.toDouble)
    val res = AnnSearch.lshTopK(emb, "embedding", "vec_id", q, 5, bits = 4, tables = 6)
      .select("vec_id").as[Long].collect().toSeq
    assert(res.nonEmpty)
    assert(res.head == 7L, s"self-match should rank first: $res")
    // probing scans a fraction of the table, not all of it
    val scanned = AnnSearch.lshTopK(emb, "embedding", "vec_id", q, 200, bits = 4, tables = 1).count()
    assert(scanned < 200, s"LSH with 1 table should prune candidates, scanned=$scanned")
  }

  test("L8 k-means centroids converge and IVF probe finds the self-match") {
    val centroids = AnnSearch.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
    assert(centroids.length == 8 && centroids.forall(_.length == dim))
    val q = vecs(3)._2.map(_.toDouble)
    val res = AnnSearch.ivfTopK(emb, "embedding", "vec_id", q, 5, centroids, nprobe = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(res.head == 3L, s"self-match should rank first: $res")
    // nprobe=8 (all cells) degenerates to exact brute force
    val all = AnnSearch.ivfTopK(emb, "embedding", "vec_id", q, 5, centroids, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    val exact = AnnSearch.bruteForce(emb, "embedding", "vec_id", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(all == exact)
  }

  test("L8b persisted IVF index: cell-partitioned probe prunes files, zero assignments") {
    val centroids = AnnSearch.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
    val path = tmpDir("ivf_")
    AnnSearch.writeIvfIndex(emb, "embedding", path, centroids)
    // the layout on disk is one directory per cell
    val cellDirs = new java.io.File(path).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 8, s"cell dirs: ${cellDirs.map(_.getName).toSeq}")

    val indexed = spark.read.parquet(path)
    val q = vecs(3)._2.map(_.toDouble)
    val probe = AnnSearch.ivfTopKIndexed(indexed, "embedding", "vec_id", q, 5, centroids, nprobe = 3)
    // identical results to the inline (assign-per-query) form
    val inline = AnnSearch.ivfTopK(emb, "embedding", "vec_id", q, 5, centroids, nprobe = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(probe.select("vec_id").as[Long].collect().toSeq == inline)
    // and the probe PRUNES: the scan selects <= nprobe of the cell partitions
    val parts = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.selectedPartitions.partitionCount, s.toString.contains("PartitionFilters"))
    }
    assert(parts.nonEmpty && parts.forall { case (n, hasFilter) => n <= 3 && hasFilter },
      s"cell filter must partition-prune the index scan: $parts")
  }

  test("L8b batched probe: per-query parity, <= queries*nprobe pruned dirs, bounded heap shuffle") {
    val centroids = AnnSearch.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
    val path = tmpDir("ivf_multi_")
    AnnSearch.writeIvfIndex(emb, "embedding", path, centroids)
    val indexed = spark.read.parquet(path)
    val queries = Seq(3L, 17L, 42L).map(i => (i, vecs(i.toInt)._2.map(_.toDouble)))

    val multi = AnnSearch.ivfTopKIndexedMulti(indexed, "embedding", "vec_id",
      queries, k = 5, centroids, nprobe = 3)
    val byQuery = multi.collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq }

    // (a) row-for-row parity with the single-query indexed probe
    queries.foreach { case (qid, q) =>
      val single = AnnSearch.ivfTopKIndexed(indexed, "embedding", "vec_id",
          q, 5, centroids, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(byQuery(qid) == single, s"query $qid: multi ${byQuery(qid)} vs single $single")
    }

    // (b) the ONE index scan prunes to at most queries*nprobe cell dirs
    val parts = fileScans(multi).map(_.selectedPartitions.partitionCount)
    assert(parts.nonEmpty && parts.forall(_ <= queries.length * 3),
      s"union-of-cells isin must partition-prune the batched scan: $parts")

    // (c) bounded per-query heap aggregate, not a corpus window
    val plan = multi.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_rows"),
      s"map-side partial top_k_rows must bound the shuffle:\n$plan")
    assert(!plan.contains("Window"), s"no corpus-sized window allowed:\n$plan")
  }

  test("L8 centroids are identical across shuffle-partition settings (reproducible indexes)") {
    // cluster ids name persisted IVF cell directories and SQ8
    // partitions; a layout-dependent centroid ORDER would silently
    // re-label an index on the next cluster with different parallelism
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      spark.conf.set(key, "32")
      val a = AnnSearch.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
      spark.conf.set(key, "5")
      val b = AnnSearch.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
      assert(a.length == b.length)
      a.zip(b).zipWithIndex.foreach { case ((ca, cb), i) =>
        assert(ca.toSeq == cb.toSeq, s"centroid $i differs across partition layouts")
      }
    } finally spark.conf.set(key, orig)
  }

  test("vector math building blocks") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      VectorMath.dot(col("a"), col("b")).as("dot"),
      VectorMath.norm(col("a")).as("na"),
      VectorMath.cosine(col("a"), col("b")).as("cos")).head()
    assert(r.getDouble(0) == 18.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9) // parallel vectors
  }
}
