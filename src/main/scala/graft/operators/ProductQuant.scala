package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) — the standard way to fit billion-scale
 * embedding indexes in memory: split each vector into `m` contiguous
 * subvectors, k-means each subspace into `ksub ≤ 256` centroids, and
 * store ONE BYTE per subspace. A dim-1024 float32 embedding (4 KB)
 * becomes m=16 bytes — 256× smaller; at 100 TB of raw embeddings the
 * PQ codes are ~0.4 TB, which is the difference between an index that
 * lives in the cluster's page cache and one that re-reads parquet per
 * probe. (The int8 path in [[EmbeddingQuant]] is 4×; PQ is the next
 * rung, trading more recall for another ~64×.)
 *
 * Scoring is ADC (asymmetric distance computation): the QUERY stays
 * exact float; the driver precomputes, per query, the dot product of
 * each query subvector with every centroid of that subspace — an
 * m × ksub lookup table. A row's score is then m array lookups + adds
 * instead of `dim` multiplies:
 *
 *   cos(q, recon(codes)) = Σⱼ dotT[j][codeⱼ] /
 *                          (√(Σⱼ nrmT[j][codeⱼ]) · |q|)
 *
 * exactly, because the reconstruction is the concatenation of the
 * chosen centroids, so dot products and squared norms add across
 * subspaces. Both sums are pure `zip_with`/`aggregate` HOF
 * compositions over literal tables — codegen'd, no UDF, no shuffle of
 * the code table; the probe plan is the same scan + TakeOrdered as
 * every other ANN path here.
 *
 * Codebook training runs on a deterministic hash-ordered sample
 * collected to the driver (like faiss, which trains PQ on ~100k
 * sampled vectors regardless of index size): a k-means fit needs
 * thousands of points per centroid, not the corpus, and the sampled
 * local fit costs ONE Spark job instead of m × iters distributed
 * passes.
 */
object ProductQuant {

  /** m per-subspace codebooks: `codebooks(j)(c)` is the dsub-dim
    * centroid `c` of subspace `j`. */
  type Codebooks = Array[Array[Array[Double]]]

  /** Train PQ codebooks on a deterministic sample (hash-ordered, so
    * the same corpus always yields the same codebooks regardless of
    * partition layout). `dim` must divide evenly into `m` subspaces. */
  def fitCodebooks(embeddings: DataFrame, vecCol: String, m: Int, ksub: Int,
                   iters: Int = 10, seed: Long = 42L,
                   trainSample: Int = 16384): Codebooks = {
    require(ksub >= 2 && ksub <= 256, s"ksub must be in [2, 256]: $ksub")
    val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    // TakeOrdered of trainSample rows — bounded driver memory by
    // construction (sample × dim doubles), one job
    val sample = embeddings
      .select(col(vecCol).as("_v"),
        xxhash64(col(vecCol).cast("string"), lit(seed)).as("_o"))
      .orderBy(col("_o")).limit(trainSample)
      .select(col("_v")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "cannot fit PQ codebooks on an empty table")
    Array.tabulate(m) { j =>
      localKmeans(sample.map(_.slice(j * dsub, (j + 1) * dsub)), ksub, iters)
    }
  }

  /** Plain Lloyd's over driver-local points; seeds are the first k
    * DISTINCT points in sample order (deterministic), and a centroid
    * that loses all points keeps its previous position. */
  private[operators] def localKmeans(points: Array[Array[Double]], k: Int,
                                     iters: Int): Array[Array[Double]] = {
    val seeds = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.Set.empty[Seq[Double]]
    points.iterator.takeWhile(_ => seeds.length < k).foreach { p =>
      if (seen.add(p.toSeq)) seeds += p
    }
    // fewer distinct points than k: duplicate the first seed so the
    // codebook keeps its declared shape (unused entries never win argmin
    // ties because nearest-centroid takes the LOWEST index on ties)
    while (seeds.length < k) seeds += seeds.head.clone()
    var centroids = seeds.toArray
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](points.head.length))
      val counts = new Array[Long](k)
      points.foreach { p =>
        val c = nearestIdx(p, centroids)
        counts(c) += 1
        var i = 0
        while (i < p.length) { sums(c)(i) += p(i); i += 1 }
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  private def nearestIdx(p: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < centroids.length) {
      var d = 0.0; var i = 0
      while (i < p.length) { val t = p(i) - centroids(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** PQ codes as ONE `array<tinyint>` column (byte j = nearest
    * centroid of subspace j, stored as idx − 128 to fit tinyint).
    * r17: the native `pq_encode` expression — codebook as one binary
    * literal, the m·ksub·dsub distance loop in primitive Java inside
    * whole-stage codegen. The HOF formulation it replaces
    * ([[codesOfColumns]], kept as the spec parity twin) allocated
    * ~2·ksub arrays/structs per subspace PER ROW on the index-build
    * path — the one that scans the whole corpus at 100 TB. Callers
    * must `GraftFunctions.ensure` the session. */
  def codesOf(vec: Column, codebooks: Codebooks): Column =
    graft.expr.GraftFunctions.pqEncode(vec,
      graft.expr.PqEncode.serialize(codebooks))

  /** The retired HOF formulation of [[codesOf]] — kept ONLY as the
    * parity oracle for the native expression (ProductQuantSpec asserts
    * byte-identical codes on real embeddings). Do not use in plans:
    * per-row allocation storm (see [[codesOf]]). */
  private[graft] def codesOfColumns(vec: Column, codebooks: Codebooks): Column = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val ksub = codebooks(0).length
    val cbLit = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    zip_with(cbLit, sequence(lit(0), lit(m - 1)), (cbj, j) => {
      val sub = slice(vec, j * dsub + 1, lit(dsub))
      val scored = zip_with(
        transform(cbj, c => aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
          lit(0.0d), (acc, v) => acc + v)),
        sequence(lit(0), lit(ksub - 1)),
        (d, i) => struct(d.as("d"), i.as("i")))
      (array_min(scored).getField("i") - 128).cast("tinyint")
    })
  }

  /** Encode a table: `idCol` + `codes` (m bytes/row). Write THIS as
    * the stored index. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebooks: Codebooks): DataFrame = {
    graft.expr.GraftFunctions.ensure(df.sparkSession)
    df.select(col(idCol), codesOf(col(vecCol), codebooks).as("codes"))
  }

  /** Per-query ADC dot table: dotT(j)(c) = ⟨query_j, codebook(j)(c)⟩. */
  private[graft] def dotTable(query: Array[Double], codebooks: Codebooks): Seq[Seq[Double]] = {
    val dsub = codebooks(0)(0).length
    codebooks.toIndexedSeq.zipWithIndex.map { case (cbj, j) =>
      val sub = query.slice(j * dsub, (j + 1) * dsub)
      cbj.toIndexedSeq.map(c => c.zip(sub).map { case (a, b) => a * b }.sum)
    }
  }

  /** Query-independent squared-norm table: nrmT(j)(c) = |codebook(j)(c)|². */
  private[graft] def normTable(codebooks: Codebooks): Seq[Seq[Double]] =
    codebooks.toIndexedSeq.map(_.toIndexedSeq.map(_.map(x => x * x).sum))

  /** ADC cosine of a codes column against per-query lookup tables
    * (both m × ksub literals or columns). ONE implementation for both
    * the single-query (literal qNorm) and batched (qNorm column on
    * the probe row) paths — a fix to the lookup or the zero guards
    * must never apply to one and not the other. r17: the native
    * `pq_adc_cosine` kernel (2m primitive reads per row; the HOF
    * `aggregate(zip_with(element_at))` twin allocated a zipped array
    * per table per row on the scan-every-row-per-query path). Callers
    * reach this through probe entry points that already ensure the
    * session. */
  private def adcCosine(codes: Column, dotT: Column, nrmT: Column,
                        qNorm: Column): Column =
    graft.expr.GraftFunctions.pqAdcCosine(codes, dotT, nrmT, qNorm)

  /** The retired HOF formulation of [[adcCosine]] — kept ONLY as the
    * parity oracle (spec asserts equal scores on real codes through
    * both probe shapes). element_at is 1-based and codes store
    * idx − 128 → index c + 129. */
  private[graft] def adcCosineColumns(codes: Column, dotT: Column, nrmT: Column,
                                      qNorm: Column): Column = {
    def lookupSum(table: Column) = aggregate(
      zip_with(codes, table, (c, row) => element_at(row, c.cast("int") + 129)),
      lit(0.0d), (acc, v) => acc + v)
    val d = lookupSum(dotT)
    val n2 = lookupSum(nrmT)
    when(n2 <= 0.0d || qNorm === 0.0d, lit(0.0d))
      .otherwise(d / (sqrt(n2) * qNorm))
  }

  private def qNormOf(query: Array[Double]): Double =
    math.sqrt(query.map(x => x * x).sum)

  /** Single-query top-k over an encoded table: one scan of the m-byte
    * codes + TakeOrdered — no shuffle, no join, dim never read. */
  def topK(encoded: DataFrame, idCol: String, query: Array[Double], k: Int,
           codebooks: Codebooks): DataFrame = {
    graft.expr.GraftFunctions.ensure(encoded.sparkSession)
    encoded.select(col(idCol),
        round(adcCosine(col("codes"),
          typedlit(dotTable(query, codebooks)), typedlit(normTable(codebooks)),
          lit(qNormOf(query))), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Batched top-k: each query's dot table rides the broadcast probe
    * row (m × ksub doubles — 16 KB at m=16/ksub=256, so thousands of
    * queries broadcast fine); the shared norm table is one literal.
    * The single shuffle is the bounded `top_k_rows` heap — ≤ k rows
    * per query per partition, same shape as
    * [[AnnSearch.bruteForceMulti]] but each scored pair costs m
    * lookups instead of dim multiplies. */
  def topKMulti(encoded: DataFrame, idCol: String,
                queries: Seq[(Long, Array[Double])], k: Int,
                codebooks: Codebooks): DataFrame = {
    val spark = encoded.sparkSession
    graft.expr.GraftFunctions.ensure(spark)
    import spark.implicits._
    val probes = queries.map { case (qid, q) =>
      (qid, dotTable(q, codebooks), qNormOf(q))
    }.toDF("query_id", "_dt", "_qn")
    val cosine = adcCosine(col("codes"), col("_dt"),
      typedlit(normTable(codebooks)), col("_qn"))
    val scored = encoded.crossJoin(broadcast(probes))
      .select(col("query_id"),
        struct(round(cosine, 6).as("cosine"), col(idCol)).as("_scored"))
    AnnSearch.topKPerQuery(scored, idCol, k)
  }

  /**
   * Exact re-rank — faiss's "refine" stage (IndexRefineFlat): ADC
   * retrieves k × refineFactor candidates from the m-byte codes, then
   * ONLY those ids are re-scored against the full-precision vectors
   * and the exact top-k wins. One bounded broadcast semi-join
   * (k × refineFactor ids) recovers most of PQ's recall loss: the
   * candidate set rarely misses a true neighbor entirely, it just
   * mis-orders it — exact scoring fixes the order. The embeddings scan
   * is column-pruned to (id, vector) and only candidate rows survive
   * to scoring; at 100 TB keep the vector table id-sorted so parquet
   * min/max row-group stats let the semi-join's pushed id filter skip
   * most of the file bytes too.
   */
  def topKRefined(encoded: DataFrame, idCol: String,
                  embeddings: DataFrame, vecCol: String,
                  query: Array[Double], k: Int, codebooks: Codebooks,
                  refineFactor: Int = 4): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1: $refineFactor")
    val cand = topK(encoded, idCol, query, k * refineFactor, codebooks).select(idCol)
    // the exact pass IS brute force over the candidate subset — one
    // implementation, so score rounding/tie-break can never drift
    // between the refine stage and the exact baseline it is pinned to
    AnnSearch.bruteForce(
      embeddings.join(broadcast(cand), Seq(idCol), "left_semi"),
      vecCol, idCol, query, k)
  }

  /**
   * IVF-PQ: the faiss production composition — a k-means coarse
   * quantizer partitions the index by cell (probes prune to
   * nprobe of k partition DIRECTORIES at plan time) and each row
   * stores only its m-byte PQ code. A probe of a 100 TB corpus reads
   * (nprobe/k) of the files at m bytes per row — both pruning factors
   * compound, and cell assignment uses the exact float vectors at
   * WRITE time only.
   */
  def writeIvfPqIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                      path: String, centroids: Array[Array[Double]],
                      codebooks: Codebooks): Unit = {
    graft.expr.GraftFunctions.ensure(embeddings.sparkSession)
    embeddings
      .withColumn("cell", AnnSearch.nearestCentroid(col(vecCol), centroids))
      .select(col(idCol), col("cell"), codesOf(col(vecCol), codebooks).as("codes"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell").parquet(path)
  }

  /** Probe an IVF-PQ index: partition-pruned cells, ADC on codes. */
  def ivfPqTopK(indexed: DataFrame, idCol: String, query: Array[Double], k: Int,
                centroids: Array[Array[Double]], codebooks: Codebooks,
                nprobe: Int = 2): DataFrame = {
    val cells = AnnSearch.probeCells(query, centroids, nprobe)
    topK(indexed.where(col("cell").isin(cells: _*)), idCol, query, k, codebooks)
  }

  /** IVF-PQ + refine — the full faiss production stack
    * (IndexRefineFlat over IndexIVFPQ): cell pruning bounds the scan,
    * ADC ranks cheaply, and the exact re-rank of k × refineFactor
    * candidates against the float vectors recovers the compounded
    * recall loss of both approximations for one bounded join. */
  def ivfPqTopKRefined(indexed: DataFrame, idCol: String,
                       embeddings: DataFrame, vecCol: String,
                       query: Array[Double], k: Int,
                       centroids: Array[Array[Double]], codebooks: Codebooks,
                       nprobe: Int = 2, refineFactor: Int = 4): DataFrame = {
    require(refineFactor >= 1, s"refineFactor must be >= 1: $refineFactor")
    val cand = ivfPqTopK(indexed, idCol, query, k * refineFactor,
      centroids, codebooks, nprobe).select(idCol)
    AnnSearch.bruteForce(
      embeddings.join(broadcast(cand), Seq(idCol), "left_semi"),
      vecCol, idCol, query, k)
  }
}
