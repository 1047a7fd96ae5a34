package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L29: product quantization — codebook determinism, exact ADC
  * identity, recall against brute force, batched parity, IVF-PQ
  * partition pruning. */
class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(23)
  private def randVec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)

  private lazy val vecs: Seq[(Long, Array[Float])] =
    (0L until 300L).map(i => (i, randVec()))
  private lazy val emb = vecs.toDF("vec_id", "embedding").cache()

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else d / (na * nb)
  }

  test("codebooks are deterministic and shaped m x ksub x dsub") {
    val cb1 = ProductQuant.fitCodebooks(emb, "embedding", m = 4, ksub = 8, iters = 3)
    val cb2 = ProductQuant.fitCodebooks(emb.repartition(7), "embedding", m = 4, ksub = 8, iters = 3)
    assert(cb1.length == 4 && cb1.forall(_.length == 8) && cb1.forall(_.forall(_.length == 4)))
    // hash-ordered sample → identical codebooks across partition layouts
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq == cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("codes are m tinyint bytes; ADC score equals driver-side reconstruction cosine") {
    val cb = ProductQuant.fitCodebooks(emb, "embedding", m = 4, ksub = 8, iters = 3)
    val encoded = ProductQuant.encode(emb, "vec_id", "embedding", cb).cache()
    val schema = encoded.schema("codes").dataType
    assert(schema == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = false) ||
      schema.isInstanceOf[org.apache.spark.sql.types.ArrayType],
      s"codes must be array<tinyint>: $schema")
    val q = vecs(11)._2.map(_.toDouble)
    val got = ProductQuant.topK(encoded, "vec_id", q, 300, cb)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver-side: decode each row's codes into its reconstruction and
    // take the true cosine — the ADC identity says they're EQUAL
    val codes = encoded.collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    vecs.take(50).foreach { case (id, _) =>
      val recon = codes(id).toArray.zipWithIndex.flatMap { case (c, j) => cb(j)(c + 128) }
      val want = BigDecimal(cosine(q, recon)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(id) - want) < 1e-9, s"id $id: adc ${got(id)} vs recon $want")
    }
  }

  test("native pq_encode == retired HOF chain, byte for byte; codegen plan") {
    // the r17 native expression must reproduce the HOF formulation's
    // codes exactly (same sequential accumulation, same lowest-index
    // tie rule) on real vectors across both layouts, and the encode
    // scan must stay inside whole-stage codegen
    graft.expr.GraftFunctions.ensure(spark)
    for ((m, ksub) <- Seq((4, 8), (8, 32), (16, 4))) {
      val cb = ProductQuant.fitCodebooks(emb, "embedding", m = m, ksub = ksub, iters = 3)
      val both = emb.select(col("vec_id"),
        ProductQuant.codesOf(col("embedding"), cb).as("native"),
        ProductQuant.codesOfColumns(col("embedding"), cb).as("chain"))
      val bad = both.where(col("native") =!= col("chain")).count()
      assert(bad == 0, s"m=$m ksub=$ksub: $bad rows diverge from the HOF parity twin")
    }
    val cb = ProductQuant.fitCodebooks(emb, "embedding", m = 4, ksub = 8, iters = 3)
    // fresh (uncached) input so the executed plan is this query's own —
    // a cache hit renders as InMemoryRelation whose inner stage shows
    // codegen only as the "*(n)" marker
    val enc = ProductQuant.encode(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", cb)
    enc.collect()
    val plan = enc.queryExecution.executedPlan.toString()
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"encode fell out of codegen:\n$plan")
    // null vector → null codes, dimension mismatch fails loudly
    val withNull = Seq((1L, vecs(0)._2), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val out = ProductQuant.encode(withNull, "vec_id", "embedding", cb).collect()
    assert(out.find(_.getLong(0) == 2L).exists(_.isNullAt(1)))
    val shortVec = Seq((1L, Array.fill(3)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      ProductQuant.encode(shortVec, "vec_id", "embedding", cb).collect())
    assert(String.valueOf(e.getMessage).contains("dims") ||
      String.valueOf(e.getCause).contains("dims"))
  }

  test("native pq_adc_cosine == retired HOF scoring on real codes, both probe shapes") {
    graft.expr.GraftFunctions.ensure(spark)
    val cb = ProductQuant.fitCodebooks(emb, "embedding", m = 8, ksub = 16, iters = 3)
    val encoded = ProductQuant.encode(emb, "vec_id", "embedding", cb)
    val q = vecs(42)._2.map(_.toDouble)
    val (dt, nt) = (ProductQuant.dotTable(q, cb), ProductQuant.normTable(cb))
    val qn = math.sqrt(q.map(x => x * x).sum)
    // literal-table shape (single query): native full-corpus scores
    // must equal the HOF chain's, row for row
    val both = encoded.select(col("vec_id"),
      round(graft.expr.GraftFunctions.pqAdcCosine(col("codes"),
        typedlit(dt), typedlit(nt), lit(qn)), 6).as("native"),
      round(ProductQuant.adcCosineColumns(col("codes"),
        typedlit(dt), typedlit(nt), lit(qn)), 6).as("chain"))
    assert(both.where(col("native") =!= col("chain")).count() == 0)
    // column-table shape (batched): the dot table rides the row
    val probed = encoded.withColumn("_dt", typedlit(dt)).withColumn("_qn", lit(qn))
    val both2 = probed.select(
      round(graft.expr.GraftFunctions.pqAdcCosine(col("codes"),
        col("_dt"), typedlit(nt), col("_qn")), 6).as("native"),
      round(ProductQuant.adcCosineColumns(col("codes"),
        col("_dt"), typedlit(nt), col("_qn")), 6).as("chain"))
    assert(both2.where(col("native") =!= col("chain")).count() == 0)
    // zero guards: zero query norm scores 0, not NaN/divide-by-zero
    val z = encoded.limit(1).select(
      graft.expr.GraftFunctions.pqAdcCosine(col("codes"),
        typedlit(dt), typedlit(nt), lit(0.0d)).as("s")).head().getDouble(0)
    assert(z == 0.0)
  }

  test("recall@10 against exact brute force is high at m=4/ksub=64") {
    val cb = ProductQuant.fitCodebooks(emb, "embedding", m = 4, ksub = 64, iters = 8)
    val encoded = ProductQuant.encode(emb, "vec_id", "embedding", cb)
    val q = vecs(42)._2.map(_.toDouble)
    val exact = AnnSearch.bruteForce(emb, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = ProductQuant.topK(encoded, "vec_id", q, 10, cb)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & approx).size
    assert(recall >= 6, s"recall@10 = $recall/10 (exact=$exact approx=$approx)")
    // the self-match survives quantization
    assert(approx.contains(42L))
  }

  test("single-query probe plan: scan + TakeOrdered, no shuffle, no join") {
    val cb = ProductQuant.fitCodebooks(emb, "embedding", m = 4, ksub = 8, iters = 2)
    val encoded = ProductQuant.encode(emb, "vec_id", "embedding", cb)
    val probe = ProductQuant.topK(encoded, "vec_id", vecs(0)._2.map(_.toDouble), 5, cb)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
    // TakeOrdered plans carry no Exchange at all — assert that
    // directly (an either-substring disjunction would let a
    // range-partitioned sort shuffle slip through)
    assert(!plan.contains("Exchange"),
      s"single-query PQ probe must not shuffle:\n$plan")
  }

  test("refine: exact re-rank of ADC candidates strictly improves recall@10") {
    // coarse codebooks on purpose — raw ADC must leave recall on the
    // table for the refine stage to win back
    val cb = ProductQuant.fitCodebooks(emb, "embedding", m = 4, ksub = 8, iters = 3)
    val encoded = ProductQuant.encode(emb, "vec_id", "embedding", cb).cache()
    val q = vecs(42)._2.map(_.toDouble)
    val exact = AnnSearch.bruteForce(emb, "embedding", "vec_id", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exactIds = exact.map(_._1).toSet
    val adc = ProductQuant.topK(encoded, "vec_id", q, 10, cb)
      .select("vec_id").as[Long].collect().toSet
    val refined = ProductQuant.topKRefined(encoded, "vec_id", emb, "embedding",
      q, 10, cb, refineFactor = 8).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val refinedIds = refined.map(_._1).toSet
    val adcRecall = (exactIds & adc).size
    val refRecall = (exactIds & refinedIds).size
    assert(refRecall > adcRecall,
      s"refine must win back recall: adc=$adcRecall refined=$refRecall (exact=$exactIds)")
    // refined scores are EXACT cosines: every refined hit that is a
    // true top-10 neighbor carries the identical score
    val exactScores = exact.toMap
    refined.filter(r => exactScores.contains(r._1)).foreach { case (id, c) =>
      assert(math.abs(c - exactScores(id)) < 1e-9, s"refined score for $id must be exact")
    }
    // the self-match is recovered with cosine 1
    assert(refined.head._1 == 42L && refined.head._2 > 0.999999)
    // the exact pass is a broadcast semi-join on the bounded candidate
    // set — never a shuffle join of the vector table
    val df = ProductQuant.topKRefined(encoded, "vec_id", emb, "embedding", q, 10, cb)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"refine must broadcast the candidate ids:\n$plan")
  }

  test("batched probe matches per-query single probes; bounded heap shuffle") {
    val cb = ProductQuant.fitCodebooks(emb, "embedding", m = 4, ksub = 16, iters = 3)
    val encoded = ProductQuant.encode(emb, "vec_id", "embedding", cb).cache()
    val queries = Seq(3L, 17L, 42L).map(i => (i, vecs(i.toInt)._2.map(_.toDouble)))
    val multi = ProductQuant.topKMulti(encoded, "vec_id", queries, k = 5, cb)
    val byQuery = multi.collect().groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq }
    queries.foreach { case (qid, q) =>
      val single = ProductQuant.topK(encoded, "vec_id", q, 5, cb)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(byQuery(qid) == single, s"query $qid: multi ${byQuery(qid)} vs single $single")
    }
    val plan = multi.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_rows"),
      s"map-side partial top_k_rows must bound the shuffle:\n$plan")
    assert(!plan.contains("Window"), s"no corpus-sized window allowed:\n$plan")
  }

  test("IVF-PQ: cell-partitioned probe prunes to nprobe dirs and finds the self-match") {
    val centroids = AnnSearch.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
    val cb = ProductQuant.fitCodebooks(emb, "embedding", m = 4, ksub = 64, iters = 8)
    val path = tmpDir("ivfpq_")
    ProductQuant.writeIvfPqIndex(emb, "vec_id", "embedding", path, centroids, cb)
    val cellDirs = new java.io.File(path).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 8)

    val indexed = spark.read.parquet(path)
    val q = vecs(3)._2.map(_.toDouble)
    val probe = ProductQuant.ivfPqTopK(indexed, "vec_id", q, 5, centroids, cb, nprobe = 3)
    val ids = probe.select("vec_id").as[Long].collect().toSeq
    assert(ids.contains(3L), s"self-match must survive IVF-PQ: $ids")
    val parts = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount
    }
    assert(parts.nonEmpty && parts.forall(_ <= 3),
      s"cell filter must partition-prune the IVF-PQ scan: $parts")

    // the refined stack: recall@5 at least matches raw IVF-PQ (exact
    // re-rank can only fix ordering), scores are exact cosines, and
    // the self-match tops the list at cosine 1
    val exact = AnnSearch.bruteForce(emb, "embedding", "vec_id", q, 5)
      .select("vec_id").as[Long].collect().toSet
    val raw = probe.select("vec_id").as[Long].collect().toSet
    val refined = ProductQuant.ivfPqTopKRefined(indexed, "vec_id", emb, "embedding",
      q, 5, centroids, cb, nprobe = 3, refineFactor = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert((exact & refined.map(_._1).toSet).size >= (exact & raw).size,
      s"refine must not lose recall: raw=$raw refined=${refined.map(_._1).toSet}")
    assert(refined.head._1 == 3L && refined.head._2 > 0.999999,
      s"self-match must top the refined list: ${refined.toSeq}")
  }
}
