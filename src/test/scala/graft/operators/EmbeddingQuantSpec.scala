package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 embedding quantization + quantized-cosine ANN. */
class EmbeddingQuantSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("roundtrip error is bounded by the scale (scheme correctness)") {
    val q = EmbeddingQuant.quantize(embeddings, "vec_id", "embedding")
    val joined = embeddings.join(q, "vec_id")
      .select(col("vec_id"), col("scale"),
        zip_with(col("embedding"),
          EmbeddingQuant.dequantize(col("codes"), col("scale")),
          (a, b) => abs(a - b)).as("errs"))
      .select(col("vec_id"), (array_max(col("errs")) <= col("scale") * 0.5001).as("ok"))
    assert(joined.where(!col("ok")).count() == 0)
  }

  test("codes stay in int8 range; zero vectors quantize to zero codes") {
    val d = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f))).toDF("vec_id", "embedding")
    val q = EmbeddingQuant.quantize(d, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](2)).toMap
    assert(q(1L).forall(_ == 0))
    assert(q(2L).max == 127 || q(2L).min == -127) // maxAbs element saturates
  }

  test("quantized top-k recalls >= 9/10 of the exact top-10 and cosines agree to ~1/127") {
    val query = embeddings.where(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val exact = AnnSearch.bruteForce(embeddings, "embedding", "vec_id", query, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q = EmbeddingQuant.quantize(embeddings, "vec_id", "embedding")
    val approx = EmbeddingQuant.topK(q, "vec_id", query, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val recall = exact.keySet.intersect(approx.keySet).size
    assert(recall >= 9, s"recall@10 = $recall/10")
    // cosine drift on the overlap stays within quantization noise
    exact.keySet.intersect(approx.keySet).foreach { id =>
      assert(math.abs(exact(id) - approx(id)) < 0.02,
        s"id $id: exact ${exact(id)} vs quant ${approx(id)}")
    }
  }

  test("IVF-SQ8: probes prune to nprobe cell partitions, recall holds vs float IVF") {
    val dir = tmpDir("ivfsq8_")
    val cents = AnnSearch.kmeansCentroids(embeddings, "embedding", k = 8, iters = 3)
    EmbeddingQuant.writeIvfIndexQuantized(embeddings, "vec_id", "embedding", s"$dir/ix", cents)
    val indexed = spark.read.parquet(s"$dir/ix")
    val query = embeddings.where(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray

    val probed = EmbeddingQuant.ivfTopKQuantized(indexed, "vec_id", query, 10, cents, nprobe = 3)
    // partition pruning: the scan touches at most nprobe of 8 cell dirs
    val parts = probed.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount
    }
    assert(parts.nonEmpty && parts.forall(_ <= 3), s"pruned partitions: $parts")

    // recall vs the float IVF probe with the same centroids/nprobe
    val floatIvf = AnnSearch.ivfTopK(embeddings, "embedding", "vec_id", query, 10, cents, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val quantIds = probed.collect().map(_.getLong(0)).toSet
    assert(floatIvf.intersect(quantIds).size >= 8,
      s"IVF-SQ8 diverged from float IVF: $quantIds vs $floatIvf")
  }

  test("IVF-SQ8 batched probe: parity with per-query probes, pruning and bounded shuffle hold") {
    val dir = tmpDir("ivfsq8m_")
    val cents = AnnSearch.kmeansCentroids(embeddings, "embedding", k = 8, iters = 3)
    EmbeddingQuant.writeIvfIndexQuantized(embeddings, "vec_id", "embedding", s"$dir/ix", cents)
    val indexed = spark.read.parquet(s"$dir/ix")
    val queries = Seq(7L, 21L, 33L).map { i =>
      (i, embeddings.where(col("vec_id") === i)
        .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray)
    }

    val multi = EmbeddingQuant.ivfTopKQuantizedMulti(indexed, "vec_id",
      queries, k = 10, cents, nprobe = 3)
    val byQuery = multi.collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(r => (r.getLong(1), r.getDouble(2))).toSeq }

    // per-query parity with the single-query quantized probe
    queries.foreach { case (qid, q) =>
      val single = EmbeddingQuant.ivfTopKQuantized(indexed, "vec_id", q, 10, cents, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(byQuery(qid) == single, s"query $qid: multi ${byQuery(qid)} vs single $single")
    }

    // one pruned scan (≤ queries×nprobe cell dirs) + bounded heap aggregate
    val parts = fileScans(multi).map(_.selectedPartitions.partitionCount)
    assert(parts.nonEmpty && parts.forall(_ <= queries.length * 3), s"pruned partitions: $parts")
    val plan = multi.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_rows"), s"bounded shuffle missing:\n$plan")
    assert(!plan.contains("Window"), s"no corpus window allowed:\n$plan")
  }

  test("plan shape: quantized top-k is scan + TakeOrdered, no table shuffle") {
    val q = EmbeddingQuant.quantize(embeddings, "vec_id", "embedding")
    val plan = EmbeddingQuant.topK(q, "vec_id", Array.fill(64)(0.1), 10)
      .queryExecution.executedPlan.toString
    val body = plan.split("== Initial Plan ==").head
    assert(body.contains("TakeOrderedAndProject"), body)
    assert(!body.contains("Exchange"), s"unexpected shuffle:\n$body")
  }
}
