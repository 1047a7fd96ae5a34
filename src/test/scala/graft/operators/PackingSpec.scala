package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy next-fit sequence packing. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksDf(tokens: Seq[Long]) =
    tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("chunk_id", "n_tokens")

  test("every chunk lands in exactly one sequence; no sequence overflows") {
    val df = chunksDf(Seq(100L, 200L, 300L, 250L, 90L, 510L, 60L, 70L, 480L, 30L))
    val packed = Packing.pack(df, "chunk_id", "n_tokens", capacity = 512, numPartitions = 2)
    assert(packed.count() == 10) // all chunks present
    assert(packed.select("chunk_id").distinct().count() == 10)
    val bins = packed.groupBy("seq_id").agg(sum("n_tokens").as("tot")).collect()
    assert(bins.forall(_.getLong(1) <= 512), bins.mkString(","))
  }

  test("oversized chunks get a sequence of their own") {
    val df = chunksDf(Seq(100L, 9999L, 100L))
    val packed = Packing.pack(df, "chunk_id", "n_tokens", capacity = 512, numPartitions = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val byBin = packed.groupBy(_._2).map { case (b, xs) => b -> xs.map(_._1).toSet }
    val soloBin = byBin.find(_._2 == Set(1L))
    assert(soloBin.isDefined, s"oversized chunk shared a bin: $byBin")
  }

  test("next-fit 2-competitiveness: bins per partition <= 2 * ceil(sum/capacity)") {
    val rnd = new scala.util.Random(7)
    val tokens = Seq.fill(500)(rnd.nextInt(512).toLong + 1)
    val df = chunksDf(tokens)
    val packed = Packing.pack(df, "chunk_id", "n_tokens", capacity = 512, numPartitions = 4)
      .withColumn("pid", shiftright(col("seq_id"), 40))
    val perPart = packed.groupBy("pid")
      .agg(countDistinct("seq_id").as("bins"), sum("n_tokens").as("tot")).collect()
    perPart.foreach { r =>
      val bins = r.getLong(1); val tot = r.getLong(2)
      val opt = (tot + 511) / 512
      assert(bins <= 2 * opt, s"partition ${r.get(0)}: $bins bins for optimal $opt")
    }
  }

  test("deterministic across runs for a fixed partition count") {
    val df = chunksDf(Seq.tabulate(200)(i => (i % 97 + 1).toLong))
    val a = Packing.pack(df, "chunk_id", "n_tokens", 256, numPartitions = 3).collect().toSet
    val b = Packing.pack(df, "chunk_id", "n_tokens", 256, numPartitions = 3).collect().toSet
    assert(a == b)
  }

  test("sequenceStats reports fill ratios bounded by 1") {
    val df = chunksDf(Seq(100L, 200L, 300L, 250L, 90L))
    val packed = Packing.pack(df, "chunk_id", "n_tokens", 512, numPartitions = 1)
    val stats = Packing.sequenceStats(packed, 512, "n_tokens").collect()
    assert(stats.forall(_.getAs[Double]("fill_ratio") <= 1.0))
    assert(stats.map(_.getAs[Long]("n_chunks")).sum == 5)
  }
}
