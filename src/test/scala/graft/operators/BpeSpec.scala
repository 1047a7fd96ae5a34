package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L45: BPE tokenizer training + native apply — the Sennrich
  * hand-computed merge sequence, encode ground truth, determinism
  * across layouts, and the zero-shuffle serve-plan contract. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich word-frequency fixture
  private val counts = Array("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainFromCounts reproduces the hand-computed Sennrich merge sequence") {
    val merges = Bpe.trainFromCounts(counts, 5)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")),
      s"got $merges")
  }

  test("training exhausts gracefully when no pairs remain") {
    val merges = Bpe.trainFromCounts(Array("ab" -> 1L), 100)
    // a+b, ab+</w> — then the word is one symbol and training stops
    assert(merges == Seq(("a", "b"), ("ab", "</w>")), s"got $merges")
  }

  test("native bpe_encode applies merges in rank order (classic 'lowest' case)") {
    graft.expr.GraftFunctions.ensure(spark)
    val corpus = counts.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }.mkString(" ")
    val model = Bpe.train(Seq(corpus).toDF("text"), "text", numMerges = 5)
    assert(model.merges.head == ("e", "s"))
    val got = Seq("lowest", "low low", "widest", "")
      .toDF("text")
      .select(Bpe.encodeCol(col("text"), model).as("sw"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("low", "est</w>"), s"lowest → ${got(0)}")
    assert(got(1) == List("low", "</w>", "low", "</w>"), s"low low → ${got(1)}")
    // widest: w i d est</w> — only the est</w> merges apply
    assert(got(2) == List("w", "i", "d", "est</w>"), s"widest → ${got(2)}")
    assert(got(3) == Nil, "empty text yields no subwords")
  }

  test("train is deterministic across input partitionings") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(real, "text", numMerges = 40, maxWords = 2048).merges
    val b = Bpe.train(real.repartition(17), "text", numMerges = 40, maxWords = 2048).merges
    assert(a == b, "merge table must not depend on partition layout")
    assert(a.length == 40)
  }

  test("serving is one row-local scan: zero shuffle, codegen, and merges compress") {
    graft.expr.GraftFunctions.ensure(spark)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(real, "text", numMerges = 100, maxWords = 4096)
    val q = real.select(col("doc_id"),
      Bpe.subwordCountCol(col("text"), model).as("n_sub"),
      (size(filter(graft.functions.TextFunctions.tokens(col("text")), t => t =!= ""))
        + length(regexp_replace(lower(trim(col("text"))), "\\s", ""))).as("n_char_level"))
    val rows = q.collect()
    // 100 learned merges must compress below the unmerged char-level
    // segmentation (chars + one </w> per word) in aggregate
    val totalSub = rows.map(_.getInt(1).toLong).sum
    val totalCharLevel = rows.map(_.getInt(2).toLong).sum
    assert(totalSub < totalCharLevel,
      s"BPE must merge something: sub=$totalSub charLevel=$totalCharLevel")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"serving must not shuffle or join:\n$plan")
    assert(plan.contains("bpe_encode"), s"expected the native expression:\n$plan")
  }
}
