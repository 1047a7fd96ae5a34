package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L36: incremental near-dup detection against a persisted signature
  * index — exact copies match at est_jaccard 1, near copies above the
  * threshold, new docs survive, and the index scan prefilters
  * row-locally before any explode. */
class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val corpusText =
    "the quick brown fox jumps over the lazy dog while the cat sleeps by the fire"
  private val otherText =
    "spark executes distributed query plans with whole stage codegen and adaptive execution"

  private lazy val indexDocs = Seq(
    (100L, corpusText),
    (200L, otherText)).toDF("doc_id", "text")

  test("exact and near copies match; genuinely new docs survive") {
    val index = MinHashIndex.buildIndex(indexDocs, "text", "doc_id")
    val batch = Seq(
      (1L, corpusText),                                    // exact copy of 100
      (2L, corpusText.replace("lazy", "sleepy")),          // near copy of 100
      (3L, "a totally unrelated document about gardening tomatoes in july sunshine"))
      .toDF("doc_id", "text")
    val m = MinHashIndex.matches(batch, "text", "doc_id", index, "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byBatch = m.groupBy(_._1)
    assert(byBatch(1L).exists(t => t._2 == 100L && t._3 == 1.0),
      s"exact copy must estimate jaccard 1: ${m.mkString(",")}")
    assert(byBatch(2L).exists(t => t._2 == 100L && t._3 > 0.5 && t._3 < 1.0),
      s"near copy must land between threshold and 1: ${m.mkString(",")}")
    assert(!byBatch.contains(3L), "new doc must not match")
    val kept = MinHashIndex.newDocsOnly(batch, "text", "doc_id", index, "doc_id",
      threshold = 0.5).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L), s"only the new doc appends: $kept")
    // a stricter threshold lets the near copy through but never the exact one
    val strict = MinHashIndex.newDocsOnly(batch, "text", "doc_id", index, "doc_id",
      threshold = 0.999).select("doc_id").as[Long].collect().toSet
    assert(strict == Set(2L, 3L), s"strict threshold keeps the near copy: $strict")
  }

  test("index roundtrips through parquet; signature params must line up") {
    val path = tmpDir("mh_index_")
    MinHashIndex.writeIndex(indexDocs, "text", "doc_id", path)
    val index = spark.read.parquet(path)
    val batch = Seq((1L, corpusText)).toDF("doc_id", "text")
    val m = MinHashIndex.matches(batch, "text", "doc_id", index, "doc_id")
      .collect()
    assert(m.length == 1 && m.head.getLong(1) == 100L && m.head.getDouble(2) == 1.0)
    assertThrows[IllegalArgumentException](
      MinHashIndex.matches(batch, "text", "doc_id", index, "doc_id", bands = 7))
  }

  test("index scan prefilters with arrays_overlap BEFORE exploding; empty batch is a no-op") {
    // parquet-backed index: ConvertToLocalRelation would fold the
    // prefilter over a local Seq relation and leave no plan node to pin
    val path = tmpDir("mh_index_plan_")
    MinHashIndex.writeIndex(indexDocs, "text", "doc_id", path)
    val index = spark.read.parquet(path)
    val batch = Seq((1L, corpusText)).toDF("doc_id", "text")
    val q = MinHashIndex.matches(batch, "text", "doc_id", index, "doc_id")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the IN list must have compiled to a shared hash set (InSet), not
    // a per-row literal walk
    assert(plan.contains("INSET") || plan.contains("exists"),
      s"row-local bucket prefilter must guard the index scan:\n$plan")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(MinHashIndex.matches(empty, "text", "doc_id", index, "doc_id").count() == 0)
    assert(MinHashIndex.newDocsOnly(empty, "text", "doc_id", index, "doc_id").count() == 0)
  }
}
