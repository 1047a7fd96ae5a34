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

  test("empty batch keeps the INDEX's index_id type, not the batch's") {
    // string index ids vs long batch ids: the empty result's schema
    // must match what a non-empty probe would produce
    val strIndex = MinHashIndex.buildIndex(
      Seq(("a100", corpusText)).toDF("doc_id", "text"), "text", "doc_id")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = MinHashIndex.matches(empty, "text", "doc_id", strIndex, "doc_id")
    assert(out.schema("index_id").dataType == org.apache.spark.sql.types.StringType,
      s"index_id must be typed from the index side: ${out.schema}")
    assert(out.schema("batch_id").dataType == org.apache.spark.sql.types.LongType)
    assert(out.count() == 0)
  }

  test("probe-time parameter validation: mismatched k or shingleSize fails loudly") {
    val path = tmpDir("mh_index_params_")
    MinHashIndex.writeIndex(indexDocs, "text", "doc_id", path, shingleSize = 3, k = 64)
    val index = spark.read.parquet(path)
    val batch = Seq((1L, corpusText)).toDF("doc_id", "text")
    // metadata survives the parquet roundtrip and catches both params
    val eK = intercept[IllegalArgumentException](
      MinHashIndex.matches(batch, "text", "doc_id", index, "doc_id", k = 128, bands = 16))
    assert(eK.getMessage.contains("k=128") && eK.getMessage.contains("64"), eK.getMessage)
    val eS = intercept[IllegalArgumentException](
      MinHashIndex.matches(batch, "text", "doc_id", index, "doc_id", shingleSize = 5))
    assert(eS.getMessage.contains("shingleSize=5"), eS.getMessage)
    // a foreign index WITHOUT the metadata stamp still catches a k
    // mismatch via the one-row size probe
    val foreign = index.select(col("doc_id"), col("sig").as("sig")) // alias drops metadata
    val eF = intercept[IllegalArgumentException](
      MinHashIndex.matches(batch, "text", "doc_id", foreign, "doc_id", k = 128, bands = 16))
    assert(eF.getMessage.contains("128"), eF.getMessage)
  }

  test("appendNewDocs: the daily loop — fresh docs append, known docs never re-enter") {
    import org.apache.spark.sql.functions.col
    val p = tmpDir("idx_append_")
    val day0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "an entirely different document describing distributed query engines"))
      .toDF("doc_id", "text")
    MinHashIndex.writeIndex(day0, "text", "doc_id", p)
    // day 1: one exact copy of doc 1, one genuinely new doc
    val day1 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      (11L, "a completely novel text about gardening tomatoes in july sunshine"))
      .toDF("doc_id", "text")
    val fresh = MinHashIndex.appendNewDocs(day1, "text", "doc_id", p)
    assert(fresh.select("doc_id").as[Long].collect().toSet == Set(11L),
      "only the unseen doc is fresh")
    // the index now holds day0 + the new doc, and ONLY those
    val ids = spark.read.parquet(p).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 11L), s"index after append: $ids")
    // day 2: a copy of the doc appended on day 1 is now known
    val day2 = Seq((20L, "a completely novel text about gardening tomatoes in july sunshine"))
      .toDF("doc_id", "text")
    val fresh2 = MinHashIndex.appendNewDocs(day2, "text", "doc_id", p)
    assert(fresh2.count() == 0, "day-1 appends must be visible to day-2 probes")
    assert(spark.read.parquet(p).count() == 3)
    // parameter stamps survive the append (a mismatched probe still fails)
    intercept[IllegalArgumentException] {
      MinHashIndex.matches(day2, "text", "doc_id", spark.read.parquet(p), "doc_id", k = 32)
    }
  }

  test("sub-shingle-length docs never match each other: short docs always pass as new (r16)") {
    import spark.implicits._
    // before r16 every doc with < shingleSize tokens shared the
    // sentinel signature: est_jaccard 1.0 between ANY two short docs,
    // silently dropping every short doc after the first indexed
    val indexed = Seq((1L, "hello world"), (2L, "a much longer document with plenty of tokens here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mhidx_short").toString
    MinHashIndex.writeIndex(indexed, "text", "doc_id", dir)
    val batch = Seq((10L, "bye now"), (11L, "ok"), (12L, "")).toDF("doc_id", "text")
    val index = spark.read.parquet(dir)
    val m = MinHashIndex.matches(batch, "text", "doc_id", index, "doc_id")
    assert(m.count() == 0, "short docs must not near-match anything")
    val fresh = MinHashIndex.newDocsOnly(batch, "text", "doc_id", index, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fresh == Seq(10L, 11L, 12L), "every short doc must survive as new")
    // and a real near-dup of an indexed LONG doc is still caught
    val near = Seq((20L, "a much longer document with plenty of tokens right here")).toDF("doc_id", "text")
    assert(MinHashIndex.matches(near, "text", "doc_id", index, "doc_id", threshold = 0.4).count() >= 1)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("bucket sets beyond inSetMax prefilter through a Bloom filter, identical matches") {
    val path = tmpDir("mh_index_bloom_")
    MinHashIndex.writeIndex(indexDocs, "text", "doc_id", path)
    val index = spark.read.parquet(path)
    val batch = Seq(
      (1L, corpusText),
      (2L, corpusText.replace("lazy", "sleepy")),
      (3L, "a totally unrelated document about gardening tomatoes in july sunshine"))
      .toDF("doc_id", "text")
    def run(inSetMax: Int) = MinHashIndex.matches(batch, "text", "doc_id", index,
      "doc_id", threshold = 0.5, inSetMax = inSetMax)
    val viaInSet = run(Int.MaxValue)
    val viaBloom = run(0) // every bucket set exceeds 0 → Bloom tier
    val a = viaInSet.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = viaBloom.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b && a.nonEmpty, s"tiers must agree: inset=$a bloom=$b")
    // and the Bloom plan must NOT carry an In/INSET literal prefilter
    val bloomPlan = viaBloom.queryExecution.executedPlan.toString
    assert(!bloomPlan.contains("INSET"), s"Bloom tier must not compile an InSet:\n$bloomPlan")
    // the prefilter is the native codegen'd bloom_might_contain inside
    // exists — no Scala UDF breaking whole-stage codegen on the scan
    assert(bloomPlan.contains("bloom_might_contain"),
      s"Bloom tier must probe via the native expression:\n$bloomPlan")
    assert(!bloomPlan.toLowerCase.contains("batchevalpython") && !bloomPlan.contains("UDF("),
      s"Bloom tier must not fall back to a UDF:\n$bloomPlan")
  }
}
