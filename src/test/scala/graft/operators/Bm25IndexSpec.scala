package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted BM25 index: score parity with the scan-time operator,
  * bucket-pruned probe plan, additive append semantics. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text")

  test("index scores equal Ranking.bm25 on the real corpus") {
    val path = tmpDir("bm25ix_") + "/ix"
    Bm25Index.write(docs, "doc_id", "text", path, numBuckets = 64)
    val terms = Seq("hash", "join", "vector")
    val direct = Ranking.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val indexed = Bm25Index.scores(spark, path, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(indexed.keySet == direct.keySet, "same matched documents")
    assert(direct.nonEmpty)
    indexed.foreach { case (id, s) =>
      assert(math.abs(s - direct(id)) < 1e-9, s"doc $id: $s vs ${direct(id)}") }
  }

  test("probe reads only the query terms' bucket partitions; corpus text never read") {
    val path = tmpDir("bm25px_") + "/ix"
    Bm25Index.write(docs, "doc_id", "text", path, numBuckets = 64)
    val q = Bm25Index.scores(spark, path, Seq("vector"))
    q.collect()
    val parts = fileScans(q).map(_.selectedPartitions.partitionCount)
    assert(parts.nonEmpty && parts.forall(_ <= 1),
      s"a 1-term query must prune to <= 1 bucket dir, read $parts")
  }

  test("append: new docs searchable, global df/avgdl stay correct") {
    val path = tmpDir("bm25ap_") + "/ix"
    val (day1, day2) = (docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 =!= 0))
    Bm25Index.write(day1, "doc_id", "text", path, numBuckets = 64)
    Bm25Index.append(day2, "doc_id", "text", path)
    val terms = Seq("hash", "join")
    val whole = Ranking.bm25(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val appended = Bm25Index.scores(spark, path, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(appended.keySet == whole.keySet)
    appended.foreach { case (id, s) =>
      assert(math.abs(s - whole(id)) < 1e-9,
        s"append must keep GLOBAL stats: doc $id $s vs ${whole(id)}") }
  }

  test("topK order and empty/validation contracts") {
    val path = tmpDir("bm25tk_") + "/ix"
    Bm25Index.write(docs, "doc_id", "text", path, numBuckets = 64)
    val top = Bm25Index.topK(spark, path, Seq("vector"), k = 5).collect()
    assert(top.length <= 5 && top.nonEmpty)
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p.head >= p.last),
      "descending score order")
    intercept[IllegalArgumentException] {
      Bm25Index.scores(spark, path, Seq("  ")) }
  }
}
