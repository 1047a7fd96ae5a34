package graft.pipeline

import graft.SparkSpec
import graft.meta.{MetaTable, Metastore}
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** The composed curation stage over real documents + crafted cases. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val d = LocalDate.parse("2024-05-01")

  test("curation drops duplicates and junk, annotates and splits the rest") {
    val good = "The quick brown fox jumps over the lazy dog near the river bank. " * 8
    val docs = Seq(
      (1L, good), (2L, good),                        // duplicate pair — keep id 1
      (3L, "aaa\naaa\naaa\naaa"),                    // repetition junk
      (4L, "zz!!! ??? !!! ;;; ###"),                 // punctuation junk
      (5L, "El perro y los gatos en una casa para el niño. " * 8)
    ).toDF("doc_id", "text")

    val ms = new Metastore(spark)
    val base = tmpDir("cur_")
    ms.register(MetaTable("raw", s"$base/raw"))
    ms.register(MetaTable("cur", s"$base/cur"))
    ms.saveTable("raw", d, docs)
    val res = new Orchestrator(ms).run(Seq(JobDef(
      "curate", "cur", new CurationTransformer, Seq("raw"),
      // composite score floors at ~0.34 (case/stopword otherwise-branches),
      // so catching pure-punctuation junk needs a threshold above that
      options = Map("input.table" -> "raw", "quality.min" -> "0.4"))), d)
    assert(res.head.isInstanceOf[TaskResult.Succeeded])

    val out = ms.getTable("cur", Some(d), Some(d))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && !ids.contains(2L), "dup must drop, keeper stays")
    assert(!ids.contains(3L), "repetition junk must drop")
    assert(!ids.contains(4L), "punctuation junk must drop")
    assert(ids.contains(5L))

    val row1 = out.where(col("doc_id") === 1L).head()
    assert(row1.getAs[String]("lang_pred") == "en")
    assert(row1.getAs[Int]("n_tokens") == 13 * 8) // 13 words x 8 repeats
    assert(Set("train", "val", "test").contains(row1.getAs[String]("split")))
    assert(out.columns.contains("quality") && out.columns.contains("fingerprint"))
  }

  test("runs over the real documents table with sane retention") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ms = new Metastore(spark)
    val base = tmpDir("curr_")
    ms.register(MetaTable("raw", s"$base/raw"))
    ms.register(MetaTable("cur", s"$base/cur"))
    ms.saveTable("raw", d, docs)
    new Orchestrator(ms).run(Seq(JobDef(
      "curate", "cur", new CurationTransformer, Seq("raw"),
      options = Map("input.table" -> "raw", "quality.min" -> "0.2"))), d)
    val out = ms.getTable("cur", Some(d), Some(d))
    val kept = out.count()
    assert(kept > 100 && kept <= 500, s"retention off: $kept of 500")
    // splits cover the output and are disjoint by construction
    assert(out.groupBy("split").count().count() == 3)
  }
}
