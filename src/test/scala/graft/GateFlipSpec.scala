package graft

import org.apache.spark.sql.functions._

/**
 * Plant-replay pins for the r17 oracle flips: these six gates were
 * rows-only and now carry DuckDB hash-match oracles whose expected
 * output is pure plant arithmetic. The driver only checks them at
 * sf0.01; this spec replays the same arithmetic at sf0.001 (same
 * 500-vector embeddings table) so a regression — a fit change that
 * splits a planted pair, a probe change that loses a twin, a
 * classifier change that muddies the marker margin — fails in
 * `sbt test` before it fails in CORRECTNESS.
 */
class GateFlipSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) = SparkEntry.queries(q)(spark, dir)

  test("q_semdedup: survivors mod 1e6 are every base id exactly once") {
    val rows = run("q_semdedup").collect()
    val nBase = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.length.toLong == nBase, s"expected $nBase pair keys, got ${rows.length}")
    val bad = rows.filter(_.getLong(1) != 1L)
    assert(bad.isEmpty, s"keys with n != 1: ${bad.take(5).mkString(", ")}")
  }

  test("q_ann_lsh: the >=0.9 region is exactly the query and its planted twin") {
    val got = run("q_ann_lsh").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1000000L), s"got $got")
  }

  test("q_ann_ivf: cell pruning keeps the query and its planted twin") {
    val got = run("q_ann_ivf").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1000000L), s"got $got")
  }

  test("q_ann_ivf_multi: each planted-original query retrieves itself and its twin") {
    val got = run("q_ann_ivf_multi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Seq(0L, 10L, 20L, 30L, 40L)
      .flatMap(q => Seq((q, q), (q, q + 1000000L))).toSet
    assert(got == want, s"diff: ${(want -- got) ++ (got -- want)}")
  }

  test("q_ann_pq_refine: refined top-10 equals the exact brute-force top-10") {
    import graft.operators.AnnSearch
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q7 = emb.where(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val exact = AnnSearch.bruteForce(emb, "embedding", "vec_id", q7, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val refined = run("q_ann_pq_refine")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(refined == exact,
      s"refine lost coverage: missing=${exact.map(_._1).toSet -- refined.map(_._1).toSet}")
  }

  test("q_quality_classifier: marker-separable decisions replay the plant rule") {
    val rows = run("q_quality_classifier").collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length.toLong == nDocs)
    val wrong = rows.filter(r => r.getBoolean(1) != (r.getLong(0) % 5 == 0))
    assert(wrong.isEmpty, s"misclassified: ${wrong.take(5).map(_.getLong(0)).mkString(", ")}")
  }
}
