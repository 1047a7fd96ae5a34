package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L13: multimodal binary-column plumbing (codec stubbed by design). */
class MultimodalSpec extends SparkSpec {

  test("feature extraction: schema, determinism, null-safety, batch plumbing") {
    val media = MultimodalPipeline.syntheticMedia(spark, 30)
    assert(media.schema == MultimodalPipeline.mediaMetaSchema)
    val feats = MultimodalPipeline.extractFeatures(media, parallelism = Some(4))
    assert(feats.schema == MultimodalPipeline.featureSchema)
    assert(feats.count() == 30)
    val r = feats.where(col("media_id") === 7L).head()
    assert(r.getSeq[Float](3).length == 8)
    assert(r.getAs[Long]("n_bytes") == 64 + 7 % 64)
    // deterministic across runs (stub codec is pure)
    val again = MultimodalPipeline.extractFeatures(media, parallelism = Some(2))
      .where(col("media_id") === 7L).head()
    assert(r.getSeq[Float](3) == again.getSeq[Float](3))
  }

  test("frame sampling explodes k offsets per video row only") {
    val media = MultimodalPipeline.syntheticMedia(spark, 9)
    val frames = MultimodalPipeline.sampleFrames(media, everyMs = 10000)
    // ids 1,2,4,5,7,8 are audio/video kinds; only kind=video rows sampled
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet.forall(id => id % 3 != 0)) // videos/audio ids
    // duration 1000*(i%60) ms, one frame every 10s, inclusive of 0
    byId.foreach { case (id, n) =>
      val dur = 1000L * (id % 60)
      assert(n == dur / 10000 + 1, s"id=$id dur=$dur frames=$n")
    }
  }
}
