package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shared executor/driver probe (local mode: one JVM). */
object BatchProbe {
  private val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  def observe(n: Int): Unit = maxSeen.getAndUpdate(m => math.max(m, n))
  def max(): Int = maxSeen.get()
  def reset(): Unit = maxSeen.set(0)
}

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

  test("decode batches are bounded: a partition never buffers whole, output identical") {
    val media = MultimodalPipeline.syntheticMedia(spark, 100).repartition(1) // one 100-row partition
    // codec that records the largest batch it was handed
    val codec = new MultimodalPipeline.Codec {
      def decodeBatch(payloads: Iterator[Array[Byte]]): Iterator[Array[Float]] = {
        var n = 0
        val out = payloads.map { b => n += 1; BatchProbe.observe(n); MultimodalPipeline.StubCodec.decodeBatch(Iterator(b)).next() }
        out
      }
    }
    BatchProbe.reset()
    val bounded = MultimodalPipeline.extractFeatures(media, codec, batchSize = 16)
    val rows = bounded.collect()
    assert(rows.length == 100)
    assert(BatchProbe.max() <= 16,
      s"a 100-row partition with batchSize=16 must never hand the codec more than 16 rows, saw ${BatchProbe.max()}")
    // identical output to the default path
    val default = MultimodalPipeline.extractFeatures(media).collect()
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    assert(rows.sortBy(key).map(_.getSeq[Float](3)).toSeq ==
      default.sortBy(key).map(_.getSeq[Float](3)).toSeq)
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

  test("resize rewrites image payloads + dims in bounded batches; others pass through") {
    val media = MultimodalPipeline.syntheticMedia(spark, 30)
    val out = MultimodalPipeline.resizeImages(media, 320, 240, batchSize = 4)
    assert(out.schema == MultimodalPipeline.mediaMetaSchema)
    assert(out.count() == 30)
    val images = out.where(org.apache.spark.sql.functions.col("kind") === "image").collect()
    assert(images.nonEmpty)
    images.foreach { r =>
      assert(r.getAs[Int]("width") == 320 && r.getAs[Int]("height") == 240)
      assert(r.getAs[Array[Byte]]("content").length == 320 * 240 / 256)
    }
    // non-image rows keep their original payloads and metadata
    val origAudio = media.where(org.apache.spark.sql.functions.col("kind") =!= "image")
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("content").toSeq).toMap
    val outAudio = out.where(org.apache.spark.sql.functions.col("kind") =!= "image")
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("content").toSeq).toMap
    assert(outAudio == origAudio)
    // deterministic regardless of batch size (compare payload CONTENTS
    // — Row.toString renders arrays by identity)
    def snapshot(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("content").toSeq)
      .sortBy(_._1).toSeq
    assert(snapshot(MultimodalPipeline.resizeImages(media, 320, 240, batchSize = 7)) ==
      snapshot(out))
  }
}
