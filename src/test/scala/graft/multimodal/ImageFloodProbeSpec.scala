package graft.multimodal

import graft.SparkSpec

/** The near-blank-image flood probe: truncation and planted recall are
  * measured TOGETHER, so the maxBucket cap's recall trade on hot-bucket
  * (skewed) corpora is a number, not a surprise. Everything is
  * deterministic (seeded generators, no RNG), so the assertions are
  * exact replays, not statistical hopes. */
class ImageFloodProbeSpec extends SparkSpec {

  test("flood family: distinct clustered hashes that saturate a block bucket") {
    // driver-side calibration check on a small sample: the family must
    // have (a) mostly-distinct hashes (else star pre-grouping absorbs
    // the flood and buckets never fill) and (b) a hot block bucket
    // holding a large corpus share (the saturation mechanism)
    val hashes = (0 until 600).map { i =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(ImageFloodProbe.floodImage(i.toLong), "png", bos)
      ImageHash.phash64(bos.toByteArray).longValue
    }
    val distinct = hashes.distinct
    assert(distinct.size >= 400, s"flood hashes not distinct enough: ${distinct.size}/600")
    val hottestShare = (0 until 4).map { b =>
      distinct.groupBy(h => (h >>> (b * 16)) & 0xFFFF).values.map(_.size).max
    }.max.toDouble / distinct.size
    assert(hottestShare >= 0.15, s"no hot block bucket: hottest share $hottestShare")
  }

  test("under a tight cap the flood truncates buckets and loses planted recall — both observable") {
    val r = ImageFloodProbe.run(spark, nImages = 4000, planted = 120, maxBucket = 50)
    assert(r.distinctHashes >= 2000, s"flood collapsed to too few hashes: $r")
    assert(r.eligible > 30, s"too few bucket-dependent planted pairs to measure: $r")
    assert(r.truncatedBuckets > 0 && r.droppedMembers > 0,
      s"the tight cap must visibly truncate: $r")
    assert(r.recall < 1.0, s"hot-bucket truncation must cost recall (that is the trade): $r")
  }

  test("with the cap above the hot bucket the same flood keeps full recall and zero truncation") {
    val r = ImageFloodProbe.run(spark, nImages = 4000, planted = 120, maxBucket = 100000)
    assert(r.truncatedBuckets == 0 && r.droppedMembers == 0, s"unexpected truncation: $r")
    assert(r.eligible > 30, s"too few eligible pairs: $r")
    assert(r.recall == 1.0,
      s"MIH is exact on distinct hashes without cap pressure — recall must be 1.0: $r")
  }
}
