package graft.multimodal

import graft.SparkSpec

/** Video near-dup: time-based sampling invariance under the
  * re-encoding family (resolution / frame rate / JPEG quality),
  * alignment semantics, threshold behavior, poison tolerance. */
class VideoHashSpec extends SparkSpec {

  test("patternFrame pHash: resolution-invariant per (id, instant), far across ids/instants") {
    for (id <- Seq(3L, 17L, 88L); t <- Seq(0L, 400L, 800L)) {
      def jpeg(size: Int) = {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(VideoHash.patternFrame(id, t, size), "jpg", bos)
        bos.toByteArray
      }
      val h96 = ImageHash.phash64(jpeg(96))
      val h48 = ImageHash.phash64(jpeg(48))
      assert(h96 != null && h48 != null)
      val d = java.lang.Long.bitCount(h96 ^ h48)
      assert(d <= 4, s"($id,$t): resolution change moved the pHash $d bits")
    }
    val base = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(VideoHash.patternFrame(3L, 0L, 96), "jpg", bos)
      ImageHash.phash64(bos.toByteArray)
    }
    for ((id, t) <- Seq((3L, 400L), (4L, 0L), (99L, 800L))) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(VideoHash.patternFrame(id, t, 96), "jpg", bos)
      val h = ImageHash.phash64(bos.toByteArray)
      assert(java.lang.Long.bitCount(base ^ h) > 10,
        s"distinct ($id,$t) frame too close to (3,0)")
    }
  }

  test("withFrameHashes samples by TIME: fps/hold re-encodes land on the same ordinals") {
    import spark.implicits._
    val media = Seq(
      (1L, VideoHash.toneClipAvi(7L, fps = 5, holdFrames = 2, size = 96)),
      (2L, VideoHash.toneClipAvi(7L, fps = 10, holdFrames = 4, size = 48))
    ).toDF("media_id", "content")
    val rows = VideoHash.withFrameHashes(media, everyMs = 400L, maxFrames = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.get(2)).toMap
    assert(rows.keySet == Set((1L, 0), (1L, 1), (1L, 2), (1L, 3),
      (2L, 0), (2L, 1), (2L, 2), (2L, 3)))
    for (k <- 0 until 4) {
      val a = rows((1L, k)).asInstanceOf[Long]
      val b = rows((2L, k)).asInstanceOf[Long]
      assert(java.lang.Long.bitCount(a ^ b) <= 4,
        s"ordinal $k: re-encode moved the frame hash ${java.lang.Long.bitCount(a ^ b)} bits")
    }
  }

  test("nearDups finds re-encoded copies and nothing else") {
    import spark.implicits._
    val rows = (0 until 8).flatMap { i =>
      val orig = (100L + i, VideoHash.toneClipAvi(100L + i, fps = 5, holdFrames = 2, size = 96))
      if (i % 2 == 0)
        Seq(orig, (1100L + i, VideoHash.toneClipAvi(100L + i, fps = 10, holdFrames = 4, size = 48)))
      else Seq(orig)
    } :+ ((9999L, "junk bytes, not a RIFF container".getBytes("UTF-8")))
    val media = rows.toDF("media_id", "content")
    val got = VideoHash.nearDups(media, everyMs = 400L).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("matched"))).toSet
    val expected = (0 until 8).filter(_ % 2 == 0).map(i => (100L + i, 1100L + i, 4L)).toSet
    assert(got == expected, s"expected $expected, got $got")
  }

  test("temporal alignment is part of the match: shared frames at the wrong instants don't count") {
    import spark.implicits._
    // clip B shows clip A's instant-0 picture at ALL its instants —
    // only ordinal 0 is aligned, 1 of 4 < ceil(0.6*4)=3
    val a = VideoHash.toneClipAvi(1L, fps = 5, holdFrames = 2, size = 96)
    val bFrames = Seq.fill(8)(VideoHash.patternFrame(1L, 0L, 96))
    val b = Avi.encodeMjpeg(bFrames, 5)
    val media = Seq((1L, a), (2L, b)).toDF("media_id", "content")
    assert(VideoHash.nearDups(media, everyMs = 400L).collect().isEmpty)
    // lowering the threshold surfaces the partial overlap with its count
    val loose = VideoHash.nearDups(media, everyMs = 400L, minMatchFrac = 0.25)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("matched")))
    assert(loose.toSeq == Seq((1L, 2L, 1L)))
  }

  test("a frame recurring at other positions in OTHER videos doesn't break an aligned match") {
    import spark.implicits._
    // A and B are true re-encodes whose ordinal-2 picture X also
    // opens unrelated video C (a shared title card). C's composite id
    // is the SMALLEST in X's identical-hash group — an unaligned
    // pre-group would elect it rep and drop the direct A-B pair at
    // ordinal 2, capping matched at 3. minMatchFrac=1.0 demands 4/4.
    def clip(size: Int, fps: Int, hold: Int, pics: Seq[(Long, Long)]) =
      Avi.encodeMjpeg(pics.flatMap { case (id, t) =>
        Seq.fill(hold)(VideoHash.patternFrame(id, t, size)) }, fps)
    val picsA = Seq((10L, 0L), (10L, 400L), (42L, 0L), (10L, 1200L))
    val a = clip(96, 5, 2, picsA)
    val b = clip(48, 10, 4, picsA)
    val c = clip(96, 5, 2, Seq((42L, 0L), (1L, 400L), (1L, 800L), (1L, 1200L)))
    val media = Seq((1L, c), (10L, a), (20L, b)).toDF("media_id", "content")
    val got = VideoHash.nearDups(media, everyMs = 400L, minMatchFrac = 1.0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("matched")))
    assert(got.toSeq == Seq((10L, 20L, 4L)), s"got ${got.toSeq}")
  }

  test("signatures cap at maxFrames and respect clip duration") {
    import spark.implicits._
    val media = Seq((5L, VideoHash.toneClipAvi(5L, fps = 5, holdFrames = 2, size = 64,
      logicalFrames = 8))).toDF("media_id", "content")
    val n = VideoHash.withFrameHashes(media, everyMs = 400L, maxFrames = 3).count()
    assert(n == 3)
    val all = VideoHash.withFrameHashes(media, everyMs = 400L, maxFrames = 64).count()
    assert(all == 8)
  }

  test("negative video ids refuse loudly instead of aliasing the composite key") {
    import spark.implicits._
    val media = Seq((-5L, VideoHash.toneClipAvi(5L, fps = 5, holdFrames = 2, size = 64)))
      .toDF("media_id", "content")
    val e = intercept[Exception] {
      VideoHash.nearDups(media, everyMs = 400L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("video id out of")))
  }
}
