package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MJPEG-AVI container parse + REAL per-frame pixel decode. */
class AviSpec extends SparkSpec {

  /** Solid-color frame — ImageIO's JPEG round trip keeps solid colors
    * within a couple of quantization steps, so channel means are
    * checkable. */
  private def frame(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
    img
  }

  test("container parse: dimensions, frame period, every video chunk sliced") {
    val avi = Avi.encodeMjpeg(Seq(frame(32, 24, 0xFF0000), frame(32, 24, 0x00FF00),
      frame(32, 24, 0x0000FF)), fps = 10)
    val meta = Avi.parse(avi)
    assert(meta.width == 32 && meta.height == 24)
    assert(meta.usPerFrame == 100000L)
    assert(meta.frames.length == 3)
    assert(meta.frameTsMs(2) == 200L)
    // each sliced chunk is a standalone JPEG (SOI marker)
    (0 until 3).foreach { i =>
      val j = Avi.frameBytes(avi, meta, i)
      assert((j(0) & 0xFF) == 0xFF && (j(1) & 0xFF) == 0xD8, s"frame $i is not a JPEG")
    }
  }

  test("frames decode to REAL pixels: solid colors come back as dominant channel means") {
    val avi = Avi.encodeMjpeg(Seq(frame(48, 32, 0xFF0000), frame(48, 32, 0x0000FF)), fps = 5)
    val meta = Avi.parse(avi)
    val red = MultimodalPipeline.ImageIoCodec.decodeBatch(
      Iterator(Avi.frameBytes(avi, meta, 0))).next()
    // ImageIoCodec feature: [w, h, channels, rMean, gMean, bMean, luma, aspect]
    assert(red(0) == 48f && red(1) == 32f)
    assert(red(3) > 0.8f && red(4) < 0.2f && red(5) < 0.2f,
      s"red frame means: ${red.mkString(",")}")
    val blue = MultimodalPipeline.ImageIoCodec.decodeBatch(
      Iterator(Avi.frameBytes(avi, meta, 1))).next()
    assert(blue(5) > 0.8f && blue(3) < 0.2f, s"blue frame means: ${blue.mkString(",")}")
  }

  test("extractVideoFrames: sampling step honors everyMs; features land per (media_id, ts)") {
    import spark.implicits._
    // 10 fps, 10 frames = 1 s of video; sample every 300 ms -> frames 0,3,6,9
    val avi = Avi.encodeMjpeg((0 until 10).map(i => frame(16, 16, i * 0x101010)), fps = 10)
    val media = Seq((7L, "video", avi)).toDF("media_id", "kind", "content")
    val out = Avi.extractVideoFrames(media, everyMs = 300)
    val rows = out.orderBy("frame_index").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 300L, 600L, 900L))
    assert(rows.forall(!_.isNullAt(3)))
    assert(rows.forall(_.getSeq[Float](3).head == 16f))
  }

  test("mixed/corrupt corpora degrade row-local: junk rows drop, corrupt frames null") {
    import spark.implicits._
    val good = Avi.encodeMjpeg(Seq(frame(8, 8, 0xFFFFFF)), fps = 1)
    // corrupt ONE frame's JPEG body but keep the container valid
    val meta = Avi.parse(good)
    val corrupt = good.clone()
    val (off, len) = meta.frames(0)
    corrupt(off + len / 2) = 0x00
    val media = Seq(
      (1L, "video", good),
      (2L, "video", "junk that is not RIFF".getBytes("UTF-8")),
      (3L, "video", corrupt)).toDF("media_id", "kind", "content")
    val out = Avi.extractVideoFrames(media, everyMs = 1000).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 3L), "junk row must drop")
    val goodRow = out.find(_.getLong(0) == 1L).get
    assert(!goodRow.isNullAt(3))
  }

  test("interleaved AVIs: frames inside 'rec ' lists are found") {
    val plain = Avi.encodeMjpeg(Seq(frame(8, 8, 0x112233), frame(8, 8, 0x445566)), fps = 2)
    val meta = Avi.parse(plain)
    // rebuild the container with each 00dc chunk nested in a LIST 'rec '
    def le32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++ pad
    }
    val recWrapped = (0 until meta.frames.length).map { i =>
      chunk("LIST", "rec ".getBytes("US-ASCII") ++ chunk("00dc", Avi.frameBytes(plain, meta, i)))
    }.reduce(_ ++ _)
    val avih = {
      // copy the avih payload out of the plain file: locate via parse
      // fields (56-byte payload right after "avih" + size)
      val idx = plain.indexOfSlice("avih".getBytes("US-ASCII"))
      plain.slice(idx, idx + 8 + 56)
    }
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++ recWrapped)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val interleaved = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val m2 = Avi.parse(interleaved)
    assert(m2.frames.length == 2, "frames nested in rec lists must be found")
    val f = MultimodalPipeline.ImageIoCodec.decodeBatch(
      Iterator(Avi.frameBytes(interleaved, m2, 0))).next()
    assert(f != null && f(0) == 8f)
  }

  test("VideoMetaCodec dispatches AVI containers to the metadata feature") {
    val avi = Avi.encodeMjpeg(Seq(frame(20, 10, 0x123456), frame(20, 10, 0x654321)), fps = 4)
    val f = MultimodalPipeline.VideoMetaCodec.decodeBatch(Iterator(avi)).next()
    assert(f(0) == 20f && f(1) == 10f)
    assert(f(3) == 500f, s"2 frames at 4 fps = 500 ms, got ${f(3)}")
    assert(f(4).isNaN)
  }
}
