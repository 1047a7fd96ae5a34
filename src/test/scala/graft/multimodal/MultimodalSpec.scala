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

  // ── real JDK image codecs ─────────────────────────────────────────

  /** Deterministic real PNG bytes: a w×h image with per-pixel RGB. */
  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb(x, y))))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNGs: dims, channel means, junk -> null feature") {
    val red = png(40, 20)((_, _) => 0xFF0000)
    val grey = png(16, 16)((_, _) => 0x808080)
    val junk = Array.tabulate[Byte](100)(_.toByte)
    val feats = MultimodalPipeline.ImageIoCodec
      .decodeBatch(Iterator(red, grey, junk, null)).toSeq
    val fr = feats(0)
    assert(fr(0) == 40f && fr(1) == 20f, s"dims: ${fr.toSeq}")
    assert(fr(3) == 255f && fr(4) == 0f && fr(5) == 0f, s"solid red means: ${fr.toSeq}")
    assert(math.abs(fr(7) - 2.0f) < 1e-6, "aspect 40/20")
    val fg = feats(1)
    assert(fg(3) == 0x80.toFloat && fg(4) == 0x80.toFloat && fg(5) == 0x80.toFloat)
    assert(feats(2) == null, "junk bytes must yield a null feature, not an error")
    assert(feats(3) == null)
    // end-to-end through the batched plumbing over a DataFrame
    val rows = Seq((1L, "image", red), (2L, "image", junk)).map { case (id, k, b) =>
      org.apache.spark.sql.Row(id, k, "image/png", null, null, null, b)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MultimodalPipeline.mediaMetaSchema)
    val out = MultimodalPipeline.extractFeatures(df, MultimodalPipeline.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Float](3))).toMap
    assert(out(1L).exists(f => f(0) == 40f && f(1) == 20f))
    assert(out(2L).isEmpty, "null feature survives the Row plumbing")
  }

  test("ImageIoResize really rescales: output decodes at target dims, junk passes through") {
    // a half-red/half-blue 64x32 source: after resize the halves persist
    val src = png(64, 32)((x, _) => if (x < 32) 0xFF0000 else 0x0000FF)
    val junk = "not an image".getBytes
    val out = MultimodalPipeline.ImageIoResize(16, 8)
      .transformBatch(Iterator(src, junk)).toSeq
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(0)))
    assert(img.getWidth == 16 && img.getHeight == 8, "decoded target dims")
    assert((img.getRGB(2, 4) >> 16 & 0xFF) > 200, "left stays red")
    assert((img.getRGB(13, 4) & 0xFF) > 200, "right stays blue")
    assert(out(1).sameElements(junk), "undecodable payloads pass through unchanged")
    // and through the resize STAGE: image rows re-encoded at target
    val rows = Seq(org.apache.spark.sql.Row(7L, "image", "image/png",
      Integer.valueOf(64), Integer.valueOf(32), null, src))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MultimodalPipeline.mediaMetaSchema)
    val staged = MultimodalPipeline.resizeImages(df, 16, 8,
      codec = MultimodalPipeline.ImageIoResize(16, 8)).head()
    assert(staged.getAs[Int]("width") == 16 && staged.getAs[Int]("height") == 8)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(staged.getAs[Array[Byte]]("content")))
    assert(dec.getWidth == 16 && dec.getHeight == 8)
  }

  test("WavCodec decodes real WAV: rate/channels/duration, sine RMS, junk -> null") {
    // synthesize a 0.5 s 440 Hz sine at 8 kHz mono 16-bit, amplitude 0.5
    val rate = 8000f
    val nFrames = 4000
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    (0 until nFrames).foreach { i =>
      val s = (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt.toShort
      pcm(i * 2) = (s & 0xFF).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val feats = MultimodalPipeline.WavCodec
      .decodeBatch(Iterator(wav, "junk bytes".getBytes, null)).toSeq
    val f = feats(0)
    assert(f != null, "real WAV must decode")
    assert(f(0) == 8000f && f(1) == 1f && f(2) == 16f, s"format: ${f.toSeq}")
    assert(math.abs(f(3) - 500f) < 1f, s"duration ~500 ms: ${f(3)}")
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ~ 0.354; peak ~ 0.5
    assert(math.abs(f(4) - 0.3536f) < 0.01f, s"sine rms: ${f(4)}")
    assert(math.abs(f(5) - 0.5f) < 0.01f, s"sine peak: ${f(5)}")
    // 440 Hz crosses zero ~880 times/s -> rate 880/8000 = 0.11
    assert(math.abs(f(6) - 0.11f) < 0.01f, s"zero-cross rate: ${f(6)}")
    assert(feats(1) == null && feats(2) == null, "junk/null must yield null features")
  }

  /** Synthesized FLAC header: fLaC magic + STREAMINFO (type 0, 34 B)
    * with the 20/3/5/36-bit packed fields hand-encoded. */
  private def flacBytes(rate: Int, channels: Int, bps: Int, totalSamples: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80)                       // last-block flag + type 0
    out.write(0); out.write(0); out.write(34)
    val si = new Array[Byte](34)          // min/max block+frame stay 0
    si(10) = ((rate >> 12) & 0xFF).toByte
    si(11) = ((rate >> 4) & 0xFF).toByte
    si(12) = (((rate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bps - 1) >> 4) & 0x1)).toByte
    si(13) = ((((bps - 1) & 0xF) << 4) | ((totalSamples >> 32) & 0xF)).toInt.toByte
    si(14) = ((totalSamples >> 24) & 0xFF).toByte
    si(15) = ((totalSamples >> 16) & 0xFF).toByte
    si(16) = ((totalSamples >> 8) & 0xFF).toByte
    si(17) = (totalSamples & 0xFF).toByte
    out.write(si)
    out.toByteArray
  }

  /** Minimal OGG page with one packet; granule and serial hand-set. */
  private def oggPage(packet: Array[Byte], granule: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(0); out.write(2)            // version, header type (BOS)
    (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xFF).toInt))
    out.write(Array.fill[Byte](12)(0))    // serial + seq + checksum
    out.write(1); out.write(packet.length) // one segment
    out.write(packet)
    out.toByteArray
  }

  test("CompressedAudioMetaCodec: FLAC STREAMINFO fields exact; waveform stats NaN") {
    val flac = flacBytes(rate = 44100, channels = 2, bps = 24, totalSamples = 441000L)
    val f = MultimodalPipeline.CompressedAudioMetaCodec.decodeBatch(Iterator(flac)).next()
    assert(f != null, "FLAC header must parse")
    assert(f(0) == 44100f && f(1) == 2f && f(2) == 24f, s"rate/ch/bps: ${f.toSeq}")
    assert(math.abs(f(3) - 10000f) < 1f, s"441000 samples @ 44.1kHz = 10 s: ${f(3)}")
    assert(f(4).isNaN && f(5).isNaN && f(6).isNaN && f(7).isNaN,
      "waveform stats must be NaN (undecoded), not zero")
    // 8-bit mono edge of the packed fields
    val f2 = MultimodalPipeline.CompressedAudioMetaCodec
      .decodeBatch(Iterator(flacBytes(8000, 1, 8, 4000L))).next()
    assert(f2(0) == 8000f && f2(1) == 1f && f2(2) == 8f && math.abs(f2(3) - 500f) < 1f, f2.toSeq.toString)
  }

  test("CompressedAudioMetaCodec: OGG Vorbis and Opus id headers + tail-granule duration") {
    val vorbisId = Array[Byte](0x01) ++ "vorbis".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++                      // version
      Array[Byte](2) ++                               // channels
      Array[Byte](0x44.toByte, 0xAC.toByte, 0, 0) ++  // 44100 LE
      Array.fill[Byte](13)(0)
    val firstPage = oggPage(vorbisId, granule = 0L)
    val lastPage = oggPage(Array[Byte](0), granule = 88200L) // 2 s @ 44.1k
    val v = MultimodalPipeline.CompressedAudioMetaCodec
      .decodeBatch(Iterator(firstPage ++ lastPage)).next()
    assert(v != null && v(0) == 44100f && v(1) == 2f, s"vorbis: ${v.toSeq}")
    assert(math.abs(v(3) - 2000f) < 1f, s"vorbis duration from tail granule: ${v(3)}")

    val opusId = "OpusHead".getBytes("US-ASCII") ++
      Array[Byte](1) ++                               // version
      Array[Byte](1) ++                               // channels
      Array[Byte](0x38, 0x01) ++                      // pre-skip 312 LE
      Array[Byte](0x80.toByte, 0xBB.toByte, 0, 0) ++  // input rate 48000 LE
      Array.fill[Byte](3)(0)
    val opus = oggPage(opusId, 0L) ++ oggPage(Array[Byte](0), granule = 48000L + 312L)
    val o = MultimodalPipeline.CompressedAudioMetaCodec.decodeBatch(Iterator(opus)).next()
    assert(o != null && o(0) == 48000f && o(1) == 1f, s"opus: ${o.toSeq}")
    assert(math.abs(o(3) - 1000f) < 1f, s"opus duration minus pre-skip at 48 kHz: ${o(3)}")
  }

  test("AudioCodec dispatches by magic: WAV decodes fully, FLAC/OGG metadata-only, junk null") {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](1600 * 2)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 1600L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val feats = MultimodalPipeline.AudioCodec.decodeBatch(Iterator(
      bos.toByteArray, flacBytes(16000, 1, 16, 8000L), "not audio at all!".getBytes, null)).toSeq
    assert(feats(0) != null && feats(0)(0) == 8000f && !feats(0)(4).isNaN,
      "WAV must carry real waveform stats")
    assert(feats(1) != null && feats(1)(0) == 16000f && feats(1)(4).isNaN,
      "FLAC must carry metadata with NaN stats")
    assert(feats(2) == null && feats(3) == null)
  }

  /** Minimal MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
  private def mp4Bytes(timescale: Long, duration: Long,
                       width: Int, height: Int, v1: Boolean = false): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val sz = payload.length + 8
      out.write(Array((sz >> 24).toByte, (sz >> 16).toByte, (sz >> 8).toByte, sz.toByte))
      out.write(tpe.getBytes("ISO-8859-1")); out.write(payload)
      out.toByteArray
    }
    def u32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u64(v: Long) = u32(v >> 32) ++ u32(v & 0xFFFFFFFFL)
    val mvhd =
      if (v1) Array[Byte](1, 0, 0, 0) ++ u64(0) ++ u64(0) ++ u32(timescale) ++ u64(duration) ++
        Array.fill[Byte](80)(0)
      else Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++ u32(timescale) ++ u32(duration) ++
        Array.fill[Byte](80)(0)
    val tkhd = Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(duration) ++
      Array.fill[Byte](52)(0) ++ u32(width.toLong << 16) ++ u32(height.toLong << 16)
    box("ftyp", "isomiso2".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
  }

  /** Minimal WebM: EBML header + Segment(Info(TimecodeScale, Duration),
    * Tracks(TrackEntry(Video(PixelWidth, PixelHeight)))). */
  private def webmBytes(durationTicks: Double, width: Int, height: Int): Array[Byte] = {
    def sz(n: Int): Array[Byte] = {
      require(n < 0x7F); Array((0x80 | n).toByte) // 1-byte size
    }
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
      id ++ sz(payload.length) ++ payload
    def u16(v: Int) = Array((v >> 8).toByte, v.toByte)
    val tcs = el(Array(0x2A.toByte, 0xD7.toByte, 0xB1.toByte),
      Array(0x0F.toByte, 0x42.toByte, 0x40.toByte)) // 1,000,000 ns
    val durBits = java.lang.Float.floatToIntBits(durationTicks.toFloat)
    val dur = el(Array(0x44.toByte, 0x89.toByte),
      Array((durBits >> 24).toByte, (durBits >> 16).toByte, (durBits >> 8).toByte, durBits.toByte))
    val video = el(Array(0xE0.toByte),
      el(Array(0xB0.toByte), u16(width)) ++ el(Array(0xBA.toByte), u16(height)))
    val trackEntry = el(Array(0xAE.toByte), video)
    val info = el(Array(0x15.toByte, 0x49.toByte, 0xA9.toByte, 0x66.toByte), tcs ++ dur)
    val tracks = el(Array(0x16.toByte, 0x54.toByte, 0xAE.toByte, 0x6B.toByte), trackEntry)
    val ebmlHdr = el(Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte), Array[Byte]())
    val segment = el(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte), info ++ tracks)
    ebmlHdr ++ segment
  }

  test("VideoMetaCodec: MP4 mvhd/tkhd fields exact, v0 and v1") {
    val f = MultimodalPipeline.VideoMetaCodec
      .decodeBatch(Iterator(mp4Bytes(timescale = 1000, duration = 12500, width = 1280, height = 720)))
      .next()
    assert(f != null, "MP4 must parse")
    assert(f(0) == 1280f && f(1) == 720f && f(2) == 1f, s"w/h/tracks: ${f.toSeq}")
    assert(math.abs(f(3) - 12500f) < 1f, s"duration ms: ${f(3)}")
    assert(f(4).isNaN && f(5).isNaN && f(6).isNaN && f(7).isNaN)
    val v1 = MultimodalPipeline.VideoMetaCodec
      .decodeBatch(Iterator(mp4Bytes(90000, 90000L * 7, 640, 480, v1 = true))).next()
    assert(v1 != null && v1(0) == 640f && math.abs(v1(3) - 7000f) < 1f, s"v1: ${v1.toSeq}")
  }

  test("VideoMetaCodec: WebM EBML walk — dims, duration at default timecode scale") {
    val f = MultimodalPipeline.VideoMetaCodec
      .decodeBatch(Iterator(webmBytes(durationTicks = 4500.0, width = 1920, height = 1080)))
      .next()
    assert(f != null, "WebM must parse")
    assert(f(0) == 1920f && f(1) == 1080f && f(2) == 1f, s"w/h/tracks: ${f.toSeq}")
    assert(math.abs(f(3) - 4500f) < 1f, s"duration ms: ${f(3)}")
  }

  test("VideoMetaCodec: corrupt and unknown payloads null, never throw") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val truncated = mp4Bytes(1000, 5000, 320, 240).take(20)
    val feats = MultimodalPipeline.VideoMetaCodec
      .decodeBatch(Iterator(garbage, truncated, null)).toSeq
    assert(feats.forall(_ == null))
  }
}
