package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FLAC sample decoder: CRCs pinned to published check values,
  * encode→decode round trips (FIXED, LPC, VERBATIM, multi-frame,
  * stereo), WavCodec parity on identical PCM, corruption degrade. */
class FlacSpec extends AnyFunSuite {

  /** 16-bit sine at `hz`, amplitude `amp`. */
  private def sine(n: Int, rate: Int, hz: Double, amp: Double): Array[Int] =
    Array.tabulate(n)(i => math.round(amp * 32767.0 * math.sin(2 * math.Pi * hz * i / rate)).toInt)

  /** The decoder's waveform fold, recomputed independently on raw PCM. */
  private def stats(pcm: Array[Int], bits: Int): (Double, Double, Double, Double) = {
    val norm = (1L << (bits - 1)).toDouble
    var sumSq = 0.0; var sum = 0.0; var peak = 0.0
    var crossings = 0L; var prevSign = 0
    pcm.foreach { v =>
      val s = v / norm
      sumSq += s * s; sum += s
      val a = math.abs(s); if (a > peak) peak = a
      val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
      if (prevSign != 0 && sign != prevSign) crossings += 1
      prevSign = sign
    }
    (math.sqrt(sumSq / pcm.length), peak, crossings.toDouble / pcm.length, sum / pcm.length)
  }

  test("frame CRCs match the published check values (CRC-8/SMBUS 0xF4, CRC-16/UMTS 0xFEE8)") {
    val check = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(check, 0, check.length) == 0xF4)
    assert(Flac.crc16(check, 0, check.length) == 0xFEE8)
  }

  test("STREAMINFO parse: rate, channels, bps, total samples") {
    val bytes = Flac.encode(Array(sine(1000, 44100, 440, 0.5)), 44100)
    val si = Flac.parseStreamInfo(bytes)
    assert(si == Flac.StreamInfo(44100, 1, 16, 1000L))
  }

  test("FIXED-predictor round trip: decoded stats equal the PCM's exactly") {
    val pcm = sine(4096, 16000, 220, 0.8)
    val d = Flac.decode(Flac.encode(Array(pcm), 16000))
    assert(d.samplesDecoded == 4096L)
    val (rms, peak, zcr, dc) = stats(pcm, 16)
    assert(math.abs(d.rms - rms) < 1e-12 && math.abs(d.peak - peak) < 1e-12)
    assert(math.abs(d.zeroCrossRate - zcr) < 1e-12 && math.abs(d.dcOffset - dc) < 1e-12)
  }

  test("LPC subframes decode to the same samples as FIXED (coefficients [2,-1], shift 0)") {
    val pcm = sine(3000, 8000, 100, 0.6)
    val viaFixed = Flac.decode(Flac.encode(Array(pcm), 8000))
    val viaLpc = Flac.decode(Flac.encode(Array(pcm), 8000, lpc = true))
    assert(viaFixed.rms == viaLpc.rms && viaFixed.peak == viaLpc.peak)
    assert(viaFixed.zeroCrossRate == viaLpc.zeroCrossRate)
    assert(viaLpc.samplesDecoded == 3000L)
  }

  test("multi-frame streams: an odd tail block and frame numbers past one byte") {
    // 10 frames of 192 + a 57-sample tail; blockSize 192 keeps frames small
    val pcm = sine(1977, 22050, 440, 0.4)
    val d = Flac.decode(Flac.encode(Array(pcm), 22050, blockSize = 192))
    assert(d.samplesDecoded == 1977L)
    val (rms, _, _, _) = stats(pcm, 16)
    assert(math.abs(d.rms - rms) < 1e-12)
  }

  test("stereo independent channels: stats fold the FIRST channel, like WavCodec") {
    val left = sine(2048, 32000, 440, 0.9)
    val right = sine(2048, 32000, 220, 0.1)
    val d = Flac.decode(Flac.encode(Array(left, right), 32000))
    val (rmsL, peakL, _, _) = stats(left, 16)
    assert(d.info.channels == 2)
    assert(math.abs(d.rms - rmsL) < 1e-12)
    assert(math.abs(d.peak - peakL) < 1e-12)
  }

  test("two-sample blocks take the VERBATIM path and still round trip") {
    val pcm = Array(1234, -4321)
    val d = Flac.decode(Flac.encode(Array(pcm), 8000, blockSize = 4096))
    assert(d.samplesDecoded == 2L)
    assert(math.abs(d.peak - 4321.0 / 32768.0) < 1e-12)
  }

  test("FlacCodec emits the WavCodec 8-dim feature; WAV parity on identical PCM") {
    val rate = 16000
    val pcm = sine(rate, rate, 440, 0.5) // one second
    val flacBytes = Flac.encode(Array(pcm), rate)
    val flacFeat = MultimodalPipeline.FlacCodec.decodeBatch(Iterator(flacBytes)).next()

    // the same PCM as a WAV through javax.sound
    val bos = new java.io.ByteArrayOutputStream()
    val data = new Array[Byte](pcm.length * 2)
    pcm.zipWithIndex.foreach { case (v, i) =>
      data(2 * i) = (v & 0xFF).toByte; data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, pcm.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wavFeat = MultimodalPipeline.WavCodec.decodeBatch(Iterator(bos.toByteArray)).next()

    assert(flacFeat.length == 8 && wavFeat.length == 8)
    // rate, channels, bits, duration
    (0 until 4).foreach(i => assert(math.abs(flacFeat(i) - wavFeat(i)) < 1e-3,
      s"dim $i: flac=${flacFeat(i)} wav=${wavFeat(i)}"))
    // rms, peak, zcr, dc — identical samples, identical fold
    (4 until 8).foreach(i => assert(math.abs(flacFeat(i) - wavFeat(i)) < 1e-5,
      s"dim $i: flac=${flacFeat(i)} wav=${wavFeat(i)}"))
  }

  test("corrupt frame data degrades: FlacCodec nulls, AudioCodec falls back to the metadata row") {
    val bytes = Flac.encode(Array(sine(4096, 44100, 440, 0.5)), 44100)
    // flip a byte in the frame body (well past the 4+4+34 byte headers)
    val corrupt = bytes.clone()
    corrupt(60) = (corrupt(60) ^ 0x55).toByte
    assert(MultimodalPipeline.FlacCodec.decodeBatch(Iterator(corrupt)).next() == null)
    val viaAudio = MultimodalPipeline.AudioCodec.decodeBatch(Iterator(corrupt)).next()
    assert(viaAudio != null, "AudioCodec must degrade to the metadata row")
    assert(viaAudio(0) == 44100f && viaAudio(1) == 1f && viaAudio(2) == 16f)
    assert(viaAudio(4).isNaN, "waveform stats must be NaN on the degraded row")
    // intact bytes through AudioCodec get REAL waveform stats now
    val full = MultimodalPipeline.AudioCodec.decodeBatch(Iterator(bytes)).next()
    assert(!full(4).isNaN && full(4) > 0.3f && full(4) < 0.4f) // rms of 0.5-amp sine ~ 0.354
  }

  test("a trailing ID3v1 tag does not void the decode (total-sample bound stops the frame loop)") {
    val pcm = sine(2048, 16000, 440, 0.5)
    val tagged = Flac.encode(Array(pcm), 16000) ++
      ("TAG" + "x" * 125).getBytes("US-ASCII") // 128-byte ID3v1 trailer
    val d = Flac.decode(tagged)
    assert(d.samplesDecoded == 2048L)
    val viaCodec = MultimodalPipeline.FlacCodec.decodeBatch(Iterator(tagged)).next()
    assert(viaCodec != null && !viaCodec(4).isNaN, "sample stats must survive the trailer")
  }

  test("truncated and junk payloads null cleanly") {
    val bytes = Flac.encode(Array(sine(500, 8000, 100, 0.3)), 8000)
    assert(MultimodalPipeline.FlacCodec.decodeBatch(Iterator(bytes.take(30))).next() == null)
    assert(MultimodalPipeline.FlacCodec.decodeBatch(Iterator("not flac at all".getBytes)).next() == null)
    assert(MultimodalPipeline.FlacCodec.decodeBatch(Iterator(null)).next() == null)
  }
}

/** MP3 frame-header metadata (MPEG-1/2 Layer III, public layout). */
class Mp3MetaSpec extends AnyFunSuite {

  /** Build a conformant MP3 frame header + optional Xing frame count
    * + dummy payload. */
  private def mp3(version1: Boolean, rateIdx: Int, brIdx: Int, stereo: Boolean,
                  xingFrames: Option[Long], payloadBytes: Int,
                  id3: Boolean = false, crcProtected: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    if (id3) {
      bos.write("ID3".getBytes("US-ASCII"))
      bos.write(Array[Byte](3, 0, 0)) // version + flags
      // syncsafe size 20
      bos.write(Array[Byte](0, 0, 0, 20))
      bos.write(new Array[Byte](20))
    }
    // sync tail + version + layer III + protection bit (1 = NO crc)
    val h1 = 0xE0 | (if (version1) 0x3 else 0x2) << 3 | (1 << 1) | (if (crcProtected) 0 else 1)
    val h2 = (brIdx << 4) | (rateIdx << 2)
    val h3 = if (stereo) 0x00 else 0xC0
    bos.write(0xFF); bos.write(h1); bos.write(h2); bos.write(h3)
    if (crcProtected) bos.write(Array[Byte](0x12, 0x34)) // 2-byte frame CRC
    val sideInfo = if (version1) { if (stereo) 32 else 17 } else { if (stereo) 17 else 9 }
    bos.write(new Array[Byte](sideInfo))
    xingFrames match {
      case Some(n) =>
        bos.write("Xing".getBytes("US-ASCII"))
        bos.write(Array[Byte](0, 0, 0, 1)) // flags: frames present
        bos.write(Array[Byte](((n >> 24) & 0xFF).toByte, ((n >> 16) & 0xFF).toByte,
          ((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte))
      case None =>
    }
    bos.write(new Array[Byte](payloadBytes))
    bos.toByteArray
  }

  test("Xing VBR header gives the exact duration: frames x 1152 / rate") {
    // MPEG1, 44100 Hz, stereo, 100 frames -> 100*1152/44100 s = 2612 ms
    val b = mp3(version1 = true, rateIdx = 0, brIdx = 9, stereo = true,
      xingFrames = Some(100), payloadBytes = 500)
    val f = MultimodalPipeline.CompressedAudioMetaCodec.decodeBatch(Iterator(b)).next()
    assert(f(0) == 44100f && f(1) == 2f)
    assert(math.abs(f(3) - 100 * 1152 * 1000.0 / 44100.0) < 1.0, s"durMs=${f(3)}")
    assert(f(4).isNaN, "waveform stats stay NaN (metadata-only)")
  }

  test("CBR estimate from the first frame's bitrate; ID3v2 container skipped") {
    // MPEG2 (576 samples/frame), 16 kHz mono, bitrate idx 5 = 40 kbps,
    // 5000 payload bytes -> ~1000 ms
    val b = mp3(version1 = false, rateIdx = 2, brIdx = 5, stereo = false,
      xingFrames = None, payloadBytes = 5000, id3 = true)
    val f = MultimodalPipeline.CompressedAudioMetaCodec.decodeBatch(Iterator(b)).next()
    assert(f(0) == 16000f && f(1) == 1f)
    assert(f(3) > 900f && f(3) < 1150f, s"durMs=${f(3)}")
  }

  test("a CRC-protected stream's Xing header sits 2 bytes later and is still found") {
    val b = mp3(version1 = true, rateIdx = 0, brIdx = 9, stereo = true,
      xingFrames = Some(50), payloadBytes = 200, crcProtected = true)
    val f = MultimodalPipeline.CompressedAudioMetaCodec.decodeBatch(Iterator(b)).next()
    assert(math.abs(f(3) - 50 * 1152 * 1000.0 / 44100.0) < 1.0, s"durMs=${f(3)}")
  }

  test("a false sync in leading junk resyncs to the real header") {
    val real = mp3(version1 = true, rateIdx = 0, brIdx = 9, stereo = true,
      xingFrames = Some(10), payloadBytes = 50)
    // 0xFF 0xE6 passes the 11-bit sync test but its layer bits are
    // reserved — the parser must resync, not bail (placed FIRST so the
    // magic dispatch also routes on it)
    val junk = Array[Byte](0xFF.toByte, 0xE6.toByte, 0x00, 0x00, 0x41)
    val f = MultimodalPipeline.CompressedAudioMetaCodec.decodeBatch(
      Iterator(junk ++ real)).next()
    assert(f != null && f(0) == 44100f, "must resync past the false header")
  }

  test("AudioCodec routes MP3 to the metadata row; junk still nulls") {
    val b = mp3(version1 = true, rateIdx = 1, brIdx = 9, stereo = true,
      xingFrames = Some(48), payloadBytes = 100)
    val f = MultimodalPipeline.AudioCodec.decodeBatch(Iterator(b)).next()
    assert(f != null && f(0) == 48000f)
    assert(MultimodalPipeline.AudioCodec.decodeBatch(
      Iterator("plain text, no sync".getBytes("UTF-8"))).next() == null)
    // reserved version bits (0b01) and a free-format bitrate must not crash
    val bad = b.clone(); bad(1) = (bad(1) & ~0x18).toByte // version bits 00 = MPEG2.5 ok
    assert(MultimodalPipeline.CompressedAudioMetaCodec.decodeBatch(Iterator(bad)).next() != null)
  }
}

/** Multi-partition rice residuals (partition order > 0). */
class FlacPartitionSpec extends AnyFunSuite {
  private def sine(n: Int, rate: Int, hz: Double, amp: Double): Array[Int] =
    Array.tabulate(n)(i => math.round(amp * 32767.0 * math.sin(2 * math.Pi * hz * i / rate)).toInt)

  test("partition order 2 decodes identically to order 0 (first partition short by the predictor order)") {
    val pcm = sine(4096, 16000, 330, 0.7)
    val flat = Flac.decode(Flac.encode(Array(pcm), 16000))
    val parts = Flac.decode(Flac.encode(Array(pcm), 16000, ricePartitionOrder = 2))
    assert(flat.rms == parts.rms && flat.peak == parts.peak && flat.dcOffset == parts.dcOffset)
    assert(parts.samplesDecoded == 4096L)
  }

  test("a tail block that does not divide into partitions falls back to one partition") {
    val pcm = sine(4100, 8000, 200, 0.5) // 4096 + 4-sample tail
    val d = Flac.decode(Flac.encode(Array(pcm), 8000, ricePartitionOrder = 3))
    assert(d.samplesDecoded == 4100L)
  }
}
