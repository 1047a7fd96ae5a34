package graft.multimodal

/**
 * Pure-JVM FLAC sample decoder (the public format, RFC 9639 /
 * xiph.org/flac/format.html) — upgrades the compressed-audio seam
 * from metadata-real to SAMPLE-real for the lossless container a
 * crawl actually carries. No codec library: bit-level rice coding,
 * fixed and LPC predictors, inter-channel decorrelation and both
 * frame CRCs are implemented from the specification.
 *
 * The decoder streams frame by frame and folds waveform statistics
 * as it goes — an hour-long file never materializes more than one
 * block (≤ 65,535 samples) of decoded audio, the same bounded-memory
 * contract as [[MultimodalPipeline.WavCodec]]. Corrupt input throws;
 * the codec wrapper maps that to a null feature row.
 */
object Flac {

  /** MSB-first bit reader. */
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    /** Jump to a byte offset (metadata skip) without per-bit calls. */
    def seekByte(byteOffset: Int): Unit = pos = byteOffset << 3
    def bytePos: Int = pos >> 3
    def bitAligned: Boolean = (pos & 7) == 0
    def atEnd: Boolean = pos >= (b.length << 3)
    def remainingBits: Long = (b.length.toLong << 3) - pos

    def bit(): Int = {
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def bits(n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def signedBits(n: Int): Long = {
      val v = bits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Count of 0-bits before the terminating 1-bit. */
    def unary(): Int = {
      var n = 0
      while (bit() == 0) n += 1
      n
    }
    def align(): Unit = pos = (pos + 7) & ~7
  }

  // CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0 (the FLAC frame CRCs)
  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF; k += 1 }
      i += 1
    }
    crc
  }
  private[multimodal] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF else (crc << 1) & 0xFFFF; k += 1 }
      i += 1
    }
    crc
  }

  final case class StreamInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                              totalSamples: Long)

  /** Folded waveform statistics over the decoded first channel —
    * the [[MultimodalPipeline.WavCodec]] feature contract. */
  final case class Decoded(info: StreamInfo, samplesDecoded: Long,
                           rms: Double, peak: Double, zeroCrossRate: Double, dcOffset: Double)

  def parseStreamInfo(b: Array[Byte]): StreamInfo = {
    require(b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C',
      "not a FLAC stream")
    var i = 4
    while (i + 4 <= b.length) {
      val header = b(i) & 0xFF
      val blockType = header & 0x7F
      val len = ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
      if (blockType == 0) {
        require(len >= 34, s"STREAMINFO too short: $len")
        val o = i + 4
        val rate = ((b(o + 10) & 0xFF) << 12) | ((b(o + 11) & 0xFF) << 4) | ((b(o + 12) & 0xF0) >> 4)
        val ch = ((b(o + 12) & 0x0E) >> 1) + 1
        val bps = (((b(o + 12) & 0x01) << 4) | ((b(o + 13) & 0xF0) >> 4)) + 1
        val total = ((b(o + 13) & 0x0FL) << 32) | ((b(o + 14) & 0xFFL) << 24) |
          ((b(o + 15) & 0xFFL) << 16) | ((b(o + 16) & 0xFFL) << 8) | (b(o + 17) & 0xFFL)
        return StreamInfo(rate, ch, bps, total)
      }
      if ((header & 0x80) != 0) i = b.length // was last block and not STREAMINFO
      else i += 4 + len
    }
    throw new IllegalArgumentException("FLAC: STREAMINFO block not found")
  }

  /** Byte offset of the first audio frame (after all metadata blocks). */
  private def firstFrameOffset(b: Array[Byte]): Int = {
    var i = 4
    while (true) {
      require(i + 4 <= b.length, "FLAC: ran out of metadata")
      val header = b(i) & 0xFF
      val len = ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
      i += 4 + len
      if ((header & 0x80) != 0) return i
    }
    i
  }

  /** Decode every frame, folding first-channel waveform statistics. */
  def decode(b: Array[Byte]): Decoded = {
    val info = parseStreamInfo(b)
    val start = firstFrameOffset(b)
    val r = new BitReader(b)
    r.seekByte(start)

    var n = 0L; var sumSq = 0.0; var sum = 0.0
    var peak = 0.0; var crossings = 0L; var prevSign = 0
    val norm = (1L << (info.bitsPerSample - 1)).toDouble

    // STREAMINFO's total-sample count bounds the frame loop, so a
    // trailing ID3v1 tag (128 'TAG...' bytes, routine in crawled
    // audio) does not read as a corrupt frame and void the decode;
    // when the total is unknown (0), frames run to EOF and trailing
    // garbage fails loudly
    while (r.remainingBits >= 16 && (info.totalSamples == 0L || n < info.totalSamples)) {
      val frameStart = r.bytePos
      val block = decodeFrame(r, info, b, frameStart)
      val first = block(0)
      var i = 0
      while (i < first.length) {
        val s = first(i) / norm
        n += 1; sumSq += s * s; sum += s
        val a = math.abs(s); if (a > peak) peak = a
        val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
        i += 1
      }
    }
    require(n > 0, "FLAC: no audio frames decoded")
    Decoded(info, n, math.sqrt(sumSq / n), peak,
      if (n == 0) 0.0 else crossings.toDouble / n, sum / n)
  }

  /** Decode to channel-averaged mono samples in [-1, 1], capped at
    * `maxSamples` (fingerprinting reads a bounded clip prefix — an
    * hour-long FLAC never materializes whole). Same ID3v1-tolerant
    * frame loop as [[decode]]. */
  def decodePcmMono(b: Array[Byte], maxSamples: Int = 1 << 22): (StreamInfo, Array[Double]) = {
    val info = parseStreamInfo(b)
    val start = firstFrameOffset(b)
    val r = new BitReader(b)
    r.seekByte(start)
    val norm = (1L << (info.bitsPerSample - 1)).toDouble
    val cap = if (info.totalSamples > 0) math.min(info.totalSamples, maxSamples.toLong).toInt
              else maxSamples
    val acc = new scala.collection.mutable.ArrayBuffer[Double](math.min(cap, 1 << 16))
    var n = 0L
    while (r.remainingBits >= 16 && acc.length < cap &&
           (info.totalSamples == 0L || n < info.totalSamples)) {
      val frameStart = r.bytePos
      val block = decodeFrame(r, info, b, frameStart)
      val ch = block.length
      val len = block(0).length
      var i = 0
      while (i < len && acc.length < cap) {
        var s = 0.0; var c = 0
        while (c < ch) { s += block(c)(i); c += 1 }
        acc += s / (norm * ch)
        i += 1
      }
      n += len
    }
    require(acc.nonEmpty, "FLAC: no audio frames decoded")
    (info, acc.toArray)
  }

  /** One frame: returns channels × blockSize samples. */
  private def decodeFrame(r: BitReader, info: StreamInfo,
                          raw: Array[Byte], frameStart: Int): Array[Array[Long]] = {
    val sync = r.bits(14)
    require(sync == 0x3FFE, f"FLAC: bad frame sync 0x$sync%04x at byte $frameStart")
    r.bit() // reserved
    r.bit() // blocking strategy
    val bsCode = r.bits(4).toInt
    val rateCode = r.bits(4).toInt
    val chCode = r.bits(4).toInt
    val ssCode = r.bits(3).toInt
    require(r.bit() == 0, "FLAC: reserved frame-header bit set")
    // UTF-8-coded frame/sample number: parse the length, skip the payload
    val lead = r.bits(8).toInt
    val extra =
      if (lead < 0x80) 0
      else if ((lead & 0xE0) == 0xC0) 1
      else if ((lead & 0xF0) == 0xE0) 2
      else if ((lead & 0xF8) == 0xF0) 3
      else if ((lead & 0xFC) == 0xF8) 4
      else if ((lead & 0xFE) == 0xFC) 5
      else if (lead == 0xFE) 6
      else throw new IllegalArgumentException(s"FLAC: bad coded-number lead byte $lead")
    (0 until extra).foreach(_ => r.bits(8))

    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("FLAC: reserved block size code 0")
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.bits(8).toInt + 1
      case 7 => r.bits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    rateCode match {
      case 12 => r.bits(8)
      case 13 | 14 => r.bits(16)
      case _ => // from code table or STREAMINFO; value unused here
    }
    val bps = ssCode match {
      case 0 => info.bitsPerSample
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case c => throw new IllegalArgumentException(s"FLAC: reserved sample size code $c")
    }
    // CRC-8 covers the header from the sync byte up to here
    val headerEnd = r.bytePos
    val expectedCrc8 = r.bits(8).toInt
    require(crc8(raw, frameStart, headerEnd) == expectedCrc8,
      s"FLAC: frame header CRC mismatch at byte $frameStart")

    val channels = if (chCode <= 7) chCode + 1 else 2
    val out = Array.ofDim[Array[Long]](channels)
    var ch = 0
    while (ch < channels) {
      // side channels carry one extra bit
      val chBps = chCode match {
        case 8 => if (ch == 1) bps + 1 else bps  // left/side
        case 9 => if (ch == 0) bps + 1 else bps  // right/side
        case 10 => if (ch == 1) bps + 1 else bps // mid/side
        case _ => bps
      }
      out(ch) = decodeSubframe(r, blockSize, chBps)
      ch += 1
    }
    // inter-channel decorrelation
    chCode match {
      case 8 => // left/side: right = left - side
        val l = out(0); val s = out(1)
        val rch = new Array[Long](blockSize)
        var i = 0; while (i < blockSize) { rch(i) = l(i) - s(i); i += 1 }
        out(1) = rch
      case 9 => // right/side: left = right + side
        val s = out(0); val rr = out(1)
        val lch = new Array[Long](blockSize)
        var i = 0; while (i < blockSize) { lch(i) = rr(i) + s(i); i += 1 }
        out(0) = lch; out(1) = rr
      case 10 => // mid/side
        val m = out(0); val s = out(1)
        val lch = new Array[Long](blockSize); val rch = new Array[Long](blockSize)
        var i = 0
        while (i < blockSize) {
          val mid2 = (m(i) << 1) | (s(i) & 1L)
          lch(i) = (mid2 + s(i)) >> 1
          rch(i) = (mid2 - s(i)) >> 1
          i += 1
        }
        out(0) = lch; out(1) = rch
      case _ =>
    }
    // frame footer: byte-align, then CRC-16 of the whole frame
    r.align()
    val footerPos = r.bytePos
    val expectedCrc16 = r.bits(16).toInt
    require(crc16(raw, frameStart, footerPos) == expectedCrc16,
      s"FLAC: frame CRC-16 mismatch at byte $frameStart")
    out
  }

  private def decodeSubframe(r: BitReader, blockSize: Int, bps: Int): Array[Long] = {
    require(r.bit() == 0, "FLAC: subframe padding bit set")
    val tpe = r.bits(6).toInt
    val wastedFlag = r.bit()
    val wasted = if (wastedFlag == 1) r.unary() + 1 else 0
    val effBps = bps - wasted
    val out: Array[Long] = tpe match {
      case 0 => // CONSTANT
        val v = r.signedBits(effBps)
        Array.fill(blockSize)(v)
      case 1 => // VERBATIM
        val a = new Array[Long](blockSize)
        var i = 0; while (i < blockSize) { a(i) = r.signedBits(effBps); i += 1 }
        a
      case t if t >= 8 && t <= 12 => // FIXED, order t-8
        val order = t - 8
        val a = new Array[Long](blockSize)
        var i = 0; while (i < order) { a(i) = r.signedBits(effBps); i += 1 }
        decodeResidual(r, blockSize, order, a)
        i = order
        while (i < blockSize) {
          a(i) += (order match {
            case 0 => 0L
            case 1 => a(i - 1)
            case 2 => 2 * a(i - 1) - a(i - 2)
            case 3 => 3 * a(i - 1) - 3 * a(i - 2) + a(i - 3)
            case 4 => 4 * a(i - 1) - 6 * a(i - 2) + 4 * a(i - 3) - a(i - 4)
          })
          i += 1
        }
        a
      case t if t >= 32 => // LPC, order (t & 31) + 1
        val order = (t & 0x1F) + 1
        val a = new Array[Long](blockSize)
        var i = 0; while (i < order) { a(i) = r.signedBits(effBps); i += 1 }
        val precision = r.bits(4).toInt + 1
        require(precision <= 15, "FLAC: invalid LPC precision")
        val shift = r.signedBits(5).toInt
        require(shift >= 0, "FLAC: negative LPC shift is reserved")
        val coefs = Array.fill(order)(r.signedBits(precision))
        decodeResidual(r, blockSize, order, a)
        i = order
        while (i < blockSize) {
          var acc = 0L; var j = 0
          while (j < order) { acc += coefs(j) * a(i - 1 - j); j += 1 }
          a(i) += (acc >> shift)
          i += 1
        }
        a
      case t => throw new IllegalArgumentException(s"FLAC: reserved subframe type $t")
    }
    if (wasted > 0) {
      var i = 0; while (i < out.length) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual into a(order until blockSize). */
  private def decodeResidual(r: BitReader, blockSize: Int, order: Int,
                             a: Array[Long]): Unit = {
    val method = r.bits(2).toInt
    require(method <= 1, s"FLAC: reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val partitionOrder = r.bits(4).toInt
    val partitions = 1 << partitionOrder
    require(blockSize % partitions == 0, "FLAC: partitions do not divide block size")
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = (blockSize >> partitionOrder) - (if (p == 0) order else 0)
      val param = r.bits(paramBits).toInt
      if (param == escape) {
        val width = r.bits(5).toInt
        var i = 0
        while (i < count) { a(idx) = if (width == 0) 0L else r.signedBits(width); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary().toLong
          val u = (q << param) | r.bits(param)
          a(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  // ── fixture encoder ──────────────────────────────────────────────

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var nbits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); nbits += 1
      if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit(((v >> k) & 1L).toInt); k -= 1 }
    }
    def unary(n: Int): Unit = { (0 until n).foreach(_ => bit(0)); bit(1) }
    def align(): Unit = while (nbits != 0) bit(0)
    def toBytes: Array[Byte] = { require(nbits == 0, "unaligned"); buf.toByteArray }
  }

  /**
   * Minimal conformant encoder for test fixtures and gates: 16-bit
   * PCM, independent channels, FIXED order-2 predictor with a single
   * rice partition — enough to exercise the decoder's rice coding,
   * predictors, CRCs and multi-frame loop against real bitstreams.
   * `lpc = true` emits the order-2 predictor as an explicit LPC
   * subframe (coefficients [2, -1], shift 0 — bit-identical residuals)
   * so the decoder's LPC path is pinned by the same fixtures.
   * (Production crawls DECODE; nothing in the pipeline encodes FLAC.)
   */
  def encode(samples: Array[Array[Int]], sampleRate: Int, blockSize: Int = 4096,
             lpc: Boolean = false, ricePartitionOrder: Int = 0): Array[Byte] = {
    val channels = samples.length
    require(channels >= 1 && channels <= 8, "1..8 channels")
    val total = samples(0).length.toLong
    require(samples.forall(_.length == total), "equal-length channels")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    si.bits(blockSize.toLong, 16); si.bits(blockSize.toLong, 16) // min/max block size
    si.bits(0L, 24); si.bits(0L, 24)                             // min/max frame size unknown
    si.bits(sampleRate.toLong, 20)
    si.bits((channels - 1).toLong, 3)
    si.bits(15L, 5)                                              // bps - 1 = 16-bit
    si.bits(total, 36)
    (0 until 16).foreach(_ => si.bits(0L, 8))                    // MD5 unknown
    val siBytes = si.toBytes
    out.write(0x80)                                              // last-block flag + type 0
    out.write((siBytes.length >> 16) & 0xFF); out.write((siBytes.length >> 8) & 0xFF)
    out.write(siBytes.length & 0xFF)
    out.write(siBytes)

    var frameNo = 0L
    var off = 0
    while (off < total) {
      val n = math.min(blockSize.toLong, total - off).toInt
      out.write(encodeFrame(samples, off, n, frameNo, lpc,
        // a short tail block may not divide into 2^po partitions
        if (n % (1 << ricePartitionOrder) == 0) ricePartitionOrder else 0))
      off += n; frameNo += 1
    }
    out.toByteArray
  }

  private def encodeFrame(samples: Array[Array[Int]], off: Int, n: Int,
                          frameNo: Long, lpc: Boolean, po: Int): Array[Byte] = {
    val w = new BitWriter
    w.bits(0x3FFE, 14) // sync
    w.bit(0)           // reserved
    w.bit(0)           // fixed block size strategy
    w.bits(7L, 4)      // block size: 16-bit value follows
    w.bits(0L, 4)      // sample rate: from STREAMINFO
    w.bits((samples.length - 1).toLong, 4) // independent channels
    w.bits(4L, 3)      // sample size: 16-bit
    w.bit(0)           // reserved
    // UTF-8-coded frame number (fixtures stay below 2^31 frames)
    encodeCodedNumber(w, frameNo)
    w.bits((n - 1).toLong, 16)
    w.align()
    val headBytes = w.toBytes
    val head2 = new java.io.ByteArrayOutputStream()
    head2.write(headBytes)
    head2.write(crc8(headBytes, 0, headBytes.length))

    val body = new BitWriter
    samples.foreach { ch =>
      // subframe header: FIXED order 2 (or verbatim for tiny blocks)
      body.bit(0)
      if (n > 2) {
        if (lpc) body.bits((32 + 1).toLong, 6) // LPC, order 2 (code 32 + order-1)
        else body.bits((8 + 2).toLong, 6)      // FIXED, order 2
        body.bit(0)                  // no wasted bits
        body.bits(ch(off).toLong & 0xFFFF, 16)
        body.bits(ch(off + 1).toLong & 0xFFFF, 16)
        if (lpc) {
          body.bits(2L, 4)           // precision - 1 = 2 -> 3-bit coefficients
          body.bits(0L, 5)           // shift 0
          body.bits(2L & 0x7, 3)     // c1 = 2
          body.bits(-1L & 0x7, 3)    // c2 = -1  (same predictor as FIXED order 2)
        }
        // residuals, one partition, rice method 0
        val res = new Array[Long](n - 2)
        var i = 2
        while (i < n) {
          res(i - 2) = ch(off + i).toLong - 2L * ch(off + i - 1) + ch(off + i - 2)
          i += 1
        }
        val mean = if (res.isEmpty) 0.0 else res.map(v => math.abs(v).toDouble).sum / res.length
        val param = math.min(14, math.max(0, (math.log(mean + 1) / math.log(2)).toInt))
        body.bits(0L, 2)      // rice method 0 (4-bit params)
        body.bits(po.toLong, 4) // partition order (same param in every partition)
        val partitions = 1 << po
        var resIdx = 0
        var part = 0
        while (part < partitions) {
          val count = (n >> po) - (if (part == 0) 2 else 0)
          body.bits(param.toLong, 4)
          var k = 0
          while (k < count) {
            val v = res(resIdx)
            val u = (v << 1) ^ (v >> 63) // zigzag
            body.unary((u >>> param).toInt)
            body.bits(u & ((1L << param) - 1), param)
            resIdx += 1; k += 1
          }
          part += 1
        }
      } else {
        body.bits(1L, 6) // VERBATIM
        body.bit(0)
        (0 until n).foreach(i => body.bits(ch(off + i).toLong & 0xFFFF, 16))
      }
    }
    body.align()
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(head2.toByteArray)
    frame.write(body.toBytes)
    val all = frame.toByteArray
    val c16 = crc16(all, 0, all.length)
    frame.write((c16 >> 8) & 0xFF); frame.write(c16 & 0xFF)
    frame.toByteArray
  }

  private def encodeCodedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.bits(v, 8)
    else if (v < 0x800) {
      w.bits(0xC0L | (v >> 6), 8); w.bits(0x80L | (v & 0x3F), 8)
    } else if (v < 0x10000) {
      w.bits(0xE0L | (v >> 12), 8); w.bits(0x80L | ((v >> 6) & 0x3F), 8)
      w.bits(0x80L | (v & 0x3F), 8)
    } else {
      require(v < (1L << 21), "fixture encoder: frame number too large")
      w.bits(0xF0L | (v >> 18), 8); w.bits(0x80L | ((v >> 12) & 0x3F), 8)
      w.bits(0x80L | ((v >> 6) & 0x3F), 8); w.bits(0x80L | (v & 0x3F), 8)
    }
  }
}
