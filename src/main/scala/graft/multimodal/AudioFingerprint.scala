package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Acoustic fingerprinting + audio near-duplicate detection — the
 * audio leg of the dedup family, completing the text (SimHash) /
 * image (pHash) / audio symmetry over one shared banding plan. A
 * crawl's audio duplicates are rarely byte-identical: the same
 * recording re-encoded (FLAC vs WAV, different sample rates, 8 vs
 * 16 bit) or re-levelled (gain normalization). The 64-bit hash here
 * is the spectral-envelope variant of the public Haitsma–Kalker
 * fingerprint (ISMIR 2002): decode → mono → resample to a fixed
 * 8 kHz grid → Hann-windowed FFT frames → 65 log-spaced band
 * energies accumulated over the clip → bit b = E(b) > E(b+1).
 * Adjacent-band energy ORDER is invariant under gain (uniform
 * scaling), bit depth (quantization noise sits far below band
 * energy), container (same PCM) and resampling (bands are fixed in
 * Hz below both Nyquists), which is exactly the transform set that
 * defeats byte-exact dedup.
 *
 * Scale shape: fingerprinting is per-row DSP inside the scan
 * (mapPartitions — one decoded clip in flight per row, frames
 * streamed through two reusable FFT buffers); candidate generation
 * is [[graft.operators.Dedup.hammingCandidates]], so everything
 * that shuffles is (id, 8-byte hash) — samples never leave the
 * task, same as pixels in [[ImageHash]].
 */
object AudioFingerprint {

  private[multimodal] val TargetRate = 8000.0
  private[multimodal] val FrameSize = 2048 // 3.9 Hz/bin at 8 kHz
  private val Hop = 1024
  private val Bands = 65 // 64 adjacent comparisons = 64 bits
  private[multimodal] val FMin = 200.0
  private[multimodal] val FMax = 3600.0

  private[multimodal] lazy val hann: Array[Double] =
    Array.tabulate(FrameSize)(i => 0.5 - 0.5 * math.cos(2 * math.Pi * i / (FrameSize - 1)))

  /** Log-spaced band edges in Hz; band b covers [edge(b), edge(b+1)). */
  private lazy val bandEdges: Array[Double] =
    Array.tabulate(Bands + 1)(k => FMin * math.pow(FMax / FMin, k.toDouble / Bands))

  /** Per-band FFT bin ranges [lo, hi) at the fixed analysis grid. */
  private lazy val bandBins: Array[(Int, Int)] = Array.tabulate(Bands) { b =>
    val binHz = TargetRate / FrameSize
    val lo = math.max(1, math.ceil(bandEdges(b) / binHz).toInt)
    val hi = math.min(FrameSize / 2, math.ceil(bandEdges(b + 1) / binHz).toInt)
    (lo, math.max(hi, lo + 1)) // every band integrates at least one bin
  }

  /** Geometric center frequency of band b — used by the synthetic
    * fixture so each band carries its own deterministic tone. */
  private[multimodal] def bandCenter(b: Int): Double =
    math.sqrt(bandEdges(b) * bandEdges(b + 1))

  /** In-place iterative radix-2 Cooley–Tukey FFT (n = power of two). */
  private[multimodal] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      val half = len >> 1
      var s = 0
      while (s < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < half) {
          val ur = re(s + k); val ui = im(s + k)
          val xr = re(s + k + half); val xi = im(s + k + half)
          val vr = xr * cr - xi * ci
          val vi = xr * ci + xi * cr
          re(s + k) = ur + vr; im(s + k) = ui + vi
          re(s + k + half) = ur - vr; im(s + k + half) = ui - vi
          val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** Decode encoded audio bytes to (mono samples in [-1,1], rate):
    * WAV/AIFF via javax.sound (signed AND unsigned PCM decoded per
    * their declared encoding; ULAW/ALAW routed through the platform
    * PCM converter), FLAC via [[Flac.decode]]. None for undecodable
    * payloads — crawl bytes lie. */
  private[multimodal] def pcmMono(bytes: Array[Byte]): Option[(Array[Double], Int)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes == null || bytes.length < 12) return None
    try {
      if (bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C') {
        val (info, mono) = Flac.decodePcmMono(bytes)
        Some((mono, info.sampleRate))
      } else {
        val raw = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        // non-linear encodings (ULAW/ALAW) decoded as raw bytes would
        // be spectral garbage — convert to linear 16-bit signed first
        val srcEnc = raw.getFormat.getEncoding
        val in =
          if (srcEnc == AudioFormat.Encoding.PCM_SIGNED ||
              srcEnc == AudioFormat.Encoding.PCM_UNSIGNED) raw
          else AudioSystem.getAudioInputStream(
            new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
              raw.getFormat.getSampleRate, 16, raw.getFormat.getChannels,
              raw.getFormat.getChannels * 2, raw.getFormat.getSampleRate, false), raw)
        try {
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          if (bits != 16 && bits != 8) return None
          // 8-bit WAV is unsigned, 8-bit AIFF is signed — trusting the
          // container's declared encoding is the difference between a
          // clean decode and a +2.0 discontinuity on negative samples
          val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
          val ch = fmt.getChannels
          val frameBytes = fmt.getFrameSize
          val buf = new Array[Byte](frameBytes * 4096)
          val acc = new scala.collection.mutable.ArrayBuffer[Double](16384)
          var read = in.read(buf)
          while (read > 0) {
            var off = 0
            while (off + frameBytes <= read) {
              var s = 0.0; var c = 0
              while (c < ch) {
                val o = off + c * (bits / 8)
                s += (if (bits == 16) {
                  val v = if (fmt.isBigEndian) ((buf(o) << 8) | (buf(o + 1) & 0xFF))
                          else ((buf(o + 1) << 8) | (buf(o) & 0xFF))
                  if (signed) v.toShort / 32768.0
                  else ((v & 0xFFFF) - 32768) / 32768.0
                } else {
                  if (signed) buf(o) / 128.0
                  else (buf(o) & 0xFF) / 128.0 - 1.0
                })
                c += 1
              }
              acc += s / ch
              off += frameBytes
            }
            read = in.read(buf)
          }
          if (acc.isEmpty) None else Some((acc.toArray, fmt.getSampleRate.toInt))
        } finally in.close()
      }
    } catch { case _: Exception => None }
  }

  /** 64-bit spectral-envelope fingerprint of mono PCM. Clips shorter
    * than one analysis frame are zero-padded to one frame. Rates
    * below 2×FMax cannot carry the full band grid (the top bands
    * would integrate nothing but resampling images) — they return
    * null rather than a hash that can never match a full-band twin. */
  def fingerprint64(samples: Array[Double], rate: Int): java.lang.Long = {
    if (samples == null || samples.length == 0 || rate < 2 * FMax) return null
    val x = resampleToGrid(samples, rate)
    val outLen = x.length
    fingerprintResampled(x, outLen)
  }

  /** Resample mono PCM onto the fixed 8 kHz analysis grid (callers
    * guarantee rate ≥ 2×FMax and non-empty input; output is padded to
    * at least one analysis frame). Shared by the clip fingerprint and
    * the sub-fingerprint stream so both see identical samples. */
  private[multimodal] def resampleToGrid(samples: Array[Double], rate: Int): Array[Double] = {
    val ratio = rate / TargetRate
    val outLen = math.max(FrameSize, (samples.length / ratio).toInt)
    val x = new Array[Double](outLen)
    if (ratio <= 1.0) {
      // upsampling: no aliasing possible, linear interpolation suffices
      var i = 0
      while (i < outLen) {
        val pos = i * ratio
        val j = pos.toInt
        val frac = pos - j
        val a = if (j < samples.length) samples(j) else 0.0
        val b = if (j + 1 < samples.length) samples(j + 1) else a
        x(i) = a + (b - a) * frac
        i += 1
      }
    } else {
      // decimation MUST low-pass first: a 44.1 kHz source with energy
      // above 4 kHz would alias it straight into the band grid and
      // flip band-order bits its properly-encoded low-rate twin
      // doesn't have. Windowed-sinc kernel, cutoff at FMax (3.6 kHz
      // — only [FMin, FMax) is analyzed, so the passband edge rides
      // ON the top band edge), unity-DC-normalized per output sample.
      val fn = FMax / rate // cutoff in cycles per input sample
      val half = math.ceil(2.5 * ratio).toInt
      var i = 0
      while (i < outLen) {
        val center = i * ratio
        val j0 = math.max(0, math.ceil(center - half).toInt)
        val j1 = math.min(samples.length - 1, math.floor(center + half).toInt)
        var acc = 0.0; var wsum = 0.0
        var j = j0
        while (j <= j1) {
          val t = j - center
          val sinc = if (t == 0.0) 1.0 else {
            val a = 2 * math.Pi * fn * t
            math.sin(a) / a
          }
          val w = sinc * (0.5 + 0.5 * math.cos(math.Pi * t / (half + 1)))
          acc += samples(j) * w
          wsum += w
          j += 1
        }
        x(i) = if (wsum > 1e-12) acc / wsum else 0.0
        i += 1
      }
    }
    x
  }

  private def fingerprintResampled(x: Array[Double], outLen: Int): java.lang.Long = {
    val energy = new Array[Double](Bands)
    val re = new Array[Double](FrameSize)
    val im = new Array[Double](FrameSize)
    var start = 0
    var frames = 0
    while (start + FrameSize <= outLen) {
      var k = 0
      while (k < FrameSize) { re(k) = x(start + k) * hann(k); im(k) = 0.0; k += 1 }
      fft(re, im)
      var b = 0
      while (b < Bands) {
        val (lo, hi) = bandBins(b)
        var e = 0.0; var bin = lo
        while (bin < hi) { e += re(bin) * re(bin) + im(bin) * im(bin); bin += 1 }
        energy(b) += e
        b += 1
      }
      frames += 1
      start += Hop
    }
    if (frames == 0) return null
    var h = 0L
    var b = 0
    while (b < 64) {
      if (energy(b) > energy(b + 1)) h |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(h)
  }

  /** Fingerprint encoded bytes; null for undecodable payloads. */
  def fingerprint64(bytes: Array[Byte]): java.lang.Long =
    pcmMono(bytes) match {
      case Some((samples, rate)) => fingerprint64(samples, rate)
      case None => null
    }

  /** Add a fingerprint column `sh` keyed by `doc_id` — the
    * (id, 8-byte hash) frame [[graft.operators.Dedup.hammingCandidates]]
    * consumes. Per-row DSP — a legitimate mapPartitions site. */
  def withFingerprint(media: DataFrame, contentCol: String = "content",
                      idCol: String = "media_id"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sh", LongType, nullable = true)))
    val rdd = media.select(col(idCol).cast(LongType), col(contentCol)).rdd.mapPartitions {
      rows =>
        rows.flatMap { r =>
          if (r.isNullAt(0)) Nil
          else Seq(Row(r.getLong(0), fingerprint64(r.getAs[Array[Byte]](1))))
        }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Audio near-duplicate candidate pairs over the shared hamming
    * banding plan. Undecodable rows drop out; the pair set is
    * transitively complete — feed it to [[graft.operators.DupGroups]]. */
  def nearDups(media: DataFrame, contentCol: String = "content",
               idCol: String = "media_id",
               maxHamming: Int = 4, maxBucket: Int = 1000): DataFrame = {
    val hashed = withFingerprint(media, contentCol, idCol).where(col("sh").isNotNull)
    graft.operators.Dedup.hammingCandidates(hashed, maxHamming, maxBucket)
  }

  // ---- deterministic fixtures ------------------------------------

  /** Quantized per-band tone gains for a clip id: 4 levels with
    * adjacent bands forced to DIFFERENT levels, so every adjacent
    * band-energy comparison is decided by a ≥1.78× energy ratio —
    * far above resampling/quantization perturbation — and the
    * resulting 64 bits are a deterministic function of the id. */
  private[multimodal] def bandGains(id: Long): Array[Double] = {
    val levels = Array(0.25, 0.5, 0.75, 1.0)
    val out = new Array[Double](Bands)
    var prev = -1
    var b = 0
    while (b < Bands) {
      var mix = id * 0x9E3779B97F4A7C15L + b.toLong * 0xBF58476D1CE4E5B9L
      mix ^= (mix >>> 31); mix *= 0x94D049BB133111EBL; mix ^= (mix >>> 29)
      var lvl = ((mix >>> 3) % 4).toInt
      if (lvl < 0) lvl += 4
      if (lvl == prev) lvl = (lvl + 1) % 4
      out(b) = levels(lvl)
      prev = lvl
      b += 1
    }
    out
  }

  /** Deterministic broad-spectrum test clip: one tone per analysis
    * band at the band's center frequency with [[bandGains]]
    * amplitudes, encoded as PCM WAV at the requested rate/depth/gain.
    * The same id at ANY (rate ≥ 8 kHz, bits, gain) fingerprints to
    * (nearly) the same hash — the re-encoding family the operator
    * exists to catch — while different ids disagree on ~half the
    * band comparisons. */
  def toneClipWav(id: Long, sampleRate: Int, bits: Int, gain: Double,
                  durationMs: Int = 400): Array[Byte] = {
    require(bits == 8 || bits == 16, "PCM 8/16-bit only")
    val n = sampleRate * durationMs / 1000
    val gains = bandGains(id)
    val freqs = Array.tabulate(Bands)(bandCenter)
    val raw = new Array[Double](n)
    var peak = 0.0
    var j = 0
    while (j < n) {
      var s = 0.0; var b = 0
      while (b < Bands) {
        s += gains(b) * math.sin(2 * math.Pi * freqs(b) * j / sampleRate)
        b += 1
      }
      raw(j) = s
      val a = math.abs(s); if (a > peak) peak = a
      j += 1
    }
    val scale = if (peak > 0) gain / peak else 0.0
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    val dataLen = n * (bits / 8)
    def le32(v: Int): Unit = { d.write(v & 0xFF); d.write((v >> 8) & 0xFF); d.write((v >> 16) & 0xFF); d.write((v >> 24) & 0xFF) }
    def le16(v: Int): Unit = { d.write(v & 0xFF); d.write((v >> 8) & 0xFF) }
    d.writeBytes("RIFF"); le32(36 + dataLen); d.writeBytes("WAVE")
    d.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(sampleRate)
    le32(sampleRate * (bits / 8)); le16(bits / 8); le16(bits)
    d.writeBytes("data"); le32(dataLen)
    j = 0
    while (j < n) {
      val s = raw(j) * scale
      if (bits == 16) le16((s * 32767.0).round.toInt & 0xFFFF)
      else d.write(((s * 127.0).round.toInt + 128) & 0xFF)
      j += 1
    }
    d.flush()
    bos.toByteArray
  }
}
