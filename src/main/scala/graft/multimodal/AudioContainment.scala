package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Audio containment search — find a short clip INSIDE longer
 * recordings (the jingle/sample/rebroadcast case), offset-invariant
 * where [[AudioFingerprint]] is whole-clip: a 10-second ad embedded
 * at minute 37 of a podcast shares no clip-level hash with it, but
 * its frame-level sub-fingerprints match the podcast's at ONE
 * consistent time offset. This is the audio analog of the text
 * engine's exact-substring dedup: candidates come from exact
 * sub-fingerprint collisions, confirmation from offset consistency.
 *
 * Sub-fingerprint = the classic Haitsma–Kalker 32-bit frame hash
 * (ISMIR 2002): per overlapping FFT frame, bit b compares the
 * TIME-DIFFERENCED adjacent-band energy gradient,
 * `(E(b,t)−E(b+1,t)) − (E(b,t−1)−E(b+1,t−1)) > 0` over 33 log-spaced
 * bands — robust to gain, bit depth, container and resampling for
 * the same reasons as the clip hash (shared decode + anti-aliased
 * 8 kHz grid via [[AudioFingerprint.resampleToGrid]]).
 *
 * Scale shape: sub-fingerprinting is per-row DSP inside the scan;
 * the candidate join shuffles (id, frame_idx, 4-byte hash) rows
 * keyed by the hash value — never samples. Degenerate hashes
 * (digital silence, constant tones) would turn that join quadratic,
 * so haystack-side hash values occurring more than `maxBucket`
 * times are dropped up front (the HK "stop-word" rule: a hash
 * carried by a million frames identifies nothing). Confirmation is
 * a count per (needle, haystack, offset-delta) — an aggregation,
 * not a driver loop.
 */
object AudioContainment {

  /** Hop between sub-fingerprint frames on the 8 kHz grid: 64 ms —
    * the offset resolution of a reported match. */
  val HopSamples = 512
  val HopMs: Double = HopSamples * 1000.0 / AudioFingerprint.TargetRate

  private val SubBands = 33 // 32 adjacent comparisons = 32 bits

  private lazy val edges: Array[Double] =
    Array.tabulate(SubBands + 1)(k =>
      AudioFingerprint.FMin * math.pow(AudioFingerprint.FMax / AudioFingerprint.FMin,
        k.toDouble / SubBands))

  private lazy val bins: Array[(Int, Int)] = Array.tabulate(SubBands) { b =>
    val binHz = AudioFingerprint.TargetRate / AudioFingerprint.FrameSize
    val lo = math.max(1, math.ceil(edges(b) / binHz).toInt)
    val hi = math.min(AudioFingerprint.FrameSize / 2, math.ceil(edges(b + 1) / binHz).toInt)
    (lo, math.max(hi, lo + 1))
  }

  /** Sub-fingerprint stream of mono PCM: one 32-bit hash per 64 ms
    * hop (the first frame has no predecessor and is skipped). Empty
    * for undecodable/too-short/sub-Nyquist input. */
  def subFingerprints(samples: Array[Double], rate: Int): Array[Int] = {
    if (samples == null || samples.length == 0 || rate < 2 * AudioFingerprint.FMax)
      return Array.emptyIntArray
    val x = AudioFingerprint.resampleToGrid(samples, rate)
    val n = AudioFingerprint.FrameSize
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    val prev = new Array[Double](SubBands)
    var havePrev = false
    val out = new scala.collection.mutable.ArrayBuffer[Int](
      math.max(0, (x.length - n) / HopSamples))
    var start = 0
    while (start + n <= x.length) {
      var k = 0
      while (k < n) { re(k) = x(start + k) * AudioFingerprint.hann(k); im(k) = 0.0; k += 1 }
      AudioFingerprint.fft(re, im)
      val e = new Array[Double](SubBands)
      var b = 0
      while (b < SubBands) {
        val (lo, hi) = bins(b)
        var acc = 0.0; var bin = lo
        while (bin < hi) { acc += re(bin) * re(bin) + im(bin) * im(bin); bin += 1 }
        e(b) = acc
        b += 1
      }
      if (havePrev) {
        var h = 0
        var c = 0
        while (c < SubBands - 1) {
          if ((e(c) - e(c + 1)) - (prev(c) - prev(c + 1)) > 0) h |= (1 << c)
          c += 1
        }
        out += h
      }
      System.arraycopy(e, 0, prev, 0, SubBands)
      havePrev = true
      start += HopSamples
    }
    out.toArray
  }

  /** Sub-fingerprint stream of encoded bytes (WAV/AIFF/FLAC via the
    * shared decoders). */
  def subFingerprints(bytes: Array[Byte]): Array[Int] =
    AudioFingerprint.pcmMono(bytes) match {
      case Some((samples, rate)) => subFingerprints(samples, rate)
      case None => Array.emptyIntArray
    }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("fidx", IntegerType, nullable = false),
    StructField("sf", IntegerType, nullable = false)))

  /** Per-row decode → (doc_id, fidx, sf) frame rows. Undecodable
    * rows produce nothing. */
  def withSubFingerprints(media: DataFrame, contentCol: String = "content",
                          idCol: String = "media_id"): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col(idCol).cast(LongType), col(contentCol)).rdd.mapPartitions {
      rows =>
        rows.flatMap { r =>
          if (r.isNullAt(0)) Iterator.empty
          else {
            val id = r.getLong(0)
            val sfs = subFingerprints(r.getAs[Array[Byte]](1))
            Iterator.tabulate(sfs.length)(i => Row(id, i, sfs(i)))
          }
        }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /**
   * Containment matches (needle_id, haystack_id, matched, frames_n,
   * offset_ms): exact sub-fingerprint collisions grouped by
   * offset-delta, best delta per pair, thresholded against the
   * needle's frame count. `minMatched` floors the evidence (short
   * needles with two lucky collisions must not match);
   * `minMatchFrac` scales it (a 10 s needle needs sustained
   * agreement). A needle contained at several positions reports its
   * best-supported offset.
   */
  def containment(needles: DataFrame, haystacks: DataFrame,
                  contentCol: String = "content", idCol: String = "media_id",
                  minMatchFrac: Double = 0.35, minMatched: Int = 8,
                  maxBucket: Int = 10000): DataFrame = {
    require(minMatchFrac > 0 && minMatchFrac <= 1,
      s"minMatchFrac must be in (0, 1], got $minMatchFrac")
    require(minMatched >= 1, s"minMatched must be >= 1, got $minMatched")
    val n = withSubFingerprints(needles, contentCol, idCol)
      .select(col("doc_id").as("needle_id"), col("fidx").as("nf"), col("sf"))
      // both the per-needle frame count and the collision join read
      // this; the decode is far too expensive to run twice
      .localCheckpoint()
    val h = withSubFingerprints(haystacks, contentCol, idCol)
      .select(col("doc_id").as("haystack_id"), col("fidx").as("hf"), col("sf"))
    // stop-word rule: a hash value carried by more than maxBucket
    // haystack frames (digital silence, test tones) identifies
    // nothing and would make the collision join quadratic — drop the
    // VALUE, keep everything else. The hot list is tiny (bounded by
    // distinct degenerate spectra), so it broadcasts.
    val hot = h.groupBy("sf").agg(count(lit(1)).as("c"))
      .where(col("c") > maxBucket).select("sf")
    val hClean = h.join(broadcast(hot), Seq("sf"), "left_anti")
    val nCounts = n.groupBy("needle_id").agg(count(lit(1)).as("frames_n"))
    val hits = n.join(hClean, "sf")
      // a negative delta says the needle starts BEFORE the haystack —
      // noise by definition; drop it before electing the best offset
      // so scattered negative collisions can never outvote a real one
      .where(col("hf") >= col("nf"))
      .groupBy(col("needle_id"), col("haystack_id"),
        (col("hf") - col("nf")).as("delta"))
      .agg(count(lit(1)).as("matched"))
    // best offset per (needle, haystack): one max over a struct, no
    // second shuffle of the raw collisions
    val best = hits
      .groupBy("needle_id", "haystack_id")
      .agg(max(struct(col("matched"), col("delta"))).as("best"))
      .select(col("needle_id"), col("haystack_id"),
        col("best.matched").as("matched"), col("best.delta").as("delta"))
    val out = best.join(nCounts, "needle_id")
      .where(col("matched") >= greatest(lit(minMatched),
        ceil(col("frames_n") * minMatchFrac)))
      .select(col("needle_id"), col("haystack_id"), col("matched"),
        col("frames_n"), (col("delta") * HopMs).as("offset_ms"))
      // materialize the (small) containment report eagerly, then
      // release the decoded needle-fingerprint checkpoint instead of
      // pinning it for the session (the r14 bench leak class)
      .localCheckpoint(true)
    graft.operators.CheckpointDiscipline.freeLocalCheckpoint(n)
    out
  }
}
