package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Video near-duplicate detection — the video leg of the dedup family,
 * composing the pieces the engine already has: time-based frame
 * sampling out of the MJPEG-AVI container ([[Avi]]), the DCT
 * perceptual hash per sampled frame ([[ImageHash.phash64]]), and the
 * shared hamming-banding candidate plan
 * ([[graft.operators.Dedup.hammingCandidates]]). A crawl's video
 * duplicates are re-encodes: the same footage at a different
 * resolution, frame rate, or JPEG quality — byte-exact dedup finds
 * none of them, but the frames at the same TIMESTAMPS are the same
 * pictures, so their pHashes agree.
 *
 * Signature = the sequence of frame pHashes at fixed wall-clock
 * sampling points (every `everyMs`, up to `maxFrames`). Sampling by
 * TIME, not frame index, is what makes the signature frame-rate
 * invariant: a 30 fps original and its 10 fps re-encode sample the
 * same instants. Two videos match when at least
 * `ceil(minMatchFrac * min(nA, nB))` aligned sampling points are
 * within `maxHamming` bits.
 *
 * Scale shape: decoding and hashing are per-row byte work inside the
 * scan (mapPartitions — one frame plane in flight per row); every
 * shuffle after that carries (composite id, 8-byte hash) — the
 * video-id and sampling ordinal pack into ONE long (`vid * 64 + ord`),
 * so the banding plan and bucket caps of the text/image/audio
 * families apply verbatim — with the banding ALIGNED on the ordinal
 * (the identical-hash pre-group and the block buckets both key on
 * it), because a frame hash recurring at many positions (black
 * frames, title cards) must pair per-position, not collapse to one
 * global representative. Pixels never shuffle. Like the other
 * hamming families, the per-(ordinal, hash) pair set is transitively
 * complete rather than pairwise-exhaustive, so in dense clusters of
 * 3+ copies the per-pair match count is a lower bound — run
 * [[graft.operators.DupGroups]] over the output to close the groups,
 * exactly as for text.
 */
object VideoHash {

  /** Max sampled frames per video — ordinals pack into 6 bits of the
    * composite id, leaving 57 bits of video-id space. */
  val MaxFrames = 64

  /** Per-video frame-hash rows (video_id, ord, sh): the pHash of the
    * frame nearest each sampling instant `ord * everyMs`. Rows whose
    * payload is not a parseable AVI drop out (mixed corpora route
    * here after MIME sniffing); an undecodable single frame yields a
    * null hash for that ordinal only. */
  def withFrameHashes(media: DataFrame, everyMs: Long, maxFrames: Int = 16,
                      idCol: String = "media_id",
                      contentCol: String = "content"): DataFrame = {
    require(everyMs > 0, "everyMs must be positive")
    require(maxFrames > 0 && maxFrames <= MaxFrames,
      s"maxFrames must be in [1, $MaxFrames], got $maxFrames")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("video_id", LongType, nullable = false),
      StructField("ord", IntegerType, nullable = false),
      StructField("sh", LongType, nullable = true)))
    val rdd = media.select(col(idCol).cast(LongType), col(contentCol)).rdd.mapPartitions {
      rows =>
        rows.flatMap { r =>
          if (r.isNullAt(0)) Nil
          else {
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val metaOpt =
              try { if (bytes == null) None else Some(Avi.parse(bytes)) }
              catch { case _: Exception => None }
            metaOpt.toSeq.flatMap { meta =>
              val n = meta.frames.length
              if (n == 0 || meta.usPerFrame <= 0) Nil
              else {
                val durMs = meta.durationMs
                (0 until maxFrames).iterator
                  .takeWhile(k => k == 0 || k * everyMs < durMs)
                  .map { k =>
                    val idx = math.min(n - 1L, k * everyMs * 1000L / meta.usPerFrame).toInt
                    val h =
                      try ImageHash.phash64(Avi.frameBytes(bytes, meta, idx))
                      catch { case _: Exception => null }
                    Row(id, k, h)
                  }.toSeq
              }
            }
          }
        }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Video near-duplicate pairs (id_a, id_b, matched, frames_a,
   * frames_b): frame-hash signatures, per-ordinal hamming banding
   * over composite (vid*64+ord) ids, then a count of aligned matching
   * ordinals thresholded against the shorter signature. Candidate
   * hashes within `maxHamming` at DIFFERENT ordinals are discarded —
   * alignment in time is part of the match definition.
   */
  def nearDups(media: DataFrame, everyMs: Long = 500L, maxFrames: Int = 16,
               maxHamming: Int = 4, minMatchFrac: Double = 0.6,
               idCol: String = "media_id", contentCol: String = "content",
               maxBucket: Int = 1000): DataFrame = {
    require(minMatchFrac > 0 && minMatchFrac <= 1,
      s"minMatchFrac must be in (0, 1], got $minMatchFrac")
    val hashed = withFrameHashes(media, everyMs, maxFrames, idCol, contentCol)
      .where(col("sh").isNotNull)
      // composite long: 57 bits of video id + 6 bits of ordinal.
      // Negative or oversized ids would alias across videos — refuse.
      // (Long.MaxValue / MaxFrames = 2^57 - 1 itself still packs:
      // (2^57-1)*64 + 63 = Long.MaxValue.)
      .select(when(col("video_id").between(0L, Long.MaxValue / MaxFrames),
          col("video_id") * MaxFrames + col("ord"))
          .otherwise(raise_error(concat(lit("VideoHash: video id out of [0, 2^57) range: "),
            col("video_id").cast("string"))).cast(LongType)).as("doc_id"),
        col("sh"))
      // the frame feeds counts AND candidate generation; materialize
      // once — recomputing it would re-walk every container and
      // re-decode every sampled frame per branch
      .localCheckpoint()
    // bit ops, not division: doc_id >> 6 is exact at any id where a
    // double-valued division would round past 2^53
    val counts = hashed.groupBy(shiftright(col("doc_id"), 6).as("vid"))
      .agg(count(lit(1)).as("n"))
    // aligned banding: the ordinal is the alignment key, so a hash
    // recurring at many positions (black frames, title cards) still
    // pairs per-position instead of pre-grouping across positions
    val pairs = graft.operators.Dedup.hammingCandidates(hashed, maxHamming, maxBucket,
        align = Some(col("doc_id").bitwiseAND(MaxFrames - 1)))
      .select(shiftright(col("id_a"), 6).as("va"), shiftright(col("id_b"), 6).as("vb"))
      .where(col("va") =!= col("vb"))
      // same-ordinal composite pairs shift order-stably, so va < vb
      // already holds; least/greatest keeps the invariant explicit
      .select(least(col("va"), col("vb")).as("va"), greatest(col("va"), col("vb")).as("vb"))
      .groupBy("va", "vb").agg(count(lit(1)).as("matched"))
    val out = pairs
      .join(counts.select(col("vid").as("va"), col("n").as("frames_a")), "va")
      .join(counts.select(col("vid").as("vb"), col("n").as("frames_b")), "vb")
      .where(col("matched") >= ceil(least(col("frames_a"), col("frames_b")) * minMatchFrac))
      .select(col("va").as("id_a"), col("vb").as("id_b"),
        col("matched"), col("frames_a"), col("frames_b"))
      // materialize the (small) match list eagerly, then release the
      // decoded frame-hash checkpoint — pinning it for the session
      // was one of the r14 bench's cross-query memory leaks
      .localCheckpoint(true)
    graft.operators.CheckpointDiscipline.freeLocalCheckpoint(hashed)
    out
  }

  // ---- deterministic fixtures ------------------------------------

  /** Deterministic logical frame for (id, instantMs): the shared
    * [[ImageHash.patternImage]] family with the instant as the
    * variant — the same (id, instant) at any resolution pHashes
    * within a bit or two, different ids or instants land far apart. */
  def patternFrame(id: Long, instantMs: Long, size: Int): java.awt.image.BufferedImage =
    ImageHash.patternImage(size, size, id, instantMs)

  /** Deterministic MJPEG-AVI test clip: `logicalFrames` distinct
    * pictures, each held for `holdFrames` consecutive container
    * frames at `fps` (low-motion footage), rendered at `size` px.
    * The same id re-encoded at a different (fps, holdFrames, size)
    * shows the SAME pictures at the same instants — the re-encode
    * family the operator exists to catch. */
  def toneClipAvi(id: Long, fps: Int, holdFrames: Int, size: Int,
                  logicalFrames: Int = 4): Array[Byte] = {
    require(fps > 0 && holdFrames > 0 && logicalFrames > 0)
    val holdMs = 1000L * holdFrames / fps
    val frames = (0 until logicalFrames * holdFrames).map { j =>
      patternFrame(id, (j / holdFrames) * holdMs, size)
    }
    Avi.encodeMjpeg(frames, fps)
  }
}
