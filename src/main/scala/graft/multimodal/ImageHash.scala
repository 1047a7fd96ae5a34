package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Perceptual image hashing + image near-duplicate detection — the
 * image leg of the dedup family (the LAION-style multimodal curation
 * step). Byte-exact dedup misses the normal shape of image
 * duplication on the web: the SAME picture re-encoded (JPEG quality
 * ladders), resized (thumbnails), or minimally edited. The 64-bit
 * DCT perceptual hash (the public pHash algorithm) survives exactly
 * those transforms: decode → 32×32 grayscale → 2D DCT-II → keep the
 * low-frequency 8×8 block → threshold each coefficient against the
 * block's median (DC excluded from the median — it is pure average
 * brightness). Hamming distance between hashes ranks perceptual
 * similarity.
 *
 * Scale shape: hashing is per-row byte work inside the scan
 * (mapPartitions, one decoded 32×32 plane per image in flight);
 * candidate generation reuses [[graft.operators.Dedup]]'s hamming
 * banding — after the hash column exists, everything that shuffles
 * is (id, 8-byte hash), never pixels. A 100 TB image corpus dedups
 * with the same plan discipline as the text corpus.
 */
object ImageHash {

  private val Size = 32
  // DCT-II basis, precomputed once per JVM: C[u][x] = cos((2x+1)uπ/64)
  private lazy val cosTable: Array[Array[Double]] = Array.tabulate(Size, Size) {
    (u, x) => math.cos((2 * x + 1) * u * math.Pi / (2.0 * Size))
  }

  /** 64-bit perceptual hash of encoded image bytes; null for
    * undecodable payloads (crawl bytes lie — a poison image must not
    * kill the partition). */
  def phash64(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.length < 8) return null
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return null
      // grayscale 32×32 via area-averaging rescale (robust to the
      // source resolution; Graphics2D bilinear suffices at this size)
      val small = new java.awt.image.BufferedImage(Size, Size,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, Size, Size, null)
      g.dispose()
      val gray = Array.ofDim[Double](Size, Size)
      var y = 0
      while (y < Size) {
        var x = 0
        while (x < Size) {
          val p = small.getRGB(x, y)
          gray(y)(x) = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
          x += 1
        }
        y += 1
      }
      // separable 2D DCT-II, low-frequency 8×8 block only
      val ct = cosTable
      val rows = Array.ofDim[Double](8, Size) // DCT over x for u < 8
      var u = 0
      while (u < 8) {
        var yy = 0
        while (yy < Size) {
          var acc = 0.0; var x = 0
          while (x < Size) { acc += gray(yy)(x) * ct(u)(x); x += 1 }
          rows(u)(yy) = acc
          yy += 1
        }
        u += 1
      }
      val coef = new Array[Double](64)
      var v = 0
      while (v < 8) {
        u = 0
        while (u < 8) {
          var acc = 0.0; var yy = 0
          while (yy < Size) { acc += rows(u)(yy) * ct(v)(yy); yy += 1 }
          coef(v * 8 + u) = acc
          u += 1
        }
        v += 1
      }
      // median of the 63 AC coefficients; DC is average brightness
      val ac = coef.drop(1).sorted
      val median = (ac(30) + ac(31)) / 2.0
      var h = 0L
      var i = 0
      while (i < 64) {
        if (coef(i) > median) h |= (1L << i)
        i += 1
      }
      java.lang.Long.valueOf(h)
    } catch { case _: Exception => null }
  }

  /** Hamming distance between two pHashes. */
  def distance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Add a `phash` column (null for undecodable rows). Per-row byte
    * work — a legitimate mapPartitions site, like the codecs. */
  def withPhash(media: DataFrame, contentCol: String = "content",
                idCol: String = "media_id"): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sh", LongType, nullable = true)))
    val rdd = media.select(col(idCol).cast(LongType), col(contentCol)).rdd.mapPartitions {
      rows =>
        rows.flatMap { r =>
          if (r.isNullAt(0)) Nil
          else Seq(Row(r.getLong(0), phash64(r.getAs[Array[Byte]](1))))
        }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Image near-duplicate candidate pairs: pHash per row, then the
   * SAME hamming-banding plan text SimHash uses (pigeonhole block
   * buckets over (id, hash) — zero cross joins, pixels never
   * shuffle). Undecodable rows drop out. The pair set is transitively
   * complete; feed it to [[graft.operators.DupGroups]] exactly like
   * the text families.
   */
  def nearDups(media: DataFrame, contentCol: String = "content",
               idCol: String = "media_id",
               maxHamming: Int = 8, maxBucket: Int = 1000): DataFrame = {
    val hashed = withPhash(media, contentCol, idCol).where(col("sh").isNotNull)
    graft.operators.Dedup.hammingCandidates(hashed, maxHamming, maxBucket)
  }
}
