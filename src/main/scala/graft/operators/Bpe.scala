package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer support (Sennrich et al. 2016, "Neural
 * Machine Translation of Rare Words with Subword Units") — the
 * tokenizer-training side of a training-data pipeline: learn a merge
 * table from the corpus, then segment every document into subwords for
 * token accounting, packing budgets and vocabulary analysis.
 *
 * Train/serve split (the PQ-codebook / quality-classifier
 * discipline):
 *  - TRAINING needs corpus-global statistics but saturates on a
 *    word-FREQUENCY table, not the corpus: one distributed
 *    `groupBy(word).count` (the shuffle carries (word, long)), capped
 *    at the top `maxWords` types with a deterministic
 *    (count desc, word asc) boundary, then the classic merge loop
 *    runs driver-side over that bounded table — `numMerges ×
 *    O(types × word-length)` scalar work, no Spark job per merge.
 *  - SERVING never re-reads the statistics: the learned merges ride
 *    the plan as one binary literal probed by the native codegen'd
 *    `bpe_encode` expression ([[graft.expr.BpeEncode]]) — row-local,
 *    zero shuffle, zero join, scan-speed.
 *
 * Determinism: ties in pair counts break on the pair string
 * ascending, and the word-frequency boundary on (count desc, word
 * asc), so the same corpus always learns the same merge table on any
 * cluster layout.
 */
object Bpe {

  /** Learned merge table, in application (rank) order. */
  final case class BpeModel(merges: Seq[(String, String)]) {
    lazy val bytes: Array[Byte] = graft.expr.BpeEncode.serialize(merges)
  }

  /** Top-`maxWords` (word, count) — the bounded training aggregate. */
  private[operators] def wordCounts(docs: DataFrame, textCol: String,
                                    maxWords: Int): Array[(String, Long)] =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

  /** The Sennrich training loop over a word-frequency table (pure
    * driver-side scalar work; exposed for spec ground truth). */
  private[operators] def trainFromCounts(counts: Array[(String, Long)],
                                         numMerges: Int): Seq[(String, String)] = {
    // each word as its symbol sequence (chars + </w>)
    val words: Array[(Array[String], Long)] = counts.map { case (w, n) =>
      (w.map(String.valueOf(_)).toArray :+ graft.expr.BpeEncode.EndOfWord, n)
    }
    var seqs = words.map(_._1)
    val freqs = words.map(_._2)
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < seqs.length) {
        val s = seqs(i); val f = freqs(i)
        var j = 0
        while (j < s.length - 1) {
          val p = (s(j), s(j + 1))
          pairCounts.merge(p, f, (a, b) => a + b)
          j += 1
        }
        i += 1
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic argmax: count desc, then "left right" asc
        var best: (String, String) = null
        var bestN = -1L
        pairCounts.forEach { (p, n) =>
          val key = p._1 + " " + p._2
          if (n > bestN || (n == bestN && key < (best._1 + " " + best._2))) {
            best = p; bestN = n
          }
        }
        merges += best
        seqs = seqs.map { s =>
          if (s.length < 2) s
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
                out += s(j) + s(j + 1); j += 2
              } else { out += s(j); j += 1 }
            }
            out.toArray
          }
        }
      }
      m += 1
    }
    merges.result()
  }

  /** Learn `numMerges` merges from the corpus. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 65536): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    require(maxWords >= 1, s"maxWords must be >= 1: $maxWords")
    val counts = wordCounts(docs, textCol, maxWords)
    require(counts.nonEmpty, "cannot train BPE on an empty corpus")
    BpeModel(trainFromCounts(counts, numMerges))
  }

  /** Subword segmentation of `text` under the model — row-local,
    * zero-shuffle (the native `bpe_encode` probe). Caller's session
    * must have graft functions registered. */
  def encodeCol(text: Column, model: BpeModel): Column =
    graft.expr.GraftFunctions.bpeEncode(TextFunctions.tokens(text), model.bytes)

  /** Subword count — the token-accounting column (packing budgets,
    * per-doc length stats under the REAL tokenizer rather than the
    * whitespace proxy). */
  def subwordCountCol(text: Column, model: BpeModel): Column =
    size(encodeCol(text, model))
}
