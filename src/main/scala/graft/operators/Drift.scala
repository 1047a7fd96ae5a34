package graft.operators

import graft.operators.LmScore.UnigramLm
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Token-distribution drift monitoring — the daily corpus alarm: fit
 * the L35 unigram model on a reference slice (yesterday / a trusted
 * sample) and on the current slice, then compare the two bounded
 * distributions. A source switching language, a scraper starting to
 * emit boilerplate, or a broken extractor all move token mass long
 * before they move row counts — and the comparison costs two bounded
 * fits (one scan each, vocab-capped collects) plus driver arithmetic
 * over ≤ 2·vocabSize probabilities. Nothing here re-scans data at
 * question time.
 *
 * Probabilities are the models' add-one-smoothed values; tokens
 * absent from one side take that side's OOV floor (the [[Dsir]]
 * union-vocab convention), so the comparison is defined on the vocab
 * UNION and the divergence is the smoothed-model approximation —
 * exact when both vocabularies fit the cap.
 */
object Drift {

  final case class TokenDrift(token: String, pCur: Double, pRef: Double,
                              logRatio: Double, delta: Double)

  /** Per-token drift over the union vocabulary, ordered by absolute
    * probability-mass change (desc, then token asc — a total order). */
  def tokenDrift(cur: UnigramLm, ref: UnigramLm): Seq[TokenDrift] = {
    val vocab = cur.logProbs.keySet ++ ref.logProbs.keySet
    vocab.toSeq.map { t =>
      val lc = cur.logProbs.getOrElse(t, cur.oovLogProb)
      val lr = ref.logProbs.getOrElse(t, ref.oovLogProb)
      val (pc, pr) = (math.exp(lc), math.exp(lr))
      TokenDrift(t, pc, pr, lc - lr, math.abs(pc - pr))
    }.sortBy(d => (-d.delta, d.token))
  }

  /** Jensen-Shannon divergence (natural log) of the two smoothed
    * models — the single drift NUMBER a dashboard thresholds, with
    * the [0, ln 2] bound holding EXACTLY on any input.
    *
    * Each model is first turned into a PROPER distribution over the
    * union vocabulary plus one shared off-support bucket. The fit
    * reserves exactly one OOV pseudo-type of mass 1/denom; the
    * per-token scoring floor replicates that mass for every unseen
    * token — right for perplexity scoring, but improper as a
    * distribution (a one-sentence model floored across 65k
    * disjoint tokens "sums" to thousands, which is why the r14
    * union-sum formula had no real bound despite its doc). Here the
    * reserve is instead SPLIT uniformly across the unseen union
    * tokens, so each side sums to at most 1 by construction
    * (in-vocab mass + the whole reserve); any shortfall — the
    * vocab-cap tail plus, when nothing is unseen, the unused
    * reserve — sits in the shared bucket. The result is the true
    * JSD of two proper distributions on a common support: 0 iff
    * they agree, ln 2 at disjoint support, symmetric. */
  def jsDivergence(cur: UnigramLm, ref: UnigramLm): Double = {
    val vocab = (cur.logProbs.keySet ++ ref.logProbs.keySet).toSeq
    def dist(lm: UnigramLm): (Seq[Double], Double) = {
      val unseen = vocab.count(t => !lm.logProbs.contains(t))
      val reserve = math.exp(lm.oovLogProb) // the fit's single OOV pseudo-type
      val perUnseen = if (unseen == 0) 0.0 else reserve / unseen
      val ps = vocab.map(t => lm.logProbs.get(t).map(math.exp).getOrElse(perUnseen))
      (ps, math.max(0.0, 1.0 - ps.sum))
    }
    val (ps, residP) = dist(cur)
    val (qs, residQ) = dist(ref)
    def term(p: Double, m: Double): Double = if (p <= 0) 0.0 else p * math.log(p / m)
    ((ps :+ residP).iterator zip (qs :+ residQ).iterator).map { case (p, q) =>
      val m = (p + q) / 2
      0.5 * term(p, m) + 0.5 * term(q, m)
    }.sum
  }

  /** The config-friendly shape: fit both slices, return the top-`k`
    * movers as a DataFrame (token, p_cur, p_ref, log_ratio, delta). */
  def report(spark: SparkSession, current: DataFrame, reference: DataFrame,
             textCol: String, k: Int = 100, vocabSize: Int = 65536): DataFrame = {
    val cur = LmScore.fitUnigram(current, textCol, vocabSize)
    val ref = LmScore.fitUnigram(reference, textCol, vocabSize)
    import spark.implicits._
    tokenDrift(cur, ref).take(k).toDF()
  }
}
