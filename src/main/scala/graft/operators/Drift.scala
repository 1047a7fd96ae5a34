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
    * models, summed over the UNION vocabulary only — the single drift
    * NUMBER a dashboard thresholds. The smoothed models reserve some
    * probability mass for tokens outside their own vocab, and that
    * residual mass (absent from the union support) is NOT paired into
    * the sum, so this is the union-vocab APPROXIMATION of JSD: the
    * theoretical [0, ln 2] bound holds only approximately (exactly
    * when both vocabularies fit the cap and no mass is reserved
    * off-support). Fine for thresholding a trend; not a calibrated
    * information-theoretic quantity. */
  def jsDivergence(cur: UnigramLm, ref: UnigramLm): Double = {
    def term(p: Double, m: Double): Double = if (p <= 0) 0.0 else p * math.log(p / m)
    tokenDrift(cur, ref).map { d =>
      val m = (d.pCur + d.pRef) / 2
      0.5 * term(d.pCur, m) + 0.5 * term(d.pRef, m)
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
