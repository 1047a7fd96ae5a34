package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Perplexity-based quality scoring — the CCNet filtering idea (score
 * documents against a language model trained on a trusted reference
 * corpus; low perplexity ≈ fluent, in-domain text) reduced to a
 * unigram model with add-one smoothing: no external LM artifacts, and
 * a unigram model already separates gibberish/boilerplate from prose
 * by orders of magnitude, which is what a bucket-into-quality-tiers
 * stage needs.
 *
 * Scale story: the fit is two bounded jobs over the reference corpus
 * (a scalar total/vocab aggregate and a TakeOrdered top-`vocabSize`
 * count — never a full vocabulary collect); the model travels as ONE
 * map literal in the plan (bounded by `vocabSize`, the same
 * compile-into-the-plan pattern as the segment-dedup frequent set),
 * and scoring is a row-local HOF fold over each document's tokens —
 * one scan, zero shuffle, no UDF. Documents with no tokens score
 * null.
 */
object LmScore {

  /** Unigram log-probabilities for the top-`vocabSize` tokens plus the
    * smoothed out-of-vocabulary floor. */
  final case class UnigramLm(logProbs: Map[String, Double], oovLogProb: Double)

  /** Fit on a reference corpus: add-one smoothing over
    * (total tokens + distinct vocabulary + 1 OOV pseudo-type), vocab
    * capped at `vocabSize` with a deterministic (count desc, token
    * asc) boundary. */
  def fitUnigram(reference: DataFrame, textCol: String,
                 vocabSize: Int = 65536): UnigramLm = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    val toks = reference
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val stats = toks.agg(count(lit(1)).as("total"),
      countDistinct(col("tok")).as("v")).head()
    val total = stats.getLong(0)
    require(total > 0, "cannot fit a unigram model on an empty reference corpus")
    val v = stats.getLong(1)
    val denom = (total + v + 1).toDouble
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(vocabSize)
      .collect()
    UnigramLm(
      top.map(r => r.getString(0) -> math.log((r.getLong(1) + 1).toDouble / denom)).toMap,
      math.log(1.0 / denom))
  }

  /** Per-document perplexity exp(−mean token log-prob) as a row-local
    * column expression; null when the document has no tokens. */
  def perplexity(text: Column, lm: UnigramLm): Column = {
    val model = typedlit(lm.logProbs)
    val toks = filter(TextFunctions.tokens(text), t => t =!= "")
    val lpSum = aggregate(toks, lit(0.0d),
      (acc, t) => acc + coalesce(element_at(model, t), lit(lm.oovLogProb)))
    when(size(toks) === 0, lit(null).cast("double"))
      .otherwise(exp(-lpSum / size(toks)))
  }

  /** The corpus with a `perplexity` column — the CCNet-style tiering
    * input (callers bucket or threshold it). */
  def scored(docs: DataFrame, textCol: String, lm: UnigramLm): DataFrame =
    docs.withColumn("perplexity", perplexity(col(textCol), lm))
}
