package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Trainable bag-of-words quality classifier — the fastText-style
 * linear filter every major curation pipeline runs (GPT-3's
 * WebText-likeness LR, LLaMA's wiki-reference classifier,
 * RefinedWeb's quality tiers): positives = a trusted target sample,
 * negatives = the raw pool, model = logistic regression over token
 * counts. Complements [[Dsir]]: DSIR reweights by generative
 * likelihood ratio, this DISCRIMINATES — the trained weights find
 * whatever separates the samples.
 *
 * Train/serve split (the 100 TB story): training runs ON SAMPLES
 * (MLlib's distributed LBFGS over a capped deterministic vocabulary —
 * bounded iterations, bounded vocab; a linear text classifier
 * saturates at ~100k docs, so the sample IS the right input, the
 * PQ-codebook discipline). Serving never touches MLlib: the learned
 * coefficients export as a plain (token → weight) map and every doc
 * scores ROW-LOCALLY through the native `unigram_ppl` hash probe —
 * the logit is a pure per-token sum, exactly the shape the probe
 * already computes — so the scoring scan is zero-shuffle, zero-join,
 * whole-stage codegen, and the 100 TB corpus never materializes a
 * feature vector.
 */
object QualityClassifier {

  /** Exported linear model: per-token logit weights (each token
    * OCCURRENCE adds its weight — bag-of-words counts), unknown
    * tokens contribute 0, plus the intercept. */
  final case class LinearTextModel(weights: Map[String, Double], bias: Double)

  /**
   * Train logistic regression on positive/negative text samples.
   * The vocabulary is the top `vocabSize` tokens of the union sample
   * by document frequency with the deterministic (df desc, token asc)
   * boundary; `regParam` is L2 (keeps rare-token weights sane).
   */
  def fit(positives: DataFrame, negatives: DataFrame, textCol: String,
          vocabSize: Int = 65536, maxIter: Int = 50,
          regParam: Double = 1e-3): LinearTextModel = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    // the tokenized SAMPLE feeds two consumers — the vocabulary job and
    // the featurize+LBFGS fit — and is bounded by the train/serve
    // contract (samples, never the corpus), so persist it across both
    // instead of tokenizing the texts twice (r20; MLlib persists only
    // its own featurized instances, not this upstream)
    val labeled = positives.select(TextFunctions.tokens(col(textCol)).as("_toks"), lit(1.0).as("_label"))
      .unionByName(negatives.select(TextFunctions.tokens(col(textCol)).as("_toks"), lit(0.0).as("_label")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic capped vocabulary by document frequency — the
      // fitUnigram discipline (never a full-vocabulary collect)
      val vocab = labeled
        .select(explode(array_distinct(filter(col("_toks"), t => t =!= ""))).as("_tok"))
        .groupBy("_tok").agg(count(lit(1)).as("_df"))
        .orderBy(col("_df").desc, col("_tok"))
        .limit(vocabSize)
        .select("_tok")
        .as(org.apache.spark.sql.Encoders.STRING)
        .collect()
      require(vocab.nonEmpty, "cannot fit a classifier on token-free samples")
      val cv = new org.apache.spark.ml.feature.CountVectorizerModel(vocab)
        .setInputCol("_toks").setOutputCol("_features")
      val lr = new org.apache.spark.ml.classification.LogisticRegression()
        .setFeaturesCol("_features").setLabelCol("_label")
        .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
      val model = lr.fit(cv.transform(labeled))
      val coefs = model.coefficients
      LinearTextModel(
        vocab.iterator.zipWithIndex.collect {
          case (t, i) if coefs(i) != 0.0 => t -> coefs(i)
        }.toMap,
        model.intercept)
    } finally { labeled.unpersist(); () }
  }

  /** Logit (pre-sigmoid score) as a row-local column: bias +
    * Σ_tokens weight(t); null for tokenless docs. The per-token sum
    * rides the native `unigram_ppl` probe (probe = exp(−Σw/n), so
    * Σw = −n·ln(probe) — the 1-ulp exp/ln roundtrip, absorbed by any
    * downstream rounding). Caller's session needs graft functions
    * registered ([[graft.expr.GraftFunctions.ensure]]). */
  def logitCol(text: Column, model: LinearTextModel): Column = {
    val toks = TextFunctions.tokens(text)
    val n = size(filter(toks, t => t =!= ""))
    val probe = graft.expr.GraftFunctions.unigramPpl(toks,
      graft.expr.UnigramPerplexity.serialize(model.weights), 0.0)
    when(probe.isNull, lit(null).cast("double"))
      .otherwise(lit(model.bias) - n.cast("double") * log(probe))
  }

  /** P(positive) — sigmoid of [[logitCol]]; null for tokenless docs. */
  def scoreCol(text: Column, model: LinearTextModel): Column = {
    val z = logitCol(text, model)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
