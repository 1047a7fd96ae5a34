package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L38: DSIR importance weighting — hand-computed log weights,
  * target-affinity ordering, Gumbel resampling determinism, the
  * fraction-threshold selection path, zero-shuffle scoring plan. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def fit(texts: String*) = LmScore.fitUnigram(texts.toDF("text"), "text")

  test("log weight matches the hand-computed two-model sum exactly") {
    graft.expr.GraftFunctions.ensure(spark)
    // target "a a b": denom 6, lp(a)=ln(3/6), lp(b)=ln(2/6), oov=ln(1/6)
    // raw "a b b c":  denom 8, lp(a)=ln(2/8), lp(b)=ln(3/8), lp(c)=ln(2/8), oov=ln(1/8)
    val target = fit("a a b")
    val raw = fit("a b b c")
    val probe = Seq((1L, "a b d"), (2L, "a a a"), (3L, "  ")).toDF("id", "text")
    val got = probe.select(col("id"),
        Dsir.logWeightCol(col("text"), target, raw).as("w"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    val want1 = (math.log(3.0 / 6) - math.log(2.0 / 8)) + // a
      (math.log(2.0 / 6) - math.log(3.0 / 8)) +           // b
      (math.log(1.0 / 6) - math.log(1.0 / 8))             // d: oov in both
    val want2 = 3 * (math.log(3.0 / 6) - math.log(2.0 / 8))
    assert(got(1L).exists(v => math.abs(v - want1) < 1e-9), s"got ${got(1L)} want $want1")
    assert(got(2L).exists(v => math.abs(v - want2) < 1e-9))
    assert(got(3L).isEmpty, "a tokenless document weighs null")
  }

  test("diff model: union vocabulary, one-sided tokens fall to the other side's floor") {
    val target = fit("a a b")
    val raw = fit("b c")
    val d = Dsir.diffModel(target, raw)
    assert(d.logProbs.keySet == Set("a", "b", "c"))
    // a: in target only -> lpT(a) - oovR
    assert(math.abs(d.logProbs("a") - (target.logProbs("a") - raw.oovLogProb)) < 1e-12)
    // c: in raw only -> oovT - lpR(c)
    assert(math.abs(d.logProbs("c") - (target.oovLogProb - raw.logProbs("c"))) < 1e-12)
    assert(math.abs(d.oovLogProb - (target.oovLogProb - raw.oovLogProb)) < 1e-12)
  }

  test("target-typical text outweighs raw-typical text on real data") {
    graft.expr.GraftFunctions.ensure(spark)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = LmScore.fitUnigram(real.where(col("doc_id") % 3 === 0), "text")
    val raw = LmScore.fitUnigram(real, "text")
    val scored = real.select(col("doc_id"),
        Dsir.logWeightCol(col("text"), target, raw).as("w"))
      .where(col("w").isNotNull)
    assert(scored.count() > 0)
    // the target docs themselves must average a higher weight than the pool
    val inT = scored.where(col("doc_id") % 3 === 0).agg(avg("w")).head.getDouble(0)
    val out = scored.where(col("doc_id") % 3 =!= 0).agg(avg("w")).head.getDouble(0)
    assert(inT > out, s"target-sample mean weight $inT must exceed off-target $out")
  }

  test("gumbel resampling: deterministic per seed, k rows, temperature->0 is top-k") {
    graft.expr.GraftFunctions.ensure(spark)
    val scored = (1L to 100L).map(i => (i, i / 100.0)).toDF("id", "w")
    val s1 = Dsir.resampleTopK(scored, "w", "id", k = 20, seed = 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    val s2 = Dsir.resampleTopK(scored, "w", "id", k = 20, seed = 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same seed must select the same rows")
    assert(s1.size == 20)
    val s3 = Dsir.resampleTopK(scored, "w", "id", k = 20, seed = 8L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 != s3, "a different seed must move the sample")
    // tiny temperature: logW/tau dominates the gumbel noise -> exact top-k
    val cold = Dsir.resampleTopK(scored, "w", "id", k = 20, seed = 7L, temperature = 1e-9)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(cold == (81L to 100L).toSet, s"cold resampling must be top-k: $cold")
  }

  test("selectTopFraction keeps the heaviest frac, ties-at-threshold included, nulls out") {
    val scored = ((1L to 100L).map(i => (i, Some(i / 100.0))) :+ (101L, None))
      .toDF("id", "w")
    val top = Dsir.selectTopFraction(scored, "w", frac = 0.1, relErr = 0.0)
      .select("id").collect().map(_.getLong(0)).toSet
    // the exact quantile returns the rank-90 ELEMENT, which the >=
    // filter keeps (the at-least-frac, ties-included contract)
    assert(top == (90L to 100L).toSet, s"decile incl. threshold element: $top")
  }

  test("scoring plan: row-local, zero shuffle, native probe in codegen") {
    graft.expr.GraftFunctions.ensure(spark)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = LmScore.fitUnigram(real.limit(100), "text")
    val raw = LmScore.fitUnigram(real, "text")
    val q = real.select(col("doc_id"),
      Dsir.logWeightCol(col("text"), target, raw).as("w"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"row-local scoring must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"the folded diff model must not join:\n$plan")
    assert(plan.contains("unigram_ppl"), s"expected the native probe:\n$plan")
  }
}
