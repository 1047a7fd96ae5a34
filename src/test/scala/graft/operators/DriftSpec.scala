package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-distribution drift: hand-computed probabilities, injected-
  * boilerplate detection, JSD properties. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def fit(texts: String*) = LmScore.fitUnigram(texts.toDF("text"), "text")

  test("tokenDrift: hand-computed union-vocab probabilities and ordering") {
    // ref "a a b": total 3, v 2, denom 6 -> p(a)=3/6, p(b)=2/6, oov 1/6
    // cur "a b b c": total 4, v 3, denom 8 -> p(a)=2/8, p(b)=3/8, p(c)=2/8, oov 1/8
    val drifts = Drift.tokenDrift(fit("a b b c"), fit("a a b"))
    val byTok = drifts.map(d => d.token -> d).toMap
    assert(math.abs(byTok("a").pCur - 2.0 / 8) < 1e-12)
    assert(math.abs(byTok("a").pRef - 3.0 / 6) < 1e-12)
    assert(math.abs(byTok("c").pRef - 1.0 / 6) < 1e-12, "ref-absent token takes the ref OOV floor")
    assert(math.abs(byTok("a").logRatio -
      (math.log(2.0 / 8) - math.log(3.0 / 6))) < 1e-12)
    // ordering: a moved by .25, b by ~.042, c by .083 -> a, c, b
    assert(drifts.map(_.token) == Seq("a", "c", "b"), drifts.map(_.token).toString)
  }

  test("injected boilerplate surfaces as the top mover on the real corpus") {
    val ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val cur = ref.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 5 === 0, " driftbug driftbug").otherwise("")).as("text"))
    val top = Drift.report(spark, cur, ref, "text", k = 5).collect()
    assert(top.head.getString(0) == "driftbug",
      s"the injected token must top the movers: ${top.map(_.getString(0)).toSeq}")
    assert(top.head.getDouble(3) > 0, "current-side mass gain has a positive log ratio")
  }

  test("jsDivergence: zero for identical corpora, symmetric, bounded by ln 2") {
    val a = fit("a a b c d")
    val b = fit("x y z z")
    assert(Drift.jsDivergence(a, a) == 0.0)
    assert(math.abs(Drift.jsDivergence(a, b) - Drift.jsDivergence(b, a)) < 1e-12)
    val d = Drift.jsDivergence(a, b)
    assert(d > 0.1 && d <= math.log(2.0) + 1e-12,
      s"disjoint-vocab corpora drift near the ln 2 bound: $d")
    // small perturbation drifts a little, not a lot
    val small = Drift.jsDivergence(fit("a a b c d"), fit("a a b c e"))
    assert(small > 0 && small < d / 2, s"small edit: $small vs disjoint $d")
  }

  test("jsDivergence: the ln 2 bound holds on ADVERSARIAL vocabs (tiny corpus vs huge disjoint vocab)") {
    // the r14 formula summed each side's OOV floor once per
    // other-side token, so a one-sentence corpus against thousands of
    // disjoint tokens summed to p-mass >> 1 and the "bound" ran into
    // the thousands; the renormalized form must stay within ln 2
    val tiny = fit("solo")
    val huge = fit((1 to 20000).map(i => s"tok$i").mkString(" "))
    for ((x, y) <- Seq((tiny, huge), (huge, tiny))) {
      val d = Drift.jsDivergence(x, y)
      assert(d >= 0 && d <= math.log(2.0) + 1e-12, s"bound violated: $d")
      // disjoint supports must still ALARM — the one observed token
      // carries 2/3 of the tiny model's mass against ~0 on the other
      // side (≈0.23 of divergence by itself). The value sits below
      // ln 2 because both models' smoothing reserves legitimately
      // overlap on the unseen side of the union.
      assert(d > 0.2, s"disjoint adversarial vocabs should drift hard: $d")
    }
    // still symmetric and still zero on self under the renormalization
    assert(Drift.jsDivergence(huge, huge) == 0.0)
    assert(math.abs(Drift.jsDivergence(tiny, huge) - Drift.jsDivergence(huge, tiny)) < 1e-12)
  }
}
