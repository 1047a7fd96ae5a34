package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `normalize_text`: native unicode normalization ahead of dedup /
  * fingerprinting (composed vs decomposed encodings of the same glyphs
  * must hash identically after canonicalization). Unicode in this spec
  * is spelled with explicit escapes so source encoding can't silently
  * change what is being tested. */
class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def ensure(): Unit = GraftFunctions.ensure(spark)

  private val Composed = "caf\u00e9"     // \u00e9 as one code point
  private val Decomposed = "cafe\u0301"  // e + combining acute

  test("NFC folds decomposed sequences onto composed forms (ground truth parity)") {
    ensure()
    val df = Seq((1L, Composed), (2L, Decomposed), (3L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"), GraftFunctions.normalizeText(col("t"), "NFC").as("n"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == got(2L), "composed and decomposed forms must normalize identically")
    assert(got(1L) == java.text.Normalizer.normalize(Composed, java.text.Normalizer.Form.NFC))
    assert(got(3L) == "plain ascii")
    // dedup consequence: the two spellings now share a fingerprint
    val hashes = Seq(Composed, Decomposed).toDF("t")
      .select(xxhash64(GraftFunctions.normalizeText(col("t"), "NFC"))).as[Long].collect()
    assert(hashes(0) == hashes(1))
  }

  test("NFKC folds compatibility forms (ligatures, full-width)") {
    ensure()
    val got = Seq(("\ufb01le", "\uff28\uff49")) // fi-ligature + "le"; full-width "Hi"
      .toDF("a", "b")
      .select(GraftFunctions.normalizeText(col("a"), "NFKC"),
        GraftFunctions.normalizeText(col("b"), "NFKC"))
      .head()
    assert(got.getString(0) == "file")
    assert(got.getString(1) == "Hi")
  }

  test("nulls pass through; unknown form fails analysis; non-literal form rejected") {
    ensure()
    val df = Seq((1L, Option("x")), (2L, None)).toDF("id", "t")
    val got = df.select(GraftFunctions.normalizeText(col("t"), "NFD")).collect()
    assert(got(1).isNullAt(0))
    val e = intercept[Exception] {
      df.select(GraftFunctions.normalizeText(col("t"), "NFX")).collect()
    }
    assert(e.getMessage.contains("normalize_text"), e.getMessage)
    val e2 = intercept[Exception] {
      df.createOrReplaceTempView("tn_in")
      spark.sql("SELECT normalize_text(t, t) FROM tn_in").collect()
    }
    assert(e2.getMessage.contains("normalize_text"), e2.getMessage)
  }

  test("expression participates in whole-stage codegen (no interpreted fallback)") {
    ensure()
    val df = spark.range(100).select(
      GraftFunctions.normalizeText(concat(lit(Decomposed + " "), col("id")), "NFC").as("n"))
    df.collect()
    val codegen = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegen.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.where(col("n").startsWith(Composed)).count() == 100,
      "decomposed input must arrive composed through the codegen path")
  }

  test("per-row path receives the pre-resolved Form constant, not a string name") {
    ensure()
    val df = spark.range(4).select(
      GraftFunctions.normalizeText(concat(lit("a"), col("id")), "NFC").as("n"))
    df.collect()
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("normalizeUtf8"), "expression must stay in codegen")
    assert(code.contains("Normalizer$Form"),
      "generated call must pass the Form reference object")
    assert(!code.contains("\"NFC\""),
      s"generated per-row call must not carry the form as a string (would re-resolve per row)")
  }

  test("registered SQL function works and already-normalized text round-trips unchanged") {
    ensure()
    Seq("abc", "x").toDF("t").createOrReplaceTempView("tn_sql")
    val got = spark.sql("SELECT normalize_text(t, 'NFC') AS n FROM tn_sql ORDER BY n")
      .as[String].collect().toSeq
    assert(got == Seq("abc", "x"))
  }
}
