package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-corpus segment/line dedup (CCNet-style boilerplate scrub). */
class TextPrepDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "COOKIE BANNER\nreal content one\nfooter"),
    (2L, "COOKIE BANNER\nreal content two\nfooter"),
    (3L, "COOKIE BANNER\nreal content three\nfooter"),
    (4L, "COOKIE BANNER\nunique line here"),
    (5L, "all original\nnothing shared")).toDF("doc_id", "text")

  test("lines repeating more than minRepeats vanish; order and uniques survive") {
    val out = TextPrep.dedupLines(docs, "doc_id", "text", minRepeats = 2)
      .select("doc_id", "text_clean").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // COOKIE BANNER appears 4x (>2) -> dropped; footer 3x (>2) -> dropped
    assert(out(1L) == "real content one")
    assert(out(4L) == "unique line here")
    assert(out(5L) == "all original\nnothing shared")
  }

  test("minRepeats boundary: exactly-minRepeats segments are kept") {
    val out = TextPrep.dedupLines(docs, "doc_id", "text", minRepeats = 4)
      .select("doc_id", "text_clean").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // COOKIE BANNER appears exactly 4 times -> NOT > 4 -> kept
    assert(out(1L) == "COOKIE BANNER\nreal content one\nfooter")
  }

  test("a doc of pure boilerplate becomes the empty string (row kept)") {
    val d = Seq((1L, "same\nsame"), (2L, "same"), (3L, "same\nother")).toDF("doc_id", "text")
    val out = TextPrep.dedupLines(d, "doc_id", "text", minRepeats = 1)
      .select("doc_id", "text_clean").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == "" && out(2L) == "" && out(3L) == "other")
  }

  test("in-place path and join-fallback path produce identical results") {
    val fast = TextPrep.dedupLines(docs, "doc_id", "text", minRepeats = 2)
      .select("doc_id", "text_clean")
    // maxDriverSet = 0 forces the explode/anti-join/reassemble fallback
    val slow = TextPrep.dedupSegments(docs, "doc_id", "text",
        t => split(t, "\n"), "\n", minRepeats = 2, maxDriverSet = 0)
      .select("doc_id", "text_clean")
    assert(fast.collect().toSet == slow.collect().toSet)
  }

  test("no frequent segments -> text rebuilt verbatim (modulo joiner)") {
    val d = Seq((1L, "a\nb"), (2L, "c")).toDF("doc_id", "text")
    val out = TextPrep.dedupLines(d, "doc_id", "text", minRepeats = 5)
      .select("doc_id", "text_clean").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a\nb", 2L -> "c"))
  }

  test("plan shape: the in-place rebuild has no shuffle of the corpus") {
    val cleaned = TextPrep.dedupLines(docs, "doc_id", "text", minRepeats = 2)
    val plan = cleaned.queryExecution.executedPlan.toString
    val body = plan.split("== Initial Plan ==").head
    assert(!body.contains("Exchange"), s"corpus rebuild should be shuffle-free:\n$body")
  }

  test("repetition metrics: top-bigram fraction and type-token ratio") {
    val d = Seq(
      (1L, "spam spam spam spam"),            // bigram "spam spam" fills all 3 slots
      (2L, "a b c d"),                        // all bigrams unique
      (3L, "x"),                              // no bigrams
      (4L, "")).toDF("doc_id", "text")
    val m = TextPrep.repetitionMetrics(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(1L) == ((1.0, 0.25)))            // 3/3 bigrams, 1 distinct of 4 tokens
    assert(m(2L) == ((round6(1.0 / 3), 1.0)))
    assert(m(3L) == ((0.0, 1.0)))
    assert(m(4L) == ((0.0, 1.0)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
