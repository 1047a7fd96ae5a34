package graft.operators

import graft.SparkSpec

/** Cross-corpus substring (token-window) dedup — the ExactSubstr
  * keep-first contract: every window duplicated beyond maxRepeats
  * keeps its (lowest id, lowest pos) occurrence and cuts the rest. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int, maxRepeats: Int = 1) =
    TextPrep.dedupTokenWindows(docs.toDF("doc_id", "text"), "doc_id", "text",
        windowSize = w, maxRepeats = maxRepeats)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("cross-doc duplicated run: first occurrence kept, later one cut") {
    val out = run(Seq(
      1L -> "intro alpha beta gamma delta tail one",
      2L -> "other alpha beta gamma delta tail two"), w = 4)
    // windows "alpha beta gamma delta" and "beta gamma delta tail"
    // both repeat; doc 1 holds the first occurrences, doc 2 loses the
    // union of the two spans (tokens 1..5)
    assert(out(1L) == (("intro alpha beta gamma delta tail one", 0L)))
    assert(out(2L) == (("other two", 5L)))
  }

  test("within-doc repetition: the second copy of a run is cut") {
    val out = run(Seq(1L -> "x a b c a b c"), w = 3)
    // "a b c" at pos 1 (kept) and pos 4 (cut -> tokens 4,5,6 removed)
    assert(out(1L) == (("x a b c", 3L)))
  }

  test("three occurrences: only the (min id, min pos) one survives") {
    val out = run(Seq(
      3L -> "zz p q r s end3",
      1L -> "aa p q r s end1",
      2L -> "bb p q r s end2"), w = 4)
    assert(out(1L) == (("aa p q r s end1", 0L)))
    assert(out(2L) == (("bb end2", 4L)))
    assert(out(3L) == (("zz end3", 4L)))
  }

  test("maxRepeats boundary: exactly-maxRepeats windows are untouched") {
    val docs = Seq(
      1L -> "aa p q r s end1",
      2L -> "bb p q r s end2")
    val out = run(docs, w = 4, maxRepeats = 2) // 2 occurrences, not > 2
    assert(out(1L) == (("aa p q r s end1", 0L)))
    assert(out(2L) == (("bb p q r s end2", 0L)))
  }

  test("docs shorter than the window pass through (normalized)") {
    val out = run(Seq(1L -> "  Hello   World ", 2L -> "", 3L -> "one"), w = 5)
    assert(out(1L) == (("hello world", 0L)))
    assert(out(2L) == (("", 0L)))
    assert(out(3L) == (("one", 0L)))
  }

  test("ultra-hot window: per-window agg state is count + one struct, not a posting list") {
    // one boilerplate window present in EVERY doc — the blockedCandidates
    // lesson: the plan must never collect a posting list per window
    val docs = (1L to 60L).map(i => i -> s"hot boiler plate window unique$i tail$i")
    val df = TextPrep.dedupTokenWindows(docs.toDF("doc_id", "text"),
      "doc_id", "text", windowSize = 4)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_set") && !plan.contains("collect_list(_h") &&
      !plan.contains("collect_list(_p, _h"),
      s"window stats must not aggregate posting lists:\n$plan")
    val out = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 keeps the hot window; every other doc loses exactly that span
    assert(out(1L) == "hot boiler plate window unique1 tail1")
    assert(out(2L) == "unique2 tail2")
    assert(out(60L) == "unique60 tail60")
  }

  test("overlapping flagged spans merge: no token survives inside any cut window") {
    // doc 2 repeats doc 1's run shifted by one token, so its deletion
    // spans overlap; the union must come out, nothing more
    val out = run(Seq(
      1L -> "m1 a b c d e m2",
      2L -> "a b c d e x a b c d e"), w = 5)
    // doc2 windows: "a b c d e" @0 and @6 — the @0 occurrence is the
    // FIRST (doc1's copy sits at pos 1 of doc 1 -> (1,1) < (2,0)? no:
    // (1,1) sorts before (2,0), so doc1 keeps it); both doc2 spans cut
    assert(out(1L) == (("m1 a b c d e m2", 0L)))
    assert(out(2L) == (("x", 10L)))
  }
}
