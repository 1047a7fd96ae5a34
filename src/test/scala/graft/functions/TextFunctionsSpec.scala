package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L9–L12: text-analysis functions with hand-computed expectations. */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  test("L11 token counts: whitespace and BPE-ish") {
    val r = one("Hello, world!  This is   fine.")
      .select(
        TextFunctions.tokenCountWs(col("t")).as("ws"),
        TextFunctions.tokenCountBpe(col("t")).as("bpe"),
        TextFunctions.charCount(col("t")).as("n")).head()
    assert(r.getInt(0) == 5)
    // Hello , world ! This is fine . -> 8 BPE-ish tokens
    assert(r.getInt(1) == 8)
    assert(r.getInt(2) == 30)
    assert(one("").select(TextFunctions.tokenCountWs(col("t"))).head().getInt(0) == 0)
    assert(one("   ").select(TextFunctions.tokenCountWs(col("t"))).head().getInt(0) == 0)
  }

  test("r17 review pins: tab/newline boundaries add no phantom tokens and don't split fingerprints") {
    // Spark's trim strips only the space character; the old
    // trim-then-split kept boundary empties, so nearly every real
    // document (trailing newline) counted a phantom token — inflating
    // every token-denominated metric — and "foo\n" fingerprinted
    // differently from "foo", splitting byte-identical content across
    // dedup buckets
    def ws(t: String) = one(t).select(TextFunctions.tokenCountWs(col("t"))).head().getInt(0)
    assert(ws("hello world\n") == 2, "trailing newline must not add a token")
    assert(ws("\thello world") == 2)
    assert(ws("\t") == 0 && ws("\n\n") == 0, "whitespace-only text has zero tokens")
    assert(ws("a\t\nb") == 2)
    def fp(t: String) = one(t).select(TextFunctions.fingerprint(col("t"))).head().getLong(0)
    assert(fp("foo\n") == fp("foo"), "trailing newline must not split dedup buckets")
    assert(fp("\tfoo bar\r\n") == fp("foo bar"))
    assert(fp("foo") != fp("foo x"))
    val md5s = Seq("foo\n", "foo").map(t =>
      one(t).select(TextFunctions.fingerprintMd5(col("t"))).head().getString(0))
    assert(md5s.head == md5s(1))
    val toks = one("foo bar\n").select(TextFunctions.tokens(col("t"))).head().getSeq[String](0)
    assert(toks == Seq("foo", "bar"), s"no phantom empty token: $toks")
    val mwl = one("ab cd\n").select(TextFunctions.meanWordLen(col("t"))).head().getDouble(0)
    assert(math.abs(mwl - 2.0) < 1e-9, s"meanWordLen over 2 tokens: $mwl")
    val sr = one("the cat\n").select(TextFunctions.stopwordRatio(col("t"))).head().getDouble(0)
    assert(math.abs(sr - 0.5) < 1e-9, s"stopword ratio over 2 tokens: $sr")
  }

  test("L10 quality ratios") {
    val r = one("ABc de!?")
      .select(
        TextFunctions.punctRatio(col("t")).as("p"),
        TextFunctions.upperRatio(col("t")).as("u"),
        TextFunctions.meanWordLen(col("t")).as("m")).head()
    assert(math.abs(r.getDouble(0) - 2.0 / 8) < 1e-9)  // ! and ? of 8 chars
    assert(math.abs(r.getDouble(1) - 2.0 / 5) < 1e-9)  // A B of ABcde
    assert(math.abs(r.getDouble(2) - 7.0 / 2) < 1e-9)  // 7 non-space chars / 2 words
    val q = one("The quick brown fox jumps over the lazy dog near the river bank today.")
      .select(TextFunctions.qualityScore(col("t"))).head().getDouble(0)
    assert(q > 0 && q <= 1.0)
  }

  test("stopword ratio") {
    val r = one("the cat and the dog").select(TextFunctions.stopwordRatio(col("t"))).head().getDouble(0)
    assert(math.abs(r - 3.0 / 5) < 1e-9) // the, and, the
    assert(one("").select(TextFunctions.stopwordRatio(col("t"))).head().getDouble(0) == 0.0)
  }

  test("L12 fingerprint is normalization-invariant and content-sensitive") {
    val df = Seq(
      ("a", "Hello   World"), ("b", "  hello world "), ("c", "hello worlds")
    ).toDF("id", "t").select(col("id"), TextFunctions.fingerprint(col("t")).as("fp"))
    val fps = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fps("a") == fps("b")) // case/whitespace normalized
    assert(fps("a") != fps("c"))
  }

  test("seeded fingerprint is an independent hash family, not a function of the unseeded one") {
    // r18 ADVICE pin: Spark's xxhash64 folds children sequentially
    // (running hash = next seed), so the OLD spelling
    // xxhash64(text, seed) was H(seed, H(text, 42)) — derivable from
    // the unseeded fingerprint, which made a widened two-hash dedup
    // key add zero collision resistance. Seed-FIRST perturbs the hash
    // state before the text folds in.
    val df = Seq(("a", "hello world"), ("b", "some other doc")).toDF("id", "t")
      .select(col("id"),
        TextFunctions.fingerprint(col("t")).as("fp"),
        TextFunctions.fingerprint(col("t"), seed = 7).as("fp7"),
        // the OLD derived-from-unseeded value: must NOT equal fp7
        xxhash64(lower(trim(regexp_replace(col("t"), "\\s+", " "))), lit(7)).as("derived"))
    df.collect().foreach { r =>
      assert(r.getLong(2) != r.getLong(3),
        s"seeded fingerprint must not be derivable from the unseeded one: $r")
      assert(r.getLong(1) != r.getLong(2), s"seeded must differ from unseeded: $r")
    }
    // same seed, same text -> deterministic (the state-key contract)
    val again = Seq(("a", "hello world")).toDF("id", "t")
      .select(TextFunctions.fingerprint(col("t"), seed = 7)).head().getLong(0)
    assert(again == df.where(col("id") === "a").head().getLong(2))
  }

  test("L9 language id picks the evident language") {
    val r = Seq(
      ("en", "the cat sat on the mat with the dog and that was that"),
      ("de", "der hund und die katze sind nicht mit einem vogel über müde straßen"),
      ("fr", "le chat est dans la maison et les oiseaux dans une cage pour été"),
      ("es", "el perro y los gatos en una casa para el niño con mañana"),
      ("zh", "这是一个中文句子用于测试语言识别"),
      ("und", "zzz qqq kkk")
    ).toDF("want", "t").select(col("want"), TextFunctions.langId(col("t")).as("got"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    r.foreach { case (want, got) => assert(got == want, s"expected $want got $got") }
  }

  test("repetition ratio counts duplicated non-empty lines") {
    val r = one("aaa\nbbb\naaa\n\nccc\naaa")
      .select(TextFunctions.repetitionRatio(col("t"))).head().getDouble(0)
    assert(math.abs(r - 2.0 / 5) < 1e-9) // 5 non-empty lines, 2 repeats of aaa
    assert(one("").select(TextFunctions.repetitionRatio(col("t"))).head().getDouble(0) == 0.0)
    assert(one("x\ny\nz").select(TextFunctions.repetitionRatio(col("t"))).head().getDouble(0) == 0.0)
  }

  test("char entropy: uniform text high, degenerate low") {
    def e(s: String) = one(s).select(TextFunctions.charEntropy(col("t"))).head().getDouble(0)
    assert(math.abs(e("aabb") - 1.0) < 1e-9)        // two symbols, uniform -> 1 bit
    assert(e("aaaaaaaa") == 0.0)                    // single symbol -> 0 bits
    assert(math.abs(e("abcd") - 2.0) < 1e-9)        // four uniform symbols -> 2 bits
    assert(e("") == 0.0)
    assert(e("the quick brown fox") > e("aaaaaaaaaaaaaaaaaaa"))
  }

  test("shingles: sizes and contents") {
    val r = one("a b c d").select(TextFunctions.wordShingles(col("t"), 3)).head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = one("a b").select(TextFunctions.wordShingles(col("t"), 3)).head().getSeq[String](0)
    assert(short.isEmpty)
    val ng = one("abcd").select(TextFunctions.charNgrams(col("t"), 2)).head().getSeq[String](0)
    assert(ng == Seq("ab", "bc", "cd"))
  }

  test("mojibake ratio counts replacement/control/C1 chars; tab-newline-CR are fine") {
    def ratio(s: String): Double =
      Seq(s).toDF("t").select(TextFunctions.mojibakeRatio(col("t"))).head().getDouble(0)
    assert(ratio("clean prose, nothing wrong") == 0.0)
    assert(ratio("tabs\tand\nnewlines\rok") == 0.0)
    // 4 damaged of 8 chars: FFFD, BEL, C1 0x9C, DEL
    assert(math.abs(ratio("ab\uFFFD\u0007cd\u009C\u007F") - 4.0 / 8) < 1e-12)
    assert(ratio("") == 0.0)
  }

  test("deflate ratio: repetitive text crushes, varied prose does not, empty is null") {
    graft.expr.GraftFunctions.ensure(spark)
    def ratio(s: String): Option[Double] = {
      val r = Seq(s).toDF("t")
        .select(graft.expr.GraftFunctions.deflateRatio(col("t"))).head()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val looped = ("the same exact sentence repeated over and over again. " * 40)
    val varied = (1 to 40).map(i =>
      s"sentence number $i speaks about topic ${i * 37 % 101} in its own words").mkString(". ")
    val rl = ratio(looped).get
    val rv = ratio(varied).get
    assert(rl < 0.1, s"looped text must crush under zlib: $rl")
    assert(rv > rl * 3, s"varied prose must compress far less: varied=$rv looped=$rl")
    assert(ratio("").isEmpty, "empty text scores null, not zero")
    // long-range repetition invisible to the line/bigram signals:
    // a whole paragraph pasted with varied separators still crushes
    val para = "a reasonably long paragraph with plenty of distinct words inside it"
    val pasted = (1 to 30).map(i => para).mkString(s"\n")
    assert(ratio(pasted).get < 0.15, "paragraph-level looping must be caught")
  }

  test("line-wise ratios: bullets, ellipsis teasers, letterless lines — hand-computed") {
    def ratios(s: String): (Double, Double, Double) = {
      val r = Seq(s).toDF("t").select(
        TextFunctions.bulletLineRatio(col("t")),
        TextFunctions.ellipsisLineRatio(col("t")),
        TextFunctions.nonAlphaLineRatio(col("t"))).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    // 5 non-empty lines (blank separator NOT counted): 2 bullets
    // (dash + typographic), 1 ellipsis, 1 letterless
    val doc = "intro prose line\n- first item\n\n• second item\nRead more...\n$ 12.50"
    val (b, e, n) = ratios(doc)
    assert(math.abs(b - 2.0 / 5) < 1e-12, s"bullet $b")
    assert(math.abs(e - 1.0 / 5) < 1e-12, s"ellipsis $e")
    assert(math.abs(n - 1.0 / 5) < 1e-12, s"nonalpha $n")
    assert(ratios("") == ((0.0, 0.0, 0.0)), "empty text: all ratios 0")
    // one-char ellipsis and indentation-tolerant bullets both count
    val (b2, e2, _) = ratios("  - indented bullet\ncontinued…")
    assert(b2 == 0.5 && e2 == 0.5)
    // a dash WITHOUT following whitespace is a word, not a bullet
    val (b3, _, _) = ratios("-dashword starts this line\nprose")
    assert(b3 == 0.0)
  }

  test("code-likeness: prose scores low, source code high; sub-signals hand-checked") {
    def score(s: String): (Double, Double, Double, Double) = {
      val r = Seq(s).toDF("t").select(
        TextFunctions.symbolRatio(col("t")),
        TextFunctions.indentedLineRatio(col("t")),
        TextFunctions.codeKeywordDensity(col("t")),
        TextFunctions.codeLikeScore(col("t"))).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val prose = "The quick brown fox jumps over the lazy dog and keeps running " +
      "through the quiet field while nobody watches it at all."
    val code = "def f(x):\n  return (x + 1) * arr[0]\n" +
      "class A {\n  public static void g() { y = a && b; }\n}"
    val (pSym, pInd, pKd, pScore) = score(prose)
    val (cSym, cInd, cKd, cScore) = score(code)
    assert(pSym < 0.02 && pInd == 0.0 && pKd == 0.0, s"prose signals: $pSym $pInd $pKd")
    assert(pScore < 0.1, s"prose composite: $pScore")
    assert(cSym > 0.1, s"code symbol ratio: $cSym")
    assert(cInd == 0.4, s"2 of 5 lines indented: $cInd")
    assert(cKd > 0.1, s"keyword density: $cKd")
    assert(cScore >= 0.5, s"code composite: $cScore")
    // "definition of classical imports" must NOT fire the keyword rule
    val (_, _, kd, _) = score("the definition of classical imports returns nothing")
    assert(kd == 0.0, s"prose words containing keywords must not fire: $kd")
  }

  test("lineQualityKeep: composed decision flips on each rule independently") {
    def keep(s: String): Boolean =
      Seq(s).toDF("t")
        .select(TextFunctions.lineQualityKeep(col("t"), 0.5, 0.25, 0.4)).head().getBoolean(0)
    assert(keep("plain prose line one\nplain prose line two"))
    assert(!keep("- a\n- b\n- c\nprose"), "75% bullet lines must drop")
    assert(!keep("teaser one...\nteaser two…\nprose line"), "67% ellipsis must drop")
    assert(!keep("12345\n$9.99\nprose line"), "67% letterless must drop")
  }
}
