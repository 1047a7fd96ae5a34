package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L17/L18: PII scrubbing and fixed-token-window chunking. */
class TextPrepSpec extends SparkSpec {
  import spark.implicits._

  test("L17 PII scrub masks emails, IPs, phones and card numbers with typed tokens") {
    val df = Seq(
      (1L, "write to jane.doe+spam@mail.example.com or admin@sub.domain.io today"),
      (2L, "server at 192.168.0.17 and backup at 10.0.0.1 went down"),
      (3L, "call +1 (555) 010-4477 or 0044 7700 900123 now"),
      (4L, "card 4111 1111 1111 1111 expires soon"),
      (5L, "no pii here just words")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextPrep.scrubPii(col("text")).as("clean"),
        TextPrep.piiCounts(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "write to <EMAIL> or <EMAIL> today")
    assert(out(2L).getString(1) == "server at <IP> and backup at <IP> went down")
    assert(out(3L).getString(1).contains("<PHONE>") && !out(3L).getString(1).exists(_.isDigit))
    assert(out(4L).getString(1) == "card <CARD> expires soon",
      s"card must win over phone: ${out(4L).getString(1)}")
    assert(out(5L).getString(1) == "no pii here just words")
    assert(out(1L).getStruct(2).getInt(0) == 2) // emails
    assert(out(2L).getStruct(2).getInt(1) == 2) // ips
    assert(out(4L).getStruct(2).getInt(3) == 1) // cards
  }

  test("L18 chunking: windows, overlap, coverage, short and empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than window
      (3L, ""), (4L, "   ")                           // no chunks
    ).toDF("doc_id", "text")
    val out = TextPrep.chunk(docs, "text", "doc_id", maxTokens = 4, overlap = 1)
    val rows = out.select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows.filter(_._1 == 1L).map(_._3) == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"),
      s"stride-3 windows over 10 tokens: $rows")
    assert(rows.filter(_._1 == 1L).map(_._4) == Seq(4, 4, 4))
    assert(rows.filter(_._1 == 2L) == Seq((2L, 0, "a b c", 3)))
    assert(!rows.exists(r => r._1 == 3L || r._1 == 4L), "empty docs produce no chunks")
    // consecutive chunks share exactly `overlap` tokens; union covers the doc
    val toks1 = rows.filter(_._1 == 1L).map(_._3.split(" ").toSeq)
    toks1.sliding(2).foreach { case Seq(a, b) => assert(a.takeRight(1) == b.take(1)); case _ => }
    assert(toks1.flatten.distinct.size == 10)
    // no overlap mode tiles exactly
    val flat = TextPrep.chunk(docs, "text", "doc_id", maxTokens = 4)
      .where(col("doc_id") === 1L).select("chunk_text").as[String].collect().toSeq
    assert(flat == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
  }

  test("sentence-aware chunking: boundaries snap to sentence ends, never mid-sentence") {
    // 3 sentences of 4/4/3 tokens; budget 6: s1 alone overflows into
    // chunk 0 (before=0), s2 starts at before=4 -> chunk 0, s3 at
    // before=8 -> chunk 1
    val doc = Seq((1L, "one two three four. five six seven eight! nine ten eleven?"))
      .toDF("doc_id", "text")
    val out = TextPrep.chunkBySentence(doc, "text", "doc_id", maxTokens = 6)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (0, "one two three four. five six seven eight!", 8),
      (1, "nine ten eleven?", 3)), out.toSeq.toString)
  }

  test("sentence-aware chunking: over-budget sentence gets its own chunk; ids stay dense") {
    // s1 = 10 tokens (budget 4): chunk 0; s2 starts at before=10 ->
    // floor(10/4)=2, but ids are DENSE -> chunk 1, not 2
    val doc = Seq((1L, "a b c d e f g h i j. k l."))
      .toDF("doc_id", "text")
    val out = TextPrep.chunkBySentence(doc, "text", "doc_id", maxTokens = 4)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq((0, "a b c d e f g h i j."), (1, "k l.")),
      out.toSeq.toString)
  }

  test("sentence-aware chunking: unterminated tails, empty docs, no-punctuation docs") {
    val docs = Seq(
      (1L, "complete sentence here. trailing tail without period"),
      (2L, ""),
      (3L, "no punctuation at all just words")
    ).toDF("doc_id", "text")
    val out = TextPrep.chunkBySentence(docs, "text", "doc_id", maxTokens = 100)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out(1L) == "complete sentence here. trailing tail without period")
    assert(!out.contains(2L), "empty doc emits no chunks")
    assert(out(3L) == "no punctuation at all just words")
  }
  test("r16: null-text docs produce zero chunks, and piiCounts reconciles with scrubPii") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, "one two three four")).toDF("doc_id", "text")
    val chunks = TextPrep.chunk(docs, "text", "doc_id", maxTokens = 3)
    assert(chunks.where(col("doc_id") === 1L).count() == 0, "null text must yield zero chunks")
    assert(chunks.where(col("doc_id") === 2L).count() == 2)
    // a card number is NOT also a phone; an IPv4 is NOT also a phone
    val pii = Seq(Tuple1("card 4111 1111 1111 1111 ip 10.1.2.3 tel +1 555 010 9999"))
      .toDF("text").select(TextPrep.piiCounts(col("text")).as("c"))
      .select("c.emails", "c.ips", "c.phones", "c.cards").head()
    assert((pii.getInt(0), pii.getInt(1), pii.getInt(2), pii.getInt(3)) == ((0, 1, 1, 1)),
      s"got $pii - counts must match what scrubPii masks")
    // masking must not BRIDGE flanking digit runs into a phony phone
    val bridge = Seq(Tuple1("12345 10.1.2.3 67890")).toDF("text")
      .select(TextPrep.piiCounts(col("text")).as("c")).select("c.phones", "c.ips").head()
    assert((bridge.getInt(0), bridge.getInt(1)) == ((0, 1)), s"got $bridge")
  }

  test("L67 cleanLines: junk lines drop, prose survives, within-doc repeats collapse") {
    val prose = "This is a perfectly reasonable paragraph of running text."
    val doc = Seq(
      prose,
      "- see",                                    // short bullet fragment: drop
      "12345",                                    // letterless counter: drop
      "$9.99 + 42",                               // letterless debris: drop
      "Read more...",                             // short teaser: drop
      "- a bulleted line of real prose that is clearly long enough", // long bullet: KEEP
      "This sentence genuinely continues beyond thirty characters...", // long "...": KEEP
      "",                                         // blank: layout, uncounted
      "   ",                                      // whitespace-only: layout
      prose,                                      // repeat of line 1: drop
      "A closing line that is new content here."  // KEEP
    ).mkString("\n")
    val out = TextPrep.cleanLines(Seq(Tuple1(doc)).toDF("text"), "text").head()
    val clean = out.getAs[String]("text_clean")
    assert(clean == Seq(prose,
      "- a bulleted line of real prose that is clearly long enough",
      "This sentence genuinely continues beyond thirty characters...",
      "A closing line that is new content here.").mkString("\n"), clean)
    assert(out.getAs[Int]("lines_kept") == 4)
    assert(out.getAs[Int]("lines_dropped") == 5, "blank lines must not count as dropped")
    assert(out.getAs[Double]("line_drop_frac") == 0.5556) // round(5/9, 4)
    // CRLF endings and leading/trailing spaces normalize before rules
    val crlf = TextPrep.cleanLines(
      Seq(Tuple1("  left pad stays fine here as prose \r\n- see\r\n")).toDF("text"), "text").head()
    assert(crlf.getAs[String]("text_clean") == "left pad stays fine here as prose")
    // degenerate docs: no lines -> frac 0, empty clean text
    val empty = TextPrep.cleanLines(Seq(Tuple1("\n  \n")).toDF("text"), "text").head()
    assert(empty.getAs[Int]("lines_kept") == 0 && empty.getAs[Double]("line_drop_frac") == 0.0)
    assert(empty.getAs[String]("text_clean") == "")
  }

  test("L67 cleanLines: sort-based pass equals reference first-occurrence semantics on random docs") {
    // differential check of the r19 O(L log L) rewrite: 60 random docs
    // (duplicate-heavy vocab, junk lines, blanks, padding) against an
    // independent quadratic Scala reference of the documented rules —
    // one Spark job for all docs. ASCII + spaces only: Spark's trim
    // strips ' ' while Java's strips all <= U+0020, so the vocab must
    // not smuggle tabs into the comparison.
    val rnd = new scala.util.Random(4242)
    val vocab = Vector(
      "Prose line with letters in it", "- hit", "12345", "Read more...",
      "Another long enough prose sentence right here",
      "- a genuinely long bulleted prose line over thirty characters",
      "Short end...", "  padded prose line  ", "", "   ",
      "dup line content", "DUP LINE CONTENT", "$9.99 + 42",
      "This sentence genuinely continues beyond thirty characters...")
    val docs = (0 until 60).map { i =>
      (0 until rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString("\n")
    }
    def isLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def ref(doc: String): (String, Int, Int, Double) = {
      val cand = doc.replace("\r", "").split("\n", -1).toSeq
        .map(_.replaceAll("^ +| +$", "")).filter(_.nonEmpty)
      val kept = cand.zipWithIndex.filter { case (l, i) =>
        l.exists(isLetter) &&
          !(l.length < 30 && "-*•".contains(l.head)) &&
          !(l.length < 30 && l.endsWith("...")) &&
          !cand.take(i).contains(l)
      }.map(_._1)
      val dropped = cand.size - kept.size
      val frac = if (cand.isEmpty) 0.0
        else BigDecimal(dropped.toDouble / cand.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (kept.mkString("\n"), kept.size, dropped, frac)
    }
    val out = TextPrep.cleanLines(docs.zipWithIndex.map(_.swap).toDF("i", "text"), "text")
      .select("i", "text_clean", "lines_kept", "lines_dropped", "line_drop_frac")
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    docs.zipWithIndex.foreach { case (doc, i) =>
      assert(out(i) == ref(doc), s"doc $i diverged:\n${doc.take(200)}\ngot ${out(i)}\nref ${ref(doc)}")
    }
  }

  test("L67 cleanLines: first-occurrence dedup is near-linear, not O(L^2), per doc") {
    // 50k lines, every line duplicated once: the retired
    // exists(slice(all, 1, i)) spelling is ~1.25e9 string compares for
    // this ONE row (minutes); the sort-based pass is two array_sorts +
    // one linear flag scan. The wall bound is deliberately loose (CI
    // host noise) but sits orders of magnitude under the quadratic
    // blow-up, so a regression back to per-line prefix rescans trips it.
    val n = 25000
    val doc = (0 until n).flatMap(i =>
      Seq(s"prose line number $i with enough words to pass every keep rule",
          s"prose line number $i with enough words to pass every keep rule"))
      .mkString("\n")
    val t0 = System.nanoTime()
    val out = TextPrep.cleanLines(Seq(Tuple1(doc)).toDF("text"), "text")
      .select("lines_kept", "lines_dropped", "line_drop_frac").head()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.getAs[Int]("lines_kept") == n, out)
    assert(out.getAs[Int]("lines_dropped") == n, out)
    assert(out.getAs[Double]("line_drop_frac") == 0.5)
    assert(sec < 30.0, f"cleanLines took $sec%.1f s on a 50k-line doc - quadratic regression?")
  }
}
