package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** L43: HTML → text extraction — hand-computed ground truth,
  * block classification rules, degradation on malformed markup, and
  * the scan-speed (zero-shuffle, codegen) plan contract. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.htmlToText(col("h")).as("t"))
      .head().getString(0)

  private def main(html: String, minTokens: Int = 3, maxLinkShare: Double = 0.34,
                   minStopRatio: Double = 0.0): String =
    Seq(html).toDF("h")
      .select(HtmlExtract.mainContent(col("h"), minTokens, maxLinkShare,
        minStopRatio).as("t"))
      .head().getString(0)

  test("htmlToText strips machinery, decodes entities, collapses whitespace") {
    val html =
      """<html><head><title>ignored</title><style>p { color: red }</style></head>
        |<body><!-- comment with <p>fake</p> markup -->
        |<script type="text/javascript">var x = "<div>not content</div>";</script>
        |<h1>Title</h1>
        |<p>one &amp; two &lt;three&gt; &quot;four&quot; &#39;five&#39;&nbsp;six</p>
        |</body></html>""".stripMargin
    assert(extract(html) ==
      "Title one & two <three> \"four\" 'five' six")
  }

  test("&amp; decodes LAST: one non-recursive pass") {
    // &amp;lt; must yield the literal text "&lt;", not "<"
    assert(extract("<p>a &amp;lt; b</p>") == "a &lt; b")
  }

  test("malformed markup degrades to whitespace, never errors") {
    assert(extract("<p>unclosed <div><span>nested</p> text") == "unclosed nested text")
    assert(extract("plain text, no markup at all") == "plain text, no markup at all")
    assert(extract("") == "")
  }

  test("mainContent drops link-dense and short blocks, keeps prose") {
    val html =
      """<body>
        |<h1>Hi</h1>
        |<div class="nav"><a href="/">home</a> <a href="/a">about</a> <a href="/c">contact</a></div>
        |<p>This paragraph is the actual content of the page and it survives.</p>
        |<div><a href="/x">one link</a> inside a longer sentence of prose that still reads like content</div>
        |<footer><a href="/p">privacy</a> <a href="/t">terms</a></footer>
        |</body>""".stripMargin
    val got = main(html)
    val blocks = got.split("\n").toSeq
    assert(blocks.exists(_.startsWith("This paragraph is the actual content")), got)
    assert(blocks.exists(_.contains("one link inside a longer sentence")),
      s"link-sparse prose must survive: $got")
    assert(!got.contains("home about contact"), s"nav must die by link density: $got")
    assert(!got.contains("privacy terms"), s"footer must die: $got")
    assert(!blocks.contains("Hi"), s"short header must die by minTokens: $got")
  }

  test("stopword gate kills keyword-stuffing blocks when enabled") {
    val html = "<p>buy cheap widgets best widgets cheap deals widgets</p>" +
      "<p>these are the words that a real sentence would use</p>"
    val strict = main(html, minStopRatio = 0.2)
    assert(strict == "these are the words that a real sentence would use", strict)
    // disabled (the default): both blocks survive
    assert(main(html).split("\n").length == 2)
  }

  test("extraction is one row-local projection: no shuffle, no UDF, codegen intact") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val html = concat(lit("<body><p>"), col("text"), lit("</p></body>"))
    val q = real.select(col("doc_id"),
      HtmlExtract.htmlToText(html).as("c"),
      HtmlExtract.mainContent(html).as("m"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython") &&
      !plan.contains("Invoke"), s"must be pure built-ins, no shuffle:\n$plan")
    assert(plan.contains("*(1)"), s"expected whole-stage codegen:\n$plan")
  }

  test("markdownToText: formatting layer dies, content survives — hand-computed") {
    def ext(s: String): String =
      Seq(s).toDF("m").select(MarkdownExtract.markdownToText(col("m"))).head().getString(0)
    assert(ext("# Title\nSome **bold** and *italic* prose.") ==
      "Title Some bold and italic prose.")
    assert(ext("See [the docs](https://ex.com/a?b=1) and `x += 1` inline.") ==
      "See the docs and x += 1 inline.")
    assert(ext("![alt text](img.png) leads") == "alt text leads")
    assert(ext("```\ncode line 1\ncode line 2\n```\nafter fence") == "after fence")
    assert(ext("- one\n- two\n1. three\n2) four") == "one two three four")
    assert(ext("> quoted\n---\nplain") == "quoted plain")
    assert(ext("| a | b |\n|---|---|\n| c | d |") == "a b c d")
    // snake_case survives the bold-underscore rule
    assert(ext("var_name stays __bold goes__") == "var_name stays bold goes")
  }

  test("markdownToText: weird markdown degrades to whitespace, never errors") {
    def ext(s: String): String =
      Seq(s).toDF("m").select(MarkdownExtract.markdownToText(col("m"))).head().getString(0)
    assert(ext("") == "")
    assert(ext("```` unbalanced ``` fence") !== null)
    assert(ext("[dangling](") == "[dangling](")  // non-matching syntax passes through
  }

  test("canonicalLink: both attribute orders, quote styles, absence; metaNoindex detection") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("""<link rel="canonical" href="https://a.com/x">""", "https://a.com/x"),
      ("""<link href="https://a.com/y" rel=canonical>""", "https://a.com/y"),
      ("""<LINK REL='canonical' HREF='https://a.com/z'>""", "https://a.com/z"),
      ("""<link rel="stylesheet" href="https://a.com/css">""", null),
      ("""no links at all""", null))
    val got = cases.map(_._1).toDF("h")
      .select(col("h"), HtmlExtract.canonicalLink(col("h")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"canonical($h) = ${got(h)}, want $want") }

    val noidx = Seq(
      """<meta name="robots" content="noindex, nofollow">""" -> true,
      """<META NAME=robots CONTENT="NOINDEX">""" -> true,
      """<meta name="robots" content="index, follow">""" -> false,
      """<meta name="viewport" content="noindex-ish nonsense">""" -> false)
    val got2 = noidx.map(_._1).toDF("h")
      .select(col("h"), HtmlExtract.metaNoindex(col("h")).as("n"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    noidx.foreach { case (h, want) =>
      assert(got2(h) == want, s"noindex($h) = ${got2(h)}, want $want") }
  }

  test("SitemapExtract: locs, index detection, entry-scoped lastmod pairing") {
    import spark.implicits._
    val urlset =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc> https://a.com/1 </loc><lastmod>2026-01-01</lastmod></url>
        |  <url><loc>https://a.com/2</loc></url>
        |  <url><lastmod>2026-02-02</lastmod></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc></sitemap>
        |<sitemap><loc>https://a.com/s2.xml</loc><lastmod>2026-03-03</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    val df = Seq(("u", urlset), ("i", index)).toDF("id", "xml")
    val got = df.select(col("id"),
        SitemapExtract.locs(col("xml")).as("locs"),
        SitemapExtract.isIndex(col("xml")).as("idx"),
        SitemapExtract.entries(col("xml")).as("es"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](1), r.getBoolean(2),
          r.getSeq[org.apache.spark.sql.Row](3).map(e =>
            (e.getString(0), Option(e.getString(1))))))).toMap
    assert(got("u")._1 == Seq("https://a.com/1", "https://a.com/2"))
    assert(!got("u")._2)
    // loc-less entry dropped; lastmod pairs with ITS loc, null when absent
    assert(got("u")._3 == Seq(
      ("https://a.com/1", Some("2026-01-01")), ("https://a.com/2", None)))
    assert(got("i")._2)
    assert(got("i")._3 == Seq(
      ("https://a.com/s1.xml", None), ("https://a.com/s2.xml", Some("2026-03-03"))))
  }
}
