package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * HTML → training-text extraction — the first stage of every
 * web-crawl pipeline (CommonCrawl WARC → WET): strip markup, drop
 * non-content machinery (scripts, styles, comments, head), and
 * optionally keep only CONTENT blocks, classifying each block by link
 * density and length the way jusText/trafilatura-style boilerplate
 * removal does (navigation, footers and link farms are short and
 * link-dense; prose is long and link-sparse).
 *
 * Everything here is a composition of codegen'd built-ins
 * (`regexp_replace`, array HOFs) — one row-local projection, zero
 * shuffle, zero UDF, whole-stage codegen intact — because at 100 TB
 * the extraction pass touches every byte of the crawl and must run at
 * scan speed. Patterns are RE2-compatible (no backreferences, no
 * lookaround) so a SQL oracle (DuckDB uses RE2) replays them exactly;
 * the block-tag vocabulary is the HTML5 flow-content core.
 *
 * This is deliberately a heuristic extractor, not an HTML5 tree
 * parser: malformed markup degrades to extra whitespace, never to an
 * error, which is the right failure mode for crawl data.
 */
object HtmlExtract {

  /** Comments, scripts, styles and the whole head are never content. */
  private val NonContent = Seq(
    "(?s)<!--.*?-->",
    "(?is)<script\\b[^>]*>.*?</script>",
    "(?is)<style\\b[^>]*>.*?</style>",
    "(?is)<head\\b[^>]*>.*?</head>")

  /** Open/close forms of block-level (flow-content) tags — these mark
    * block boundaries, so they rewrite to newline, not space. */
  val BlockTagPattern: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|tr|td|th|table|br|hr|section|article|" +
      "header|footer|nav|blockquote|pre|form|aside|main)\\b[^>]*>"

  private def stripNonContent(html: Column): Column =
    NonContent.foldLeft(html)((c, p) => regexp_replace(c, p, " "))

  /** The five entities that dominate real markup plus nbsp; `&amp;`
    * decodes LAST so `&amp;lt;` yields the literal `&lt;` (one decode
    * pass, the standard non-recursive rule). */
  private def decodeEntities(c: Column): Column = {
    val steps = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  /** Full tag-stripped text: non-content removed, every tag deleted,
    * entities decoded, whitespace collapsed to single spaces. The
    * WET-file shape — use [[mainContent]] when boilerplate blocks
    * should go too. */
  def htmlToText(html: Column): Column = {
    val noTags = regexp_replace(stripNonContent(html), "(?s)<[^>]*>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** `<link rel="canonical" href=...>` extraction — the page's OWN
    * declaration of its canonical spelling, the strongest URL-dedup
    * signal a crawl carries (mirrors/print views/tracking variants all
    * point at one canonical; feed the result through
    * [[graft.operators.UrlCuration.canonicalizeUrl]] and dedup on it).
    * Both attribute orders handled (rel-first and href-first), RE2
    * syntax so the oracle replays it. Null when absent. */
  def canonicalLink(html: Column): Column = {
    val relFirst = regexp_extract(html,
      "(?is)<link[^>]*rel\\s*=\\s*[\"']?canonical[\"']?[^>]*href\\s*=\\s*[\"']([^\"']+)[\"']", 1)
    val hrefFirst = regexp_extract(html,
      "(?is)<link[^>]*href\\s*=\\s*[\"']([^\"']+)[\"'][^>]*rel\\s*=\\s*[\"']?canonical[\"']?", 1)
    nullif(coalesce(nullif(relFirst, lit("")), nullif(hrefFirst, lit(""))), lit(""))
  }

  /** `<meta name="robots" content="...noindex...">` detection — pages
    * that ask to be excluded from indexes are usually junk for
    * training too (soft-404s, login walls, duplicate listings). */
  def metaNoindex(html: Column): Column =
    regexp_extract(html,
      "(?is)<meta[^>]*name\\s*=\\s*[\"']?robots[\"']?[^>]*content\\s*=\\s*[\"'][^\"']*noindex",
      0) =!= ""

  /**
   * Content-block extraction: split on block-tag boundaries, classify
   * each block, keep prose. A block survives when it has at least
   * `minTokens` whitespace tokens, at most `maxLinkShare` anchors per
   * token (nav/footer/link-farm kill rule), and — when
   * `minStopRatio > 0` — at least that share of English stopwords
   * (the jusText "function words mark prose" signal; leave 0 for
   * non-English corpora). Surviving blocks join with `\n`.
   */
  def mainContent(html: Column, minTokens: Int = 3,
                  maxLinkShare: Double = 0.34,
                  minStopRatio: Double = 0.0): Column = {
    val blocks = split(regexp_replace(stripNonContent(html), BlockTagPattern, "\n"), "\n")
    val cleaned = transform(blocks, b => struct(
      trim(regexp_replace(decodeEntities(
        regexp_replace(b, "(?s)<[^>]*>", " ")), "\\s+", " ")).as("text"),
      size(regexp_extract_all(b, lit("(?i)<a\\b"), lit(0))).as("n_links")))
    val kept = filter(cleaned, s => {
      val text = s.getField("text")
      val toks = split(text, " ")
      val n = size(toks)
      // strip flanking punctuation before the stopword match: prose
      // tokens routinely arrive as "the," / "of." and would otherwise
      // never match, undercounting the ratio and misclassifying
      // genuine prose as boilerplate under minStopRatio (r17 review)
      val stopHits = size(filter(toks,
        t => lower(regexp_replace(t, "^[^A-Za-z0-9]+|[^A-Za-z0-9]+$", ""))
          .isin(TextFunctions.EnglishStopwords: _*)))
      (text =!= "") && (n >= minTokens) &&
        (s.getField("n_links").cast("double") <= lit(maxLinkShare) * n) &&
        (stopHits.cast("double") >= lit(minStopRatio) * n)
    })
    array_join(transform(kept, s => s.getField("text")), "\n")
  }
}

/**
 * Markdown → training-text extraction — the documentation/forum/repo
 * corpora counterpart of [[HtmlExtract]]: strip the formatting layer
 * (fences, link targets, emphasis markers, list/header/table
 * furniture), keep the human-readable text. Same altitude rules:
 * every step is a codegen'd RE2-compatible `regexp_replace` (no UDF —
 * extraction touches every corpus byte and must run at scan speed),
 * heuristic by design (weird markdown degrades to whitespace, never
 * errors), and the whole chain replays verbatim in the oracle.
 *
 * Step order is semantic: fenced code dies before inline code (a
 * fence body may hold backticks), images before links (image syntax
 * CONTAINS link syntax), structural line markers before whitespace
 * collapse (they anchor on `(?m)^`).
 */
object MarkdownExtract {

  def markdownToText(md: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "(?s)```.*?```" -> " ",                    // fenced code blocks
      "`([^`]*)`" -> "$1",                       // inline code: keep content
      "!\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",     // images: keep alt text
      "\\[([^\\]]*)\\]\\([^)]*\\)" -> "$1",      // links: keep anchor text
      "(?m)^#{1,6}\\s*" -> "",                   // headers
      "(?m)^>\\s?" -> "",                        // blockquote markers
      "(?m)^[-*_]{3,}\\s*$" -> " ",              // horizontal rules
      "(?m)^\\s*[-*+]\\s+" -> "",                // bullet markers
      "(?m)^\\s*\\d+[.)]\\s+" -> "",             // numbered-list markers
      "(?m)^[\\s:|-]+$" -> " ",                  // table separator rows
      "\\|" -> " ",                              // table cell pipes
      "\\*{1,3}" -> "",                          // emphasis asterisks
      "__" -> "")                                // bold underscores (word_snake survives)
    val stripped = steps.foldLeft(md) { case (c, (p, r)) => regexp_replace(c, p, r) }
    trim(regexp_replace(stripped, "\\s+", " "))
  }
}

/**
 * Sitemap XML (the public sitemaps.org protocol) — crawl-frontier
 * discovery: a host's sitemap enumerates the URLs (and freshness
 * hints) the crawler should fetch, and sitemap INDEX files nest
 * further sitemaps. Extraction is entry-scoped regex over the XML
 * (RE2-compatible, codegen'd, oracle-replayable) rather than a full
 * XML parse: sitemaps in the wild are machine-generated and regular,
 * and a malformed one degrades to dropped entries, never an error —
 * the same altitude rule as [[HtmlExtract]].
 */
object SitemapExtract {

  /** All `<loc>` values, whitespace-trimmed (the spec allows padding
    * inside the element). */
  def locs(xml: Column): Column =
    regexp_extract_all(xml, lit("(?is)<loc>\\s*([^<]*?)\\s*</loc>"), lit(1))

  /** Whether the document is a sitemap INDEX (its locs are further
    * sitemaps to fetch, not page URLs). */
  def isIndex(xml: Column): Column =
    regexp_extract(xml, "(?is)<\\s*sitemapindex[\\s>]", 0) =!= ""

  /** `(loc, lastmod)` structs of the `<url>`/`<sitemap>` entries —
    * entry-scoped so each lastmod pairs with ITS loc; entries without
    * a loc are dropped, lastmod is null when absent. */
  def entries(xml: Column): Column = {
    val blocks = regexp_extract_all(xml,
      lit("(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1))
    filter(
      transform(blocks, b => struct(
        nullif(regexp_extract(b, "(?is)<loc>\\s*([^<]*?)\\s*</loc>", 1),
          lit("")).as("loc"),
        nullif(regexp_extract(b, "(?is)<lastmod>\\s*([^<]*?)\\s*</lastmod>", 1),
          lit("")).as("lastmod"))),
      e => e.getField("loc").isNotNull)
  }
}
