package graft.expr

import graft.SparkSpec
import graft.operators.Robots
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {

  private val sample =
    """# friendly robots
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/pub/
      |
      |User-agent: graftbot
      |Disallow: /doc/
      |Crawl-delay: 2.5
      |
      |Sitemap: https://x.com/sitemap.xml
      |""".stripMargin

  test("parse: groups, comments, sitemaps") {
    val (groups, sitemaps) = RobotsTxt.parse(sample)
    assert(groups.map(_._1) == Vector(Vector("*"), Vector("graftbot")))
    assert(groups(0)._2 == Vector(
      RobotsTxt.Rule("/private/", allow = false),
      RobotsTxt.Rule("/private/pub/", allow = true)))
    assert(sitemaps == Vector("https://x.com/sitemap.xml"))
  }

  test("group selection: named token beats *, prefix-matches product token") {
    val (groups, _) = RobotsTxt.parse(sample)
    assert(RobotsTxt.rulesFor(groups, "GraftBot/1.0") ==
      Vector(RobotsTxt.Rule("/doc/", allow = false)))
    assert(RobotsTxt.rulesFor(groups, "otherbot") ==
      Vector(RobotsTxt.Rule("/private/", allow = false),
        RobotsTxt.Rule("/private/pub/", allow = true)))
  }

  test("stacked user-agent lines share one rule block; UA after rules starts a new group") {
    val txt = "User-agent: a\nUser-agent: b\nDisallow: /x\nUser-agent: c\nDisallow: /y\n"
    val (groups, _) = RobotsTxt.parse(txt)
    assert(groups.map(_._1) == Vector(Vector("a", "b"), Vector("c")))
    assert(RobotsTxt.rulesFor(groups, "b") == Vector(RobotsTxt.Rule("/x", allow = false)))
  }

  test("longest-match precedence with allow winning ties") {
    val txt = "User-agent: *\nDisallow: /p/\nAllow: /p/ok/\nAllow: /q\nDisallow: /q\n"
    val c = RobotsTxt.compile(txt, "any")
    assert(!RobotsTxt.allowed("/p/x", c))
    assert(RobotsTxt.allowed("/p/ok/x", c)) // longer allow wins
    assert(RobotsTxt.allowed("/q/z", c))    // equal length: allow wins
    assert(RobotsTxt.allowed("/other", c))  // no rule: default allow
  }

  test("empty Disallow allows everything") {
    val c = RobotsTxt.compile("User-agent: *\nDisallow:\n", "any")
    assert(RobotsTxt.allowed("/anything", c))
  }

  test("glob match: wildcards and end anchor") {
    assert(RobotsTxt.globMatch("/private/", "/private/x"))
    assert(!RobotsTxt.globMatch("/private/", "/privatex"))
    assert(RobotsTxt.globMatch("/*.pdf$", "/a/b.pdf"))
    assert(!RobotsTxt.globMatch("/*.pdf$", "/a/b.pdfx"))
    assert(RobotsTxt.globMatch("/*.pdf", "/a/b.pdfx")) // unanchored prefix
    assert(RobotsTxt.globMatch("/a*b*c", "/aXXbYYc-tail"))
    assert(!RobotsTxt.globMatch("/a*b*c", "/aXXbYY"))
    assert(RobotsTxt.globMatch("/x$", "/x"))
    assert(!RobotsTxt.globMatch("/x$", "/xy"))
    assert(RobotsTxt.globMatch("*", "/whatever"))
    assert(RobotsTxt.globMatch("/p*$", "/p"))          // trailing * matches empty
  }

  test("crawl-delay: named group wins over *") {
    val txt = "User-agent: *\nCrawl-delay: 10\nUser-agent: graftbot\nCrawl-delay: 2.5\n"
    assert(RobotsTxt.crawlDelay(txt, "graftbot/2.0").contains(2.5))
    assert(RobotsTxt.crawlDelay(txt, "other").contains(10.0))
    assert(RobotsTxt.crawlDelay("User-agent: *\nDisallow: /\n", "x").isEmpty)
  }

  test("urlPathQuery: path+query, fragment stripped, bare host → /") {
    val rows = spark.createDataFrame(Seq(
      Tuple1("https://a.com/x/y?q=1#frag"),
      Tuple1("https://a.com"),
      Tuple1("http://a.com/?q=2"))).toDF("url")
    val got = rows.select(Robots.urlPathQuery(col("url"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("/x/y?q=1", "/", "/?q=2"))
  }

  test("annotate + filterAllowed over DataFrames (broadcast plan)") {
    GraftFunctions.ensure(spark)
    import spark.implicits._
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"),
      ("b.com", "User-agent: graftbot\nDisallow: /\n")).toDF("host", "robots_txt")
    val urls = Seq(
      (1L, "https://a.com/ok"),
      (2L, "https://a.com/private/x"),
      (3L, "https://a.com/private/pub/x"),
      (4L, "https://b.com/anything"),
      (5L, "https://c.com/no-robots-host")).toDF("id", "url")
    val ann = Robots.annotate(urls, "url", robots, "host", "robots_txt", "graftbot/1.0")
    val m = ann.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(m == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false, 5L -> true))
    val kept = Robots.filterAllowed(urls, "url", robots, "host", "robots_txt", "graftbot/1.0")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    // the robots side must broadcast — no shuffle of the URL corpus
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("hostile robots.txt edges (r14c review): empty UA lines, control chars, delay group selection") {
    import graft.expr.RobotsTxt
    // an empty User-agent value must not shadow the '*' group
    val emptyUa = "User-agent:\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    assert(RobotsTxt.allowed("/page", RobotsTxt.compile(emptyUa, "anybot")),
      "the empty-token group must be ignored; '*' governs")
    // an interior control char cannot smuggle a rule-splitting delimiter
    val ctl = "User-agent: *\nDisallow: /foo\u0001/bar\n"
    assert(RobotsTxt.allowed("/foo-anything", RobotsTxt.compile(ctl, "x")),
      "the control char is stripped; the rule is /foo/bar, not /foo")
    assert(!RobotsTxt.allowed("/foo\u0001/bar/x".replace("\u0001", ""), RobotsTxt.compile(ctl, "x")))
    // the crawl-delay comes from the group whose RULES govern the agent
    val delays = "User-agent: graftbot\nCrawl-delay: 10\nDisallow:\n\n" +
      "User-agent: graftbot-images\nCrawl-delay: 1\nDisallow: /x\n"
    assert(RobotsTxt.crawlDelay(delays, "graftbot-images/1.0").contains(1.0),
      "longest-token group wins for the delay, same as for rules")
    assert(RobotsTxt.crawlDelay(delays, "graftbot/1.0").contains(10.0))
  }
}
