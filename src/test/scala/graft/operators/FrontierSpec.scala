package graft.operators

import graft.SparkSpec

class FrontierSpec extends SparkSpec {

  test("update: canonicalizes, dedups, diffs against known, applies robots") {
    import spark.implicits._
    val discovered = Seq(
      "https://a.com/new?utm_source=x#top", // canonicalizes to /new
      "https://a.com/new",                  // duplicate after canon
      "https://a.com/old/",                 // known (after trailing-slash canon)
      "https://a.com/private/x",            // robots-blocked
      "ftp://a.com/skip",                   // non-http scheme dropped
      "https://b.com/fresh").toDF("url")
    val known = Seq("https://a.com/old").toDF("url")
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\n")).toDF("host", "txt")
    val got = Frontier.update(discovered, "url", known, "url",
        robots = Some((robots, "host", "txt")))
      .as[String].collect().toSet
    assert(got == Set("https://a.com/new", "https://b.com/fresh"))
  }

  test("update without robots keeps blocked paths; known side is canonicalized too") {
    import spark.implicits._
    val discovered = Seq("https://a.com/private/x", "https://a.com/p").toDF("url")
    // known stored in a messy spelling — canon must still match
    val known = Seq("HTTPS://A.com/p?utm_campaign=y").toDF("url")
    val got = Frontier.update(discovered, "url", known, "url")
      .as[String].collect().toSet
    assert(got == Set("https://a.com/private/x"))
  }
}
