package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Crawl-frontier update — the discovery loop that feeds a crawl:
 * newly discovered URLs (sitemap locs, extracted page links, redirect
 * targets) are canonicalized, collapsed, diffed against everything
 * already crawled, and filtered by robots policy; what survives is the
 * next fetch round.
 *
 * Scale shape: the dedup and the anti-join shuffle CANONICAL URL
 * STRINGS only — never payloads. At 100 TB the known side is the
 * crawl's full URL history; store it bucketed by `url`
 * ([[Bucketing]]) so the anti-join co-locates instead of shuffling
 * the history every round. The robots side stays one compiled row per
 * host and broadcasts ([[Robots]]).
 */
object Frontier {

  /** One frontier round: canonicalize `discovered`, drop non-http(s)
    * schemes, dedup, anti-join `known` (both sides canonicalized so
    * spelling variants can't sneak a known URL back in), then keep
    * only robots-allowed targets when a robots table is given.
    * Returns one `url` row per new fetch target. */
  def update(discovered: DataFrame, urlCol: String,
             known: DataFrame, knownUrlCol: String,
             robots: Option[(DataFrame, String, String)] = None,
             agent: String = "graftbot"): DataFrame = {
    graft.expr.GraftFunctions.ensure(discovered.sparkSession)
    val canon = discovered
      .select(UrlCuration.canonicalizeUrl(col(urlCol)).as("url"))
      .where(col("url").rlike("^https?://"))
      .distinct()
    val knownCanon = known.select(
      UrlCuration.canonicalizeUrl(col(knownUrlCol)).as("url"))
    val fresh = canon.join(knownCanon, Seq("url"), "left_anti")
    robots match {
      case Some((r, hostCol, txtCol)) =>
        Robots.filterAllowed(fresh, "url", r, hostCol, txtCol, agent)
      case None => fresh
    }
  }
}
