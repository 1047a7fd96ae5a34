package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL/domain curation: host + eTLD+1 extraction ground truth,
  * blocklist semantics, per-domain diversity cap (broadcast minority
  * path ≡ window fallback, determinism across partitionings, bounded
  * per-domain survivors). */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._
  graft.expr.GraftFunctions.ensure(spark)

  test("urlHost: scheme/userinfo/port/path/fragment handling ground truth") {
    val cases = Seq(
      "https://www.Example.COM/path?q=1"      -> "www.example.com",
      "http://user:pw@site.org:8080/x"        -> "site.org",
      "ftp://files.example.net"               -> "files.example.net",
      "https://example.com#frag"              -> "example.com",
      "not a url"                             -> null,
      "/relative/path"                        -> null)
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), UrlCuration.urlHost(col("url")).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) =>
      assert(got(u) == want, s"host($u) = ${got(u)}, want $want") }
  }

  test("registeredDomain: label rule incl. multi-part suffixes") {
    val cases = Seq(
      "www.example.com"       -> "example.com",
      "a.b.deep.example.com"  -> "example.com",
      "www.bbc.co.uk"         -> "bbc.co.uk",
      "news.site.com.au"      -> "site.com.au",
      "example.com"           -> "example.com",
      "localhost"             -> "localhost",
      "co.uk"                 -> "co.uk")  // bare suffix: nothing to register, passes through
    val got = cases.map(_._1).toDF("h")
      .select(col("h"), UrlCuration.registeredDomain(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"domain($h) = ${got(h)}, want $want") }
  }

  test("canonicalizeUrl: tracking params, fragments, ports, case, slashes — hand-computed") {
    val cases = Seq(
      "HTTPS://Example.COM:443/Path/?utm_source=x&utm_medium=y#frag"
        -> "https://example.com/Path",
      "http://a.com:80/p?id=3&fbclid=abc&q=2" -> "http://a.com/p?id=3&q=2",
      "https://a.com/p?utm_campaign=z"        -> "https://a.com/p",
      "https://a.com/p?gclid=1&ref=tw"        -> "https://a.com/p",
      "https://a.com/"                        -> "https://a.com",
      "https://a.com:8443/x"                  -> "https://a.com:8443/x",  // non-default port stays
      "https://a.com/p?refresh=1"             -> "https://a.com/p?refresh=1", // not the ref param
      "https://a.com/p?utm_source=x&q=1"      -> "https://a.com/p?q=1", // orphaned & promoted
      "https://a.com/a&b"                     -> "https://a.com/a&b", // literal & in a clean path stays
      "https://a.com/a&b?utm_source=x"        -> "https://a.com/a&b", // removal doesn't corrupt the path
      "https://a.com/p?utm_source=x&a=1&b=2"  -> "https://a.com/p?a=1&b=2") // FIRST orphan promotes
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), UrlCuration.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) =>
      assert(got(u) == want, s"canon($u) = ${got(u)}, want $want") }
    // the point: spelled-apart duplicates collide
    val variants = Seq("https://A.com/x/?utm_source=nl#top", "HTTPS://a.COM:443/x/")
    val canon = variants.toDF("url")
      .select(UrlCuration.canonicalizeUrl(col("url"))).collect().map(_.getString(0)).toSet
    assert(canon.size == 1, s"variants must collide: $canon")
  }

  test("canonicalize_url native expression == retired Column chain, byte for byte") {
    // the native expression (r17 — one compiled-pattern pass; fixes the
    // 64 KB codegen blowout the branch-expanded chain caused in
    // composed plans) must agree with the Column formulation the DuckDB
    // oracles replay, on every adversarial shape the chain's guards
    // exist for — plus null, empty, and junk
    val urls = Seq(
      "HTTPS://Example.COM:443/Path/?utm_source=x&utm_medium=y#frag",
      "http://a.com:80/p?id=3&fbclid=abc&q=2",
      "https://a.com/p?utm_campaign=z",
      "https://a.com/",
      "https://a.com",
      "https://a.com:8443/x",
      "https://a.com/p?refresh=1",
      "https://a.com/p?utm_source=x&q=1",
      "https://a.com/a&b",
      "https://a.com/a&b?utm_source=x",
      "https://a.com/a&b&q=1?utm_source=x",
      "https://a.com/x&y=1?p=1&utm_a=2",
      "https://a.com/p?utm_source=x&a=1&b=2",
      "https://a.com/p?a=1&utm_source=x&b=2",
      "https://a.com/p?utm_source=&utm_medium=",
      "HTTP://A.COM:80",
      "https://a.com:443",
      "https://a.com:443/?utm_source=x",
      "http://a.com:8080:80/x",
      "ftp://files.example.net/a/",
      "mailto:someone@example.com",
      "not a url at all",
      "", "   ",
      "https://a.com/p?path=/",
      "https://a.com/p?utm_source=x&path=/",
      "https://Ünïcode.example/ÜPPER/?utm_source=x#f",
      "https://a.com/p#frag?utm_source=x",
      "https://a.com/p??&&a=1",
      "&a=1&b=2",
      "https://a.com/p?utm_source=a&utm_source=b&q=1") ++
      // generated messy shapes: every combination of case, port,
      // trailing slash, tracking position, fragment
      (0 until 64).map { i =>
        val scheme = if (i % 2 == 0) "https://" else "HTTP://"
        val host = if (i % 4 < 2) s"Site$i.com" else s"site$i.ORG"
        val port = i % 3 match { case 0 => ":443" case 1 => ":80" case _ => "" }
        val path = if (i % 5 == 0) s"/A&b/$i" else s"/p/$i"
        val slash = if (i % 2 == 1) "/" else ""
        val q = i % 4 match {
          case 0 => "?utm_source=x&q=1"
          case 1 => "?q=1&utm_source=x"
          case 2 => "?utm_source=x"
          case _ => ""
        }
        val frag = if (i % 3 == 0) "#sec" else ""
        s"$scheme$host$port$path$slash$q$frag"
      }
    val df = (urls :+ null.asInstanceOf[String]).toDF("url")
      .select(col("url"),
        UrlCuration.canonicalizeUrl(col("url")).as("native"),
        UrlCuration.canonicalizeUrlColumns(col("url")).as("chain"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[String]("native") == r.getAs[String]("chain"),
        s"parity break on ${r.getAs[String]("url")}: " +
          s"native=${r.getAs[String]("native")} chain=${r.getAs[String]("chain")}")
    }
    assert(rows.count(_.isNullAt(1)) == 1, "null input must stay null")
  }

  test("filterBlockedDomains: blocked registered domains drop, subdomains included; null host policy") {
    val df = Seq(
      (1L, "https://www.spam.com/a"),      // blocked via www
      (2L, "https://spam.com/b"),          // blocked
      (3L, "https://ham.com/c"),           // kept
      (4L, "https://spam.com.evil.org/d"), // registered domain evil.org: kept
      (5L, "garbage")                      // unparseable
    ).toDF("id", "url")
    val kept = UrlCuration.filterBlockedDomains(df, "url", Set("spam.com"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L, 5L), s"got ${kept.toSeq}")
    val keptStrict = UrlCuration.filterBlockedDomains(df, "url", Set("spam.com"),
      dropUnparseable = true).select("id").as[Long].collect().sorted
    assert(keptStrict.toSeq == Seq(3L, 4L))
  }

  /** 1 mega-domain with 60 docs + 30 single-doc tail domains. */
  private def skewed = {
    val rows = (0L until 60L).map(i => (i, s"https://big.com/doc/$i")) ++
      (100L until 130L).map(i => (i, s"https://site$i.org/doc/$i"))
    rows.toDF("id", "url")
  }

  test("capPerDomain: over-cap domain trimmed to cap, tail untouched, deterministic across partitionings") {
    val capped = UrlCuration.capPerDomain(skewed, "url", "id", maxPerDomain = 10)
    val byDom = capped
      .withColumn("d", UrlCuration.registeredDomain(UrlCuration.urlHost(col("url"))))
      .groupBy("d").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("big.com") == 10L)
    assert(byDom.size == 31 && byDom.count(_._2 == 1L) == 30)

    val ids1 = capped.select("id").as[Long].collect().sorted.toSeq
    val ids2 = UrlCuration.capPerDomain(skewed.repartition(7), "url", "id", 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2, "kept set must not depend on partitioning")
  }

  test("capPerDomain: broadcast minority path and window fallback keep IDENTICAL rows") {
    val broadcastPath = UrlCuration.capPerDomain(skewed, "url", "id", 10)
      .select("id").as[Long].collect().sorted.toSeq
    // maxHotDomains = 0 forces the over-cap set past the driver bound
    val fallback = UrlCuration.capPerDomain(skewed, "url", "id", 10, maxHotDomains = 0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(broadcastPath == fallback)
    // and the kept big.com members are the 10 smallest multiplicative-hash keys
    val want = (0L until 60L).sortBy(i => (i * 2654435761L) % 4294967296L).take(10).sorted
    assert(broadcastPath.filter(_ < 100L) == want)
  }

  test("withDomainPrior: site mean + count annotated; www variants share a domain; null-domain keeps null") {
    val df = Seq(
      (1L, "https://a.com/x", 10.0),
      (2L, "https://www.a.com/y", 30.0),   // same registered domain as 1
      (3L, "https://b.org/z", 7.0),
      (4L, "not a url", 99.0)
    ).toDF("id", "url", "score")
    val out = UrlCuration.withDomainPrior(df, "url", "score")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out(1L) == ((Some(20.0), Some(2L))), s"${out(1L)}")
    assert(out(2L) == ((Some(20.0), Some(2L))), "www.a.com and a.com share the prior")
    assert(out(3L) == ((Some(7.0), Some(1L))))
    assert(out(4L) == ((None, None)), "unparseable url carries null priors")
    // column shape: original + the two prior columns
    val cols = UrlCuration.withDomainPrior(df, "url", "score").columns.toSeq
    assert(cols == Seq("id", "url", "score", "domain_prior", "domain_docs"), cols.toString)
  }

  test("plan shapes: cap's kept-id join and the prior join broadcast; no sort-merge join") {
    val capped = UrlCuration.capPerDomain(skewed, "url", "id", 10)
    capped.collect()
    val capPlan = capped.queryExecution.executedPlan.toString
    assert(!capPlan.contains("SortMergeJoin"),
      s"hot-domain kept ids must broadcast, not shuffle the corpus:\n$capPlan")
    assert(capPlan.contains("BroadcastHashJoin"), capPlan)

    val withScores = skewed.withColumn("score", (col("id") % 7).cast("double"))
    val priored = UrlCuration.withDomainPrior(withScores, "url", "score")
    priored.collect()
    val priorPlan = priored.queryExecution.executedPlan.toString
    assert(!priorPlan.contains("SortMergeJoin"),
      s"the per-domain prior table must broadcast back:\n$priorPlan")
  }

  test("capPerDomain: under-cap corpus returns unchanged (no hot set, no extra work)") {
    val capped = UrlCuration.capPerDomain(skewed, "url", "id", maxPerDomain = 60)
    assert(capped.count() == 90L)
    assert(capped.columns.toSeq == Seq("id", "url"), "internal columns must not leak")
  }

  test("capPerDomain: STRING ids take the xxhash64 fallback key, deterministic, both paths agree") {
    // ANSI mode would throw on cast("long") of a non-numeric id; the
    // schema-dispatched fallback must instead produce a stable sample
    val strSkewed = skewed.withColumn("id", concat(lit("doc-"), col("id")))
    val a = UrlCuration.capPerDomain(strSkewed, "url", "id", 10)
      .select("id").collect().map(_.getString(0)).toSet
    assert(a.size == 40, s"60-row hot domain capped at 10 + 30 tail, got ${a.size}")
    val b = UrlCuration.capPerDomain(strSkewed.repartition(5), "url", "id", 10)
      .select("id").collect().map(_.getString(0)).toSet
    assert(a == b, "string-id cap must be deterministic across partitionings")
    val w = UrlCuration.capPerDomain(strSkewed, "url", "id", 10, maxHotDomains = 0)
      .select("id").collect().map(_.getString(0)).toSet
    assert(a == w, "broadcast path and window fallback must keep identical string-id rows")
  }
  test("r16 canonicalization guards: surviving query blocks promotion; query-tail slash kept") {
    import spark.implicits._
    def canon(u: String): String =
      Seq(Tuple1(u)).toDF("url").select(UrlCuration.canonicalizeUrl(col("url"))).head().getString(0)
    // tracking removed but the '?' head SURVIVES: the path's literal
    // '&y=' must NOT be promoted into a second query head
    assert(canon("https://a.com/x&y=1?p=1&utm_a=2") == "https://a.com/x&y=1?p=1")
    // tracking-free spelling canonicalizes to the same string
    assert(canon("https://a.com/x&y=1?p=1") == "https://a.com/x&y=1?p=1")
    // promotion still fires when the whole query head was consumed
    assert(canon("https://a.com/p?utm_a=1&q=2") == "https://a.com/p?q=2")
    // a trailing slash inside a QUERY VALUE is content, not layout
    assert(canon("https://a.com/p?path=/") == "https://a.com/p?path=/")
    assert(canon("https://a.com/p?path=") == "https://a.com/p?path=")
    // path trailing slash still collapses without a query
    assert(canon("https://a.com/p/") == "https://a.com/p")
  }

  test("r16 capPerDomain: snowflake-scale ids neither overflow nor destabilize the kept set") {
    import spark.implicits._
    val big = (0 until 300).map(i => (4000000000L + i * 1000000007L, s"https://hot.com/p$i")) ++
      (0 until 5).map(i => (9100000000000000000L + i, s"https://cold.org/c$i")) ++
      Seq((42L, "not a url at all"))
    val df = big.toDF("doc_id", "url")
    val kept = UrlCuration.capPerDomain(df, "url", "doc_id", maxPerDomain = 50)
    assert(kept.where(col("url").startsWith("https://hot.com")).count() == 50)
    assert(kept.where(col("url").startsWith("https://cold.org")).count() == 5)
    assert(kept.where(col("doc_id") === 42L).count() == 1, "null-domain rows pass through")
    // deterministic across plans
    val again = UrlCuration.capPerDomain(df.repartition(7), "url", "doc_id", maxPerDomain = 50)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }
}
