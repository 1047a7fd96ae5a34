package graft.sources

import graft.SparkSpec

/** WARC ingestion: record parsing off a stream (plain + gzipped +
  * multi-member gzip), HTTP envelope splitting, oversized-payload
  * truncation, WET conversion records, and the crawl → extracted-text
  * composition with HtmlExtract. */
class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p)

  private def httpPayload(body: String, ct: String = "text/html"): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\nServer: x\r\n\r\n" + body).getBytes("UTF-8")

  private def responseRecord(uri: String, body: String): (Map[String, String], Array[Byte]) =
    (Map(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2024-05-01T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:uuid:$uri>",
      "Content-Type" -> "application/http; msgtype=response"),
      httpPayload(body))

  test("plain WARC: warcinfo + response records parse; HTTP envelope split off") {
    val dir = tmp("warc_plain_")
    val bytes = WarcSource.writeRecords(Seq(
      (Map("WARC-Type" -> "warcinfo", "Content-Type" -> "application/warc-fields"),
        "software: graft-test\r\n".getBytes("UTF-8")),
      responseRecord("https://a.com/1", "<html><body>hello A</body></html>"),
      responseRecord("https://b.com/2", "<html><body>hello B</body></html>")))
    java.nio.file.Files.write(dir.resolve("test.warc"), bytes)
    val df = WarcSource.read(spark, dir.toString).cache()
    assert(df.count() == 3)
    val resp = df.where($"warc_type" === "response").orderBy("target_uri")
      .select("target_uri", "http_status", "http_content_type", "payload")
      .collect()
    assert(resp.length == 2)
    assert(resp(0).getString(0) == "https://a.com/1")
    assert(resp(0).getInt(1) == 200 && resp(0).getString(2) == "text/html")
    assert(new String(resp(0).getAs[Array[Byte]](3), "UTF-8")
      == "<html><body>hello A</body></html>",
      "payload must be the HTTP entity body alone, headers split off")
    val info = df.where($"warc_type" === "warcinfo").head()
    assert(info.isNullAt(df.columns.indexOf("http_status")),
      "non-response records carry no HTTP fields")
  }

  test("gzipped WARC incl. multi-member concatenation (the crawl layout) parses identically") {
    val dir = tmp("warc_gz_")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // two gzip MEMBERS concatenated in one file — each wrapping one record
    val m1 = gz(WarcSource.writeRecords(Seq(responseRecord("https://a.com/1", "alpha"))))
    val m2 = gz(WarcSource.writeRecords(Seq(responseRecord("https://a.com/2", "beta"))))
    java.nio.file.Files.write(dir.resolve("cc.warc.gz"), m1 ++ m2)
    val got = WarcSource.read(spark, dir.toString)
      .select("target_uri", "payload").orderBy("target_uri")
      .collect().map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
    assert(got.toSeq == Seq("https://a.com/1" -> "alpha", "https://a.com/2" -> "beta"),
      s"both gzip members must be read: ${got.toSeq}")
  }

  test("zstd WARC incl. multi-frame concatenation parses identically (zstd-jni from Spark's own jars)") {
    val dir = tmp("warc_zst_")
    def zst(b: Array[Byte]): Array[Byte] = com.github.luben.zstd.Zstd.compress(b)
    val f1 = zst(WarcSource.writeRecords(Seq(responseRecord("https://z.com/1", "zeta"))))
    val f2 = zst(WarcSource.writeRecords(Seq(responseRecord("https://z.com/2", "eta"))))
    java.nio.file.Files.write(dir.resolve("cc.warc.zst"), f1 ++ f2)
    val got = WarcSource.read(spark, dir.toString)
      .select("target_uri", "payload").orderBy("target_uri")
      .collect().map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
    assert(got.toSeq == Seq("https://z.com/1" -> "zeta", "https://z.com/2" -> "eta"),
      s"both zstd frames must be read: ${got.toSeq}")
  }

  test("oversized payloads truncate with the flag set — never buffered whole") {
    val dir = tmp("warc_big_")
    val big = ("x" * 100000).getBytes("UTF-8")
    val bytes = WarcSource.writeRecords(Seq(
      (Map("WARC-Type" -> "conversion", "WARC-Target-URI" -> "https://big"), big),
      (Map("WARC-Type" -> "conversion", "WARC-Target-URI" -> "https://small"), "ok".getBytes)))
    java.nio.file.Files.write(dir.resolve("t.warc"), bytes)
    val rows = WarcSource.read(spark, dir.toString, maxRecordBytes = 1024)
      .select("target_uri", "payload", "truncated").orderBy("target_uri").collect()
    assert(rows(0).getString(0) == "https://big" &&
      rows(0).getAs[Array[Byte]](1).length == 1024 && rows(0).getBoolean(2))
    assert(rows(1).getString(0) == "https://small" &&
      new String(rows(1).getAs[Array[Byte]](1)) == "ok" && !rows(1).getBoolean(2),
      "the record AFTER an oversized one must still parse (skip, not desync)")
  }

  test("WET conversion records -> HtmlExtract-free text rows; crawl e2e with htmlToText") {
    val dir = tmp("warc_wet_")
    val bytes = WarcSource.writeRecords(Seq(
      (Map("WARC-Type" -> "conversion", "WARC-Target-URI" -> "https://a.com/1",
        "Content-Type" -> "text/plain"), "extracted text".getBytes("UTF-8")),
      responseRecord("https://b.com/2",
        "<html><head><script>junk()</script></head><body><p>real body</p></body></html>")))
    java.nio.file.Files.write(dir.resolve("mix.warc"), bytes)
    import org.apache.spark.sql.functions._
    val df = WarcSource.read(spark, dir.toString)
    val wet = df.where($"warc_type" === "conversion")
      .select($"target_uri", $"payload".cast("string").as("text"))
      .head()
    assert(wet.getString(1) == "extracted text")
    val html = df.where($"warc_type" === "response")
      .select(graft.operators.HtmlExtract.htmlToText($"payload".cast("string")).as("text"))
      .head().getString(0)
    assert(html.contains("real body") && !html.contains("junk"),
      s"crawl response -> htmlToText must drop script content: '$html'")
  }

  test("CDX random access: one seek + one member inflate fetches exactly the indexed record") {
    val dir = tmp("warc_cdx_")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // three gzip members; the CDX "index" is each member's byte offset
    val members = Seq("first", "second", "third").map(t =>
      gz(WarcSource.writeRecords(Seq(
        (Map("WARC-Type" -> "conversion", "WARC-Target-URI" -> s"https://x/$t"),
          t.getBytes("UTF-8"))))))
    val offsets = members.scanLeft(0L)(_ + _.length).init
    val file = dir.resolve("indexed.warc.gz")
    java.nio.file.Files.write(file, members.flatten.toArray)
    val rec = WarcSource.readRecordAt(spark, file.toString, offsets(1)).get
    assert(rec.getString(2) == "https://x/second", rec.toString)
    assert(new String(rec.getAs[Array[Byte]](8), "UTF-8") == "second")
    // offset 0 and the last member work too; plain files seek directly
    assert(WarcSource.readRecordAt(spark, file.toString, offsets(0)).get.getString(2)
      == "https://x/first")
    assert(WarcSource.readRecordAt(spark, file.toString, offsets(2)).get.getString(2)
      == "https://x/third")
  }

  test("CDXJ index parses to typed columns; index-then-fetch e2e; malformed lines null out") {
    val dir = tmp("warc_cdxj_")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val m1 = gz(WarcSource.writeRecords(Seq(
      (Map("WARC-Type" -> "conversion", "WARC-Target-URI" -> "https://a.com/x"),
        "doc body".getBytes("UTF-8")))))
    val warc = dir.resolve("seg.warc.gz")
    java.nio.file.Files.write(warc, m1)
    val cdx =
      s"""com,a)/x 20240501000000 {"url": "https://a.com/x", "mime": "text/plain", "status": "200", "digest": "SHA1X", "length": "${m1.length}", "offset": "0", "filename": "${warc.toString}"}
         |this line is not cdx
         |""".stripMargin
    java.nio.file.Files.write(dir.resolve("idx.cdx"), cdx.getBytes("UTF-8"))
    val idx = WarcSource.readCdx(spark, dir.resolve("idx.cdx").toString)
    val good = idx.where($"url".isNotNull).head()
    assert(good.getAs[String]("urlkey") == "com,a)/x")
    assert(good.getAs[String]("mime") == "text/plain" && good.getAs[Int]("status") == 200)
    assert(good.getAs[Long]("offset") == 0L && good.getAs[String]("filename") == warc.toString)
    // index-then-fetch: exactly the record the index row points at
    val rec = WarcSource.readRecordAt(spark,
      good.getAs[String]("filename"), good.getAs[Long]("offset")).get
    assert(rec.getString(2) == "https://a.com/x" &&
      new String(rec.getAs[Array[Byte]](8), "UTF-8") == "doc body")
    assert(idx.where($"url".isNull).count() == 1, "malformed lines null out, not fail")
  }

  test("streaming ingestion: newly-arrived archives flow per micro-batch; path-only (no whole-file buffering)") {
    val dir = tmp("warc_stream_")
    val ckpt = tmp("warc_ckpt_")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def writeSeg(name: String, uris: String*): Unit =
      java.nio.file.Files.write(dir.resolve(name), gz(WarcSource.writeRecords(
        uris.map(u => (Map("WARC-Type" -> "conversion", "WARC-Target-URI" -> u),
          u.getBytes("UTF-8"))))))
    writeSeg("seg1.warc.gz", "https://s/1", "https://s/2")

    val outDir = tmp("warc_sink_")
    val stream = WarcSource.readStream(spark, dir.toString)
    assert(stream.isStreaming, "must be a streaming frame")
    def runBatch(): Unit = {
      // parquet sink: recoverable from the checkpoint, so the second
      // start resumes FILE TRACKING instead of re-ingesting seg1
      val q = stream.select("target_uri", "warc_type", "payload")
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000); ()
    }
    runBatch()
    val got1 = spark.read.parquet(outDir.toString).select("target_uri")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got1 == Seq("https://s/1", "https://s/2"), got1.toString)
    // a NEW segment arrives; the next batch ingests only it (file
    // tracking via the checkpoint)
    writeSeg("seg2.warc.gz", "https://s/3")
    runBatch()
    val got2 = spark.read.parquet(outDir.toString).select("target_uri")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got2 == Seq("https://s/1", "https://s/2", "https://s/3"),
      s"second batch must add exactly the new segment's records: $got2")
  }

  test("malformed input fails loudly, not silently empty") {
    val dir = tmp("warc_bad_")
    java.nio.file.Files.write(dir.resolve("bad.warc"), "this is not a warc\r\n".getBytes)
    val e = intercept[org.apache.spark.SparkException](
      WarcSource.read(spark, dir.toString).count())
    assert(e.getCause.getMessage.contains("expected a WARC"), e.getCause.getMessage)
  }

  test("streaming crawl e2e: response records decode (mixed charsets) + extract inside the stream") {
    graft.expr.GraftFunctions.ensure(spark)
    import org.apache.spark.sql.functions._
    val dir = tmp("warc_cs_stream_")
    val ckpt = tmp("warc_cs_ckpt_")
    val outDir = tmp("warc_cs_sink_")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def response(uri: String, ct: String, body: Array[Byte]): (Map[String, String], Array[Byte]) =
      (Map("WARC-Type" -> "response",
        "Content-Type" -> "application/http;msgtype=response",
        "WARC-Target-URI" -> uri),
        (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n").getBytes("ISO-8859-1") ++ body)
    val recs = Seq(
      response("https://s/utf8", "text/html; charset=utf-8",
        "<html><body><p>héllo utf8</p></body></html>".getBytes("UTF-8")),
      response("https://s/utf16", "text/html",
        Array(0xFF, 0xFE).map(_.toByte) ++
          "<html><body><p>wide page</p></body></html>".getBytes("UTF-16LE")),
      response("https://s/cp1252", "text/html; charset=iso-8859-1",
        "<html><body><p>caf\u00e9 legacy</p></body></html>".getBytes("ISO-8859-1")))
    java.nio.file.Files.write(dir.resolve("seg.warc.gz"),
      gz(WarcSource.writeRecords(recs)))

    val q = WarcSource.readStream(spark, dir.toString)
      .where(col("warc_type") === "response")
      .select(col("target_uri"),
        graft.expr.GraftFunctions.sniffCharset(col("payload"),
          col("http_content_type")).as("charset"),
        graft.operators.HtmlExtract.htmlToText(
          graft.expr.GraftFunctions.decodeCharset(col("payload"),
            col("http_content_type"))).as("text"))
      .writeStream.format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(outDir.toString)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got("https://s/utf8") == (("utf-8", "héllo utf8")))
    assert(got("https://s/utf16") == (("utf-16le", "wide page")))
    assert(got("https://s/cp1252") == (("windows-1252", "caf\u00e9 legacy")))
  }

  test("WarcCrawlSource: WARC-Date windowing, charset decode, html extraction, config dispatch") {
    import org.apache.spark.sql.functions._
    val dir = tmp("warc_src_")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def rec(uri: String, date: String, body: Array[Byte], ct: String) =
      (Map("WARC-Type" -> "response",
        "Content-Type" -> "application/http;msgtype=response",
        "WARC-Date" -> date, "WARC-Target-URI" -> uri),
        (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n").getBytes("ISO-8859-1") ++ body)
    java.nio.file.Files.write(dir.resolve("day.warc.gz"), gz(WarcSource.writeRecords(Seq(
      rec("https://s/a", "2026-08-13T10:00:00Z",
        "<html><body><p>day one page</p></body></html>".getBytes("UTF-8"),
        "text/html; charset=utf-8"),
      rec("https://s/b", "2026-08-14T09:00:00Z",
        "caf\u00e9 plain".getBytes("ISO-8859-1"), "text/plain; charset=latin1"),
      rec("https://s/c", "2026-08-15T09:00:00Z",
        "tomorrow".getBytes("UTF-8"), "text/plain")))))

    // a malformed WARC-Date must fall out of the window, not throw (ANSI)
    java.nio.file.Files.write(dir.resolve("bad.warc.gz"), gz(WarcSource.writeRecords(Seq(
      rec("https://s/bad", "not-a-date", "x".getBytes("UTF-8"), "text/plain")))))

    val src = new WarcCrawlSource(spark, dir.toString, extractHtml = true)
    val d13 = java.time.LocalDate.of(2026, 8, 13)
    val d14 = java.time.LocalDate.of(2026, 8, 14)
    assert(src.getRecordCount(d13, d14) == 2, "window excludes the day-15 record")
    val got = src.getData(d13, d14).df
      .select("target_uri", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("https://s/a") == "day one page", "html extracted to clean text")
    assert(got("https://s/b") == "caf\u00e9 plain", "cp1252 decoded, non-html untouched")

    // FQCN factory + built-in `warc` config dispatch build equivalent sources
    val viaFactory = WarcSourceFactory(spark, Map(
      "path" -> dir.toString, "extract.html" -> "true"))
    assert(viaFactory.getRecordCount(d13, d14) == 2)
    // the built-in `warc` type parses into an ingestion job (a typo'd
    // option fails the config load, not the Nth job of tonight's run)
    val parsed = graft.pipeline.PipelineConfig.parse(
      s"""pipeline.name = crawl
         |table.pages.path = ${tmp("warc_meta_").toString}
         |source.crawl.type = warc
         |source.crawl.path = ${dir.toString}
         |source.crawl.kinds = response
         |source.crawl.extract.html = true
         |job.ingest.type = ingestion
         |job.ingest.source = crawl
         |job.ingest.output = pages
         |""".stripMargin)
    assert(parsed.jobs.map(_.outputTable) == Seq("pages"))
    intercept[IllegalArgumentException] {
      graft.pipeline.PipelineConfig.parse(
        """pipeline.name = bad
          |source.crawl.type = warc
          |job.ingest.type = ingestion
          |job.ingest.source = crawl
          |job.ingest.output = pages
          |""".stripMargin) // missing path must fail at parse
    }
  }
}
