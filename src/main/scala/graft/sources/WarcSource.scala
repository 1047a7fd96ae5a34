package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * WARC (Web ARChive, ISO 28500 — the Common Crawl container) record
 * reader: the ingestion step a crawl-scale training-data pipeline
 * starts from. Public format: each record is
 *
 * {{{
 * WARC/1.0\r\n
 * WARC-Type: response\r\n
 * WARC-Target-URI: https://...\r\n
 * Content-Length: N\r\n
 * ...\r\n
 * \r\n
 * <N payload bytes>\r\n\r\n
 * }}}
 *
 * Scale shape: files stream through `sc.binaryFiles`'
 * `PortableDataStream` — records parse INCREMENTALLY off the stream,
 * so peak memory per task is ONE record (capped by `maxRecordBytes`,
 * oversized payloads truncate with a flag rather than OOM an
 * executor), never a whole 1 GB archive. Parallelism is per-file —
 * the natural unit for gzipped WARC, whose members don't split — and
 * a 100 TB crawl is hundreds of thousands of files, far more than
 * any cluster's cores. Gzip (including the multi-member concatenation
 * crawls actually ship) is detected by magic and handled by the JDK's
 * own streaming inflater.
 *
 * For `response` records the HTTP envelope is split off: `http_status`
 * and `content_type` parse from the status line / headers, `payload`
 * is the entity body alone. WET (extracted-text) archives are
 * `conversion` records and need no HTTP handling — the same reader
 * serves both.
 */
object WarcSource {

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("record_id", StringType),
    StructField("content_type", StringType),   // the RECORD's Content-Type header
    StructField("http_status", IntegerType),   // response records; null otherwise
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType),
    StructField("truncated", BooleanType)))

  /** Read every record of every WARC file under `path` (plain or
    * gzipped, mixed freely). */
  def read(spark: SparkSession, path: String,
           maxRecordBytes: Int = 16 * 1024 * 1024,
           minPartitions: Int = 0): DataFrame = {
    val parts = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val rows = spark.sparkContext.binaryFiles(path, parts)
      .flatMap { case (file, pds) =>
        val raw = new java.io.BufferedInputStream(pds.open())
        val in = decompressed(raw)
        // a partially-consumed plan (limit/take) or a malformed record
        // must not leak the stream on a long-lived executor
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: Exception => } })
        // iterator over the stream: one record in memory at a time
        new Iterator[Row] {
          private var nextRec: Row = advance()
          private def advance(): Row =
            try parseRecord(in, file, maxRecordBytes).orNull
            catch { case e: Throwable => try in.close() catch { case _: Exception => }; throw e }
          override def hasNext: Boolean = {
            if (nextRec == null) in.close()
            nextRec != null
          }
          override def next(): Row = {
            val r = nextRec; nextRec = advance(); r
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Magic-sniffed decompression: gzip (incl. multi-member) via the
    * JDK, zstd (incl. multi-frame — some corpora ship .warc.zst) via
    * the zstd-jni Spark already carries, plain passthrough otherwise. */
  private[sources] def decompressed(in: java.io.BufferedInputStream): java.io.InputStream = {
    in.mark(4)
    val m = Array(in.read(), in.read(), in.read(), in.read())
    in.reset()
    if (m(0) == 0x1F && m(1) == 0x8B) new java.util.zip.GZIPInputStream(in)
    else if (m(0) == 0x28 && m(1) == 0xB5 && m(2) == 0x2F && m(3) == 0xFD) {
      val z = new com.github.luben.zstd.ZstdInputStream(in)
      z.setContinuous(true) // read across frame boundaries
      z
    } else in
  }

  /** Next record off the stream, or None at EOF. Tolerates leading
    * blank lines between records (the spec's record separator is
    * \r\n\r\n after the payload). */
  private[sources] def parseRecord(in: java.io.InputStream, file: String,
                                   maxRecordBytes: Int): Option[Row] = {
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return None
    if (!line.startsWith("WARC/"))
      throw new IllegalArgumentException(
        s"WarcSource: expected a WARC/x.y version line in $file, got '${line.take(60)}'")
    // WARC named fields until the blank line
    val headers = collection.mutable.Map.empty[String, String]
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      if (i > 0) headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
      h = readLine(in)
    }
    val len = headers.getOrElse("content-length",
      throw new IllegalArgumentException(s"WarcSource: record without Content-Length in $file"))
      .toLong
    val toRead = math.min(len, maxRecordBytes.toLong).toInt
    val block = new Array[Byte](toRead)
    var off = 0
    while (off < toRead) {
      val n = in.read(block, off, toRead - off)
      require(n >= 0, s"WarcSource: truncated record body in $file")
      off += n
    }
    // skip the rest of an oversized payload without buffering it
    var toSkip = len - toRead
    while (toSkip > 0) {
      val s = in.skip(toSkip)
      require(s > 0, s"WarcSource: truncated record body in $file")
      toSkip -= s
    }

    val warcType = headers.getOrElse("warc-type", "unknown")
    val isResponse = warcType == "response" &&
      headers.getOrElse("content-type", "").startsWith("application/http")
    val (status, httpCt, payload) =
      if (isResponse) splitHttp(block) else (null, null, block)
    Some(Row(
      file, warcType,
      headers.getOrElse("warc-target-uri", null),
      headers.getOrElse("warc-date", null),
      headers.getOrElse("warc-record-id", null),
      headers.getOrElse("content-type", null),
      status, httpCt, payload, len > maxRecordBytes))
  }

  // compiled ONCE: this runs per response record, and a fresh
  // Pattern.compile per record is pure hot-path overhead
  private val HttpStatusLine = "HTTP/\\S+\\s+(\\d{3})".r

  /** Split an HTTP response envelope: (status, content-type, body). */
  private[sources] def splitHttp(block: Array[Byte]): (Integer, String, Array[Byte]) = {
    val sep = indexOfCrlfCrlf(block)
    if (sep < 0) return (null, null, block) // not actually HTTP: keep bytes
    val head = new String(block, 0, sep, "ISO-8859-1")
    val lines = head.split("\r\n")
    val status: Integer = lines.headOption
      .flatMap(l => HttpStatusLine.findFirstMatchIn(l))
      .map(m => Integer.valueOf(m.group(1))).orNull
    val ct = lines.drop(1)
      .find(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim).orNull
    (status, ct, java.util.Arrays.copyOfRange(block, sep + 4, block.length))
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** One header line, CRLF-terminated (LF tolerated), ISO-8859-1 per
    * the WARC spec; null at EOF. */
  private def readLine(in: java.io.InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') buf.write(c)
      c = in.read()
    }
    new String(buf.toByteArray, "ISO-8859-1")
  }

  /** STREAMING ingestion: crawl segments land continuously; each
    * micro-batch sees the newly-arrived files. Built on the
    * `binaryFile` file-stream source for its file tracking — but
    * reading ONLY the `path` column (never `content`, which would
    * buffer whole archives): each task re-opens its file through the
    * Hadoop filesystem and parses records incrementally, so the
    * batch-path memory bound (one record per task) carries over
    * verbatim. Pair with the streaming exact-dedup / curation stages
    * for the continuous crawl→metastore pipeline. */
  def readStream(spark: SparkSession, dir: String,
                 maxRecordBytes: Int = 16 * 1024 * 1024,
                 pathGlobFilter: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // the binaryFile source's fixed schema, stated explicitly (file
    // streams don't infer); only `path` is ever selected, so the
    // format's column pruning never materializes `content`
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", pathGlobFilter)
      .load(dir)
      .select("path")
      .as[String]
      .mapPartitions { paths =>
        paths.flatMap { file =>
          val p = new org.apache.hadoop.fs.Path(file)
          val fs = p.getFileSystem(hconf.value)
          val in = decompressed(new java.io.BufferedInputStream(fs.open(p)))
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit] { _ =>
              try in.close() catch { case _: Exception => } })
          new Iterator[Row] {
            private var nextRec: Row = advance()
            private def advance(): Row =
              try parseRecord(in, file, maxRecordBytes).orNull
              catch { case e: Throwable => try in.close() catch { case _: Exception => }; throw e }
            override def hasNext: Boolean = {
              if (nextRec == null) in.close()
              nextRec != null
            }
            override def next(): Row = {
              val r = nextRec
              nextRec = advance()
              r
            }
          }
        }
      }(enc)
  }

  /** CDXJ index schema (the Common Crawl `cdx-*.gz` line format:
    * `<urlkey> <timestamp> <json>` where the json carries url, offset,
    * length, filename, status, mime, digest). Parsed COLUMNS feed
    * predicate pushdown — "all PDFs on host X in March" prunes on the
    * index, then [[readRecordAt]] fetches only the surviving records. */
  val cdxSchema: StructType = StructType(Seq(
    StructField("urlkey", StringType),
    StructField("timestamp", StringType),
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", IntegerType),
    StructField("digest", StringType),
    StructField("length", LongType),
    StructField("offset", LongType),
    StructField("filename", StringType)))

  /** Read CDXJ index files (plain or .gz — `spark.read.text` inflates
    * by extension) into [[cdxSchema]] rows. Lines that don't parse
    * yield null fields rather than failing the scan — crawl indexes
    * carry occasional malformed entries. */
  def readCdx(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.text(path)
      .withColumn("_j", regexp_extract(col("value"), "^\\S+ \\S+ (.*)$", 1))
      .select(
        nullif(regexp_extract(col("value"), "^(\\S+)", 1), lit("")).as("urlkey"),
        nullif(regexp_extract(col("value"), "^\\S+ (\\S+)", 1), lit("")).as("timestamp"),
        get_json_object(col("_j"), "$.url").as("url"),
        get_json_object(col("_j"), "$.mime").as("mime"),
        get_json_object(col("_j"), "$.status").cast("int").as("status"),
        get_json_object(col("_j"), "$.digest").as("digest"),
        get_json_object(col("_j"), "$.length").cast("long").as("length"),
        get_json_object(col("_j"), "$.offset").cast("long").as("offset"),
        get_json_object(col("_j"), "$.filename").as("filename"))
  }

  /** Random access by (file, byte offset) — the CDX-index pattern:
    * Common Crawl's public indexes point at the gzip-MEMBER start of
    * one record inside a .warc.gz, so fetching a single document from
    * a 100 TB archive is one seek + one member inflate, not a file
    * scan. Works on any Hadoop filesystem (FSDataInputStream seeks);
    * plain (non-gzip) archives seek to the record's `WARC/` line
    * directly. */
  def readRecordAt(spark: SparkSession, file: String, offset: Long,
                   maxRecordBytes: Int = 16 * 1024 * 1024): Option[Row] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw = fs.open(p)
    try {
      raw.seek(offset)
      val in = decompressed(new java.io.BufferedInputStream(raw))
      parseRecord(in, file, maxRecordBytes)
    } finally raw.close()
  }

  /** Writer for specs/round-trips: serialize records (headers +
    * payload) into valid WARC bytes. */
  private[graft] def writeRecords(records: Seq[(Map[String, String], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (headers, payload) =>
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      w("WARC/1.0\r\n")
      headers.foreach { case (k, v) => w(s"$k: $v\r\n") }
      w(s"Content-Length: ${payload.length}\r\n\r\n")
      out.write(payload)
      w("\r\n\r\n")
    }
    out.toByteArray
  }
}

/**
 * Crawl ingestion as a pipeline SOURCE (`source.<name>.type = warc`,
 * or the [[WarcSourceFactory]] FQCN): WARC archives under `path`
 * become typed rows, the info-date window filters on each record's
 * `WARC-Date` (the crawl timestamp), so a daily ingestion job reads
 * exactly that day's records out of the arriving segments. With
 * `decodeText` the charset-sniffed text column is added
 * ([[graft.expr.CrawlExpressions]]); with `extractHtml` pages the
 * MIME sniffer routes as text/html are additionally reduced to
 * boilerplate-free text — both row-local codegen'd expressions inside
 * the same scan stage, zero extra shuffles at 100 TB.
 */
final class WarcCrawlSource(
    spark: org.apache.spark.sql.SparkSession,
    path: String,
    maxRecordBytes: Int = 16 * 1024 * 1024,
    kinds: Seq[String] = Seq.empty,
    decodeText: Boolean = true,
    extractHtml: Boolean = false) extends GraftSource {

  // extraction operates on DECODED text; silently skipping it when
  // decode.text=false would produce different data than configured
  require(decodeText || !extractHtml,
    "extract.html = true requires decode.text = true (extraction runs on decoded text)")

  import org.apache.spark.sql.functions._

  private def readAll(): DataFrame = {
    graft.expr.GraftFunctions.ensure(spark)
    var df = WarcSource.read(spark, path, maxRecordBytes)
    if (kinds.nonEmpty) df = df.where(col("warc_type").isin(kinds: _*))
    if (decodeText) {
      val ct = coalesce(col("http_content_type"), col("content_type"))
      df = df.withColumn("text",
        graft.expr.GraftFunctions.decodeCharset(col("payload"), ct))
      if (extractHtml)
        df = df.withColumn("text",
          when(graft.expr.GraftFunctions.sniffMime(col("payload")) === "text/html",
            graft.operators.HtmlExtract.htmlToText(col("text")))
            .otherwise(col("text")))
    }
    df
  }

  override def hasInfoDateColumn: Boolean = true

  /** Malformed WARC-Date values must drop out of the window, not
    * throw under ANSI mode — crawl metadata is untrusted input. */
  private def window(df: DataFrame, from: java.time.LocalDate,
                     to: java.time.LocalDate): DataFrame =
    df.where(expr("try_cast(warc_date AS DATE)").between(
      java.sql.Date.valueOf(from), java.sql.Date.valueOf(to)))

  override def getRecordCount(from: java.time.LocalDate,
                              to: java.time.LocalDate): Long =
    window(readAll(), from, to).count()

  override def getData(from: java.time.LocalDate, to: java.time.LocalDate,
                       columns: Seq[String]): SourceResult = {
    val df = window(readAll(), from, to)
    SourceResult(if (columns.isEmpty) df else df.select(columns.map(col): _*))
  }
}

/** FQCN-declarable factory for [[WarcCrawlSource]] (`source.<name>
  * .type = graft.sources.WarcSourceFactory`; the built-in `warc` type
  * routes here too). Options: `path` (required), `max.record.bytes`,
  * `kinds` (comma-separated WARC-Type filter), `decode.text`
  * (default true), `extract.html` (default false). */
object WarcSourceFactory extends SourceFactory {
  override def apply(spark: org.apache.spark.sql.SparkSession,
                     options: Map[String, String]): GraftSource =
    new WarcCrawlSource(spark,
      path = options.getOrElse("path",
        throw new IllegalArgumentException("warc source needs 'path'")),
      maxRecordBytes = options.get("max.record.bytes").map(_.toInt)
        .getOrElse(16 * 1024 * 1024),
      kinds = options.get("kinds").toSeq
        .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)),
      decodeText = options.get("decode.text").forall(_.toBoolean),
      extractHtml = options.get("extract.html").exists(_.toBoolean))
}
