package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * WebDataset tar-shard source/sink — the de-facto container format
 * for multimodal training data (the public WebDataset convention:
 * POSIX tar archives whose consecutive members share a key prefix,
 * `key.jpg` + `key.txt` + `key.json` = one training sample; shards
 * stream sequentially, which is what makes the format object-store
 * friendly at 100 TB). This is beyond the reference's surface — a
 * training-data engine needs to READ the shards the training job
 * reads and WRITE shards the loader can stream.
 *
 * Sample key = member path up to the FIRST dot of the basename;
 * extension = everything after it (`a/b/c.seg.jpg` → key `a/b/c`,
 * ext `seg.jpg`). Members with the same key must be CONSECUTIVE —
 * that is the format's contract (loaders hold one sample in memory),
 * and both sides here honor it: the reader closes a sample when the
 * key changes (a recurring key later in the shard is a NEW sample,
 * as in the reference implementation), the writer never splits a
 * sample across shards.
 *
 * Scale shape: shards stream through `binaryFiles` one tar member at
 * a time — peak memory is ONE SAMPLE per task, never a shard; the
 * writer streams rows out through a counting stream and rotates
 * shards at the size budget. Parallelism is per-shard on read (the
 * natural unit — tar does not split) and per-partition on write.
 * Tar parsing is from the public POSIX ustar spec: checksum verified
 * per header (unsigned, signed tolerated), PAX `x` path overrides
 * and GNU `L` long names honored, base-256 sizes for >8 GiB members.
 */
object WebDataset {

  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("shard", StringType, nullable = false),
    StructField("parts", MapType(StringType, BinaryType), nullable = false),
    StructField("truncated", BooleanType, nullable = false)))

  // ---- tar reading ------------------------------------------------

  private[sources] final case class Member(name: String, data: Array[Byte],
                                            truncated: Boolean)

  /** Fully read `n` bytes (tar never legitimately truncates mid-block). */
  private def readFully(in: java.io.InputStream, buf: Array[Byte], n: Int,
                        file: String): Unit = {
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new IllegalArgumentException(
        s"WebDataset: truncated tar block in $file (wanted $n bytes, got $off)")
      off += r
    }
  }

  private def skipFully(in: java.io.InputStream, n: Long, file: String): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() >= 0) left -= 1
      else throw new IllegalArgumentException(
        s"WebDataset: truncated tar data in $file ($left bytes missing)")
    }
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    // GNU base-256: high bit of the first byte set, big-endian binary
    if ((b(off) & 0x80) != 0) {
      var v = (b(off) & 0x7F).toLong
      var i = off + 1
      while (i < off + len) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
      v
    } else {
      var v = 0L
      var i = off
      while (i < off + len && (b(i) == ' ' || b(i) == 0)) i += 1
      while (i < off + len && b(i) >= '0' && b(i) <= '7') { v = v * 8 + (b(i) - '0'); i += 1 }
      v
    }
  }

  private def nulString(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Streaming iterator over a tar's FILE members. One member's data
    * in memory at a time (capped at `maxPartBytes`; larger members
    * are truncated with the flag set — crawl-scale shards can carry
    * surprises, and an executor OOM is the wrong response). */
  private[sources] def tarMembers(in: java.io.InputStream, file: String,
                                  maxPartBytes: Int): Iterator[Member] =
    new Iterator[Member] {
      private val header = new Array[Byte](512)
      private var pendingName: String = null // PAX path= or GNU L override
      private var nextMember: Member = advance()

      private def zeroBlock(b: Array[Byte]): Boolean = {
        var i = 0
        while (i < 512) { if (b(i) != 0) return false; i += 1 }
        true
      }

      private def verifyChecksum(): Unit = {
        val stored = parseOctal(header, 148, 8)
        var unsigned = 0L; var signed = 0L
        var i = 0
        while (i < 512) {
          val raw = if (i >= 148 && i < 156) ' '.toByte else header(i)
          unsigned += raw & 0xFF
          signed += raw
          i += 1
        }
        if (stored != unsigned && stored != signed)
          throw new IllegalArgumentException(
            s"WebDataset: tar header checksum mismatch in $file " +
              s"(stored $stored, computed $unsigned)")
      }

      private def readData(size: Long): (Array[Byte], Boolean) = {
        val keep = math.min(size, maxPartBytes.toLong).toInt
        val data = new Array[Byte](keep)
        readFully(in, data, keep, file)
        skipFully(in, size - keep, file)
        val pad = (512 - size % 512) % 512
        skipFully(in, pad, file)
        (data, size > keep)
      }

      @annotation.tailrec
      private def advance(): Member = {
        readFullyOrEof() match {
          case false => null
          case true =>
            if (zeroBlock(header)) advance() // end marker / concatenated tars
            else {
              verifyChecksum()
              val typeflag = header(156).toChar
              val size = parseOctal(header, 124, 12)
              typeflag match {
                case '0' | '\u0000' => // POSIX '0', pre-POSIX NUL
                  val prefix = nulString(header, 345, 155)
                  val base = nulString(header, 0, 100)
                  val name =
                    if (pendingName != null) pendingName
                    else if (prefix.nonEmpty) s"$prefix/$base"
                    else base
                  pendingName = null
                  val (data, trunc) = readData(size)
                  Member(name, data, trunc)
                case 'L' => // GNU long name: data = next member's path
                  val (data, trunc) = readData(size)
                  if (trunc) throw new IllegalArgumentException(
                    s"WebDataset: GNU long name exceeds $maxPartBytes bytes in $file")
                  var end = data.length
                  while (end > 0 && data(end - 1) == 0) end -= 1
                  pendingName = new String(data, 0, end,
                    java.nio.charset.StandardCharsets.UTF_8)
                  advance()
                case 'x' => // PAX extended header: "NN key=value\n" records
                  val (data, trunc) = readData(size)
                  if (trunc) throw new IllegalArgumentException(
                    s"WebDataset: PAX header exceeds $maxPartBytes bytes in $file")
                  paxPath(data).foreach(p => pendingName = p)
                  advance()
                case _ => // dirs, links, PAX globals: skip data, drop overrides
                  readData(size)
                  pendingName = null
                  advance()
              }
            }
        }
      }

      private def readFullyOrEof(): Boolean = {
        val first = in.read()
        if (first < 0) return false
        header(0) = first.toByte
        readFully2(header, 1, 511)
        true
      }
      private def readFully2(buf: Array[Byte], off0: Int, n: Int): Unit = {
        var off = off0
        while (off < off0 + n) {
          val r = in.read(buf, off, off0 + n - off)
          if (r < 0) throw new IllegalArgumentException(
            s"WebDataset: truncated tar header in $file")
          off += r
        }
      }

      override def hasNext: Boolean = nextMember != null
      override def next(): Member = {
        val m = nextMember; nextMember = advance(); m
      }
    }

  /** PAX `path=` override out of the record stream; malformed records
    * fail loudly (a desynced PAX parse would silently misname every
    * following member). */
  private def paxPath(data: Array[Byte]): Option[String] = {
    var off = 0
    var path: Option[String] = None
    while (off < data.length) {
      var sp = off
      while (sp < data.length && data(sp) != ' ') sp += 1
      if (sp >= data.length) throw new IllegalArgumentException(
        "WebDataset: malformed PAX record (no length delimiter)")
      val len = new String(data, off, sp - off, "US-ASCII").toInt
      if (len <= 0 || off + len > data.length) throw new IllegalArgumentException(
        s"WebDataset: malformed PAX record length $len")
      val rec = new String(data, sp + 1, off + len - sp - 2,
        java.nio.charset.StandardCharsets.UTF_8) // drop trailing \n
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path") path = Some(rec.substring(eq + 1))
      off += len
    }
    path
  }

  /** (key, ext) split at the FIRST dot of the basename. */
  private[sources] def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** Group a shard's member stream into samples: consecutive members
    * sharing a key. One sample in memory at a time. */
  private[sources] def samples(members: Iterator[Member], shard: String): Iterator[Row] =
    new Iterator[Row] {
      private var pending: Member = if (members.hasNext) members.next() else null
      override def hasNext: Boolean = pending != null
      override def next(): Row = {
        val (key, ext0) = splitKey(pending.name)
        val parts = collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
        var truncated = pending.truncated
        parts(ext0) = pending.data
        pending = null
        var done = false
        while (!done && members.hasNext) {
          val m = members.next()
          val (k, e) = splitKey(m.name)
          if (k == key) {
            truncated |= m.truncated
            parts(e) = m.data
          } else { pending = m; done = true }
        }
        Row(key, shard, parts.toMap, truncated)
      }
    }

  /** Read every sample of every tar shard under `path` (plain,
    * gzipped or zstd, mixed freely). */
  def read(spark: SparkSession, path: String,
           maxPartBytes: Int = 16 * 1024 * 1024,
           minPartitions: Int = 0): DataFrame = {
    val parts = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val rows = spark.sparkContext.binaryFiles(path, parts)
      .flatMap { case (file, pds) =>
        val in = WarcSource.decompressed(new java.io.BufferedInputStream(pds.open()))
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: Exception => } })
        samples(tarMembers(in, file, maxPartBytes), file)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Streaming shard ingestion: arriving `.tar` files become a
    * per-micro-batch sample stream (binaryFile source for exactly-once
    * file tracking, path-only projection — shard bytes never buffer
    * whole; the batch path's one-sample memory bound carries over). */
  def readStream(spark: SparkSession, dir: String,
                 maxPartBytes: Int = 16 * 1024 * 1024,
                 pathGlobFilter: String = "*.tar*"): DataFrame = {
    import spark.implicits._
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
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
          val in = WarcSource.decompressed(new java.io.BufferedInputStream(fs.open(p)))
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit] { _ =>
              try in.close() catch { case _: Exception => } })
          samples(tarMembers(in, file, maxPartBytes), file)
        }
      }(enc)
  }

  /** Project sample parts to one binary column per extension (dots
    * become underscores in the column name). */
  def project(df: DataFrame, exts: String*): DataFrame =
    df.select(col("key") +: exts.map(e =>
      element_at(col("parts"), e).as(e.replace('.', '_'))): _*)

  // ---- tar writing ------------------------------------------------

  private val Ustar = Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0')

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    require(v >= 0, s"tar numeric field must be non-negative, got $v")
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= len - 1, s"tar numeric field overflow: $v needs ${s.length} digits")
    var i = 0
    while (i < len - 1 - s.length) { h(off + i) = '0'; i += 1 }
    var j = 0
    while (j < s.length) { h(off + i + j) = s.charAt(j).toByte; j += 1 }
    // NUL terminator (len - 1 digits + NUL)
    h(off + len - 1) = 0
  }

  /** One ustar header + data + padding; PAX `x` prelude for names
    * over 100 bytes. Deterministic: mtime 0, uid/gid 0, mode 0644 —
    * re-writing the same rows yields byte-identical shards. */
  private[sources] def writeMember(out: java.io.OutputStream, name: String,
                                   data: Array[Byte]): Long = {
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var written = 0L
    if (nameBytes.length > 100) {
      val body = s" path=$name\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val rec = new java.io.ByteArrayOutputStream()
      rec.write((body.length + paxLengthDigits(body.length)).toString
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      rec.write(body)
      written += writeHeaderAndData(out, "./PaxHeaders.x/sample", 'x', rec.toByteArray)
    }
    val shortName = if (nameBytes.length > 100)
      new String(nameBytes, 0, 100, java.nio.charset.StandardCharsets.ISO_8859_1)
    else name
    written += writeHeaderAndData(out, shortName, '0', data)
    written
  }

  private def writeHeaderAndData(out: java.io.OutputStream, name: String,
                                 typeflag: Char, data: Array[Byte]): Long = {
    val h = new Array[Byte](512)
    val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
    putOctal(h, 100, 8, 0x1A4) // 0644
    putOctal(h, 108, 8, 0)     // uid
    putOctal(h, 116, 8, 0)     // gid
    putOctal(h, 124, 12, data.length.toLong)
    putOctal(h, 136, 12, 0)    // mtime: deterministic output
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h(156) = typeflag.toByte
    System.arraycopy(Ustar, 0, h, 257, 8)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xFF; i += 1 }
    // checksum: 6 octal digits, NUL, space
    val cs = java.lang.Long.toOctalString(sum)
    var k = 0
    while (k < 6 - cs.length) { h(148 + k) = '0'; k += 1 }
    var j = 0
    while (j < cs.length) { h(148 + k + j) = cs.charAt(j).toByte; j += 1 }
    h(154) = 0
    h(155) = ' '
    out.write(h)
    out.write(data)
    val pad = (512 - data.length % 512) % 512
    var p = 0
    while (p < pad) { out.write(0); p += 1 }
    512L + data.length + pad
  }

  /** Digit count of a PAX record's length prefix: "NN path=<name>\n"
    * declares its TOTAL byte length including its own digits — the
    * prefix lengthens the record it measures, so run to the fixpoint. */
  private[sources] def paxLengthDigits(bodyLen: Int): Int = {
    var digits = (bodyLen + 1).toString.length
    while ((bodyLen + digits).toString.length != digits)
      digits = (bodyLen + digits).toString.length
    digits
  }

  /** Exact tar footprint of one sample — used to rotate BEFORE a
    * sample that would blow the shard budget. */
  private[sources] def sampleBytes(key: String, parts: Seq[(String, Array[Byte])]): Long =
    parts.map { case (ext, data) =>
      val name = memberName(key, ext)
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      val pax =
        if (nameBytes <= 100) 0L
        else {
          // EXACT PAX member size (same arithmetic as writeMember): a
          // member name over ~500 UTF-8 bytes pushes the record past
          // one 512-byte data block, so a pinned 1024 constant would
          // undercount and let a shard exceed maxShardBytes
          val bodyLen = s" path=$name\n"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
          val recLen = bodyLen + paxLengthDigits(bodyLen)
          512L + ((recLen + 511L) / 512L) * 512L
        }
      pax + 512L + ((data.length + 511L) / 512L) * 512L
    }.sum

  private def memberName(key: String, ext: String): String =
    if (ext.isEmpty) key else s"$key.$ext"

  /**
   * Write `df` as WebDataset tar shards under `dir`. Expects a string
   * key column and a map<string,binary> parts column (the reader's
   * own shape — read → transform → write round-trips). Each task
   * streams its rows into `prefix-PPPPP-SSSS.tar`, rotating at
   * `maxShardBytes` WITHOUT splitting a sample; parts write in ext
   * order for determinism. Task retries overwrite their own
   * deterministic file names, so reruns converge.
   */
  def write(df: DataFrame, dir: String,
            maxShardBytes: Long = 1L << 30,
            prefix: String = "shard",
            keyCol: String = "key", partsCol: String = "parts",
            gzip: Boolean = false,
            overwrite: Boolean = false): Unit = {
    require(maxShardBytes >= 3 * 512,
      s"maxShardBytes must fit at least one member + footer, got $maxShardBytes")
    val spark = df.sparkSession
    df.schema(partsCol).dataType match {
      case MapType(StringType, BinaryType, _) =>
      case other => throw new IllegalArgumentException(
        s"WebDataset.write: $partsCol must be map<string,binary>, got ${other.simpleString}")
    }
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val outPath = new org.apache.hadoop.fs.Path(dir)
    val driverFs = outPath.getFileSystem(hconf.value)
    if (driverFs.exists(outPath)) {
      if (overwrite) driverFs.delete(outPath, true)
      else throw new IllegalArgumentException(
        s"WebDataset.write: $dir already exists (pass overwrite = true)")
    }
    driverFs.mkdirs(outPath)
    val suffix = if (gzip) ".tar.gz" else ".tar"
    df.select(col(keyCol).cast(StringType).as("key"), col(partsCol).as("parts"))
      .foreachPartition { rows: Iterator[Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf.value)
        var seq = 0
        var out: java.io.OutputStream = null
        var shardBytes = 0L
        def open(): Unit = {
          val name = f"$prefix-$pid%05d-$seq%04d$suffix"
          val raw = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
          out = if (gzip) new java.util.zip.GZIPOutputStream(raw, 8192) else raw
          shardBytes = 0L
        }
        def close(): Unit = if (out != null) {
          // tar end marker: two zero blocks
          val z = new Array[Byte](1024)
          out.write(z)
          out.close()
          out = null
          seq += 1
        }
        try {
          rows.foreach { r =>
            val key = r.getString(0)
            if (key == null) throw new IllegalArgumentException(
              "WebDataset.write: null sample key")
            val parts = r.getMap[String, Array[Byte]](1).toSeq.sortBy(_._1)
            val need = sampleBytes(key, parts)
            if (out != null && shardBytes + need > maxShardBytes - 1024) close()
            if (out == null) open()
            parts.foreach { case (ext, data) =>
              shardBytes += writeMember(out,
                memberName(key, ext),
                if (data == null) Array.emptyByteArray else data)
            }
          }
        } finally close()
      }
  }
}
