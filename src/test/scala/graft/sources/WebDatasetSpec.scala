package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WebDataset tar shards: ustar layout, PAX long names, sample
  * grouping, size-budget rotation, gzip, and the Spark round trip. */
class WebDatasetSpec extends SparkSpec {

  private def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def sampleDf(rows: Seq[(String, Map[String, Array[Byte]])]) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("key", StringType),
      StructField("parts", MapType(StringType, BinaryType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, m) => Row(k, m) }, 2), schema)
  }

  test("ustar header layout: magic, octal fields, verifiable checksum") {
    val bos = new java.io.ByteArrayOutputStream()
    WebDataset.writeMember(bos, "0001.txt", utf8("hello"))
    val bytes = bos.toByteArray
    assert(bytes.length == 1024) // one header block + one padded data block
    assert(new String(bytes, 257, 5, "US-ASCII") == "ustar")
    assert(bytes(262) == 0 && bytes(263) == '0' && bytes(264) == '0')
    assert(bytes(156) == '0') // regular file
    // size field: 11 octal digits + NUL terminator
    assert(new String(bytes, 124, 11, "US-ASCII") == "00000000005")
    assert(bytes(135) == 0)
    // the checksum must validate under the reader's own rule
    val members = WebDataset.tarMembers(
      new java.io.ByteArrayInputStream(bytes), "golden", 1 << 20).toSeq
    assert(members.map(_.name) == Seq("0001.txt"))
    assert(new String(members.head.data, "UTF-8") == "hello")
  }

  test("corrupted header checksum fails loudly") {
    val bos = new java.io.ByteArrayOutputStream()
    WebDataset.writeMember(bos, "a.txt", utf8("x"))
    val bytes = bos.toByteArray
    bytes(0) = (bytes(0) + 1).toByte // name byte flip, checksum now stale
    val e = intercept[IllegalArgumentException] {
      WebDataset.tarMembers(new java.io.ByteArrayInputStream(bytes), "f", 1 << 20).toSeq
    }
    assert(e.getMessage.contains("checksum"))
  }

  test("names over 100 bytes round-trip through a PAX path record") {
    val long = "nested/" + ("d" * 120) + "/sample-0001.json"
    val bos = new java.io.ByteArrayOutputStream()
    WebDataset.writeMember(bos, long, utf8("{}"))
    val members = WebDataset.tarMembers(
      new java.io.ByteArrayInputStream(bos.toByteArray), "f", 1 << 20).toSeq
    assert(members.map(_.name) == Seq(long))
  }

  test("sampleBytes equals the bytes writeMember actually writes, including multi-block PAX preludes") {
    // a PAX record for a >~500-byte name spans TWO 512-byte data
    // blocks; the old pinned 1024-byte estimate undercounted there
    // and let shards exceed their budget. The rotation math must
    // agree with the writer to the byte at every name length.
    for (nameLen <- Seq(10, 99, 100, 101, 250, 480, 505, 600, 1100)) {
      val key = "k" * nameLen
      val parts = Seq(("json", utf8("{}")), ("bin", new Array[Byte](700)))
      val bos = new java.io.ByteArrayOutputStream()
      parts.foreach { case (ext, data) =>
        WebDataset.writeMember(bos, s"$key.$ext", data); ()
      }
      assert(WebDataset.sampleBytes(key, parts) == bos.size.toLong,
        s"nameLen=$nameLen: estimated ${WebDataset.sampleBytes(key, parts)}, wrote ${bos.size}")
    }
    // PAX length-prefix fixpoint: the digits count includes itself
    assert(WebDataset.paxLengthDigits(7) == 1)    // "8 ..." total 8
    assert(WebDataset.paxLengthDigits(97) == 2)   // 97+2=99, two digits
    assert(WebDataset.paxLengthDigits(98) == 3)   // 98+2=100 needs 3; 98+3=101 has 3: fixpoint
    assert(WebDataset.paxLengthDigits(996) == 3)  // 996+3=999
    assert(WebDataset.paxLengthDigits(997) == 4)  // 997+3=1000 rolls to 4 digits
  }

  test("consecutive members group into samples; a recurring key is a NEW sample") {
    val bos = new java.io.ByteArrayOutputStream()
    WebDataset.writeMember(bos, "a.txt", utf8("A"))
    WebDataset.writeMember(bos, "a.json", utf8("{\"x\":1}"))
    WebDataset.writeMember(bos, "b.txt", utf8("B"))
    WebDataset.writeMember(bos, "a.cls", utf8("9")) // same key, NOT adjacent
    bos.write(new Array[Byte](1024))
    val rows = WebDataset.samples(
      WebDataset.tarMembers(new java.io.ByteArrayInputStream(bos.toByteArray), "s", 1 << 20),
      "s").toSeq
    assert(rows.map(_.getString(0)) == Seq("a", "b", "a"))
    val first = rows.head.getAs[Map[String, Array[Byte]]](2)
    assert(first.keySet == Set("txt", "json"))
    assert(new String(first("txt"), "UTF-8") == "A")
  }

  test("write/read round trip preserves keys, extensions and bytes exactly") {
    val data = (0 until 20).map { i =>
      (f"k$i%04d", Map(
        "txt" -> utf8(s"text-$i é中"),
        "bin" -> Array.tabulate[Byte](257)(j => ((i * 31 + j) & 0xFF).toByte)))
    }
    val dir = tmpDir("wds_rt")
    WebDataset.write(sampleDf(data), dir, overwrite = true)
    val back = WebDataset.read(spark, s"$dir/*.tar")
    assert(back.count() == 20)
    assert(back.where(col("truncated")).count() == 0)
    val got = back.collect().map { r =>
      r.getString(0) -> r.getAs[Map[String, Array[Byte]]](2)
    }.toMap
    data.foreach { case (k, parts) =>
      assert(got.contains(k), s"missing sample $k")
      parts.foreach { case (ext, bytes) =>
        assert(java.util.Arrays.equals(got(k)(ext), bytes), s"$k.$ext bytes differ")
      }
    }
  }

  test("shard rotation honors the size budget and never splits a sample") {
    val data = (0 until 40).map { i =>
      (f"k$i%04d", Map("bin" -> Array.fill[Byte](2048)(i.toByte)))
    }
    val dir = tmpDir("wds_rot")
    // ~2.5 KiB per sample (header + 4 data blocks); 8 KiB budget → rotation
    WebDataset.write(sampleDf(data), dir, maxShardBytes = 8 * 1024, overwrite = true)
    val shards = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(shards.length > 2, s"expected rotation, got ${shards.length} shard(s)")
    shards.foreach { f =>
      assert(f.length <= 8 * 1024 + 1024, s"${f.getName} blew the budget: ${f.length}")
      // every shard parses standalone with complete samples
      val rows = WebDataset.samples(
        WebDataset.tarMembers(new java.io.FileInputStream(f), f.getName, 1 << 20),
        f.getName).toSeq
      rows.foreach(r => assert(
        r.getAs[Map[String, Array[Byte]]](2).keySet == Set("bin")))
    }
    assert(WebDataset.read(spark, s"$dir/*.tar").count() == 40)
  }

  test("gzip shards round-trip through the magic-sniffed reader") {
    val data = Seq(("a", Map("txt" -> utf8("alpha"))), ("b", Map("txt" -> utf8("beta"))))
    val dir = tmpDir("wds_gz")
    WebDataset.write(sampleDf(data), dir, gzip = true, overwrite = true)
    val back = WebDataset.read(spark, s"$dir/*.tar.gz")
    assert(back.count() == 2)
    assert(WebDataset.project(back, "txt").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8"))
      .toMap == Map("a" -> "alpha", "b" -> "beta"))
  }

  test("oversized members truncate with the flag instead of OOMing the task") {
    val bos = new java.io.ByteArrayOutputStream()
    WebDataset.writeMember(bos, "big.bin", Array.fill[Byte](4096)(7))
    WebDataset.writeMember(bos, "big.txt", utf8("meta"))
    val rows = WebDataset.samples(
      WebDataset.tarMembers(new java.io.ByteArrayInputStream(bos.toByteArray), "s", 1024),
      "s").toSeq
    assert(rows.length == 1)
    assert(rows.head.getBoolean(3)) // truncated
    val parts = rows.head.getAs[Map[String, Array[Byte]]](2)
    assert(parts("bin").length == 1024) // capped, stream still in sync
    assert(new String(parts("txt"), "UTF-8") == "meta") // next member intact
  }

  test("system tar can read our shards (interop, when available)") {
    val tar = sys.env.getOrElse("PATH", "").split(':')
      .map(p => new java.io.File(p, "tar")).find(_.canExecute)
    assume(tar.isDefined, "no tar binary on PATH")
    val dir = tmpDir("wds_interop")
    WebDataset.write(sampleDf(Seq(
      ("x", Map("txt" -> utf8("sys-tar"), "json" -> utf8("{}"))))), dir, overwrite = true)
    val shard = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).head
    val p = new ProcessBuilder(tar.get.getAbsolutePath, "-tf", shard.getAbsolutePath)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"tar -tf failed: $out")
    assert(out.linesIterator.toSeq.sorted == Seq("x.json", "x.txt"))
  }

  test("streaming shard ingestion delivers per-micro-batch samples") {
    val dir = tmpDir("wds_stream_in")
    val out = tmpDir("wds_stream_out")
    val ckpt = tmpDir("wds_stream_ckpt")
    WebDataset.write(sampleDf(Seq(
      ("s1", Map("txt" -> utf8("one"))), ("s2", Map("txt" -> utf8("two"))))),
      dir, overwrite = true)
    val q = WebDataset.readStream(spark, dir)
      .select(col("key"), decode(element_at(col("parts"), "txt"), "UTF-8").as("txt"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("s1" -> "one", "s2" -> "two"))
  }
}
