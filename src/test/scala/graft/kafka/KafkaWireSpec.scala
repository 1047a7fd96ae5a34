package graft.kafka

import graft.SparkSpec
import graft.kafka.KafkaWire._

/** Wire-protocol layer: golden byte layouts, CRC enforcement,
  * murmur2 routing, and the full client <-> broker exchange over real
  * loopback sockets against [[LoopbackCluster]]. */
class KafkaWireSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("message v1 golden layout: crc + magic + attributes + timestamp + key + value") {
    val m = encodeMessage(OutRecord(b("k"), b("val"), 0x1122334455667788L))
    // layout after the 4-byte CRC: magic, attributes, int64 ts,
    // int32 keyLen, key, int32 valueLen, value
    val tail = m.drop(4)
    assert(tail(0) == 1 && tail(1) == 0)
    val ts = java.nio.ByteBuffer.wrap(tail, 2, 8).getLong
    assert(ts == 0x1122334455667788L)
    assert(java.nio.ByteBuffer.wrap(tail, 10, 4).getInt == 1)   // key length
    assert(tail(14) == 'k')
    assert(java.nio.ByteBuffer.wrap(tail, 15, 4).getInt == 3)   // value length
    assert(new String(tail, 19, 3, "UTF-8") == "val")
    assert(m.length == 4 + 2 + 8 + 4 + 1 + 4 + 3)
    // the stored CRC equals an independently computed CRC32 of the tail
    val crc = new java.util.zip.CRC32(); crc.update(tail)
    assert(java.nio.ByteBuffer.wrap(m, 0, 4).getInt == crc.getValue.toInt)
  }

  test("message set round trip: offsets, timestamps, null keys") {
    val set = encodeMessageSet(Seq(
      OutRecord(null, b("first"), 100L),
      OutRecord(b("key2"), b("second"), 200L)))
    val decoded = decodeMessageSet(set)
    assert(decoded.map(_.offset) == Seq(0L, 1L))
    assert(decoded.map(_.timestamp) == Seq(100L, 200L))
    assert(decoded.head.key == null)
    assert(new String(decoded(1).key, "UTF-8") == "key2")
    assert(decoded.map(r => new String(r.value, "UTF-8")) == Seq("first", "second"))
    assert(decoded.forall(_.timestampType == 0)) // create-time
  }

  test("partial trailing message is dropped, not an error (the protocol's max_bytes slice rule)") {
    val set = encodeMessageSet(Seq(
      OutRecord(null, b("whole"), 1L), OutRecord(null, b("sliced"), 2L)))
    // cut into the second message
    val truncated = set.take(set.length - 3)
    val decoded = decodeMessageSet(truncated)
    assert(decoded.size == 1)
    assert(new String(decoded.head.value, "UTF-8") == "whole")
    // cutting into the HEADER of the second entry also yields one record
    val firstEntry = 12 + encodeMessage(OutRecord(null, b("whole"), 1L)).length
    assert(decodeMessageSet(set.take(firstEntry + 8)).size == 1)
  }

  test("corrupt CRC fails loudly") {
    val set = encodeMessageSet(Seq(OutRecord(null, b("x"), 1L)))
    set(set.length - 1) = (set(set.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](decodeMessageSet(set))
    assert(e.getMessage.contains("CRC"), e.getMessage)
  }

  test("murmur2 stability pins and default-partitioner routing") {
    // stability pins for the reimplementation of Kafka's murmur2
    // (seed 0x9747b28c) — any change to the hash would silently move
    // keys to different partitions across versions
    val h1 = murmur2(b("hello"))
    val h2 = murmur2(b("hello"))
    assert(h1 == h2)
    assert(murmur2(b("a")) != murmur2(b("b")))
    assert(murmur2(Array.emptyByteArray) == murmur2(Array.emptyByteArray))
    val p = partitionForKey(b("some-key"), 7)
    assert(p >= 0 && p < 7)
    // sign bit masked: even a negative hash routes to a valid partition
    val neg = (0 until 1000).map(i => partitionForKey(b(s"k$i"), 5))
    assert(neg.forall(x => x >= 0 && x < 5))
    assert(neg.distinct.size == 5) // all partitions reachable
  }

  test("cluster e2e: produce -> listOffsets -> fetch round trip over real sockets") {
    val cluster = new LoopbackCluster(Map("events" -> 2))
    try {
      val client = new KafkaWireClient(KafkaBatch.parseBrokers(cluster.bootstrapServers))
      try {
        assert(client.apiVersions().contains(KafkaWire.ApiFetch))
        val meta = client.metadata(Seq("events"))
        assert(meta.topics("events").partitions.map(_.partition).sorted == Seq(0, 1))

        val base = client.produce("events", 0,
          Seq(OutRecord(b("k1"), b("v1"), 10L), OutRecord(null, b("v2"), 20L)))
        assert(base == 0L)
        val base2 = client.produce("events", 0, Seq(OutRecord(b("k3"), b("v3"), 30L)))
        assert(base2 == 2L)

        assert(client.earliestOffsets("events", Seq(0, 1)) == Map(0 -> 0L, 1 -> 0L))
        assert(client.latestOffsets("events", Seq(0, 1)) == Map(0 -> 3L, 1 -> 0L))

        val res = client.fetch("events", 0, 0L)
        assert(res.highWatermark == 3L)
        assert(res.records.map(r => new String(r.value, "UTF-8")) == Seq("v1", "v2", "v3"))
        assert(res.records.map(_.offset) == Seq(0L, 1L, 2L))
        assert(new String(res.records.head.key, "UTF-8") == "k1")
        assert(res.records(1).key == null)

        // fetch from the middle of the log
        val mid = client.fetch("events", 0, 2L)
        assert(mid.records.map(_.offset) == Seq(2L))

        // unknown topic surfaces the protocol error by name
        val e = intercept[KafkaProtocolException](client.metadata(Seq("nope")).leaderFor("nope", 0))
        assert(e.getMessage.contains("UNKNOWN_TOPIC_OR_PARTITION"), e.getMessage)
      } finally client.close()
    } finally cluster.close()
  }

  test("leader routing: a 2-broker cluster bootstrapped from ONE broker routes to each partition's leader") {
    val cluster = new LoopbackCluster(Map("t" -> 4), numBrokers = 2)
    try {
      // partitions 1 and 3 lead on broker 1, which the client only
      // learns about via Metadata from broker 0
      val client = new KafkaWireClient(KafkaBatch.parseBrokers(cluster.firstBroker))
      try {
        client.produce("t", 1, Seq(OutRecord(null, b("on-broker-1"), 1L)))
        client.produce("t", 0, Seq(OutRecord(null, b("on-broker-0"), 1L)))
        assert(new String(client.fetch("t", 1, 0L).records.head.value, "UTF-8") == "on-broker-1")
        assert(new String(client.fetch("t", 0, 0L).records.head.value, "UTF-8") == "on-broker-0")
        assert(cluster.log("t", 1).records.size == 1)
      } finally client.close()
    } finally cluster.close()
  }

  test("a client that skips leader routing gets NOT_LEADER_FOR_PARTITION, like a real broker") {
    val cluster = new LoopbackCluster(Map("t" -> 2), numBrokers = 2)
    try {
      // the wire client always routes via metadata, so hand-frame a raw
      // produce for partition 1 (leader: broker 1) at broker 0 and
      // assert the broker-side leadership check fires
      {
        val s = new java.net.Socket("127.0.0.1", cluster.brokers.head.port)
        val out = new java.io.DataOutputStream(s.getOutputStream)
        val in = new java.io.DataInputStream(s.getInputStream)
        val set = encodeMessageSet(Seq(OutRecord(null, b("x"), 1L)))
        val w = new Writer().int16(ApiProduce).int16(2).int32(99).string("raw")
          .int16(-1).int32(1000)
          .int32(1).string("t").int32(1).int32(1).bytes(set)
        val payload = w.toBytes
        out.writeInt(payload.length); out.write(payload); out.flush()
        val size = in.readInt(); val resp = new Array[Byte](size); in.readFully(resp)
        val r = new Reader(resp)
        assert(r.int32() == 99) // correlation id
        r.int32() // topic count
        assert(r.string() == "t")
        r.int32() // partition count
        assert(r.int32() == 1)   // partition
        assert(r.int16() == 6)   // NOT_LEADER_FOR_PARTITION
        s.close()
      }
    } finally cluster.close()
  }

  test("broker rejects corrupt produce batches with CORRUPT_MESSAGE, like a real broker") {
    val cluster = new LoopbackCluster(Map("t" -> 1))
    try {
      val set = encodeMessageSet(Seq(OutRecord(null, b("zap"), 1L)))
      set(set.length - 1) = (set(set.length - 1) ^ 0x7f).toByte
      val s = new java.net.Socket("127.0.0.1", cluster.brokers.head.port)
      val out = new java.io.DataOutputStream(s.getOutputStream)
      val in = new java.io.DataInputStream(s.getInputStream)
      val w = new Writer().int16(ApiProduce).int16(2).int32(7).string("raw")
        .int16(-1).int32(1000)
        .int32(1).string("t").int32(1).int32(0).bytes(set)
      val payload = w.toBytes
      out.writeInt(payload.length); out.write(payload); out.flush()
      val size = in.readInt(); val resp = new Array[Byte](size); in.readFully(resp)
      val r = new Reader(resp)
      assert(r.int32() == 7)
      r.int32(); r.string(); r.int32(); r.int32()
      assert(r.int16() == 2, "expected CORRUPT_MESSAGE")
      s.close()
      assert(cluster.log("t", 0).records.isEmpty, "corrupt batch must not append")
    } finally cluster.close()
  }

  test("KafkaBatch.read: one DataFrame in the Spark kafka-source schema, one task per partition") {
    val cluster = new LoopbackCluster(Map("ev" -> 3))
    try {
      cluster.append("ev", 0, Seq((b("a"), b("v0a")), (null, b("v0b"))), timestamp = 5000L)
      cluster.append("ev", 1, Seq((b("c"), b("v1a"))), timestamp = 6000L)
      // partition 2 stays empty
      val df = KafkaBatch.read(spark, cluster.bootstrapServers, "ev")
      assert(df.schema == KafkaBatch.kafkaSchema)
      val rows = df.collect().sortBy(r => (r.getInt(3), r.getLong(4)))
      assert(rows.length == 3)
      assert(rows.map(r => new String(r.getAs[Array[Byte]](1), "UTF-8")).toSeq == Seq("v0a", "v0b", "v1a"))
      assert(rows.map(_.getInt(3)).toSeq == Seq(0, 0, 1))
      assert(rows.map(_.getLong(4)).toSeq == Seq(0L, 1L, 0L))
      assert(rows.head.getTimestamp(5).getTime == 5000L)
      assert(rows.head.getString(2) == "ev")
      // explicit range: only partition 0's second record
      val ranged = KafkaBatch.read(spark, cluster.bootstrapServers, "ev",
        starting = KafkaBatch.Explicit(Map(0 -> 1L, 1 -> 1L, 2 -> 0L)))
      assert(ranged.collect().map(r => new String(r.getAs[Array[Byte]](1), "UTF-8")).toSeq == Seq("v0b"))
    } finally cluster.close()
  }

  test("KafkaBatch.read escalates maxBytes when a message exceeds the fetch window") {
    val cluster = new LoopbackCluster(Map("big" -> 1))
    try {
      val big = Array.fill[Byte](3000)('x')
      cluster.append("big", 0, Seq((null, big), (null, b("small"))))
      val df = KafkaBatch.read(spark, cluster.bootstrapServers, "big", maxBytes = 64)
      val values = df.collect().map(_.getAs[Array[Byte]]("value").length).sorted
      assert(values.toSeq == Seq(5, 3000))
    } finally cluster.close()
  }

  test("KafkaBatch.write: murmur2 keyed routing matches the default partitioner; null keys round-robin") {
    val cluster = new LoopbackCluster(Map("out" -> 4))
    try {
      import spark.implicits._
      val keyed = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      val df = keyed.map(k => (k.getBytes("UTF-8"), s"payload-$k".getBytes("UTF-8"))).toDF("key", "value")
      KafkaBatch.write(df, cluster.bootstrapServers, "out")
      keyed.foreach { k =>
        val expected = partitionForKey(k.getBytes("UTF-8"), 4)
        val log = cluster.log("out", expected)
        assert(log.records.exists(r => new String(r._3, "UTF-8") == s"payload-$k"),
          s"key $k expected on partition $expected")
      }
      val total = (0 until 4).map(p => cluster.log("out", p).records.size).sum
      assert(total == keyed.size)
      // null keys spread without landing all on one partition
      val nulls = spark.range(64).selectExpr("cast(null as binary) as key",
        "cast(cast(id as string) as binary) as value")
      KafkaBatch.write(nulls.repartition(4), cluster.bootstrapServers, "out")
      val after = (0 until 4).map(p => cluster.log("out", p).records.size)
      assert(after.sum == keyed.size + 64)
    } finally cluster.close()
  }

  test("OffsetSpec.parse: earliest, latest, and the Spark per-partition JSON spelling") {
    assert(KafkaBatch.OffsetSpec.parse("earliest") == KafkaBatch.Earliest)
    assert(KafkaBatch.OffsetSpec.parse(" LATEST ") == KafkaBatch.Latest)
    assert(KafkaBatch.OffsetSpec.parse("""{"0": 12, "1": 5}""") ==
      KafkaBatch.Explicit(Map(0 -> 12L, 1 -> 5L)))
    intercept[IllegalArgumentException](KafkaBatch.OffsetSpec.parse("sometimes"))
  }

  // ── record batches (magic 2) ─────────────────────────────────────

  test("CRC32C is Castagnoli: the public '123456789' check vector") {
    // the check value every CRC32C implementation must produce
    // (iSCSI / RFC 3720 polynomial) — pins java.util.zip.CRC32C as
    // the Castagnoli CRC the v2 batch format requires, NOT CRC32
    assert(crc32c(b("123456789"), 0, 9) == 0xE3069283.toInt)
    val plain = new java.util.zip.CRC32(); plain.update(b("123456789"))
    assert(plain.getValue.toInt != 0xE3069283.toInt, "CRC32 and CRC32C must differ")
  }

  test("zigzag varint golden bytes and 64-bit round trip") {
    def enc(v: Long): Seq[Byte] = new Writer().varlong(v).toBytes.toSeq
    assert(enc(0) == Seq[Byte](0x00))
    assert(enc(-1) == Seq[Byte](0x01))
    assert(enc(1) == Seq[Byte](0x02))
    assert(enc(150) == Seq[Byte](0xAC.toByte, 0x02))   // zigzag 300
    assert(enc(-75) == Seq[Byte](0x95.toByte, 0x01))   // zigzag 149
    for (v <- Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 300L, 1L << 34,
                  Long.MaxValue, Long.MinValue)) {
      val r = new Reader(new Writer().varlong(v).toBytes)
      assert(r.varlong() == v, s"round trip failed for $v")
    }
  }

  test("record batch v2 golden layout: header fields, CRC32C coverage, varint records") {
    val batch = encodeRecordBatch(Seq(
      OutRecord(b("k"), b("val"), 1000L),
      OutRecord(null, b("w"), 1002L)), baseOffset = 5L)
    val bb = java.nio.ByteBuffer.wrap(batch)
    assert(batch.length == 80)                 // 61-byte header + 19 record bytes
    assert(bb.getLong(0) == 5L)                // baseOffset
    assert(bb.getInt(8) == 68)                 // batchLength (epoch..end)
    assert(bb.getInt(12) == -1)                // partitionLeaderEpoch
    assert(batch(16) == 2)                     // magic
    assert(bb.getInt(17) == crc32c(batch, 21, batch.length - 21)) // CRC32C covers attrs..end
    assert(bb.getShort(21) == 0)               // attributes
    assert(bb.getInt(23) == 1)                 // lastOffsetDelta
    assert(bb.getLong(27) == 1000L)            // baseTimestamp
    assert(bb.getLong(35) == 1002L)            // maxTimestamp
    assert(bb.getLong(43) == -1L)              // producerId
    assert(bb.getShort(51) == -1)              // producerEpoch
    assert(bb.getInt(53) == -1)                // baseSequence
    assert(bb.getInt(57) == 2)                 // record count
    assert(batch(61) == 0x14)                  // record 0 length: varint(10)
    val decoded = decodeRecordSet(batch)
    assert(decoded.map(_.offset) == Seq(5L, 6L))
    assert(decoded.map(_.timestamp) == Seq(1000L, 1002L))
    assert(new String(decoded(0).key, "UTF-8") == "k" && decoded(1).key == null)
    assert(decoded.map(r => new String(r.value, "UTF-8")) == Seq("val", "w"))
  }

  test("unified decoder walks mixed v1 entries and v2 batches in one set") {
    val v1 = encodeMessageSet(Seq(OutRecord(b("a"), b("one"), 10L)))
    val v2 = encodeRecordBatch(Seq(OutRecord(b("b"), b("two"), 20L),
      OutRecord(b("c"), b("three"), 21L)), baseOffset = 1L)
    val mixed = v1 ++ v2
    val decoded = decodeRecordSet(mixed)
    assert(decoded.map(r => new String(r.value, "UTF-8")) == Seq("one", "two", "three"))
    assert(decoded.map(_.offset) == Seq(0L, 1L, 2L))
  }

  test("v2 partial trailing batch is dropped; corrupt CRC32C fails loudly") {
    val full = encodeRecordBatch(Seq(OutRecord(b("k"), b("value-1"), 1L)), 0L) ++
      encodeRecordBatch(Seq(OutRecord(b("k"), b("value-2"), 2L)), 1L)
    // slice mid-second-batch: only the first batch's record survives
    val sliced = decodeRecordSet(full.dropRight(5))
    assert(sliced.map(r => new String(r.value, "UTF-8")) == Seq("value-1"))
    // flip a byte inside the covered region -> CRC32C mismatch
    val corrupt = full.clone()
    corrupt(70) = (corrupt(70) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](decodeRecordSet(corrupt))
    assert(e.getMessage.contains("CRC32C"))
  }

  test("v1 set: a declared size below the 22-byte minimum mid-buffer is corruption, not a tail") {
    // offset 7, size 10, then 10+ bytes of garbage follow — the old
    // partial-tail shortcut would silently truncate here and surface
    // later as a bogus maxBytes escalation
    val junk = new Writer().int64(7L).int32(10).raw(new Array[Byte](20)).toBytes
    val e = intercept[IllegalArgumentException](decodeMessageSet(junk))
    assert(e.getMessage.contains("offset 7") && e.getMessage.contains("22"))
    // a genuinely short tail (declared size larger than what remains)
    // is still dropped silently, whatever its declared size
    val msg = encodeMessageSet(Seq(OutRecord(b("k"), b("v"), 1L)))
    assert(decodeMessageSet(msg ++ new Writer().int64(1L).int32(500).raw(new Array[Byte](30)).toBytes)
      .size == 1)
  }

  test("format negotiation e2e: v2 brokers get record batches, v1 brokers get message sets, override pins") {
    // modern cluster (Produce<=3 / Fetch<=4): negotiated format 2,
    // 7 records -> fetch walks 3 batches (3+3+1 at FetchBatchRecords=3)
    val modern = new LoopbackCluster(Map("t" -> 1), numBrokers = 1)
    try {
      val c = new KafkaWireClient(Seq(("127.0.0.1", modern.brokers.head.port)))
      assert(c.messageFormat == 2)
      val recs = (0 until 7).map(i => OutRecord(null, b(s"m$i"), 100L + i))
      assert(c.produce("t", 0, recs) == 0L)
      val got = c.fetch("t", 0, 0L)
      assert(got.records.map(r => new String(r.value, "UTF-8")) == (0 until 7).map("m" + _))
      assert(got.records.map(_.offset) == (0L until 7L))
      c.close()
      // formatOverride pins v1 against the same modern broker (mixed
      // logs on upgraded clusters): writes MessageSet via Produce v2
      val pinned = new KafkaWireClient(Seq(("127.0.0.1", modern.brokers.head.port)),
        formatOverride = Some(1))
      assert(pinned.messageFormat == 1)
      pinned.produce("t", 0, Seq(OutRecord(null, b("old-format"), 200L)))
      val mixed = pinned.fetch("t", 0, 0L)
      assert(mixed.records.size == 8 && new String(mixed.records.last.value, "UTF-8") == "old-format")
      pinned.close()
    } finally modern.close()
    // legacy cluster (Produce<=2 / Fetch<=2): negotiation downgrades
    val legacy = new LoopbackCluster(Map("t" -> 1), numBrokers = 1, maxFormat = 1)
    try {
      val c = new KafkaWireClient(Seq(("127.0.0.1", legacy.brokers.head.port)))
      assert(c.messageFormat == 1)
      c.produce("t", 0, Seq(OutRecord(b("k"), b("legacy"), 1L)))
      assert(new String(c.fetch("t", 0, 0L).records.head.value, "UTF-8") == "legacy")
      c.close()
    } finally legacy.close()
  }

  test("v2 decoder honors attribute bits and record headers from foreign producers") {
    // graft's own encoder never sets these, but a real broker's log
    // carries them: patch a batch's attributes and re-stamp the CRC
    def withAttributes(batch: Array[Byte], attrs: Short): Array[Byte] = {
      val out = batch.clone()
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putShort(21, attrs)
      bb.putInt(17, crc32c(out, 21, out.length - 21))
      out
    }
    val base = encodeRecordBatch(Seq(OutRecord(b("k"), b("v"), 5L)), 3L)
    // control batch (bit 5): transaction marker — yields NO records
    assert(decodeRecordSet(withAttributes(base, 0x20)).isEmpty)
    // log-append-time (bit 3): timestampType flips to 1
    val lat = decodeRecordSet(withAttributes(base, 0x08))
    assert(lat.size == 1 && lat.head.timestampType == 1 && lat.head.timestamp == 5L)
    // compression bits on an UNCOMPRESSED payload: the snappy framing
    // check fails loudly (corrupt batch), never silently garbled
    intercept[Exception](decodeRecordSet(withAttributes(base, 0x02)))
    // an out-of-registry codec (bits = 5) is a loud error too
    val e = intercept[IllegalArgumentException](decodeRecordSet(withAttributes(base, 0x05)))
    assert(e.getMessage.contains("unsupported compression codec"))
    // record HEADERS (never written by graft, legal on the wire):
    // hand-assemble one record with a header and verify the walk
    val rec = new Writer().int8(0).varlong(0L).varint(0)
      .varBytes(b("k")).varBytes(b("v"))
      .varint(1).varBytes(b("hk")).varBytes(b("hv")).toBytes
    val body = new Writer().varint(rec.length).raw(rec).toBytes
    val covered = new Writer().int16(0).int32(0).int64(9L).int64(9L)
      .int64(-1L).int16(-1).int32(-1).int32(1).raw(body).toBytes
    val batch = new Writer().int64(7L).int32(covered.length + 9).int32(-1).int8(2)
      .int32(crc32c(covered, 0, covered.length)).raw(covered).toBytes
    val got = decodeRecordSet(batch)
    assert(got.size == 1 && got.head.offset == 7L &&
      new String(got.head.value, "UTF-8") == "v")
    // empty set decodes to nothing, not an error
    assert(decodeRecordSet(Array.emptyByteArray).isEmpty)
  }

  test("RangeFetchIterator skips compaction gaps: an all-below-offset page advances, never escalates") {
    val range = KafkaBatch.PartitionRange("t", 0, "h", 1, start = 15L, end = 20L)
    var calls = 0
    val it = new KafkaBatch.RangeFetchIterator((off, mb) => {
      calls += 1
      if (off == 15L)
        // compacted batch: survivors 10-12 only, filter emptied the page
        FetchResult(Nil, 20L, pageEndOffset = 13L) // below the request: still no progress
      else FetchResult(Seq(KafkaWire.KafkaRecord(off, 1L, 0, null, b(s"v$off"))), 20L, off + 1)
    }, range, 1 << 20)
    // pageEndOffset BELOW the request must not loop: it falls through
    // to escalation (harmless) rather than advancing backwards
    intercept[Exception](it.hasNext)

    val range2 = KafkaBatch.PartitionRange("t", 0, "h", 1, start = 15L, end = 20L)
    val it2 = new KafkaBatch.RangeFetchIterator((off, mb) => {
      if (off == 15L) FetchResult(Nil, 20L, pageEndOffset = 18L) // gap 15-17 compacted away
      else FetchResult(Seq(KafkaWire.KafkaRecord(off, 1L, 0, null, b(s"v$off"))), 20L, off + 1)
    }, range2, 1 << 20)
    assert(it2.next().offset == 18L, "iterator must advance past the compacted gap")
  }

  test("RangeFetchIterator refuses to spin on a broker that makes no forward progress") {
    val range = KafkaBatch.PartitionRange("t", 0, "h", 1, start = 10L, end = 20L)
    // nonconforming page: non-empty but max offset below the request
    val stuck = new KafkaBatch.RangeFetchIterator(
      (_, _) => FetchResult(Seq(KafkaRecord(5L, 1L, 0, null, b("x"))), 20L), range, 1 << 20)
    val e = intercept[IllegalStateException](stuck.hasNext)
    assert(e.getMessage.contains("no forward progress"))
    // honest pages still stream
    val ok = new KafkaBatch.RangeFetchIterator(
      (off, _) => FetchResult(Seq(KafkaRecord(off, 1L, 0, null, b(s"v$off"))), 20L), range, 1 << 20)
    assert(ok.take(3).map(_.offset).toSeq == Seq(10L, 11L, 12L))
  }

  /** Hand-construct a compressed v2 batch INDEPENDENT of our encoder
    * (header bytes written field by field, records section compressed
    * by the codec library directly) — the golden check for wrapper
    * framing + inner-record offset deltas. */
  private def goldenV2Compressed(codec: Int, compressFn: Array[Byte] => Array[Byte]): Array[Byte] = {
    val recs = new Writer()
    Seq(("ka", "va", 0L), ("kb", "vb", 5L), (null, "vc", 9L)).zipWithIndex.foreach {
      case ((k, v, tsd), i) =>
        val r = new Writer().int8(0).varlong(tsd).varint(i)
          .varBytes(if (k == null) null else b(k)).varBytes(b(v)).varint(0).toBytes
        recs.varint(r.length).raw(r)
    }
    val packed = compressFn(recs.toBytes)
    val covered = new Writer()
      .int16(codec)        // attributes: codec bits
      .int32(2)            // lastOffsetDelta
      .int64(1000L)        // baseTimestamp
      .int64(1009L)        // maxTimestamp
      .int64(-1L).int16(-1).int32(-1) // producer id/epoch/sequence
      .int32(3)            // record count
      .raw(packed).toBytes
    new Writer().int64(50L).int32(covered.length + 9).int32(-1).int8(2)
      .int32(crc32c(covered, 0, covered.length)).raw(covered).toBytes
  }

  test("golden gzip v2 batch: hand-built wrapper framing decodes with correct offsets and timestamps") {
    def gz(d: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(bos); o.write(d); o.close(); bos.toByteArray
    }
    val got = decodeRecordSet(goldenV2Compressed(1, gz))
    assert(got.map(_.offset) == Seq(50L, 51L, 52L))
    assert(got.map(_.timestamp) == Seq(1000L, 1005L, 1009L))
    assert(got.map(r => new String(r.value, "UTF-8")) == Seq("va", "vb", "vc"))
    assert(got(2).key == null && new String(got.head.key, "UTF-8") == "ka")
  }

  test("golden zstd v2 batch: hand-built wrapper framing decodes with correct offsets") {
    def zs(d: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new com.github.luben.zstd.ZstdOutputStream(bos); o.write(d); o.close(); bos.toByteArray
    }
    val got = decodeRecordSet(goldenV2Compressed(4, zs))
    assert(got.map(_.offset) == Seq(50L, 51L, 52L) &&
      got.map(r => new String(r.value, "UTF-8")) == Seq("va", "vb", "vc"))
  }

  test("golden gzip v1 wrapper: absolute = wrapper - lastRel + rel; log-append time propagates") {
    // inner set with relative offsets 0..2, gzip'd into a wrapper at
    // absolute offset 104 with the log-append-time bit (0x08) set
    val inner = encodeMessageSet(Seq(
      OutRecord(b("k0"), b("v0"), 11L), OutRecord(null, b("v1"), 12L),
      OutRecord(b("k2"), b("v2"), 13L)))
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.util.zip.GZIPOutputStream(bos); o.write(inner); o.close()
    val body = new Writer().int8(1).int8(0x08 | 1).int64(7777L)
      .bytes(null).bytes(bos.toByteArray).toBytes
    val crc = new java.util.zip.CRC32(); crc.update(body, 0, body.length)
    val wrapper = new Writer().int32(crc.getValue.toInt).raw(body).toBytes
    val set = new Writer().int64(104L).int32(wrapper.length).raw(wrapper).toBytes
    val got = decodeMessageSet(set)
    assert(got.map(_.offset) == Seq(102L, 103L, 104L))
    // broker stamped only the wrapper; its timestamp applies to all
    assert(got.forall(r => r.timestamp == 7777L && r.timestampType == 1))
    assert(got.map(r => new String(r.value, "UTF-8")) == Seq("v0", "v1", "v2"))
  }

  test("compression round trip: every codec, both formats, through our own encoder") {
    val recs = (0 until 40).map(i => OutRecord(
      if (i % 5 == 0) null else b(s"key-$i"), b(s"value-$i-" + "x" * (i % 17)), 1000L + i))
    for (codec <- 1 to 4) {
      val got = decodeRecordSet(encodeRecordBatch(recs, baseOffset = 7L, codec = codec))
      assert(got.size == 40, s"v2 codec $codec")
      assert(got.map(_.offset) == (7L until 47L) &&
        got.map(r => new String(r.value, "UTF-8")) == recs.map(r => new String(r.value, "UTF-8")),
        s"v2 codec $codec content")
    }
    for (codec <- 1 to 3) {
      val got = decodeMessageSet(encodeMessageSet(recs, codec))
      assert(got.size == 40 && got.map(_.timestamp) == recs.map(_.timestamp), s"v1 codec $codec")
    }
    // zstd in a v1 set is a loud error (KIP-110: v2-only), not silent corruption
    val e = intercept[IllegalArgumentException](encodeMessageSet(recs, 4))
    assert(e.getMessage.contains("zstd"))
  }

  test("e2e SASL_PLAINTEXT: PLAIN and SCRAM-SHA-256 authenticate; bad creds and no-auth are cut off") {
    val cluster = new LoopbackCluster(Map("t" -> 1), sasl = Some(("svc", "hunter2")))
    try {
      cluster.append("t", 0, Seq((b("k"), b("guarded"))))
      val addr = Seq(("127.0.0.1", cluster.brokers.head.port))
      for (mech <- Seq("PLAIN", "SCRAM-SHA-256")) {
        val c = new KafkaWireClient(addr,
          security = KafkaSecurity(sasl = Some(SaslCredentials(mech, "svc", "hunter2"))))
        assert(new String(c.fetch("t", 0, 0L).records.head.value, "UTF-8") == "guarded", mech)
        // produce rides the same authenticated session
        assert(c.produce("t", 0, Seq(OutRecord(null, b(s"w-$mech"), 1L))) >= 1L)
        c.close()
      }
      // wrong password: loud SASL_AUTHENTICATION_FAILED for both mechanisms
      for (mech <- Seq("PLAIN", "SCRAM-SHA-256")) {
        val c = new KafkaWireClient(addr,
          security = KafkaSecurity(sasl = Some(SaslCredentials(mech, "svc", "wrong"))))
        val e = intercept[KafkaProtocolException](c.fetch("t", 0, 0L))
        assert(e.code == 58, s"$mech: ${e.getMessage}")
        c.close()
      }
      // a client that skips SASL entirely gets its connection cut
      val naked = new KafkaWireClient(addr)
      intercept[java.io.IOException](naked.fetch("t", 0, 0L))
      naked.close()
    } finally cluster.close()
  }

  test("codecId maps the kafka-clients compression.type spelling") {
    assert(Seq("none", "gzip", "snappy", "lz4", "zstd").map(codecId) == Seq(0, 1, 2, 3, 4))
    assert(codecId("") == 0 && codecId(" GZIP ") == 1)
    val e = intercept[IllegalArgumentException](codecId("brotli"))
    assert(e.getMessage.contains("brotli"))
    // a compressed produce through the partitioned producer lands
    // decodable records on the broker log
    val cluster = new LoopbackCluster(Map("cp" -> 2))
    try {
      val c = new KafkaWireClient(Seq(("127.0.0.1", cluster.brokers.head.port)))
      val producer = new KafkaBatch.PartitionedProducer(c, "cp", 2, 0,
        batchSize = 3, codec = codecId("zstd"))
      (0 until 7).foreach(i => producer.send(b(s"k$i"), b(s"v$i")))
      producer.flushAll()
      val total = cluster.log("cp", 0).records.size + cluster.log("cp", 1).records.size
      assert(total == 7)
      c.close()
    } finally cluster.close()
  }

  test("KafkaSecurity.fromOptions: kafka-clients config spelling ports verbatim") {
    assert(KafkaSecurity.fromOptions(Map.empty) == KafkaSecurity())
    assert(KafkaSecurity.fromOptions(Map("kafka.security.protocol" -> "SSL")).useTls)
    val ss = KafkaSecurity.fromOptions(Map(
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "scram-sha-256",
      "kafka.sasl.username" -> "svc", "kafka.sasl.password" -> "pw"))
    assert(ss.useTls && ss.sasl.contains(SaslCredentials("SCRAM-SHA-256", "svc", "pw")))
    val sp = KafkaSecurity.fromOptions(Map(
      "kafka.security.protocol" -> "SASL_PLAINTEXT",
      "kafka.sasl.username" -> "u", "kafka.sasl.password" -> "p"))
    assert(!sp.useTls && sp.sasl.exists(_.mechanism == "PLAIN")) // PLAIN is the default mechanism
    // missing credentials and unknown protocols fail loudly at config time
    val e1 = intercept[IllegalArgumentException](
      KafkaSecurity.fromOptions(Map("kafka.security.protocol" -> "SASL_SSL")))
    assert(e1.getMessage.contains("sasl.username"))
    val e2 = intercept[IllegalArgumentException](
      KafkaSecurity.fromOptions(Map("kafka.security.protocol" -> "KERBEROS")))
    assert(e2.getMessage.contains("security.protocol"))
    // secrets never leak through toString (log-safety)
    assert(!ss.sasl.get.toString.contains("pw"))
  }

  test("e2e SASL_SSL: TLS handshake + SCRAM over the encrypted stream") {
    // self-signed server identity via keytool (JDK tooling only)
    val dir = java.nio.file.Files.createTempDirectory("graft-kafka-tls")
    val ksPath = dir.resolve("server.p12")
    import scala.sys.process._
    val rc = Seq("keytool", "-genkeypair", "-alias", "k", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", ksPath.toString,
      "-storepass", "changeit", "-dname", "CN=127.0.0.1", "-validity", "1").!
    assert(rc == 0, "keytool failed")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fin = java.nio.file.Files.newInputStream(ksPath)
    try ks.load(fin, "changeit".toCharArray) finally fin.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    // client trusts exactly that self-signed cert (no trust-all shortcuts)
    val trustKs = java.security.KeyStore.getInstance("PKCS12")
    trustKs.load(null, null)
    trustKs.setCertificateEntry("k", ks.getCertificate("k"))
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(trustKs)
    val clientCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    clientCtx.init(null, tmf.getTrustManagers, null)

    val cluster = new LoopbackCluster(Map("t" -> 1),
      sasl = Some(("svc", "tls-pw")), tlsContext = Some(serverCtx))
    try {
      cluster.append("t", 0, Seq((null: Array[Byte], b("over-tls"))))
      val c = new KafkaWireClient(Seq(("127.0.0.1", cluster.brokers.head.port)),
        security = KafkaSecurity(tlsContext = Some(clientCtx),
          sasl = Some(SaslCredentials("SCRAM-SHA-256", "svc", "tls-pw"))))
      assert(new String(c.fetch("t", 0, 0L).records.head.value, "UTF-8") == "over-tls")
      c.close()
      // a client NOT speaking TLS fails loudly (TLS alert bytes are
      // not a plausible Kafka frame) — never a silent hang
      val plain = new KafkaWireClient(Seq(("127.0.0.1", cluster.brokers.head.port)))
      intercept[Exception](plain.fetch("t", 0, 0L))
      plain.close()
    } finally {
      cluster.close()
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("e2e: broker serving zstd v2 batches and gzip v1 wrappers; compressed produce accepted") {
    // modern cluster serving zstd-compressed record batches
    val zc = new LoopbackCluster(Map("t" -> 1), fetchCodec = 4)
    try {
      zc.append("t", 0, (0 until 10).map(i => (b(s"k$i"), b(s"compressed-$i"))))
      val c = new KafkaWireClient(Seq(("127.0.0.1", zc.brokers.head.port)))
      val fetched = c.fetch("t", 0, 0L)
      assert(fetched.records.size == 10 &&
        fetched.records.map(_.offset) == (0L until 10L) &&
        new String(fetched.records(3).value, "UTF-8") == "compressed-3")
      // produce a snappy-compressed batch; broker CRC-checks, decompresses, appends
      val base = c.produce("t", 0, Seq(OutRecord(b("pk"), b("pv"), 5L)), codec = 2)
      assert(base == 10L)
      assert(new String(c.fetch("t", 0, 10L).records.head.value, "UTF-8") == "pv")
      c.close()
    } finally zc.close()
    // legacy cluster (format 1) serving gzip v1 wrapper sets
    val gc = new LoopbackCluster(Map("t" -> 1), maxFormat = 1, fetchCodec = 1)
    try {
      gc.append("t", 0, (0 until 7).map(i => (null: Array[Byte], b(s"legacy-$i"))))
      val c = new KafkaWireClient(Seq(("127.0.0.1", gc.brokers.head.port)))
      assert(c.messageFormat == 1)
      val fetched = c.fetch("t", 0, 0L)
      assert(fetched.records.map(_.offset) == (0L until 7L) &&
        new String(fetched.records(6).value, "UTF-8") == "legacy-6")
      // compressed produce on the downgraded path too
      val base = c.produce("t", 0, Seq(OutRecord(null, b("old"), 5L)), codec = 1)
      assert(base == 7L && new String(c.fetch("t", 0, 7L).records.head.value, "UTF-8") == "old")
      c.close()
    } finally gc.close()
  }
}
