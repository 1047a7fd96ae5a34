package graft.kafka

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable

/**
 * Kafka wire protocol, spoken directly (reference: pramen/extras
 * .../extras/source/KafkaAvroSource.scala,
 * extras/sink/KafkaAvroSink.scala and
 * extras/notification/mq/SingleMessageProducerKafka.scala — which all
 * delegate transport to kafka-clients / Spark's kafka datasource,
 * neither of which exists in this environment).
 *
 * graft re-expresses the transport the same way it did MongoDB
 * (OP_MSG over a raw socket) and DynamoDB (SigV4-signed HTTP): by
 * implementing the PUBLIC protocol from its specification
 * (kafka.apache.org/protocol). Only classic, non-flexible request
 * versions are used — fixed-width big-endian primitives, INT16-length
 * strings, INT32-length bytes/arrays — with the v1 message format
 * (magic 1: CRC32-guarded, timestamped messages), which every broker
 * since 0.10 accepts for both produce and fetch:
 *
 *  - ApiVersions v0  (18) — handshake / capability probe
 *  - Metadata    v1  (3)  — brokers, partition leaders
 *  - ListOffsets v1  (2)  — earliest/latest log offsets
 *  - Fetch       v2  (1)  — ranged consumption, MessageSet v1
 *  - Produce     v2  (0)  — acked writes, MessageSet v1
 *
 * The client is deliberately a BATCH-shaped primitive: no consumer
 * groups, no heartbeats, no rebalance protocol. Offset ranges are
 * planned by the caller ([[KafkaBatch]] maps one Spark task per
 * topic partition, each opening its own socket to that partition's
 * leader) and committed through graft's own OffsetManager — the same
 * division of labor Spark's kafka batch source uses.
 */
object KafkaWire {

  val ApiProduce: Short = 0
  val ApiFetch: Short = 1
  val ApiListOffsets: Short = 2
  val ApiMetadata: Short = 3
  val ApiVersionsKey: Short = 18

  /** ListOffsets sentinel timestamps. */
  val LatestTimestamp: Long = -1L
  val EarliestTimestamp: Long = -2L

  /** One fetched message. `timestampType` follows the broker's
    * attribute bit: 0 = create time, 1 = log-append time. */
  final case class KafkaRecord(offset: Long, timestamp: Long, timestampType: Int,
                               key: Array[Byte], value: Array[Byte])

  /** A message to produce: (key, value, create-timestamp millis). */
  final case class OutRecord(key: Array[Byte], value: Array[Byte], timestamp: Long)

  // ── primitive codec ──────────────────────────────────────────────

  final class Writer {
    private val bos = new ByteArrayOutputStream(256)
    private val out = new DataOutputStream(bos)
    def int8(v: Int): this.type = { out.writeByte(v); this }
    def int16(v: Int): this.type = { out.writeShort(v); this }
    def int32(v: Int): this.type = { out.writeInt(v); this }
    def int64(v: Long): this.type = { out.writeLong(v); this }
    /** STRING: INT16 length (-1 = null) + UTF-8 bytes. */
    def string(s: String): this.type = {
      if (s == null) int16(-1)
      else { val b = s.getBytes("UTF-8"); int16(b.length); out.write(b); this }
      this
    }
    /** BYTES: INT32 length (-1 = null) + bytes. */
    def bytes(b: Array[Byte]): this.type = {
      if (b == null) int32(-1) else { int32(b.length); out.write(b) }
      this
    }
    def raw(b: Array[Byte]): this.type = { out.write(b); this }
    def toBytes: Array[Byte] = { out.flush(); bos.toByteArray }
  }

  final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def remaining: Int = buf.length - pos
    def int8(): Int = { val v = buf(pos); pos += 1; v.toInt }
    def int16(): Short = { val v = ((buf(pos) & 0xFF) << 8) | (buf(pos + 1) & 0xFF); pos += 2; v.toShort }
    def int32(): Int = {
      val v = ((buf(pos) & 0xFF) << 24) | ((buf(pos + 1) & 0xFF) << 16) |
        ((buf(pos + 2) & 0xFF) << 8) | (buf(pos + 3) & 0xFF)
      pos += 4; v
    }
    def int64(): Long = { val hi = int32().toLong; val lo = int32().toLong & 0xFFFFFFFFL; (hi << 32) | lo }
    def boolean(): Boolean = int8() != 0
    def string(): String = {
      val n = int16()
      if (n < 0) null
      else { val s = new String(buf, pos, n, "UTF-8"); pos += n; s }
    }
    def bytes(): Array[Byte] = {
      val n = int32()
      if (n < 0) null
      else { val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b }
    }
  }

  // ── message format v1 (magic 1) ──────────────────────────────────

  /** The timestamp-type attribute bit of the v1 message format. */
  private val LogAppendTimeBit = 0x08

  /** Encode one v1 message (crc + magic + attributes + timestamp +
    * key + value). The CRC32 covers everything after the crc field —
    * the on-the-wire integrity check brokers and consumers enforce. */
  def encodeMessage(rec: OutRecord): Array[Byte] = {
    val body = new Writer()
      .int8(1)                 // magic
      .int8(0)                 // attributes: no compression, create-time
      .int64(rec.timestamp)
      .bytes(rec.key)
      .bytes(rec.value)
      .toBytes
    val crc = new java.util.zip.CRC32()
    crc.update(body, 0, body.length)
    new Writer().int32(crc.getValue.toInt).raw(body).toBytes
  }

  /** Encode a MessageSet: [offset INT64, size INT32, message]* — the
    * producer writes sequence numbers as offsets; the broker assigns
    * real log offsets on append. */
  def encodeMessageSet(records: Seq[OutRecord]): Array[Byte] = {
    val w = new Writer()
    records.zipWithIndex.foreach { case (r, i) =>
      val m = encodeMessage(r)
      w.int64(i.toLong).int32(m.length).raw(m)
    }
    w.toBytes
  }

  /**
   * Decode a fetched MessageSet. A broker returns whole log segments
   * sliced at `max_bytes`, so the LAST entry is routinely truncated
   * mid-message — the protocol requires consumers to drop the partial
   * tail and re-fetch from the next offset, not to error. Complete
   * messages are CRC-checked; a corrupt message fails loudly.
   */
  def decodeMessageSet(buf: Array[Byte]): Seq[KafkaRecord] = {
    val out = Vector.newBuilder[KafkaRecord]
    var pos = 0
    while (buf.length - pos >= 12) {
      val offset = ((buf(pos) & 0xFFL) << 56) | ((buf(pos + 1) & 0xFFL) << 48) |
        ((buf(pos + 2) & 0xFFL) << 40) | ((buf(pos + 3) & 0xFFL) << 32) |
        ((buf(pos + 4) & 0xFFL) << 24) | ((buf(pos + 5) & 0xFFL) << 16) |
        ((buf(pos + 6) & 0xFFL) << 8) | (buf(pos + 7) & 0xFFL)
      val size = ((buf(pos + 8) & 0xFF) << 24) | ((buf(pos + 9) & 0xFF) << 16) |
        ((buf(pos + 10) & 0xFF) << 8) | (buf(pos + 11) & 0xFF)
      if (size < 14 || buf.length - pos - 12 < size) {
        // partial trailing message: stop, caller re-fetches
        return out.result()
      }
      val msg = java.util.Arrays.copyOfRange(buf, pos + 12, pos + 12 + size)
      val r = new Reader(msg)
      val crc = r.int32()
      val actual = new java.util.zip.CRC32()
      actual.update(msg, 4, msg.length - 4)
      require(actual.getValue.toInt == crc,
        s"corrupt message at offset $offset: CRC mismatch (stored $crc, computed ${actual.getValue.toInt})")
      val magic = r.int8()
      require(magic == 1, s"unsupported message magic $magic at offset $offset (client speaks v1 sets)")
      val attributes = r.int8()
      require((attributes & 0x07) == 0,
        s"compressed message set (codec ${attributes & 0x07}) at offset $offset: compression not supported")
      val timestamp = r.int64()
      val key = r.bytes()
      val value = r.bytes()
      val tsType = if ((attributes & LogAppendTimeBit) != 0) 1 else 0
      out += KafkaRecord(offset, timestamp, tsType, key, value)
      pos += 12 + size
    }
    out.result()
  }

  /** Kafka's default-partitioner hash (murmur2 over the key bytes,
    * seed 0x9747b28c) — reimplemented from the public algorithm so
    * graft-produced keyed records land on the SAME partitions a
    * kafka-clients producer would pick. */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val len4 = data.length / 4
    var i = 0
    while (i < len4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    val rem = data.length % 4
    val base = len4 * 4
    if (rem >= 3) h ^= (data(base + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(base + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(base) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  /** Default-partitioner routing: murmur2(key) mod partitions (sign
    * bit masked, as kafka-clients does). */
  def partitionForKey(key: Array[Byte], numPartitions: Int): Int =
    (murmur2(key) & 0x7fffffff) % numPartitions

  /** Protocol error codes this client can meet (public registry). */
  def errorName(code: Short): String = code match {
    case 0 => "NONE"
    case 1 => "OFFSET_OUT_OF_RANGE"
    case 2 => "CORRUPT_MESSAGE"
    case 3 => "UNKNOWN_TOPIC_OR_PARTITION"
    case 5 => "LEADER_NOT_AVAILABLE"
    case 6 => "NOT_LEADER_FOR_PARTITION"
    case 7 => "REQUEST_TIMED_OUT"
    case 10 => "MESSAGE_TOO_LARGE"
    case other => s"ERROR_$other"
  }

  def check(code: Short, context: => String): Unit =
    if (code != 0) throw new KafkaProtocolException(code, s"${errorName(code)} ($code): $context")
}

final class KafkaProtocolException(val code: Short, msg: String) extends RuntimeException(msg)

/** Cluster metadata snapshot (Metadata v1 response). */
final case class KafkaBrokerNode(id: Int, host: String, port: Int)
final case class KafkaPartitionMeta(partition: Int, leader: Int)
final case class KafkaTopicMeta(topic: String, partitions: Seq[KafkaPartitionMeta])
final case class KafkaClusterMeta(brokers: Map[Int, KafkaBrokerNode],
                                  topics: Map[String, KafkaTopicMeta]) {
  def leaderFor(topic: String, partition: Int): KafkaBrokerNode = {
    val t = topics.getOrElse(topic,
      throw new IllegalArgumentException(s"unknown topic '$topic' (cluster has: ${topics.keys.mkString(", ")})"))
    val p = t.partitions.find(_.partition == partition).getOrElse(
      throw new IllegalArgumentException(s"unknown partition $topic/$partition"))
    brokers.getOrElse(p.leader,
      throw new IllegalStateException(s"no broker ${p.leader} (leader of $topic/$partition) in metadata"))
  }
}

final case class FetchResult(records: Seq[KafkaWire.KafkaRecord], highWatermark: Long)

/**
 * Blocking single-threaded wire client. One socket per broker, lazily
 * opened, correlation-id checked on every response. NOT thread-safe —
 * each Spark task (and the driver planner) builds its own, which is
 * also the right shape on a 1000-executor cluster: connections never
 * serialize, and fan-out grows with tasks, not with a shared pool.
 */
final class KafkaWireClient(bootstrap: Seq[(String, Int)],
                            clientId: String = "graft",
                            timeoutMs: Int = 30000) extends AutoCloseable {
  import KafkaWire._

  require(bootstrap.nonEmpty, "at least one bootstrap broker required")

  private val sockets = mutable.Map.empty[(String, Int), (Socket, DataInputStream, DataOutputStream)]
  private val correlation = new AtomicInteger(0)
  private var cluster: Option[KafkaClusterMeta] = None

  private def conn(broker: (String, Int)) = sockets.getOrElseUpdate(broker, {
    val s = new Socket()
    s.setTcpNoDelay(true)
    s.setSoTimeout(timeoutMs)
    s.connect(new InetSocketAddress(broker._1, broker._2), timeoutMs)
    (s, new DataInputStream(new java.io.BufferedInputStream(s.getInputStream)),
      new DataOutputStream(new java.io.BufferedOutputStream(s.getOutputStream)))
  })

  /** Frame and send one request, read and unframe its response.
    * Request header v1: api_key, api_version, correlation_id,
    * client_id; response header v0: correlation_id. Any failure that
    * can leave the connection desynced (I/O error mid-exchange, a
    * mismatched correlation id) EVICTS the broker's socket, so a
    * caller that catches and retries gets a fresh connection instead
    * of reading the previous call's stale response forever. */
  private def call(broker: (String, Int), apiKey: Short, apiVersion: Short)
                  (body: Writer => Unit): Reader = {
    val cid = correlation.incrementAndGet()
    val w = new Writer().int16(apiKey).int16(apiVersion).int32(cid).string(clientId)
    body(w)
    val payload = w.toBytes
    try {
      val (_, in, out) = conn(broker)
      out.writeInt(payload.length)
      out.write(payload)
      out.flush()
      val size = in.readInt()
      require(size >= 4 && size < 256 * 1024 * 1024, s"implausible response frame size $size")
      val resp = new Array[Byte](size)
      in.readFully(resp)
      val r = new Reader(resp)
      val gotCid = r.int32()
      if (gotCid != cid) {
        evict(broker)
        throw new IllegalStateException(
          s"correlation id mismatch: sent $cid, got $gotCid (connection evicted)")
      }
      r
    } catch {
      case e: java.io.IOException => evict(broker); throw e
      case e: IllegalArgumentException => evict(broker); throw e // frame-size desync
    }
  }

  private def evict(broker: (String, Int)): Unit =
    sockets.remove(broker).foreach { case (s, _, _) =>
      try s.close() catch { case _: Exception => }
    }

  private def anyBootstrap[T](f: ((String, Int)) => T): T = {
    var last: Throwable = null
    bootstrap.foreach { b =>
      try return f(b)
      catch { case e: java.io.IOException => sockets.remove(b).foreach(_._1.close()); last = e }
    }
    throw new java.io.IOException(s"no bootstrap broker reachable: ${bootstrap.mkString(", ")}", last)
  }

  /** ApiVersions v0: api_key -> (min, max) supported versions. */
  def apiVersions(): Map[Short, (Short, Short)] = anyBootstrap { b =>
    val r = call(b, ApiVersionsKey, 0)(_ => ())
    check(r.int16(), "ApiVersions")
    (0 until r.int32()).map { _ => (r.int16(), (r.int16(), r.int16())) }.toMap
  }

  /** Metadata v1 for the given topics; cached for leader routing. */
  def metadata(topics: Seq[String]): KafkaClusterMeta = anyBootstrap { b =>
    val r = call(b, ApiMetadata, 1) { w =>
      w.int32(topics.size); topics.foreach(w.string)
    }
    val brokers = (0 until r.int32()).map { _ =>
      val id = r.int32(); val host = r.string(); val port = r.int32(); r.string() // rack
      id -> KafkaBrokerNode(id, host, port)
    }.toMap
    r.int32() // controller id
    val topicMetas = (0 until r.int32()).map { _ =>
      val err = r.int16()
      val name = r.string()
      r.boolean() // is_internal
      val parts = (0 until r.int32()).map { _ =>
        val perr = r.int16()
        val partition = r.int32()
        val leader = r.int32()
        (0 until r.int32()).foreach(_ => r.int32()) // replicas
        (0 until r.int32()).foreach(_ => r.int32()) // isr
        check(perr, s"Metadata partition $name/$partition")
        KafkaPartitionMeta(partition, leader)
      }
      check(err, s"Metadata topic $name")
      name -> KafkaTopicMeta(name, parts)
    }.toMap
    val meta = KafkaClusterMeta(brokers, topicMetas)
    cluster = Some(meta)
    meta
  }

  private def leader(topic: String, partition: Int): (String, Int) = {
    val meta = cluster.getOrElse(metadata(Seq(topic)))
    val node =
      try meta.leaderFor(topic, partition)
      catch { case _: IllegalArgumentException | _: IllegalStateException =>
        metadata(Seq(topic)).leaderFor(topic, partition) }
    (node.host, node.port)
  }

  /** ListOffsets v1: log offset at each sentinel/target timestamp
    * (-1 latest = end-of-log, -2 earliest = log start), routed to
    * each partition's leader. */
  def listOffsets(topic: String, partitionTimestamps: Map[Int, Long]): Map[Int, Long] = {
    val byLeader = partitionTimestamps.keys.groupBy(p => leader(topic, p))
    byLeader.flatMap { case (broker, parts) =>
      val r = call(broker, ApiListOffsets, 1) { w =>
        w.int32(-1) // replica_id: ordinary client
        w.int32(1).string(topic).int32(parts.size)
        parts.foreach(p => w.int32(p).int64(partitionTimestamps(p)))
      }
      (0 until r.int32()).flatMap { _ =>
        val name = r.string()
        (0 until r.int32()).map { _ =>
          val partition = r.int32()
          val err = r.int16()
          r.int64() // timestamp
          val offset = r.int64()
          check(err, s"ListOffsets $name/$partition")
          partition -> offset
        }
      }
    }
  }

  def earliestOffsets(topic: String, partitions: Seq[Int]): Map[Int, Long] =
    listOffsets(topic, partitions.map(_ -> EarliestTimestamp).toMap)
  def latestOffsets(topic: String, partitions: Seq[Int]): Map[Int, Long] =
    listOffsets(topic, partitions.map(_ -> LatestTimestamp).toMap)

  /** Fetch v2 from one partition. Returns complete records at/after
    * `offset` plus the partition's high watermark; a response whose
    * first message exceeds `maxBytes` yields zero records — the
    * caller doubles maxBytes (the kafka-clients `fetch.max.bytes`
    * escalation). */
  def fetch(topic: String, partition: Int, offset: Long,
            maxBytes: Int = 1 << 20, maxWaitMs: Int = 100, minBytes: Int = 1): FetchResult = {
    val r = call(leader(topic, partition), ApiFetch, 2) { w =>
      w.int32(-1).int32(maxWaitMs).int32(minBytes)
      w.int32(1).string(topic).int32(1)
      w.int32(partition).int64(offset).int32(maxBytes)
    }
    r.int32() // throttle_time_ms
    var result: FetchResult = FetchResult(Nil, -1L)
    (0 until r.int32()).foreach { _ =>
      val name = r.string()
      (0 until r.int32()).foreach { _ =>
        val p = r.int32()
        val err = r.int16()
        val hw = r.int64()
        val set = r.bytes()
        check(err, s"Fetch $name/$p@$offset")
        if (name == topic && p == partition)
          result = FetchResult(decodeMessageSet(if (set == null) Array.emptyByteArray else set), hw)
      }
    }
    result
  }

  /** Produce v2 to one partition (acks -1 = all ISR). Returns the
    * base offset the broker assigned to the batch. */
  def produce(topic: String, partition: Int, records: Seq[OutRecord],
              acks: Short = -1, timeoutAfterMs: Int = 30000): Long = {
    require(records.nonEmpty, "nothing to produce")
    val set = encodeMessageSet(records)
    val r = call(leader(topic, partition), ApiProduce, 2) { w =>
      w.int16(acks).int32(timeoutAfterMs)
      w.int32(1).string(topic).int32(1)
      w.int32(partition).bytes(set)
    }
    var base = -1L
    (0 until r.int32()).foreach { _ =>
      val name = r.string()
      (0 until r.int32()).foreach { _ =>
        val p = r.int32()
        val err = r.int16()
        val off = r.int64()
        r.int64() // log_append_time
        check(err, s"Produce $name/$p")
        if (name == topic && p == partition) base = off
      }
    }
    r.int32() // throttle_time_ms
    base
  }

  override def close(): Unit = {
    sockets.values.foreach { case (s, _, _) => try s.close() catch { case _: Exception => } }
    sockets.clear()
  }
}
