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
 * strings, INT32-length bytes/arrays — speaking BOTH message formats:
 *
 *  - ApiVersions v0  (18) — handshake / capability probe
 *  - Metadata    v1  (3)  — brokers, partition leaders
 *  - ListOffsets v1  (2)  — earliest/latest log offsets
 *  - Fetch       v2  (1)  — ranged consumption, MessageSet v1
 *  - Fetch       v4  (1)  — ranged consumption, RecordBatch v2
 *  - Produce     v2  (0)  — acked writes, MessageSet v1
 *  - Produce     v3  (0)  — acked writes, RecordBatch v2
 *
 * The client negotiates per cluster via ApiVersions: brokers
 * advertising Produce ≥ 3 and Fetch ≥ 4 get the v2 record-batch
 * format (magic 2: zigzag-varint records, CRC32C over the batch —
 * REQUIRED by Kafka 4.x, which removed v0/v1 write support per
 * KIP-724); older brokers (0.10–3.x) get the v1 MessageSet path. The
 * fetch decoder walks both formats in one pass, so mixed-format logs
 * on an upgraded cluster parse either way.
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
  val ApiSaslHandshake: Short = 17
  val ApiVersionsKey: Short = 18
  val ApiSaslAuthenticate: Short = 36

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
    /** Zigzag + LE base-128 varint — the v2 record-field encoding. */
    def varlong(v: Long): this.type = {
      var z = (v << 1) ^ (v >> 63) // zigzag
      while ((z & ~0x7FL) != 0) { out.writeByte(((z & 0x7F) | 0x80).toInt); z >>>= 7 }
      out.writeByte(z.toInt)
      this
    }
    def varint(v: Int): this.type = varlong(v.toLong)
    /** VARINT-length-prefixed bytes (-1 = null) — v2 record key/value. */
    def varBytes(b: Array[Byte]): this.type = {
      if (b == null) varint(-1) else { varint(b.length); out.write(b) }
      this
    }
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
    /** Zigzag + LE base-128 varint (v2 record fields). */
    def varlong(): Long = {
      var z = 0L; var shift = 0
      var b = buf(pos); pos += 1
      while ((b & 0x80) != 0) {
        z |= (b & 0x7FL) << shift; shift += 7
        require(shift <= 63, "varint longer than 64 bits")
        b = buf(pos); pos += 1
      }
      z |= (b & 0x7FL) << shift
      (z >>> 1) ^ -(z & 1) // un-zigzag
    }
    def varint(): Int = varlong().toInt
    def varBytes(): Array[Byte] = {
      val n = varint()
      if (n < 0) null
      else { val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b }
    }
    def skip(n: Int): Unit = pos += n
  }

  // ── compression codecs (attribute bits 0-2) ──────────────────────
  // 1=gzip 2=snappy 3=lz4 (v1 and v2), 4=zstd (v2 only, KIP-110).
  // All four rides on Spark's own classpath: JDK zlib, snappy-java
  // (xerial stream framing — what Kafka uses), lz4-java (LZ4 frame
  // format, KIP-57 fixed framing for magic >= 1) and zstd-jni. The
  // reference is immune to this concern by delegating to
  // kafka-clients (reference: pramen extras/source/KafkaAvroSource);
  // a from-spec wire client must decode them itself, because real
  // topics are overwhelmingly compressed.

  /** Codec id for a config name (the kafka-clients
    * `compression.type` spelling). */
  def codecId(name: String): Int = name.toLowerCase.trim match {
    case "" | "none" => 0
    case "gzip" => 1
    case "snappy" => 2
    case "lz4" => 3
    case "zstd" => 4
    case other => throw new IllegalArgumentException(
      s"unknown compression type '$other' (none, gzip, snappy, lz4, zstd)")
  }

  private[kafka] def codecName(codec: Int): String = codec match {
    case 0 => "none"; case 1 => "gzip"; case 2 => "snappy"
    case 3 => "lz4"; case 4 => "zstd"
    case other => s"unknown($other)"
  }

  private[kafka] def decompress(codec: Int, buf: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val in = new java.io.ByteArrayInputStream(buf, from, len)
    val stream: java.io.InputStream = codec match {
      case 1 => new java.util.zip.GZIPInputStream(in)
      case 2 => new org.xerial.snappy.SnappyInputStream(in)
      case 3 => new net.jpountz.lz4.LZ4FrameInputStream(in)
      case 4 => new com.github.luben.zstd.ZstdInputStream(in)
      case other => throw new IllegalArgumentException(
        s"unsupported compression codec ${codecName(other)}")
    }
    try stream.readAllBytes() finally stream.close()
  }

  private[kafka] def compress(codec: Int, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out: java.io.OutputStream = codec match {
      case 1 => new java.util.zip.GZIPOutputStream(bos)
      case 2 => new org.xerial.snappy.SnappyOutputStream(bos)
      case 3 => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      case 4 => new com.github.luben.zstd.ZstdOutputStream(bos)
      case other => throw new IllegalArgumentException(
        s"unsupported compression codec ${codecName(other)}")
    }
    out.write(data); out.close()
    bos.toByteArray
  }

  // ── message format v1 (magic 1) ──────────────────────────────────

  /** The timestamp-type attribute bit of the v1 message format. */
  private val LogAppendTimeBit = 0x08

  /** Encode one v1 message (crc + magic + attributes + timestamp +
    * key + value). The CRC32 covers everything after the crc field —
    * the on-the-wire integrity check brokers and consumers enforce. */
  def encodeMessage(rec: OutRecord): Array[Byte] = encodeMessage(rec, 0)

  private def encodeMessage(rec: OutRecord, attributes: Int): Array[Byte] = {
    val body = new Writer()
      .int8(1)                 // magic
      .int8(attributes)        // codec bits 0-2, create-time
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
    * real log offsets on append. With a codec, the whole set is
    * compressed into one wrapper message (KIP-57 framing: inner
    * relative offsets from 0, wrapper offset = last inner relative,
    * wrapper timestamp = max inner). */
  def encodeMessageSet(records: Seq[OutRecord], codec: Int = 0): Array[Byte] = {
    val w = new Writer()
    if (codec == 0) {
      records.zipWithIndex.foreach { case (r, i) =>
        val m = encodeMessage(r)
        w.int64(i.toLong).int32(m.length).raw(m)
      }
    } else {
      w.raw(compressedSetEntry(records, codec, records.size - 1L))
    }
    w.toBytes
  }

  /** One compressed v1 set entry: [wrapperOffset, size, wrapper
    * message] whose value is the compressed inner set (relative
    * offsets 0..n-1). Producers pass `records.size - 1` (the broker
    * rewrites on append); a broker encoding a fetch response passes
    * the ABSOLUTE offset of the last inner message. */
  private[kafka] def compressedSetEntry(records: Seq[OutRecord], codec: Int,
                                        wrapperOffset: Long): Array[Byte] = {
    require(records.nonEmpty, "empty compressed message set")
    require(codec >= 1 && codec <= 3,
      s"v1 message sets support gzip/snappy/lz4 only, got ${codecName(codec)} (zstd is v2-only, KIP-110)")
    val inner = encodeMessageSet(records)
    val wrapper = encodeMessage(
      OutRecord(null, compress(codec, inner), records.map(_.timestamp).max), codec)
    new Writer().int64(wrapperOffset).int32(wrapper.length).raw(wrapper).toBytes
  }

  /** Minimum v1 message body: crc(4) + magic(1) + attributes(1) +
    * timestamp(8) + key length(4) + value length(4). A declared size
    * below this mid-buffer is CORRUPTION, not a partial tail. */
  private val MinV1MessageBytes = 22

  /**
   * Decode a fetched MessageSet. A broker returns whole log segments
   * sliced at `max_bytes`, so the LAST entry is routinely truncated
   * mid-message — the protocol requires consumers to drop the partial
   * tail and re-fetch from the next offset, not to error. The
   * partial-tail rule applies ONLY when the remaining buffer is
   * shorter than the declared size; a size below the 22-byte v1
   * minimum anywhere is corruption and fails loudly, naming the
   * offset (silently treating it as a tail used to truncate the fetch
   * and surface later as a misleading maxBytes-escalation failure).
   * Complete messages are CRC-checked; a corrupt message fails loudly.
   */
  def decodeMessageSet(buf: Array[Byte]): Seq[KafkaRecord] = {
    val out = Vector.newBuilder[KafkaRecord]
    var pos = 0
    var stop = false
    while (!stop && buf.length - pos >= 12) {
      val entry = decodeV1Entry(buf, pos)
      entry match {
        case Some((recs, next)) => out ++= recs; pos = next
        case None => stop = true // partial trailing message: caller re-fetches
      }
    }
    out.result()
  }

  /** One v0/v1 MessageSet entry at `pos` (12-byte offset+size header
    * already known to fit). Returns None for a partial tail. A
    * compressed entry is a WRAPPER message whose value holds an inner
    * message set (KIP-57 framing for magic 1): the wrapper's offset
    * is the offset of the LAST inner message, inner messages store
    * relative offsets from 0, so absolute = wrapper - lastRel + rel;
    * under log-append time the broker stamps only the wrapper, and
    * its timestamp applies to every inner record. */
  private def decodeV1Entry(buf: Array[Byte], pos: Int): Option[(Seq[KafkaRecord], Int)] = {
    val offset = ((buf(pos) & 0xFFL) << 56) | ((buf(pos + 1) & 0xFFL) << 48) |
      ((buf(pos + 2) & 0xFFL) << 40) | ((buf(pos + 3) & 0xFFL) << 32) |
      ((buf(pos + 4) & 0xFFL) << 24) | ((buf(pos + 5) & 0xFFL) << 16) |
      ((buf(pos + 6) & 0xFFL) << 8) | (buf(pos + 7) & 0xFFL)
    val size = ((buf(pos + 8) & 0xFF) << 24) | ((buf(pos + 9) & 0xFF) << 16) |
      ((buf(pos + 10) & 0xFF) << 8) | (buf(pos + 11) & 0xFF)
    require(size >= MinV1MessageBytes || buf.length - pos - 12 < size,
      s"corrupt message set at offset $offset: declared size $size below the " +
        s"$MinV1MessageBytes-byte v1 minimum with ${buf.length - pos - 12} bytes remaining")
    if (buf.length - pos - 12 < size) return None
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
    val codec = attributes & 0x07
    val timestamp = r.int64()
    val key = r.bytes()
    val value = r.bytes()
    val tsType = if ((attributes & LogAppendTimeBit) != 0) 1 else 0
    val next = pos + 12 + size
    if (codec == 0)
      Some((Seq(KafkaRecord(offset, timestamp, tsType, key, value)), next))
    else {
      require(value != null,
        s"compressed wrapper at offset $offset has a null value")
      val inner = decodeMessageSet(decompress(codec, value, 0, value.length))
      require(inner.nonEmpty, s"compressed wrapper at offset $offset decoded to zero messages")
      val lastRel = inner.last.offset
      val mapped = inner.map { m =>
        val ts = if (tsType == 1) timestamp else m.timestamp
        KafkaRecord(offset - lastRel + m.offset, ts, tsType, m.key, m.value)
      }
      Some((mapped, next))
    }
  }

  // ── record batches (magic 2, KIP-98 format) ─────────────────────

  /** v2 batch attribute bits (int16): 0-2 compression codec,
    * 3 timestamp type, 4 transactional, 5 control batch. */
  private val V2TimestampTypeBit = 0x08
  private val V2ControlBit = 0x20

  /** Fixed header bytes of a v2 batch: baseOffset(8) + batchLength(4)
    * + partitionLeaderEpoch(4) + magic(1) + crc(4) + attributes(2) +
    * lastOffsetDelta(4) + baseTimestamp(8) + maxTimestamp(8) +
    * producerId(8) + producerEpoch(2) + baseSequence(4) + count(4). */
  private val V2HeaderBytes = 61

  def crc32c(buf: Array[Byte], from: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(buf, from, len)
    c.getValue.toInt
  }

  /**
   * Encode one v2 RecordBatch (magic 2): zigzag-varint record fields,
   * CRC32C over attributes..end, idempotence/transaction fields unset
   * (producerId -1). Kafka 4.x brokers accept ONLY this format for
   * produce (KIP-724 removed v0/v1 write support). Producers leave
   * `baseOffset` 0 (the broker assigns real offsets on append); a
   * broker encoding a fetch response stamps the log position.
   */
  def encodeRecordBatch(records: Seq[OutRecord], baseOffset: Long = 0L,
                        codec: Int = 0): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    require(codec >= 0 && codec <= 4, s"unknown codec $codec")
    val baseTs = records.map(_.timestamp).min
    val maxTs = records.map(_.timestamp).max
    val body = new Writer()
    records.zipWithIndex.foreach { case (rec, i) =>
      val r = new Writer()
        .int8(0)                        // record attributes (unused)
        .varlong(rec.timestamp - baseTs)
        .varint(i)                      // offset delta
        .varBytes(rec.key)
        .varBytes(rec.value)
        .varint(0)                      // headers count
        .toBytes
      body.varint(r.length).raw(r)
    }
    // with a codec, ONLY the records section compresses; the 61-byte
    // header stays clear and the CRC32C covers the wire (compressed)
    // bytes, so integrity checks never need decompression
    val bodyBytes =
      if (codec == 0) body.toBytes else compress(codec, body.toBytes)
    // attributes..end — the CRC32C-covered region
    val covered = new Writer()
      .int16(codec)                     // attributes: codec bits 0-2, create-time
      .int32(records.size - 1)          // lastOffsetDelta
      .int64(baseTs)
      .int64(maxTs)
      .int64(-1L)                       // producerId
      .int16(-1)                        // producerEpoch
      .int32(-1)                        // baseSequence
      .int32(records.size)
      .raw(bodyBytes)
      .toBytes
    val crc = crc32c(covered, 0, covered.length)
    new Writer()
      .int64(baseOffset)
      .int32(covered.length + 9)        // batchLength: partitionLeaderEpoch..end
      .int32(-1)                        // partitionLeaderEpoch
      .int8(2)                          // magic
      .int32(crc)
      .raw(covered)
      .toBytes
  }

  /** Decode one complete v2 batch starting at `pos`; the full batch is
    * known to fit. Control batches (transaction markers) yield no
    * records. */
  private def decodeV2Batch(buf: Array[Byte], pos: Int,
                            out: mutable.Builder[KafkaRecord, Vector[KafkaRecord]]): Int = {
    val r = new Reader(buf)
    r.skip(pos)
    val baseOffset = r.int64()
    val batchLength = r.int32()
    r.int32() // partitionLeaderEpoch
    val magic = r.int8()
    require(magic == 2, s"decodeV2Batch called on magic $magic")
    val crc = r.int32()
    val coveredFrom = pos + 8 + 4 + 4 + 1 + 4
    val coveredLen = batchLength - (4 + 1 + 4)
    val actual = crc32c(buf, coveredFrom, coveredLen)
    require(actual == crc,
      s"corrupt record batch at offset $baseOffset: CRC32C mismatch (stored $crc, computed $actual)")
    val attributes = r.int16()
    r.int32() // lastOffsetDelta
    val baseTs = r.int64()
    r.int64() // maxTimestamp
    r.int64(); r.int16(); r.int32() // producerId, producerEpoch, baseSequence
    val count = r.int32()
    val tsType = if ((attributes & V2TimestampTypeBit) != 0) 1 else 0
    val isControl = (attributes & V2ControlBit) != 0
    val end = pos + 12 + batchLength
    // codec bits: the records section after `count` is compressed as a
    // whole (the 61-byte header is always clear; the CRC above already
    // validated the wire bytes, so decompression happens post-check)
    val codec = attributes & 0x07
    val rr = if (codec == 0) r else {
      val recordsStart = pos + V2HeaderBytes
      new Reader(decompress(codec, buf, recordsStart, end - recordsStart))
    }
    var i = 0
    while (i < count) {
      val len = rr.varint()
      val startRemaining = rr.remaining
      rr.int8() // record attributes
      val tsDelta = rr.varlong()
      val offDelta = rr.varint()
      val key = rr.varBytes()
      val value = rr.varBytes()
      val headers = rr.varint()
      var h = 0
      while (h < headers) { rr.varBytes(); rr.varBytes(); h += 1 }
      require(startRemaining - rr.remaining == len,
        s"record batch at offset $baseOffset: record $i declared $len bytes, " +
          s"walked ${startRemaining - rr.remaining}")
      if (!isControl)
        out += KafkaRecord(baseOffset + offDelta, baseTs + tsDelta, tsType, key, value)
      i += 1
    }
    end
  }

  /**
   * Unified decoder for a fetched record set: v0/v1 message entries
   * and v2 record batches share the first 17 bytes' shape (offset
   * int64, length int32, then the magic byte at +16 — by design, so
   * mixed-format logs on upgraded clusters parse with one walk), and
   * both end with the same partial-tail rule: a truncated trailing
   * entry/batch is dropped for the caller to re-fetch.
   */
  def decodeRecordSet(buf: Array[Byte]): Seq[KafkaRecord] = {
    val out = Vector.newBuilder[KafkaRecord]
    var pos = 0
    var stop = false
    while (!stop && buf.length - pos >= 17) {
      val magic = buf(pos + 16)
      if (magic >= 2) {
        val batchLength = ((buf(pos + 8) & 0xFF) << 24) | ((buf(pos + 9) & 0xFF) << 16) |
          ((buf(pos + 10) & 0xFF) << 8) | (buf(pos + 11) & 0xFF)
        require(batchLength >= V2HeaderBytes - 12,
          s"corrupt record batch header: batchLength $batchLength below v2 minimum")
        if (buf.length - pos - 12 < batchLength) stop = true // partial tail
        else pos = decodeV2Batch(buf, pos, out)
      } else {
        decodeV1Entry(buf, pos) match {
          case Some((recs, next)) => out ++= recs; pos = next
          case None => stop = true
        }
      }
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
    case 33 => "UNSUPPORTED_SASL_MECHANISM"
    case 34 => "ILLEGAL_SASL_STATE"
    case 58 => "SASL_AUTHENTICATION_FAILED"
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

/** `pageEndOffset` = max decoded offset + 1 BEFORE the at/after-offset
  * filter (-1 when the page decoded nothing): a compacted topic can
  * return a batch whose surviving records all sit below the requested
  * offset — the filter empties `records`, and without the decoded
  * bound a consumer could not tell "advance past the gap" from
  * "message too large, escalate". */
final case class FetchResult(records: Seq[KafkaWire.KafkaRecord], highWatermark: Long,
                             pageEndOffset: Long = -1L)

/** SASL credentials: mechanism "PLAIN" (RFC 4616) or "SCRAM-SHA-256"
  * (RFC 5802/7677) — the two mechanisms production clusters deploy
  * that are implementable JDK-only. */
final case class SaslCredentials(mechanism: String, username: String, password: String) {
  require(mechanism == "PLAIN" || mechanism == "SCRAM-SHA-256",
    s"unsupported SASL mechanism '$mechanism' (PLAIN and SCRAM-SHA-256 are supported)")
  override def toString = s"SaslCredentials($mechanism, $username, ***)" // never log secrets
}

/** Connection security for [[KafkaWireClient]] — the four listener
  * flavors real clusters expose: PLAINTEXT (default), SSL
  * (`tls = true`), SASL_PLAINTEXT (`sasl` set), SASL_SSL (both).
  * `tlsContext` overrides the JVM-default trust store (tests with
  * self-signed certs; mutual-TLS key material). */
final case class KafkaSecurity(tls: Boolean = false,
                               tlsContext: Option[javax.net.ssl.SSLContext] = None,
                               sasl: Option[SaslCredentials] = None) {
  def useTls: Boolean = tls || tlsContext.isDefined

  /** Fail fast when this config is about to ship to executors:
    * SSLContext is not Serializable, so a programmatic tlsContext
    * inside an InputPartition/WriterFactory would die with an opaque
    * NotSerializableException at task-serialization time. Executors
    * get TLS via `tls = true` (JVM-default trust — configure
    * `javax.net.ssl.*` system properties on the executor JVMs);
    * programmatic contexts stay driver-side. */
  def requireSerializable(context: String): KafkaSecurity = {
    require(tlsContext.isEmpty,
      s"$context: KafkaSecurity.tlsContext (an SSLContext) cannot be serialized into " +
        "executor tasks — use tls=true with the JVM-default trust store (set javax.net.ssl.* " +
        "system properties on executors), or keep programmatic TLS contexts to driver-side clients")
    this
  }
}

object KafkaSecurity {
  private val Protocols = Set("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL")

  /** Parse kafka-clients-style config keys (the spelling a reference
    * user already has in their source/sink options):
    * `kafka.security.protocol` (PLAINTEXT | SSL | SASL_PLAINTEXT |
    * SASL_SSL), `kafka.sasl.mechanism` (PLAIN | SCRAM-SHA-256,
    * default PLAIN), `kafka.sasl.username` / `kafka.sasl.password`.
    * TLS uses the JVM-default trust store here — custom contexts are
    * programmatic (`KafkaSecurity(tlsContext = ...)`). */
  def fromOptions(options: Map[String, String], prefix: String = "kafka."): KafkaSecurity = {
    val proto = options.getOrElse(prefix + "security.protocol", "PLAINTEXT")
      .toUpperCase.trim
    require(Protocols.contains(proto),
      s"unknown ${prefix}security.protocol '$proto' (one of ${Protocols.mkString(", ")})")
    val sasl =
      if (!proto.startsWith("SASL_")) None
      else {
        def req(k: String) = options.getOrElse(prefix + k, throw new IllegalArgumentException(
          s"kafka: '$prefix$k' is required for security.protocol $proto"))
        Some(SaslCredentials(
          options.getOrElse(prefix + "sasl.mechanism", "PLAIN").toUpperCase.trim,
          req("sasl.username"), req("sasl.password")))
      }
    KafkaSecurity(tls = proto == "SSL" || proto == "SASL_SSL", sasl = sasl)
  }
}

/**
 * Blocking single-threaded wire client. One socket per broker, lazily
 * opened, correlation-id checked on every response. NOT thread-safe —
 * each Spark task (and the driver planner) builds its own, which is
 * also the right shape on a 1000-executor cluster: connections never
 * serialize, and fan-out grows with tasks, not with a shared pool.
 */
final class KafkaWireClient(bootstrap: Seq[(String, Int)],
                            clientId: String = "graft",
                            timeoutMs: Int = 30000,
                            formatOverride: Option[Int] = None,
                            /** Exposed so distributed call sites can probe a
                              * user factory's DRIVER-side client and fail fast
                              * on executor-unshippable config (tlsContext)
                              * before any task serializes. */
                            val security: KafkaSecurity = KafkaSecurity()) extends AutoCloseable {
  import KafkaWire._

  require(bootstrap.nonEmpty, "at least one bootstrap broker required")
  formatOverride.foreach(f => require(f == 1 || f == 2,
    s"formatOverride must be 1 (MessageSet) or 2 (RecordBatch), got $f"))

  private val sockets = mutable.Map.empty[(String, Int), (Socket, DataInputStream, DataOutputStream)]
  private val correlation = new AtomicInteger(0)
  private var cluster: Option[KafkaClusterMeta] = None

  /** Message format for this cluster: 2 (record batches) when the
    * brokers advertise Produce ≥ 3 AND Fetch ≥ 4, else 1. Negotiated
    * once per client via ApiVersions; `formatOverride` pins it (tests,
    * or operators who must write a specific on-log format). */
  lazy val messageFormat: Int = formatOverride.getOrElse {
    val versions = apiVersions()
    val canProduceV3 = versions.get(ApiProduce).exists(_._2 >= 3)
    val canFetchV4 = versions.get(ApiFetch).exists(_._2 >= 4)
    if (canProduceV3 && canFetchV4) 2 else 1
  }

  private def conn(broker: (String, Int)) = sockets.getOrElseUpdate(broker, {
    // TLS rides the standard SSLSocketFactory seam: the handshake
    // completes BEFORE any Kafka bytes, then the framed protocol is
    // byte-identical over the encrypted stream
    val s: Socket =
      if (security.useTls) {
        val factory = security.tlsContext.map(_.getSocketFactory)
          .getOrElse(javax.net.ssl.SSLContext.getDefault.getSocketFactory)
        factory.createSocket()
      } else new Socket()
    // anything failing before the tuple enters the socket map (TLS
    // handshake, SASL rejection) must close the socket HERE — the
    // eviction path only knows registered connections, and a caller
    // retrying against a misconfigured cluster would otherwise leak
    // one fd per attempt
    try {
      s.setTcpNoDelay(true)
      s.setSoTimeout(timeoutMs)
      s.connect(new InetSocketAddress(broker._1, broker._2), timeoutMs)
      s match {
        case ssl: javax.net.ssl.SSLSocket => ssl.startHandshake()
        case _ =>
      }
      val in = new DataInputStream(new java.io.BufferedInputStream(s.getInputStream))
      val out = new DataOutputStream(new java.io.BufferedOutputStream(s.getOutputStream))
      // SASL authenticates each NEW connection before it enters the
      // socket map — every later call on the connection rides the
      // authenticated session (how real listeners work; a reconnect
      // after evict() re-authenticates automatically)
      security.sasl.foreach(creds => saslAuthenticate(in, out, creds))
      (s, in, out)
    } catch {
      case e: Throwable =>
        try s.close() catch { case _: Exception => }
        throw e
    }
  })

  /** One framed request/response on a NOT-yet-registered connection
    * (used by the SASL exchange, which must complete before `conn`
    * returns). */
  private def rawCall(in: DataInputStream, out: DataOutputStream,
                      apiKey: Short, apiVersion: Short)(body: Writer => Unit): Reader = {
    val cid = correlation.incrementAndGet()
    val w = new Writer().int16(apiKey).int16(apiVersion).int32(cid).string(clientId)
    body(w)
    val payload = w.toBytes
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
    val size = in.readInt()
    require(size >= 4 && size < 256 * 1024 * 1024, s"implausible response frame size $size")
    val resp = new Array[Byte](size)
    in.readFully(resp)
    val r = new Reader(resp)
    val gotCid = r.int32()
    require(gotCid == cid, s"correlation id mismatch during auth: sent $cid, got $gotCid")
    r
  }

  /** SaslHandshake v1 + SaslAuthenticate v0 exchange (KIP-152 framed
    * tokens — every modern broker; the pre-0.10 raw-token flow is not
    * spoken). PLAIN is one token; SCRAM-SHA-256 is the RFC 5802
    * three-message exchange with mutual server verification. */
  private def saslAuthenticate(in: DataInputStream, out: DataOutputStream,
                               creds: SaslCredentials): Unit = {
    val hs = rawCall(in, out, ApiSaslHandshake, 1)(_.string(creds.mechanism))
    val hsErr = hs.int16()
    val offered = (0 until hs.int32()).map(_ => hs.string())
    if (hsErr != 0) throw new KafkaProtocolException(hsErr,
      s"${errorName(hsErr)}: broker offers ${offered.mkString(", ")}, asked ${creds.mechanism}")
    def step(token: Array[Byte]): Array[Byte] = {
      val r = rawCall(in, out, ApiSaslAuthenticate, 0)(_.bytes(token))
      val err = r.int16()
      val msg = r.string()
      val serverToken = r.bytes()
      if (err != 0) throw new KafkaProtocolException(err,
        s"${errorName(err)}: ${Option(msg).getOrElse("authentication failed")}")
      serverToken
    }
    creds.mechanism match {
      case "PLAIN" => // RFC 4616: [authzid] NUL authcid NUL passwd
        step(s"\u0000${creds.username}\u0000${creds.password}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        ()
      case "SCRAM-SHA-256" =>
        val ex = new Scram.ClientExchange(creds.username, creds.password, Scram.newNonce())
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val serverFirst = new String(step(ex.firstMessage.getBytes(utf8)), utf8)
        val serverFinal = new String(step(ex.finalMessage(serverFirst).getBytes(utf8)), utf8)
        ex.verifyServerFinal(serverFinal)
    }
  }

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

  /** Drop the cached cluster metadata so the next leader-routed call
    * re-resolves from the bootstrap list — the recovery hook for
    * NOT_LEADER_FOR_PARTITION / dead-leader failover (a rolling broker
    * restart moves leadership mid-read; the stale cache would send
    * every retry back to the old leader). */
  def invalidateMetadata(): Unit = cluster = None

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

  /** Fetch from one partition — v4 (record batches) on negotiated
    * format 2, v2 (MessageSet v1) otherwise; the decoder walks both
    * formats either way. Returns complete records at/after `offset`
    * plus the partition's high watermark; a response whose first
    * message exceeds `maxBytes` yields zero records — the caller
    * doubles maxBytes (the kafka-clients `fetch.max.bytes`
    * escalation). */
  def fetch(topic: String, partition: Int, offset: Long,
            maxBytes: Int = 1 << 20, maxWaitMs: Int = 100, minBytes: Int = 1): FetchResult = {
    val v4 = messageFormat == 2
    val version: Short = if (v4) 4 else 2
    val r = call(leader(topic, partition), ApiFetch, version) { w =>
      w.int32(-1).int32(maxWaitMs).int32(minBytes)
      if (v4) {
        w.int32(maxBytes) // v3+: response-wide byte budget
        w.int8(0)         // v4+: isolation_level READ_UNCOMMITTED
      }
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
        if (v4) {
          r.int64() // last_stable_offset
          val aborted = r.int32() // aborted_transactions
          (0 until math.max(aborted, 0)).foreach { _ => r.int64(); r.int64() }
        }
        val set = r.bytes()
        check(err, s"Fetch $name/$p@$offset")
        if (name == topic && p == partition) {
          // a compressed wrapper/batch is returned WHOLE even when it
          // straddles the requested offset (brokers slice at batch
          // granularity) — enforce the at/after contract here so a
          // consumer restarting mid-batch never re-sees records
          val decoded = decodeRecordSet(if (set == null) Array.emptyByteArray else set)
          result = FetchResult(decoded.filter(_.offset >= offset), hw,
            if (decoded.isEmpty) -1L else decoded.map(_.offset).max + 1)
        }
      }
    }
    result
  }

  /** Produce to one partition (acks -1 = all ISR) — v3 (record
    * batches) on negotiated format 2, v2 (MessageSet v1) otherwise.
    * Returns the base offset the broker assigned to the batch. */
  def produce(topic: String, partition: Int, records: Seq[OutRecord],
              acks: Short = -1, timeoutAfterMs: Int = 30000, codec: Int = 0): Long = {
    require(records.nonEmpty, "nothing to produce")
    val v3 = messageFormat == 2
    val set = if (v3) encodeRecordBatch(records, 0L, codec)
              else encodeMessageSet(records, codec)
    val r = call(leader(topic, partition), ApiProduce, if (v3) 3 else 2) { w =>
      if (v3) w.string(null) // transactional_id
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
