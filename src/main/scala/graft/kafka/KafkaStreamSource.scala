package graft.kafka

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/**
 * Structured Streaming source for Kafka over the wire client — the
 * streaming leg the reference ecosystem delegates to Hyperdrive,
 * re-expressed as a native Spark DataSource V2 so graft's stream
 * operators (sessionization, streaming dedup, summary sketches)
 * consume a live topic:
 *
 * {{{
 *   spark.readStream
 *     .format("graft.kafka.KafkaStreamProvider")
 *     .option("kafka.bootstrap.servers", "broker:9092")
 *     .option("subscribe", "events")
 *     .option("startingOffsets", "earliest")  // or latest / {"0": 12}
 *     .load()                                 // Spark kafka-source schema
 * }}}
 *
 * Micro-batch planning mirrors the official connector: the driver
 * asks the cluster for latest offsets per trigger (a few bytes of
 * control traffic), the planned [start, end) delta is split into ONE
 * INPUT PARTITION PER TOPIC PARTITION, and each Spark task fetches
 * its slice directly from the partition leader through the paged
 * iterator (task memory = one fetch response). Offsets checkpoint as
 * the same per-partition JSON the batch layer and OffsetValue.Kafka
 * speak, so a checkpointed query survives driver restarts exactly.
 * Batch reads through the same provider delegate to [[KafkaBatch]]
 * planning.
 */
final class KafkaStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaBatch.kafkaSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaStreamTable(new CaseInsensitiveStringMap(properties))
}

private final class KafkaStreamTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private def req(k: String): String = {
    val v = options.get(k)
    require(v != null, s"graft kafka source: option '$k' is required")
    v
  }
  private val brokers = req("kafka.bootstrap.servers")
  // kafka.security.protocol / kafka.sasl.* — the kafka-clients
  // spelling, parsed once driver-side; the resulting KafkaSecurity is
  // plain strings/booleans (config-derived security never carries an
  // SSLContext) so it serializes into the input partitions
  private val security = KafkaSecurity.fromOptions(
    Seq("kafka.security.protocol", "kafka.sasl.mechanism",
        "kafka.sasl.username", "kafka.sasl.password")
      .flatMap(k => Option(options.get(k)).map(k -> _)).toMap)
  private def topic = {
    val t = options.get("subscribe")
    if (t != null) t else req("topic") // writes use 'topic', like the official sink
  }

  override def name(): String = s"graft-kafka($topic)"
  override def schema(): StructType = KafkaBatch.kafkaSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE,
      // the write schema is (key?, value), not the read schema
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new KafkaScan(brokers, topic,
      Option(options.get("startingoffsets")).getOrElse("earliest"),
      Option(options.get("maxbytes")).map(_.toInt).getOrElse(1 << 20),
      Option(options.get("maxoffsetspertrigger")).map(_.toLong),
      Option(options.get("endingoffsets")).getOrElse("latest"),
      security)

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new KafkaWriteSupport.Builder(brokers, topic, info, security,
      Option(options.get("kafka.producer.compression"))
        .map(KafkaWire.codecId).getOrElse(0))
}

private final class KafkaScan(brokers: String, topic: String,
                              startingOffsets: String, maxBytes: Int,
                              maxOffsetsPerTrigger: Option[Long] = None,
                              endingOffsets: String = "latest",
                              security: KafkaSecurity = KafkaSecurity()) extends Scan {
  override def readSchema(): StructType = KafkaBatch.kafkaSchema

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KafkaMicroBatchStream(brokers, topic, startingOffsets, maxBytes,
      maxOffsetsPerTrigger, security)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      security.requireSerializable("kafka batch scan")
      val bootstrap = KafkaBatch.parseBrokers(brokers)
      val client = new KafkaWireClient(bootstrap, security = security)
      val ranges = try {
        KafkaBatch.planRanges(client, topic,
          KafkaBatch.OffsetSpec.parse(startingOffsets),
          KafkaBatch.OffsetSpec.parse(endingOffsets), bootstrap)
      } finally client.close()
      ranges.filter(r => r.end > r.start)
        .map(KafkaInputPartition(_, maxBytes, security): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory = KafkaReaderFactory
  }
}

/** Per-partition offsets as the checkpointable streaming offset; the
  * JSON is the same spelling the batch layer and the offset store use. */
final case class KafkaSourceOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = offsets.toSeq.sortBy(_._1)
    .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}
object KafkaSourceOffset {
  /** Strict parse: a truncated/corrupt checkpoint entry must fail
    * LOUDLY — degrading to an empty map would silently replay the
    * whole topic from offset 0. */
  def fromJson(s: String): KafkaSourceOffset = graft.databricks.Json.parse(s) match {
    case Some(m: Map[_, _]) =>
      KafkaSourceOffset(m.asInstanceOf[Map[String, Any]].map {
        case (k, v: Long) => k.toInt -> v
        case (k, v) => throw new IllegalArgumentException(
          s"corrupt kafka checkpoint offset entry '$k': $v in '$s'")
      })
    case _ => throw new IllegalArgumentException(
      s"corrupt kafka checkpoint offset: '$s'")
  }
}

private final class KafkaMicroBatchStream(brokers: String, topic: String,
                                          startingOffsets: String,
                                          maxBytes: Int,
                                          maxOffsetsPerTrigger: Option[Long] = None,
                                          security: KafkaSecurity = KafkaSecurity())
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  private val bootstrap = KafkaBatch.parseBrokers(brokers)
  private lazy val client = new KafkaWireClient(bootstrap, security = security)
  /** Driver-side planning calls run per trigger over one long-lived
    * client; brokers reap idle connections (connections.max.idle.ms)
    * and leadership moves between triggers, so planning gets the same
    * bounded failover the readers have — a slow-trigger stream must
    * not die because its control connection idled out. */
  private def planCall[T](what: => String)(op: => T): T =
    KafkaBatch.withLeaderFailover(client, maxRetries = 3, backoffMs = 500,
      KafkaBatch.retryableFetchError, what)(op)
  private def partitions: Seq[Int] = {
    val meta = client.metadata(Seq(topic))
    meta.topics(topic).partitions.map(_.partition).sorted
  }

  // ── admission control (maxOffsetsPerTrigger) ─────────────────────
  // A stream resuming after downtime must not plan one giant
  // catch-up batch: cap each trigger's advance, splitting the row
  // budget across partitions proportionally to their backlog — the
  // official kafka source's rate-limit shape.
  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val latest = planCall(s"latestOffsets $topic")(client.latestOffsets(topic, partitions))
    val from = baseline(start.asInstanceOf[KafkaSourceOffset].offsets, latest.keys)
    limit match {
      case max: ReadMaxRows =>
        val backlog = latest.map { case (p, end) =>
          p -> math.max(0L, end - from(p))
        }
        val total = backlog.values.sum
        if (total <= max.maxRows) KafkaSourceOffset(latest)
        else {
          // proportional split; every non-empty partition advances by
          // at least one record so no partition starves
          val budget = max.maxRows
          KafkaSourceOffset(latest.map { case (p, end) =>
            val b = backlog(p)
            val take = if (b == 0) 0L else math.max(1L, b * budget / total)
            p -> math.min(end, from(p) + take)
          })
        }
      case _ => KafkaSourceOffset(latest)
    }
  }

  override def initialOffset(): Offset = {
    val spec = KafkaBatch.OffsetSpec.parse(startingOffsets)
    val offs = spec match {
      case KafkaBatch.Earliest =>
        planCall(s"earliestOffsets $topic")(client.earliestOffsets(topic, partitions))
      case KafkaBatch.Latest =>
        planCall(s"latestOffsets $topic")(client.latestOffsets(topic, partitions))
      case KafkaBatch.Explicit(m) => m
    }
    KafkaSourceOffset(offs)
  }

  override def latestOffset(): Offset =
    KafkaSourceOffset(planCall(s"latestOffsets $topic")(client.latestOffsets(topic, partitions)))

  override def deserializeOffset(json: String): Offset = KafkaSourceOffset.fromJson(json)

  /** Start offsets for partitions the checkpoint doesn't know yet
    * (topic GREW mid-stream): the partition's LOG-START offset, not
    * 0 — retention may have deleted the early segments, and a fetch
    * at 0 would die with OFFSET_OUT_OF_RANGE on every restart. */
  private def baseline(known: Map[Int, Long], all: Iterable[Int]): Map[Int, Long] = {
    val missing = all.filterNot(known.contains).toSeq
    if (missing.isEmpty) known
    else known ++ planCall(s"earliestOffsets $topic")(client.earliestOffsets(topic, missing))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    security.requireSerializable("kafka micro-batch stream")
    val e = end.asInstanceOf[KafkaSourceOffset].offsets
    val s = baseline(start.asInstanceOf[KafkaSourceOffset].offsets, e.keys)
    // planCall, like every other driver-side call here: between the
    // offsets calls and this one the broker may reap the idle control
    // connection (slow triggers) or leadership may move — an unwrapped
    // metadata call was the one remaining way a routine idle-out could
    // kill the stream
    val meta = planCall(s"metadata $topic")(client.metadata(Seq(topic)))
    e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s(p)
      if (endOff > startOff) {
        val node = meta.leaderFor(topic, p)
        Some(KafkaInputPartition(
          KafkaBatch.PartitionRange(topic, p, node.host, node.port, startOff, endOff, bootstrap),
          maxBytes, security): InputPartition)
      } else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = KafkaReaderFactory

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint log
  override def stop(): Unit = client.close()
}

private final case class KafkaInputPartition(range: KafkaBatch.PartitionRange,
                                             maxBytes: Int,
                                             security: KafkaSecurity = KafkaSecurity())
    extends InputPartition

private object KafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val kp = partition.asInstanceOf[KafkaInputPartition]
    new KafkaPartitionReader(kp.range, kp.maxBytes, kp.security)
  }
}

/** Executor-side reader: the shared [[KafkaBatch.RangeFetchIterator]]
  * paged loop, emitting InternalRows in the kafka-source schema.
  * Clients come from [[KafkaClientPool]] (keyed by brokers +
  * security) so a long-running stream reuses ONE authenticated
  * connection per (executor, broker) across triggers instead of
  * re-running the TCP + SASL handshake per partition per micro-batch;
  * fetches carry the bounded leader-failover retry so a mid-batch
  * leadership migration re-resolves instead of failing the task. */
private final class KafkaPartitionReader(range: KafkaBatch.PartitionRange,
                                         initialMaxBytes: Int,
                                         security: KafkaSecurity = KafkaSecurity())
    extends PartitionReader[InternalRow] {
  private val brokers = range.allBrokers
  private val client = KafkaClientPool.borrow(brokers, security)
  private val fetchFn: (Long, Int) => FetchResult = (off, mb) =>
    KafkaBatch.withLeaderFailover(client, maxRetries = 5, backoffMs = 1000,
      KafkaBatch.retryableFetchError, s"fetch ${range.topic}/${range.partition}@$off") {
      client.fetch(range.topic, range.partition, off, mb)
    }
  private val it = new KafkaBatch.RangeFetchIterator(fetchFn, range, initialMaxBytes)
  private var current: KafkaWire.KafkaRecord = _

  override def next(): Boolean =
    if (it.hasNext) { current = it.next(); true } else false

  override def get(): InternalRow = InternalRow(
    current.key,
    current.value,
    UTF8String.fromString(range.topic),
    range.partition,
    current.offset,
    current.timestamp * 1000L, // millis -> Catalyst micros
    current.timestampType)

  override def close(): Unit = KafkaClientPool.release(brokers, security, client)
}
