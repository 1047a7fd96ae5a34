package graft.kafka

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Batch DataFrame read/write over the [[KafkaWireClient]] — the
 * transport half of the reference's KafkaAvroSource/KafkaAvroSink
 * (pramen/extras .../extras/source/KafkaAvroSource.scala:203 reads
 * through `spark.read.format("kafka")`; graft substitutes its own
 * wire client for the missing connector and keeps the same contract:
 * the OUTPUT SCHEMA is byte-for-byte the Spark kafka source's —
 * key/value binary, topic, partition, offset, timestamp,
 * timestampType — so everything downstream is interchangeable).
 *
 * Scale shape: the driver plans one [start, end) range per topic
 * partition from Metadata + ListOffsets (a few KB of control
 * traffic), then `parallelize(ranges, ranges.size)` puts EACH
 * partition's fetch loop in its own Spark task, connected directly to
 * that partition's leader. Reading a 1000-partition topic on a
 * 1000-executor cluster is 1000 concurrent leader-local streams — the
 * same fan-out kafka-clients consumers achieve, with no consumer-group
 * coordination because batch ranges are pinned up front.
 */
object KafkaBatch {

  /** The Spark kafka datasource's fixed schema. */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Plan-time shippability check for the user's client factory: the
    * factory re-runs on executors, so a non-serializable capture would
    * die as an opaque NotSerializableException at task-serialization
    * time. Serializing the CLOSURE itself is the precise test — a
    * factory that CONSTRUCTS its SSLContext inside the lambda captures
    * nothing unserializable and passes (each executor builds its own
    * context), while a captured driver-side context fails HERE with
    * the actionable message (r18 review: probing only the driver
    * client's `security` rejected the constructed-inside pattern that
    * task serialization would in fact accept). */
  private[kafka] def requireShippableFactory(
      factory: Seq[(String, Int)] => KafkaWireClient, context: String): Unit =
    try {
      val oos = new java.io.ObjectOutputStream(java.io.OutputStream.nullOutputStream())
      try oos.writeObject(factory) finally oos.close()
    } catch {
      case e: java.io.NotSerializableException =>
        // the hint keys off WHAT failed to serialize, not off the
        // probe's config: a factory that already constructs its
        // context inside the lambda but captures some OTHER
        // non-serializable object must not be told to do what it
        // already does (r18 review)
        val hint =
          if (Option(e.getMessage).exists(_.contains("SSLContext")))
            " — a programmatic KafkaSecurity.tlsContext (an SSLContext) cannot be serialized " +
              "into executor tasks; construct the SSLContext INSIDE the factory lambda so each " +
              "executor builds its own, or use tls=true with the JVM-default trust store " +
              "(javax.net.ssl.* system properties on executors)"
          else ""
        throw new IllegalArgumentException(
          s"$context: the client factory cannot be serialized into executor tasks " +
            s"(captured ${e.getMessage})$hint", e)
    }

  sealed trait OffsetSpec
  case object Earliest extends OffsetSpec
  case object Latest extends OffsetSpec
  /** Explicit per-partition log offsets (inclusive start / exclusive end). */
  final case class Explicit(offsets: Map[Int, Long]) extends OffsetSpec

  object OffsetSpec {
    /** Parse the Spark kafka option spelling: "earliest", "latest",
      * or a JSON per-partition map {"0": 12, "1": 5}. */
    def parse(s: String): OffsetSpec = s.trim.toLowerCase match {
      case "earliest" => Earliest
      case "latest"   => Latest
      case j =>
        val m = graft.databricks.Json.parseObj(s)
        require(m.nonEmpty, s"cannot parse offset spec '$s': expected earliest, latest, or {\"partition\": offset}")
        Explicit(m.map { case (k, v) => k.toInt -> v.asInstanceOf[Long] })
    }
  }

  /** "host1:9092,host2:9093" -> socket addresses. */
  def parseBrokers(s: String): Seq[(String, Int)] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map { b =>
      val i = b.lastIndexOf(':')
      require(i > 0, s"broker '$b' is not host:port")
      (b.substring(0, i), b.substring(i + 1).toInt)
    }.toSeq

  /** One planned fetch range; everything a task needs, nothing that
    * can't serialize. `host:port` is the partition leader at PLAN
    * time — the common-path connection; `bootstrap` carries the full
    * broker list so a task can re-resolve the leader when it moves
    * mid-read (rolling restarts are routine cluster maintenance, and
    * a long batch read of a big topic WILL overlap one). */
  final case class PartitionRange(topic: String, partition: Int,
                                  host: String, port: Int,
                                  start: Long, end: Long,
                                  bootstrap: Seq[(String, Int)] = Nil) {
    /** Planned leader first (leader-local common path), then the rest
      * of the bootstrap list for failover re-resolution. */
    def allBrokers: Seq[(String, Int)] = ((host, port) +: bootstrap).distinct
  }

  /** Errors worth a metadata re-resolution + retry on the READ path
    * (fetch/listOffsets are idempotent): connection failures, plus the
    * protocol codes kafka-clients classifies retriable — 3
    * UNKNOWN_TOPIC_OR_PARTITION (transient during leader election
    * propagation), 5 LEADER_NOT_AVAILABLE, 6 NOT_LEADER_FOR_PARTITION,
    * 7 REQUEST_TIMED_OUT. */
  private[kafka] def retryableFetchError(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case p: KafkaProtocolException => p.code == 3 || p.code == 5 || p.code == 6 || p.code == 7
    case _ => false
  }

  /** Produce retry classification: the leader-moved codes (3/5/6) are
    * definitively not-appended so retrying is exactly-once-safe;
    * IOException retries are AT-LEAST-ONCE (the request may have
    * appended before the connection died) — the same contract a
    * kafka-clients producer has with retries on and idempotence off. */
  private[kafka] def retryableProduceError(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case p: KafkaProtocolException => p.code == 3 || p.code == 5 || p.code == 6
    case _ => false
  }

  /**
   * Run a leader-routed operation with bounded failover: on a
   * retryable error, drop the client's cached metadata (the next call
   * re-bootstraps from the FULL broker list and re-resolves the
   * partition leader), back off linearly, and retry — so a Spark task
   * survives a leadership migration instead of dying N task-retries
   * in a row against the same stale leader.
   */
  private[kafka] def withLeaderFailover[T](client: KafkaWireClient,
                                           maxRetries: Int, backoffMs: Long,
                                           retryable: Throwable => Boolean,
                                           context: => String)(op: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(op)
      catch {
        case e: Throwable if retryable(e) && attempt < maxRetries =>
          attempt += 1
          client.invalidateMetadata()
          if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
        case e: Throwable if retryable(e) =>
          throw new java.io.IOException(
            s"$context: still failing after $maxRetries leader-failover retries", e)
      }
    }
    out.get
  }

  /**
   * Paged fetch loop over one partition range — the ONE consumer
   * iterator behind both the batch RDD and the streaming V2 reader:
   * empty-page maxBytes escalation (a message larger than the window
   * doubles it, capped), the high-watermark-below-end data-loss
   * check, the offset-range filter, strict pre-advance
   * materialization. Task memory = one fetch response.
   */
  final class RangeFetchIterator private[kafka] (
      fetchFn: (Long, Int) => FetchResult, range: PartitionRange, initialMaxBytes: Int)
      extends Iterator[KafkaWire.KafkaRecord] {

    def this(client: KafkaWireClient, range: PartitionRange, initialMaxBytes: Int) =
      this((off, mb) => client.fetch(range.topic, range.partition, off, mb),
        range, initialMaxBytes)

    private var page: Iterator[KafkaWire.KafkaRecord] = Iterator.empty
    private var nextOffset = range.start
    private var fetchBytes = initialMaxBytes

    override def hasNext: Boolean = {
      while (!page.hasNext && nextOffset < range.end) fetchPage()
      page.hasNext
    }

    override def next(): KafkaWire.KafkaRecord = {
      if (!hasNext) throw new NoSuchElementException
      page.next()
    }

    private def fetchPage(): Unit = {
      val res = fetchFn(nextOffset, fetchBytes)
      if (res.records.isEmpty) {
        if (res.pageEndOffset > nextOffset) {
          // the page DECODED records but they all sat below the
          // requested offset (log compaction removed everything in
          // between): advance past the gap — escalating maxBytes here
          // would re-transfer the same batch up to the cap and then
          // die with a misleading "message too large"
          nextOffset = res.pageEndOffset
        } else if (res.highWatermark > nextOffset) {
          // first message larger than the window: escalate, like
          // kafka-clients does, up to a hard cap
          require(fetchBytes < (1 << 26),
            s"${range.topic}/${range.partition}@$nextOffset: message exceeds ${1 << 26} bytes")
          fetchBytes = fetchBytes * 2
        } else {
          // log truncated below the planned end — surface it, a
          // silent gap would be data loss
          throw new IllegalStateException(
            s"${range.topic}/${range.partition}: high watermark ${res.highWatermark} " +
              s"fell below planned end ${range.end}")
        }
      } else {
        // filter STRICTLY before advancing nextOffset — a lazy
        // iterator would capture the var and see the advanced value
        val from = nextOffset
        page = res.records.filter(r => r.offset >= from && r.offset < range.end).iterator
        val advanced = res.records.map(_.offset).max + 1
        // forward-progress guard: a nonconforming broker returning a
        // non-empty page whose max offset sits below the requested
        // fetch offset would otherwise re-fetch the same page forever
        if (advanced <= nextOffset)
          throw new IllegalStateException(
            s"${range.topic}/${range.partition}: fetch at $nextOffset returned " +
              s"${res.records.size} records ending below it (max offset ${advanced - 1}) — " +
              "no forward progress; refusing to spin")
        nextOffset = advanced
      }
    }
  }

  /**
   * Per-target-partition buffering producer — the ONE write path
   * behind both the batch `write` and the streaming V2 sink: keyed
   * records route by Kafka's default-partitioner murmur2, keyless
   * records round-robin from the caller's seed, bounded buffers flush
   * at `batchSize` (acks=all).
   */
  final class PartitionedProducer(client: KafkaWireClient, topic: String,
                                  numPartitions: Int, roundRobinSeed: Int,
                                  batchSize: Int = 500, codec: Int = 0,
                                  maxFailovers: Int = 5, failoverBackoffMs: Long = 1000) {
    require(numPartitions > 0, s"topic '$topic' reports no partitions")
    private val buffers = Array.fill(numPartitions)(Vector.newBuilder[KafkaWire.OutRecord])
    private val counts = new Array[Int](numPartitions)
    private var roundRobin = roundRobinSeed % numPartitions

    private def flush(p: Int): Unit = if (counts(p) > 0) {
      val batch = buffers(p).result()
      withLeaderFailover(client, maxFailovers, failoverBackoffMs,
        retryableProduceError, s"produce $topic/$p") {
        client.produce(topic, p, batch, codec = codec)
      }
      buffers(p) = Vector.newBuilder; counts(p) = 0
    }

    def send(key: Array[Byte], value: Array[Byte]): Unit = {
      val p =
        if (key != null) KafkaWire.partitionForKey(key, numPartitions)
        else { roundRobin = (roundRobin + 1) % numPartitions; roundRobin }
      buffers(p) += KafkaWire.OutRecord(key, value, System.currentTimeMillis())
      counts(p) += 1
      if (counts(p) >= batchSize) flush(p)
    }

    def flushAll(): Unit = (0 until numPartitions).foreach(flush)
  }

  /** Plan per-partition ranges on the driver. `bootstrap` rides into
    * every range so executor tasks can re-resolve a moved leader. */
  def planRanges(client: KafkaWireClient, topic: String,
                 starting: OffsetSpec, ending: OffsetSpec,
                 bootstrap: Seq[(String, Int)] = Nil): Seq[PartitionRange] = {
    val meta = client.metadata(Seq(topic))
    val topicMeta = meta.topics.getOrElse(topic,
      throw new IllegalArgumentException(s"unknown topic '$topic'"))
    val partitions = topicMeta.partitions.map(_.partition).sorted
    def resolve(spec: OffsetSpec, sentinel: Long): Map[Int, Long] = spec match {
      case Explicit(m) =>
        // partitions absent from an explicit map fall back to the sentinel
        // (a topic can GROW partitions between runs; new ones read from
        // the log start, matching the Spark kafka source's behavior)
        val missing = partitions.filterNot(m.contains)
        if (missing.isEmpty) m
        else m ++ client.listOffsets(topic, missing.map(_ -> sentinel).toMap)
      case Earliest => client.earliestOffsets(topic, partitions)
      case Latest   => client.latestOffsets(topic, partitions)
    }
    val startOffsets = resolve(starting, KafkaWire.EarliestTimestamp)
    val endOffsets = resolve(ending, KafkaWire.LatestTimestamp)
    partitions.map { p =>
      val node = meta.leaderFor(topic, p)
      val s = startOffsets(p)
      val e = endOffsets(p)
      require(e >= s, s"$topic/$p: ending offset $e below starting offset $s")
      PartitionRange(topic, p, node.host, node.port, s, e, bootstrap)
    }
  }

  /**
   * Batch read [starting, ending) from every partition of `topic`
   * into a kafka-schema DataFrame. One Spark task per partition, each
   * with its own socket to the partition leader; records stream
   * through a paged fetch iterator, so a task's memory high-water is
   * one fetch response (`maxBytes`), never the partition.
   */
  def read(spark: SparkSession, brokers: String, topic: String,
           starting: OffsetSpec = Earliest, ending: OffsetSpec = Latest,
           maxBytes: Int = 1 << 20,
           clientFactory: Seq[(String, Int)] => KafkaWireClient = bs => new KafkaWireClient(bs),
           maxFailovers: Int = 5, failoverBackoffMs: Long = 1000)
          : DataFrame = {
    val bootstrap = parseBrokers(brokers)
    val planner = clientFactory(bootstrap)
    val ranges = try {
      requireShippableFactory(clientFactory, "kafka batch read")
      planRanges(planner, topic, starting, ending, bootstrap)
    } finally planner.close()
    val nonEmpty = ranges.filter(r => r.end > r.start)
    if (nonEmpty.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], kafkaSchema)
    }
    val initialMax = maxBytes
    val factory = clientFactory
    val (retries, backoff) = (maxFailovers, failoverBackoffMs)
    val rdd = spark.sparkContext.parallelize(nonEmpty, nonEmpty.size).flatMap { r =>
      // the client sees the planned leader FIRST (leader-local common
      // path) and the whole bootstrap list after it, so a mid-read
      // leadership migration re-resolves instead of dying on retries
      val client = factory(r.allBrokers)
      // a task that dies mid-iteration (downstream failure, kill) must
      // not leak its socket on a long-lived executor
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      val fetchFn: (Long, Int) => FetchResult = (off, mb) =>
        withLeaderFailover(client, retries, backoff, retryableFetchError,
          s"fetch ${r.topic}/${r.partition}@$off")(client.fetch(r.topic, r.partition, off, mb))
      val it = new RangeFetchIterator(fetchFn, r, initialMax)
      new Iterator[Row] {
        private var open = true
        override def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && open) { open = false; client.close() }
          h
        }
        override def next(): Row = {
          val rec = it.next()
          Row(rec.key, rec.value, r.topic, r.partition, rec.offset,
            new java.sql.Timestamp(rec.timestamp), rec.timestampType)
        }
      }
    }
    spark.createDataFrame(rdd, kafkaSchema)
  }

  /**
   * Batch write a DataFrame with `key`(binary|string, optional) and
   * `value`(binary|string) columns to `topic` — the Spark kafka sink
   * contract. Keyed rows route by Kafka's default-partitioner murmur2
   * so graft's placement matches a kafka-clients producer; null-key
   * rows round-robin from the task id. Each task batches `batchSize`
   * records per target partition before producing (acks=all).
   */
  def write(df: DataFrame, brokers: String, topic: String,
            batchSize: Int = 500,
            clientFactory: Seq[(String, Int)] => KafkaWireClient = bs => new KafkaWireClient(bs),
            codec: Int = 0,
            maxFailovers: Int = 5, failoverBackoffMs: Long = 1000)
           : Unit = {
    import org.apache.spark.sql.functions._
    val cols = df.columns.toSet
    require(cols.contains("value"), s"kafka write needs a 'value' column, got ${df.columns.mkString(", ")}")
    val normalized = df.select(
      (if (cols.contains("key")) col("key").cast(BinaryType) else lit(null).cast(BinaryType)).as("key"),
      col("value").cast(BinaryType).as("value"))

    val planner = clientFactory(parseBrokers(brokers))
    val numPartitions = try {
      requireShippableFactory(clientFactory, "kafka batch write")
      planner.metadata(Seq(topic)).topics(topic).partitions.size
    } finally planner.close()
    val factory = clientFactory
    val bs = brokers

    val (retries, backoff) = (maxFailovers, failoverBackoffMs)
    normalized.foreachPartition { (rows: Iterator[Row]) =>
      val client = factory(parseBrokers(bs))
      try {
        val producer = new PartitionedProducer(client, topic, numPartitions,
          org.apache.spark.TaskContext.getPartitionId(), batchSize, codec,
          retries, backoff)
        rows.foreach(row => producer.send(row.getAs[Array[Byte]](0), row.getAs[Array[Byte]](1)))
        producer.flushAll()
      } finally client.close()
    }
  }
}
