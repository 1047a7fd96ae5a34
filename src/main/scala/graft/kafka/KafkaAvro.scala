package graft.kafka

import graft.offset.{OffsetInfo, OffsetValue}
import graft.sources.{GraftSource, SourceFactory, SourceResult}
import graft.streaming.AvroCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.slf4j.LoggerFactory

import java.time.LocalDate

/**
 * Kafka -> metastore ingestion with Confluent-framed Avro payloads
 * (reference: pramen/extras .../extras/source/KafkaAvroSource.scala —
 * graft substitutes [[KafkaBatch]] + [[KafkaWireClient]] for the
 * missing Spark kafka connector and [[SchemaRegistryClient]] +
 * [[graft.streaming.AvroCodec]] for ABRiS, keeping the reference's
 * contract end to end):
 *
 *  - INCREMENTAL-ONLY: batch windows make no sense against a log;
 *    `getRecordCount` throws, like the reference (:135);
 *  - offsets are per-partition [[OffsetValue.KafkaValue]]s flowing
 *    through graft's OffsetManager; a committed value is LAST-READ,
 *    so the next run starts at `increment` (:172 — "the starting
 *    offset is inclusive in Spark");
 *  - the decoded payload lands at the ROOT of the schema next to a
 *    `kafka` metadata struct (partition, offset, timestamp,
 *    timestamp_type) and an optional key column; payload fields
 *    colliding with either reserved name are dropped with a warning
 *    (:249-255);
 *  - key serializers: none | binary | string | avro (avro requires a
 *    key naming strategy, :238);
 *  - the VALUE reader schema comes from the registry — latest version
 *    under the subject naming strategy, or a pinned `schema.id`.
 *
 * Scale: the read is one Spark task per topic partition fetching from
 * that partition's leader ([[KafkaBatch.read]]); Avro decode is
 * per-row byte work inside those same tasks; the registry is hit ONCE
 * per run on the driver. Nothing driver-side grows with data volume.
 */
final class KafkaAvroSource(
    spark: SparkSession,
    brokers: String,
    topic: String,
    registry: SchemaRegistryClient,
    valueNaming: SubjectNaming = SubjectNaming.TopicName,
    keyNaming: Option[SubjectNaming] = None,
    keySerializer: String = "binary", // none | binary | string | avro
    kafkaColumn: String = "kafka",
    keyColumn: String = "kafka_key",
    valueSchemaId: Option[Int] = None,
    startingDefault: KafkaBatch.OffsetSpec = KafkaBatch.Earliest,
    endingDefault: KafkaBatch.OffsetSpec = KafkaBatch.Latest,
    clientFactory: Seq[(String, Int)] => KafkaWireClient = bs => new KafkaWireClient(bs))
    extends GraftSource {

  private val log = LoggerFactory.getLogger(getClass)

  require(Set("none", "binary", "string", "avro").contains(keySerializer),
    s"unknown key serializer '$keySerializer' (none, binary, string, avro)")
  require(keySerializer != "avro" || keyNaming.isDefined,
    "key serializer 'avro' needs a key naming strategy (schema.registry.key.naming.strategy)")

  override def hasInfoDateColumn: Boolean = false

  override def getRecordCount(from: LocalDate, to: LocalDate): Long =
    throw new IllegalArgumentException(
      "KafkaAvroSource does not support batch jobs. Only incremental jobs are supported.")

  override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult =
    getDataIncremental(None, columns)

  override def getOffsetInfo: Option[OffsetInfo] = Some(OffsetInfo(kafkaColumn, "kafka"))

  override def getDataIncremental(offsetFrom: Option[OffsetValue],
                                  columns: Seq[String]): SourceResult = {
    val starting = offsetFrom match {
      case Some(kv: OffsetValue.KafkaValue) =>
        KafkaBatch.Explicit(kv.increment.partitionOffsets)
      case Some(other) => throw new IllegalArgumentException(
        s"KafkaAvroSource needs 'kafka' offsets, got '${other.typeName}'")
      case None => startingDefault
    }
    val raw = KafkaBatch.read(spark, brokers, topic, starting, endingDefault,
      clientFactory = clientFactory)

    val valueReg = valueSchemaId match {
      case Some(id) => RegisteredSchema(id, registry.byId(id))
      case None => registry.latest(valueNaming.subject(topic, isKey = false))
    }
    val valueSchema = AvroSchemas.toSpark(valueReg.schema)

    val withMeta = raw.withColumn(kafkaColumn, struct(
      col("partition"), col("offset"), col("timestamp"),
      col("timestampType").as("timestamp_type")))

    val withKey = keySerializer match {
      case "none" => withMeta.drop("key")
      case "binary" => withMeta.withColumnRenamed("key", keyColumn)
      case "string" => withMeta.withColumn(keyColumn, col("key").cast(StringType)).drop("key")
      case "avro" =>
        val keyReg = registry.latest(keyNaming.get.subject(topic, isKey = true))
        val keySchema = AvroSchemas.toSpark(keyReg.schema)
        AvroCodec.decodeInto(withMeta, keySchema, valueCol = "key", payloadCol = keyColumn,
          expectSchemaId = Some(keyReg.id),
          writerSchemaJson = Some(keyReg.schema.toString))
    }

    // decode with the registry schema VERBATIM (union order preserved)
    // and enforce each frame's embedded id against it — a topic
    // carrying records under an older schema version must fail loudly
    // (pin schema.registry.value.schema.id to read a specific version)
    // rather than misdecode them silently with the newer layout
    val decoded = AvroCodec.decodeInto(
      withKey.drop("topic", "partition", "offset", "timestamp", "timestampType"),
      valueSchema, valueCol = "value", payloadCol = "data",
      expectSchemaId = Some(valueReg.id),
      writerSchemaJson = Some(valueReg.schema.toString))

    // promote payload fields to the root; reserved names win collisions
    val payloadFields = valueSchema.fieldNames.toSeq
    payloadFields.filter(f => f == kafkaColumn || f == keyColumn).foreach { f =>
      log.warn(s"payload field '$f' conflicts with a reserved Kafka column name and is dropped")
    }
    val keptPayload = payloadFields.filterNot(f => f == kafkaColumn || f == keyColumn)
      .map(f => col(s"data.`$f`").as(f))
    val keyCols = if (keySerializer == "none") Seq.empty else Seq(col(keyColumn))
    val df = decoded.select((keyCols ++ keptPayload :+ col(kafkaColumn)): _*)

    SourceResult(if (columns.isEmpty) df else df.select(columns.map(col): _*))
  }
}

/**
 * Metastore -> Kafka export with Confluent-framed Avro payloads
 * (reference: pramen/extras .../extras/sink/KafkaAvroSink.scala +
 * writer/TableWriterKafka.scala). The outgoing schema is derived from
 * the DataFrame, registered under the subject naming strategy (the
 * registry returns the existing id when the schema hasn't changed),
 * and every row is framed with that id — exactly what a downstream
 * registry-aware consumer expects. An optional `key.column` routes by
 * Kafka's default murmur2 partitioner for per-key ordering.
 */
final class KafkaAvroSink(
    brokers: String,
    topic: String,
    registry: SchemaRegistryClient,
    valueNaming: SubjectNaming = SubjectNaming.TopicName,
    keyColumn: Option[String] = None,
    clientFactory: Seq[(String, Int)] => KafkaWireClient = bs => new KafkaWireClient(bs),
    codec: Int = 0)
    extends graft.sinks.GraftSink {

  override def send(df: DataFrame, tableName: String, infoDate: LocalDate,
                    options: Map[String, String]): graft.sinks.SinkResult = {
    val avroSchema = AvroCodec.avroSchemaFor(df.schema)
    val subject = valueNaming.subject(topic, isKey = false)
    val schemaId = registry.register(subject, avroSchema)
    // persist around the two actions: count() and the produce must see
    // the SAME rows (and encode once, not twice)
    val framed = AvroCodec.encode(df, schemaId, keyColumn)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val count = framed.count()
      KafkaBatch.write(framed, brokers, topic, clientFactory = clientFactory, codec = codec)
      graft.sinks.SinkResult(count)
    } finally framed.unpersist()
  }
}

/**
 * Config factory: `source.<name>.type = kafka.avro` (or this FQCN).
 * Keys mirror the reference's source definition:
 * {{{
 *   source.k.type = kafka.avro
 *   source.k.kafka.bootstrap.servers = "broker1:9092,broker2:9092"
 *   source.k.topic = "my.topic"
 *   source.k.schema.registry.url = "http://registry:8081"
 *   source.k.schema.registry.value.naming.strategy = topic.name
 *   source.k.schema.registry.value.schema.id = 42        # optional pin
 *   source.k.key.column.serializer = binary               # none|binary|string|avro
 *   source.k.key.column.name = kafka_key
 *   source.k.custom.kafka.column = kafka
 *   source.k.kafka.starting.offsets = earliest            # first-run default
 * }}}
 */
object KafkaAvroSourceFactory extends SourceFactory {
  override def apply(spark: SparkSession, options: Map[String, String]): GraftSource = {
    def req(k: String) = options.getOrElse(k,
      throw new IllegalArgumentException(s"kafka.avro source: '$k' is required"))
    val registry = new SchemaRegistryClient(
      req("schema.registry.url"), new graft.databricks.JdkHttpTransport())
    def naming(side: String): Option[SubjectNaming] =
      options.get(s"schema.registry.$side.naming.strategy").map { s =>
        SubjectNaming.parse(s,
          options.get(s"schema.registry.$side.record.name"),
          options.get(s"schema.registry.$side.record.namespace"))
      }
    new KafkaAvroSource(
      spark,
      brokers = req("kafka.bootstrap.servers"),
      topic = req("topic"),
      registry = registry,
      valueNaming = naming("value").getOrElse(SubjectNaming.TopicName),
      keyNaming = naming("key"),
      keySerializer = options.get("key.column.serializer")
        .orElse(options.get("key.naming.strategy").map(_ => "avro"))
        .getOrElse("binary").toLowerCase.trim,
      kafkaColumn = options.getOrElse("custom.kafka.column", "kafka"),
      keyColumn = options.getOrElse("key.column.name", "kafka_key"),
      valueSchemaId = options.get("schema.registry.value.schema.id").map(_.toInt),
      startingDefault = options.get("kafka.starting.offsets")
        .map(KafkaBatch.OffsetSpec.parse).getOrElse(KafkaBatch.Earliest),
      endingDefault = options.get("kafka.ending.offsets")
        .map(KafkaBatch.OffsetSpec.parse).getOrElse(KafkaBatch.Latest),
      // kafka.security.protocol / kafka.sasl.* — the kafka-clients
      // spelling, so a reference user's SASL_SSL source config ports
      // verbatim (r16)
      clientFactory = {
        val security = KafkaSecurity.fromOptions(options)
        bs => new KafkaWireClient(bs, security = security)
      })
  }
}
