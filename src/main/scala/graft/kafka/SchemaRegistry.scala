package graft.kafka

import graft.databricks.{HttpTransport, Json}
import org.apache.avro.Schema
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Confluent Schema Registry client over graft's [[HttpTransport]]
 * seam (reference: pramen/extras KafkaAvroSource/KafkaAvroSink use
 * ABRiS, whose registry calls hit the same PUBLIC REST API:
 * docs.confluent.io/platform/current/schema-registry/develop/api.html).
 * Three endpoints cover the source/sink lifecycle:
 *
 *  - `GET /subjects/{subject}/versions/latest` — reader schema + id
 *  - `GET /schemas/ids/{id}` — resolve a frame's embedded schema id
 *  - `POST /subjects/{subject}/versions` — register on produce
 *
 * Like the Databricks/ECS clients, production runs on
 * [[graft.databricks.JdkHttpTransport]] and specs run the full
 * request/response protocol against a scripted endpoint.
 */
final class SchemaRegistryClient(url: String, http: HttpTransport,
                                 headers: Map[String, String] = Map.empty) {
  private val base = url.stripSuffix("/")
  private val hdrs = headers + ("Content-Type" -> "application/vnd.schemaregistry.v1+json")

  /** The latest registered schema under a subject, with its id. */
  def latest(subject: String): RegisteredSchema =
    fetchVersion(s"$base/subjects/${enc(subject)}/versions/latest")

  def version(subject: String, version: Int): RegisteredSchema =
    fetchVersion(s"$base/subjects/${enc(subject)}/versions/$version")

  /** Resolve a Confluent frame's schema id to its schema. */
  def byId(id: Int): Schema = {
    val body = expect(http.get(s"$base/schemas/ids/$id", hdrs), s"schemas/ids/$id")
    parseSchemaField(body, s"schemas/ids/$id")
  }

  /** Register a schema under a subject; returns the registry id
    * (idempotent — re-registering an identical schema returns the
    * existing id). */
  def register(subject: String, schema: Schema): Int = {
    val body = Json.obj("schema" -> Json.str(schema.toString))
    val resp = expect(http.post(s"$base/subjects/${enc(subject)}/versions", body, hdrs),
      s"register $subject")
    Json.parseObj(resp).get("id") match {
      case Some(id: Long) => id.toInt
      case other => throw new IllegalStateException(s"registry returned no id for $subject: $other")
    }
  }

  private def fetchVersion(u: String): RegisteredSchema = {
    val body = expect(http.get(u, hdrs), u)
    val fields = Json.parseObj(body)
    val id = fields.get("id") match {
      case Some(i: Long) => i.toInt
      case other => throw new IllegalStateException(s"registry response has no id at $u: $other")
    }
    RegisteredSchema(id, parseSchemaField(body, u))
  }

  private def parseSchemaField(body: String, ctx: String): Schema =
    Json.parseObj(body).get("schema") match {
      case Some(s: String) => new Schema.Parser().parse(s)
      case other => throw new IllegalStateException(s"registry response has no schema at $ctx: $other")
    }

  private def expect(resp: (Int, String), ctx: String): String = {
    val (code, body) = resp
    if (code / 100 != 2) {
      val msg = Json.parseObj(body).get("message").collect { case s: String => s }.getOrElse(body.take(200))
      throw new IllegalStateException(s"schema registry $ctx failed: HTTP $code — $msg")
    }
    body
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
}

final case class RegisteredSchema(id: Int, schema: Schema)

/**
 * Subject naming strategies (the public Confluent contract the
 * reference configures as `value.naming.strategy` /
 * `key.naming.strategy` in KafkaAvroConfig — reference
 * extras/writer/model/NamingStrategy.scala).
 */
sealed trait SubjectNaming {
  def subject(topic: String, isKey: Boolean): String
}
object SubjectNaming {
  /** `<topic>-key` / `<topic>-value`. */
  case object TopicName extends SubjectNaming {
    def subject(topic: String, isKey: Boolean): String =
      s"$topic-${if (isKey) "key" else "value"}"
  }
  /** The record's fully-qualified name, topic-independent. */
  final case class RecordName(name: String, namespace: String) extends SubjectNaming {
    def subject(topic: String, isKey: Boolean): String =
      if (namespace.isEmpty) name else s"$namespace.$name"
  }
  /** `<topic>-<record fqn>`. */
  final case class TopicRecordName(name: String, namespace: String) extends SubjectNaming {
    def subject(topic: String, isKey: Boolean): String =
      s"$topic-${if (namespace.isEmpty) name else s"$namespace.$name"}"
  }

  def parse(strategy: String, name: Option[String], namespace: Option[String]): SubjectNaming =
    strategy.trim.toLowerCase match {
      case "topic.name" => TopicName
      case "record.name" => RecordName(
        name.getOrElse(throw new IllegalArgumentException("record.name strategy needs schema.record.name")),
        namespace.getOrElse(""))
      case "topic.record.name" => TopicRecordName(
        name.getOrElse(throw new IllegalArgumentException("topic.record.name strategy needs schema.record.name")),
        namespace.getOrElse(""))
      case other => throw new IllegalArgumentException(
        s"unknown naming strategy '$other' (topic.name, record.name, topic.record.name)")
    }
}

/**
 * Avro -> Spark schema conversion — the exact inverse of
 * [[graft.streaming.AvroCodec.avroSchemaFor]], so a registry-fetched
 * writer schema converts to the Spark schema whose re-derived reader
 * schema is structurally identical (Avro binary is untagged; decoding
 * needs structural, not nominal, equality). Logical types that the
 * codec's value mapping speaks are honored: `date` on int (epoch
 * days), `timestamp-micros` on long.
 */
object AvroSchemas {

  def toSpark(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema(), f.name())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  private def toSparkType(s: Schema, path: String): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"unsupported Avro union at $path: only (null, T) unions map to Spark")
      val (dt, _) = toSparkType(nonNull.head, path)
      (dt, branches.size > nonNull.size)
    case Schema.Type.INT =>
      val lt = Option(s.getLogicalType).map(_.getName)
      (if (lt.contains("date")) DateType else IntegerType, false)
    case Schema.Type.LONG =>
      val lt = Option(s.getLogicalType).map(_.getName)
      (if (lt.contains("timestamp-micros")) TimestampType else LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType, s"$path.elem")
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.RECORD => (toSpark(s), false)
    case other => throw new IllegalArgumentException(
      s"unsupported Avro type $other at $path")
  }
}
