package graft.streaming

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._

/**
 * Kafka Avro payload layer
 * (reference: pramen/extras .../extras/source/KafkaAvroSource.scala,
 * extras/sink/KafkaAvroSink.scala — which delegate the same job to
 * ABRiS): Avro schema derivation from the Spark schema, Confluent
 * wire-format framing (magic byte 0x00 + 4-byte big-endian schema id
 * + Avro binary body), and encode/decode between DataFrame rows and
 * framed `binary` values. Built on avro-core only — no broker, no
 * registry client needed to exercise it; on a real cluster the schema
 * id comes from the registry and `format("kafka")` carries the frame.
 *
 * Serialization is per-row byte work (inherently imperative), so this
 * is one of the few legitimate `mapPartitions` sites in the repo: the
 * datum writer/reader and parsed schema are built once per partition,
 * not per row.
 */
object AvroCodec {

  /** Derive the Avro schema for a Spark schema. Nullable fields map to
    * `union(null, T)`; dates to int days, timestamps to long micros
    * (the Avro logical-type conventions). */
  def avroSchemaFor(schema: StructType, name: String = "row",
                    namespace: String = "graft"): Schema = {
    def fieldSchema(dt: DataType, path: String): Schema = dt match {
      case LongType | TimestampType => Schema.create(Schema.Type.LONG)
      case IntegerType | DateType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case ArrayType(elem, containsNull) =>
        Schema.createArray(maybeNullable(fieldSchema(elem, path + ".elem"), containsNull))
      case st: StructType => record(st, path.replace('.', '_'))
      case other => throw new IllegalArgumentException(
        s"AvroCodec: unsupported Spark type $other at $path")
    }
    def maybeNullable(s: Schema, nullable: Boolean): Schema =
      if (nullable) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))
      else s
    def record(st: StructType, recName: String): Schema = {
      val fields = st.fields.map { f =>
        new Schema.Field(f.name, maybeNullable(fieldSchema(f.dataType, s"$recName.${f.name}"), f.nullable),
          null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(recName, null, namespace, false, fields.toList.asJava)
    }
    record(schema, name)
  }

  /** Confluent wire format: 0x00 magic + 4-byte big-endian schema id + body. */
  private[streaming] def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 5)
    out.write(0)
    out.write((schemaId >>> 24) & 0xFF); out.write((schemaId >>> 16) & 0xFF)
    out.write((schemaId >>> 8) & 0xFF); out.write(schemaId & 0xFF)
    out.write(body)
    out.toByteArray
  }

  private[streaming] def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5 && bytes(0) == 0,
      s"not a Confluent-framed Avro payload (magic=${if (bytes.isEmpty) "?" else bytes(0)})")
    val id = ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) |
      ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
    (id, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }

  // ── Spark value <-> Avro value ────────────────────────────────────

  private def toAvro(v: Any, dt: DataType, schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (t: java.sql.Timestamp, TimestampType) =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case (t: java.time.Instant, TimestampType) =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(elem, _)) =>
      val es = nonNull(resolve(schema, Schema.Type.ARRAY)).getElementType
      s.map(x => toAvro(x, elem, es)).asJava
    case (r: Row, st: StructType) => rowToRecord(r, st, nonNull(resolve(schema, Schema.Type.RECORD)))
    case (x, _) => x
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (i: java.lang.Integer, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      // floorDiv/floorMod: plain /,% are wrong for pre-epoch micros
      // (negative nanos would throw in setNanos; /1000 truncates the
      // wrong way)
      val ts = new java.sql.Timestamp(Math.floorDiv(l, 1000L))
      ts.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt); ts
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (l: java.util.List[_], ArrayType(elem, _)) => l.asScala.map(fromAvro(_, elem)).toSeq
    case (r: GenericRecord, st: StructType) => recordToRow(r, st)
    case (x, _) => x
  }

  /** Unwrap union(null, T) and find the branch of the wanted type. */
  private def resolve(s: Schema, wanted: Schema.Type): Schema =
    if (s.getType == Schema.Type.UNION) s.getTypes.asScala.find(_.getType == wanted).getOrElse(s)
    else s
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def rowToRecord(r: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvro(if (r.isNullAt(i)) null else r.get(i), f.dataType,
        schema.getField(f.name).schema()))
    }
    rec
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row =
    Row(st.fields.map(f => fromAvro(rec.get(f.name), f.dataType)).toIndexedSeq: _*)

  // ── DataFrame surface ─────────────────────────────────────────────

  /**
   * Encode every row into one Confluent-framed Avro `value` (binary)
   * column — the Kafka sink payload shape. Optional `keyCol` is
   * carried through as a string key.
   */
  def encode(df: DataFrame, schemaId: Int, keyCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val sparkSchema = df.schema
    val keyIdx = keyCol.map { c =>
      val i = df.columns.indexOf(c)
      require(i >= 0, s"key column '$c' not found in ${df.columns.mkString(", ")}")
      i
    }
    val avroJson = avroSchemaFor(sparkSchema).toString
    val outSchema = StructType(
      keyCol.map(_ => StructField("key", StringType)).toSeq :+
        StructField("value", BinaryType, nullable = false))
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      rows.map { r =>
        val out = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(out, null)
        writer.write(rowToRecord(r, sparkSchema, schema), enc)
        enc.flush()
        val value = frame(schemaId, out.toByteArray)
        keyIdx match {
          // a null key must STAY null (round-robin placement), not
          // become the 4-byte string "null" murmur2-pinned to one
          // partition; a BINARY key is REJECTED — String.valueOf
          // rendered the array's identity toString ("[B@1e4a7dd4"), so
          // identical key bytes got different strings and a key's
          // records scattered across partitions (r17 review), and a
          // UTF-8 decode is LOSSY (invalid sequences collapse to
          // U+FFFD, merging DISTINCT keys; r17 meta-review) — the
          // caller must base64/hex-encode binary keys explicitly
          case Some(i) =>
            val keyStr =
              if (r.isNullAt(i)) null
              else r.get(i) match {
                case _: Array[Byte] => throw new IllegalArgumentException(
                  "KafkaAvro encode: binary key columns are not supported by the " +
                    "string-keyed sink — base64- or hex-encode the key column first " +
                    "(a lossy UTF-8 decode would merge distinct keys)")
                case other => String.valueOf(other)
              }
            Row(keyStr, value)
          case None => Row(value)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Decode a framed Avro `value` column back into typed columns.
   * `expectSchemaId`, when given, rejects payloads written under a
   * different registry schema (the reader-schema mismatch guard a
   * registry client would enforce).
   */
  /**
   * Decode a framed Avro `value` column into a nested struct column
   * while KEEPING every other input column — the Kafka-source shape,
   * where the decoded payload must ride alongside the key and the
   * kafka metadata struct (reference KafkaAvroSource builds
   * `data.*` + `kafka` + `kafka_key` from one pass). The value column
   * is replaced by `payloadCol`.
   */
  def decodeInto(df: DataFrame, payloadSchema: StructType, valueCol: String = "value",
                 payloadCol: String = "data", expectSchemaId: Option[Int] = None,
                 writerSchemaJson: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    // when the TRUE writer schema is known (registry-fetched), decode
    // with it verbatim — re-deriving from the Spark schema would
    // normalize union branch order to (null, T), silently misreading
    // payloads written under a (T, null) union
    val avroJson = writerSchemaJson.getOrElse(avroSchemaFor(payloadSchema).toString)
    val idx = df.columns.indexOf(valueCol)
    require(idx >= 0, s"column '$valueCol' not found in ${df.columns.mkString(", ")}")
    val keptIdx = df.columns.indices.filter(_ != idx)
    val outSchema = StructType(
      keptIdx.map(df.schema.fields) :+ StructField(payloadCol, payloadSchema))
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      rows.map { r =>
        val raw = r.getAs[Array[Byte]](idx)
        // Kafka TOMBSTONES (null value, routine on compacted topics)
        // decode to a null payload struct — one tombstone must not
        // NPE the whole ingestion run (r17 review)
        if (raw == null) Row((keptIdx.map(r.get) :+ null): _*)
        else {
          val (id, body) = unframe(raw)
          expectSchemaId.foreach(e => require(id == e,
            s"schema id mismatch: payload written under id $id, reader expects $e"))
          val dec = DecoderFactory.get().binaryDecoder(body, null)
          val payload = recordToRow(reader.read(null, dec), payloadSchema)
          Row((keptIdx.map(r.get) :+ payload): _*)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  def decode(df: DataFrame, sparkSchema: StructType, valueCol: String = "value",
             expectSchemaId: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val avroJson = avroSchemaFor(sparkSchema).toString
    val idx = df.columns.indexOf(valueCol)
    require(idx >= 0, s"column '$valueCol' not found in ${df.columns.mkString(", ")}")
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      // tombstones (null value) cannot decode to a typed top-level row
      // here — decodeInto is the null-keeping path — but they must not
      // NPE: drop them, matching spark-avro's from_avro(null) = null
      // semantics for a value-only decode
      rows.flatMap { r =>
        val raw = r.getAs[Array[Byte]](idx)
        if (raw == null) None
        else {
          val (id, body) = unframe(raw)
          expectSchemaId.foreach(e => require(id == e,
            s"schema id mismatch: payload written under id $id, reader expects $e"))
          val dec = DecoderFactory.get().binaryDecoder(body, null)
          Some(recordToRow(reader.read(null, dec), sparkSchema))
        }
      }
    }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
