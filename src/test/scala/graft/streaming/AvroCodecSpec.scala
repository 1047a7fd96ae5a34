package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** S6b: Kafka Avro payload layer — schema derivation, Confluent
  * framing, row roundtrip. No broker needed; transport is the only
  * absent piece. */
class AvroCodecSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = false),
    StructField("day", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("blob", BinaryType, nullable = true),
    StructField("tags", ArrayType(StringType), nullable = true),
    StructField("nested", StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true))), nullable = true)))

  private def sample = {
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789")
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "alpha", 0.5, true, java.sql.Date.valueOf("2024-06-01"), ts,
        Array[Byte](1, 2, 3), Seq("x", "y"), Row(7, "inner")),
      Row(2L, null, null, false, null, null, null, null, null)
    )), schema)
  }

  test("avro schema derivation: unions for nullables, logical-type conventions") {
    val s = AvroCodec.avroSchemaFor(schema)
    assert(s.getField("id").schema().getType == org.apache.avro.Schema.Type.LONG)
    assert(s.getField("name").schema().getType == org.apache.avro.Schema.Type.UNION)
    assert(s.getField("day").schema().toString.contains("int"))   // epoch days
    assert(s.getField("ts").schema().toString.contains("long"))   // micros
    assert(s.getField("nested").schema().toString.contains("record"))
  }

  test("confluent framing: magic 0, big-endian id, body preserved; junk rejected") {
    val framed = AvroCodec.frame(0x01020304, Array[Byte](9, 8, 7))
    assert(framed.take(5).toSeq == Seq[Byte](0, 1, 2, 3, 4))
    val (id, body) = AvroCodec.unframe(framed)
    assert(id == 0x01020304 && body.toSeq == Seq[Byte](9, 8, 7))
    assertThrows[IllegalArgumentException](AvroCodec.unframe(Array[Byte](42, 0, 0, 0, 0, 1)))
  }

  test("encode/decode roundtrip preserves every type including nulls") {
    val encoded = AvroCodec.encode(sample, schemaId = 7, keyCol = Some("id"))
    assert(encoded.columns.toSeq == Seq("key", "value"))
    assert(encoded.count() == 2)

    val decoded = AvroCodec.decode(encoded, schema, expectSchemaId = Some(7))
      .collect().sortBy(_.getLong(0))
    val orig = sample.collect().sortBy(_.getLong(0))
    decoded.zip(orig).foreach { case (d, o) =>
      assert(d.getLong(0) == o.getLong(0))
      assert(d.get(1) == o.get(1) && d.get(2) == o.get(2) && d.get(3) == o.get(3))
      assert(d.get(4) == o.get(4), "date roundtrip")
      assert(d.get(5) == o.get(5), s"timestamp roundtrip: ${d.get(5)} vs ${o.get(5)}")
      assert((d.get(6) == null && o.get(6) == null) ||
        d.getAs[Array[Byte]](6).toSeq == o.getAs[Array[Byte]](6).toSeq)
      assert(d.get(7) == o.get(7), "array roundtrip")
      assert(d.get(8) == o.get(8), "nested struct roundtrip")
    }
  }

  test("pre-epoch timestamps with fractional seconds round-trip") {
    val s = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true)))
    val early = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5")
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, early), Row(2L, java.sql.Timestamp.valueOf("1955-06-01 01:02:03.25")))), s)
    val back = AvroCodec.decode(AvroCodec.encode(df, 1), s).collect().sortBy(_.getLong(0))
    assert(back(0).getTimestamp(1) == early)
    assert(back(1).getTimestamp(1) == java.sql.Timestamp.valueOf("1955-06-01 01:02:03.25"))
  }

  test("r17 review pins: tombstones decode to null payload; binary keys encode by content") {
    // a compacted topic's tombstone (null value) must not NPE the run
    val enc = AvroCodec.encode(sample, 7)
    val withTombstone = enc.select(col("value"))
      .unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(null))),
        StructType(Seq(StructField("value", BinaryType, nullable = true)))))
    val out = AvroCodec.decodeInto(withTombstone, schema, payloadCol = "data")
    assert(out.count() == 3)
    assert(out.where(col("data").isNull).count() == 1, "tombstone -> null payload struct")
    // decode (typed top-level) DROPS tombstones instead of throwing
    assert(AvroCodec.decode(withTombstone, schema).count() == 2)

    // binary key: REJECTED loudly — String.valueOf rendered the
    // array's identity toString (same key scattered across
    // partitions), and a UTF-8 decode would merge DISTINCT keys whose
    // invalid byte sequences collapse to U+FFFD; the caller encodes
    val bin = StructType(Seq(
      StructField("k", BinaryType, nullable = true),
      StructField("id", LongType, nullable = false)))
    val rows = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("user-1".getBytes("UTF-8"), 1L),
      Row(null, 3L))), bin)
    val e = intercept[org.apache.spark.SparkException](
      AvroCodec.encode(rows, 7, keyCol = Some("k")).collect())
    assert(String.valueOf(e.getMessage).contains("base64") ||
      String.valueOf(e.getCause).toString.contains("base64"),
      s"binary key must be rejected with encoding guidance: ${e.getMessage}")
    // a STRING rendering of the same key still round-trips normally
    val strKeyed = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("user-1", 1L), Row(null, 2L))),
      StructType(Seq(StructField("k", StringType, nullable = true),
        StructField("id", LongType, nullable = false))))
    val keys = AvroCodec.encode(strKeyed, 7, keyCol = Some("k"))
      .select("key").collect().map(r => Option(r.getString(0)))
    assert(keys.count(_.contains("user-1")) == 1 && keys.count(_.isEmpty) == 1)
  }

  test("schema-id mismatch is rejected like a registry would") {
    val encoded = AvroCodec.encode(sample.select("id", "flag"), schemaId = 7)
    val narrow = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("flag", BooleanType, nullable = false)))
    val e = intercept[org.apache.spark.SparkException](
      AvroCodec.decode(encoded, narrow, expectSchemaId = Some(9)).collect())
    assert(e.getCause != null || e.getMessage.contains("mismatch"))
  }
}
