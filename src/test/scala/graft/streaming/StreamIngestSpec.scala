package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** S6/S7: structured-streaming ingestion + kafka config plumbing. */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  test("S7 file stream -> watermarked windowed agg -> memory sink") {
    val dir = tmpDir("stream_")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", StringType),
      StructField("value", DoubleType)))
    Seq(
      (Timestamp.valueOf("2024-06-01 10:00:30"), "a", 1.0),
      (Timestamp.valueOf("2024-06-01 10:01:10"), "a", 2.0),
      (Timestamp.valueOf("2024-06-01 10:06:00"), "b", 5.0),
      (Timestamp.valueOf("2024-06-01 10:07:00"), "a", 3.0)
    ).toDF("ts", "k", "value").write.mode("overwrite").parquet(dir)

    val stream = StreamIngest.fileStream(spark, dir, schema)
    assert(stream.isStreaming)
    val agg = StreamIngest.windowedCounts(stream, "ts", "k")
    val q = StreamIngest.runToMemory(agg, "win_counts")
    q.processAllAvailable(); q.stop()

    val out = spark.table("win_counts")
      .select(col("window.start").cast("string").as("ws"), col("k"), col("n"), col("total_value"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // both 10:00 and 10:01 events fall in the 10:00 window
    assert(out(("2024-06-01 10:00:00", "a")) == ((2L, 3.0)))
    assert(out(("2024-06-01 10:05:00", "b")) == ((1L, 5.0)))
    assert(out(("2024-06-01 10:05:00", "a")) == ((1L, 3.0)))
  }

  test("S7 streaming session_window closes sessions at the gap") {
    val dir = tmpDir("sess_")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", StringType),
      StructField("value", DoubleType)))
    Seq(
      (Timestamp.valueOf("2024-06-01 10:00:00"), "u1", 1.0),
      (Timestamp.valueOf("2024-06-01 10:10:00"), "u1", 2.0),  // same session
      (Timestamp.valueOf("2024-06-01 12:00:00"), "u1", 4.0),  // new session
      (Timestamp.valueOf("2024-06-01 23:00:00"), "u1", 0.0)   // advances watermark
    ).toDF("ts", "k", "value").write.mode("overwrite").parquet(dir)

    val agg = StreamIngest.sessionized(
      StreamIngest.fileStream(spark, dir, schema), "ts", "k", gap = "30 minutes")
    val q = StreamIngest.runToMemory(agg, "sessions", mode = "append")
    q.processAllAvailable(); q.stop()

    val out = spark.table("sessions")
      .select(col("session_start").cast("string"), col("n_events"), col("total_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // watermark has closed the first two sessions
    assert(out("2024-06-01 10:00:00") == ((2L, 3.0)), s"got $out")
    assert(out("2024-06-01 12:00:00") == ((1L, 4.0)), s"got $out")
  }

  test("S6 kafka frame/options plumbing (transport stubbed; no broker in env)") {
    val cfg = StreamIngest.KafkaConfig("broker:9092", "events", Map("maxOffsetsPerTrigger" -> "1000"))
    val opts = StreamIngest.kafkaReadOptions(cfg)
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "events")
    assert(opts("maxOffsetsPerTrigger") == "1000")

    val frame = StreamIngest.toKafkaFrame(Seq((1L, "x", 2.5)).toDF("id", "name", "v"), "id")
    assert(frame.columns.toSeq == Seq("key", "value"))
    val row = frame.head()
    assert(row.getString(0) == "1")
    assert(row.getString(1) == """{"id":1,"name":"x","v":2.5}""")
  }
}
