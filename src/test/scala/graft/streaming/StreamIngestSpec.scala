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

  test("S7 streaming dedup drops in-watermark duplicates, state stays bounded") {
    val dir = tmpDir("sdedup_")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", StringType),
      StructField("value", DoubleType)))
    Seq(
      (Timestamp.valueOf("2024-06-01 10:00:00"), "a", 1.0),
      (Timestamp.valueOf("2024-06-01 10:00:30"), "a", 1.0), // dup key inside watermark
      (Timestamp.valueOf("2024-06-01 10:01:00"), "b", 2.0),
      (Timestamp.valueOf("2024-06-01 10:02:00"), "b", 2.0), // dup key inside watermark
      (Timestamp.valueOf("2024-06-01 10:03:00"), "c", 3.0)
    ).toDF("ts", "k", "value").write.mode("overwrite").parquet(dir)

    val stream = StreamIngest.fileStream(spark, dir, schema)
    val deduped = StreamIngest.dedupStream(stream, "ts", Seq("k"), watermark = "10 minutes")
    val q = StreamIngest.runToMemory(deduped, "dedup_out", mode = "append")
    q.processAllAvailable(); q.stop()

    val out = spark.table("dedup_out").select("k").as[String].collect().sorted.toSeq
    assert(out == Seq("a", "b", "c"), s"each key exactly once: $out")
  }

  test("curateStream: content dedup + quality gate + annotations on a stream") {
    val dir = tmpDir("scurate_")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("doc_id", LongType),
      StructField("text", StringType)))
    val prose = "the data pipeline reads the table and the join is computed " * 10
    Seq(
      (Timestamp.valueOf("2024-06-01 10:00:00"), 1L, prose),
      (Timestamp.valueOf("2024-06-01 10:00:30"), 2L, prose),   // exact dup content
      (Timestamp.valueOf("2024-06-01 10:01:00"), 3L, "short"), // fails quality 0.6
      (Timestamp.valueOf("2024-06-01 10:02:00"), 4L, prose + " distinct tail")
    ).toDF("ts", "doc_id", "text").write.mode("overwrite").parquet(dir)

    val stream = StreamIngest.fileStream(spark, dir, schema)
    val curated = StreamIngest.curateStream(stream, "ts", "doc_id", "text",
      watermark = "10 minutes", qualityMin = 0.6)
    assert(curated.isStreaming, "curation stages must compose on the stream plan")
    val q = StreamIngest.runToMemory(curated, "curate_out", mode = "append")
    q.processAllAvailable(); q.stop()

    val out = spark.table("curate_out")
    val ids = out.select("doc_id").as[Long].collect().toSet
    // one of the dup pair survives (micro-batch order is not contractual),
    // the short doc dies on quality, the distinct doc survives
    assert(ids.intersect(Set(1L, 2L)).size == 1, s"content dup must collapse: $ids")
    assert(!ids.contains(3L), s"low-quality doc must drop: $ids")
    assert(ids.contains(4L), s"distinct prose must survive: $ids")
    // annotations arrive with the rows
    val cols = out.columns.toSet
    assert(Set("quality", "repetition", "lang_pred", "n_tokens").subsetOf(cols), cols.toString)
    assert(!cols.contains("_fp"), "the dedup key is internal")
  }

  test("nearDedupStream: batches probe + grow the persisted index; history and earlier batches both dedup") {
    val dir = tmpDir("sneardup_")
    val indexPath = tmpDir("sneardup_ix_") + "/index"
    val checkpoint = tmpDir("sneardup_cp_")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    // 60 position-distinct tokens per doc, disjoint across seeds, so
    // nearCopy (one dropped token) sits at ~0.92 true jaccard — far
    // from the 0.8 threshold on both sides of the estimate noise
    def prose(seed: Int): String =
      (1 to 60).map(i => s"w${i}s$seed").mkString(" ")
    def nearCopy(s: String): String =
      { val t = s.split(" "); (t.take(30) ++ t.drop(31)).mkString(" ") }

    // bootstrap: historical corpus h1 is already indexed
    val hist = Seq((1L, prose(1))).toDF("doc_id", "text")
    graft.operators.MinHashIndex.buildIndex(hist, "text", "doc_id")
      .write.parquet(indexPath)

    val got = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): Unit = {
      val q = StreamIngest.nearDedupStream(
        StreamIngest.fileStream(spark, dir, schema), "doc_id", "text",
        indexPath, checkpoint, threshold = 0.8) { (fresh, _) =>
        got ++= fresh.select("doc_id").as[Long].collect()
      }
      q.processAllAvailable(); q.stop()
    }

    // batch A: near copy of history (dies), a new doc (kept + indexed),
    // and an exact in-batch dup of it (batch-local exact dedup)
    Seq((10L, nearCopy(prose(1))), (11L, prose(2)), (12L, prose(2)))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    run()
    assert(got.toSet.intersect(Set(11L, 12L)).size == 1,
      s"in-batch exact dup must collapse: $got")
    assert(!got.contains(10L), s"near copy of indexed history must drop: $got")

    // batch B: near copy of batch A's survivor (the index GREW — it
    // dies without any re-scan of batch A), plus a genuinely new doc
    val before = got.toSet
    Seq((20L, nearCopy(prose(2))), (21L, prose(5)))
      .toDF("doc_id", "text").write.mode("append").parquet(dir)
    run()
    val batchB = got.toSet -- before
    assert(batchB == Set(21L),
      s"near copy of an earlier BATCH must drop, new doc survives: $batchB")

    // the index holds exactly history + the two survivors
    val indexed = spark.read.parquet(indexPath).select("doc_id").as[Long].collect().toSet
    assert(indexed == Set(1L) ++ before.intersect(Set(11L, 12L)) ++ Set(21L),
      s"index rows: $indexed")
  }

  test("summarySketchStream: per-batch sketch rows merge to the exact whole-stream answer") {
    val dir = tmpDir("ssketch_")
    val checkpoint = tmpDir("ssketch_cp_")
    val summary = tmpDir("ssketch_out_") + "/summary"
    val schema = StructType(Seq(
      StructField("user", StringType), StructField("value", DoubleType)))

    def run(): Unit = {
      val q = StreamIngest.summarySketchStream(
        StreamIngest.fileStream(spark, dir, schema), checkpoint,
        distinctCol = "user", valueCol = "value", groupCols = Nil, summary)
      q.processAllAvailable(); q.stop()
    }
    // two batches with overlapping users
    (0 until 60).map(u => (s"u$u", u.toDouble)).toDF("user", "value")
      .write.mode("overwrite").parquet(dir)
    run()
    (30 until 90).map(u => (s"u$u", u.toDouble)).toDF("user", "value")
      .write.mode("append").parquet(dir)
    run()

    val rows = spark.read.parquet(summary)
    assert(rows.count() == 2, "one sketch row per non-empty batch")
    // distinct users across batches: 90 exactly (overlap collapses)
    val est = graft.operators.SketchAnalytics.estimateDistinct(rows, Nil, "distinct_sketch")
      .as[Long].head()
    assert(est == 90L, s"merged distinct: $est")
    // median over the union multiset (0..59 ++ 30..89, 120 values):
    // sketches are exact below compaction, INCLUSIVE rank 60 -> 44.0
    val p50 = graft.operators.SketchAnalytics.estimateQuantiles(
      rows, Nil, Seq(0.5), "value_sketch").head().getDouble(0)
    assert(p50 == 44.0 || p50 == 45.0, s"median of the union multiset: $p50")
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

  test("S7/M1 stream lands in metastore info-date partitions, appending across batches") {
    import graft.meta.{MetaTable, Metastore}
    val srcDir = tmpDir("s2m_src_")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", StringType),
      StructField("value", DoubleType)))
    val ms = new Metastore(spark)
    ms.register(MetaTable("landed_stream", tmpDir("s2m_ms_") + "/landed"))
    val checkpoint = tmpDir("s2m_cp_")

    // batch 1 spans a date boundary
    Seq(
      (Timestamp.valueOf("2024-06-01 23:50:00"), "a", 1.0),
      (Timestamp.valueOf("2024-06-02 00:10:00"), "b", 2.0)
    ).toDF("ts", "k", "value").write.mode("append").parquet(srcDir)
    val q1 = StreamIngest.streamToMetastore(
      StreamIngest.fileStream(spark, srcDir, schema), ms, "landed_stream", "ts", checkpoint)
    q1.awaitTermination()

    // batch 2 adds to an existing day — must append, not overwrite
    Seq((Timestamp.valueOf("2024-06-02 08:00:00"), "c", 3.0))
      .toDF("ts", "k", "value").write.mode("append").parquet(srcDir)
    val q2 = StreamIngest.streamToMetastore(
      StreamIngest.fileStream(spark, srcDir, schema), ms, "landed_stream", "ts", checkpoint)
    q2.awaitTermination()

    import java.time.LocalDate
    assert(ms.listAvailableDates("landed_stream") ==
      Seq(LocalDate.parse("2024-06-01"), LocalDate.parse("2024-06-02")))
    assert(ms.getTable("landed_stream",
      Some(LocalDate.parse("2024-06-01")), Some(LocalDate.parse("2024-06-01"))).count() == 1)
    val day2 = ms.getTable("landed_stream",
      Some(LocalDate.parse("2024-06-02")), Some(LocalDate.parse("2024-06-02")))
    assert(day2.count() == 2, "second batch must append to the existing day")
    // the checkpoint prevents reprocessing batch 1's files
    assert(ms.getTable("landed_stream").count() == 3)
  }

  test("S6 kafka frame/options plumbing (transport stubbed; no broker in env)") {
    val cfg = StreamIngest.KafkaConfig("broker:9092", "events", Map("maxOffsetsPerTrigger" -> "1000"))
    val opts = StreamIngest.kafkaReadOptions(cfg)
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "events")
    assert(opts("maxOffsetsPerTrigger") == "1000")

    val df = Seq((1L, "x", 2.5)).toDF("id", "name", "v")
    val frame = StreamIngest.toKafkaFrame(df, "id")
    assert(frame.columns.toSeq == Seq("key", "value"))
    val row = frame.head()
    assert(row.getString(0) == "1")
    assert(row.getString(1) == """{"id":1,"name":"x","v":2.5}""")

    // decode roundtrip: frame -> typed columns
    val back = StreamIngest.fromKafkaFrame(frame, df.schema).head()
    assert(back.getLong(0) == 1L && back.getString(1) == "x" && back.getDouble(2) == 2.5)
  }
}
