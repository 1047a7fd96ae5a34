package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Structured-streaming ingestion path: file stream → event-time
 * windowed aggregation (watermarked) → sink. The streaming analog of
 * the reference's incremental ingestion (reference: pramen/core
 * .../core/metastore/MetastoreReaderIncremental.scala) — offsets are
 * managed by the streaming engine's checkpoint instead of the
 * OffsetManager.
 */
object StreamIngest {

  /** File-based stream source over a directory of parquet drops. */
  def fileStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /**
   * Event-time tumbling-window aggregation with a watermark — late
   * events beyond `watermark` are dropped, bounding state size (the
   * property that keeps a 100 TB/day stream's state finite).
   */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     window_ : String = "5 minutes",
                     watermark: String = "10 minutes",
                     valueCol: String = "value"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  /**
   * Streaming gap-based sessionization via `session_window` — the
   * streaming analog of `graft.operators.Sessionize`: a session stays
   * open while events arrive within `gap` of each other; the
   * watermark closes and emits sessions, bounding state.
   */
  def sessionized(events: DataFrame, tsCol: String, keyCol: String,
                  gap: String = "30 minutes",
                  watermark: String = "1 hour",
                  valueCol: String = "value"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /**
   * Streaming exact dedup: drop duplicate keys across micro-batches
   * while keeping state FINITE — `dropDuplicatesWithinWatermark`
   * expires a key's dedup state once the watermark passes its event
   * time, so the state store holds only the watermark window, not the
   * whole stream's key history (the property that keeps a 100 TB/day
   * ingest's state bounded; a plain `dropDuplicates` on a stream
   * grows state forever). Duplicates arriving later than `watermark`
   * are NOT caught — the batch-side exact dedup (Dedup.exact) is the
   * backstop, same contract as any streaming/batch lambda split.
   */
  def dedupStream(events: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Streaming curation — the stream-side twin of the batch
   * [[graft.pipeline.CurationTransformer]] stages that are PURE
   * per-row functions (quality score, repetition ratio, language id,
   * token count, fingerprint: all codegen'd columns, so they run
   * unchanged on a stream) composed with the one stateful stage that
   * has a streaming formulation: watermarked exact dedup keyed on the
   * CONTENT fingerprint (state bounded by the watermark window; late
   * duplicates are the batch backstop's job — the [[dedupStream]]
   * contract). The stages a stream genuinely cannot run — corpus-wide
   * near-dup candidate generation, k-means/SemDeDup, corpus-statistic
   * model fits — stay batch-side by design: they need global state
   * proportional to the corpus, which is exactly what a bounded
   * streaming state store must not hold. An incremental stream CAN
   * check itself against yesterday's corpus via the persisted
   * [[graft.operators.MinHashIndex]] inside `foreachBatch` — that
   * composition lives at the sink, not in the stream plan.
   */
  def curateStream(docs: DataFrame, tsCol: String, idCol: String,
                   textCol: String, watermark: String = "10 minutes",
                   qualityMin: Double = 0.3,
                   maxRepetition: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions
    docs
      // TWO independent seeded hashes, the Dedup.exact discipline: a
      // single 64-bit fingerprint collision between DISTINCT documents
      // in one watermark window would silently discard one of them
      // (r17 review). UPGRADE NOTE: this widened the dedup state key
      // (was _fp alone) — a query restarting from a pre-r17 checkpoint
      // fails Spark's state-schema compatibility check and needs a
      // fresh checkpoint directory (one-time; the dedup state it loses
      // is at most one watermark window, re-covered by the batch
      // backstop).
      .withColumn("_fp", TextFunctions.fingerprint(col(textCol)))
      .withColumn("_fp2", TextFunctions.fingerprint(col(textCol), seed = 7))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_fp", "_fp2"))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("repetition", round(TextFunctions.repetitionRatio(col(textCol)), 4))
      .where(col("quality") >= qualityMin && col("repetition") <= maxRepetition)
      .withColumn("lang_pred", TextFunctions.langId(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCountWs(col(textCol)))
      .drop("_fp", "_fp2")
  }

  /**
   * Streaming incremental near-dedup — the `foreachBatch` composition
   * [[curateStream]]'s scaladoc promises: every micro-batch probes the
   * PERSISTED [[graft.operators.MinHashIndex]] ("has the historical
   * corpus ever seen this document, exactly or nearly?"), keeps only
   * never-seen documents, appends their signatures (so batch N+1
   * probes an index that knows batch N — including earlier batches of
   * the SAME stream run), and hands the fresh rows to `onFresh`
   * (typically a metastore append). State lives in the index parquet,
   * not the streaming state store — the store stays O(0) here while
   * the index grows ~0.5 KB per genuinely-new document, which is what
   * makes this viable on an unbounded stream where any in-store
   * near-dup state would grow with the corpus.
   *
   * At-least-once: a replayed batch re-probes — its docs are now IN
   * the index, so they are dropped, EXCEPT when the crash hit between
   * the append and `onFresh`'s own commit (the [[streamToMetastore]]
   * duplicate-window contract; its batch markers are the fix when
   * `onFresh` is a metastore append). Batch-internal exact duplicates
   * are collapsed here (cheap, one batch-local aggregate); the batch
   * near-dups the index can't see (two near-copies arriving in ONE
   * batch, neither yet indexed) are the documented batch-side
   * backstop's job. The index must exist before the first batch —
   * bootstrap with `MinHashIndex.buildIndex` over the historical
   * corpus (or an empty frame for a cold start).
   */
  def nearDedupStream(docs: DataFrame, idCol: String, textCol: String,
                      indexPath: String, checkpoint: String,
                      threshold: Double = 0.8, shingleSize: Int = 3,
                      k: Int = 64, bands: Int = 16)
                     (onFresh: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val deduped = graft.operators.Dedup.exact(batch, textCol, idCol)
          // onFresh COMMITS BEFORE the index append (r17 review): with
          // the old order, a crash between the append and onFresh made
          // the replay re-probe an index that already knew the docs —
          // empty fresh set, documents silently LOST. Commit-then-
          // append converts the same crash into detectable duplicates,
          // the loss-vs-duplicates choice streamToMetastore documents.
          graft.operators.MinHashIndex.appendNewDocs(
            deduped, textCol, idCol, indexPath, threshold, shingleSize, k, bands,
            beforeAppend = fresh => onFresh(fresh, batchId))
          ()
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * Streaming summary sketches: every micro-batch appends ONE sketch
   * row per group (HLL distinct + KLL values, a few KB) to a summary
   * table — the stream-side producer for [[graft.pipeline
   * .SummaryQueries]]-style range merges. Because both sketches are
   * mergeable, per-BATCH rows are just a finer-grained partition of
   * the same summary: a dashboard unions whatever rows exist, and a
   * periodic batch job can roll batches up into dailies
   * (`SketchAnalytics.mergeSketches`) without touching data. State
   * lives in the summary table, not the streaming store — the
   * aggregation inside each batch is a plain bounded batch aggregate.
   * Each batch OVERWRITES its own `batch_id=<id>` partition directory,
   * so a checkpoint replay (foreachBatch is at-least-once) rewrites
   * the same rows instead of appending duplicates — exactly-once
   * summary rows without a transaction log.
   */
  def summarySketchStream(docs: DataFrame, checkpoint: String,
                          distinctCol: String, valueCol: String,
                          groupCols: Seq[String], summaryPath: String,
                          lgK: Int = 12, kllK: Int = 200): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.expr.GraftFunctions.ensure(batch.sparkSession)
          val aggs = Seq(
            hll_sketch_agg(col(distinctCol), lit(lgK)).as("distinct_sketch"),
            graft.expr.GraftFunctions.kllSketchAgg(col(valueCol), kllK).as("value_sketch"))
          val grouped =
            if (groupCols.isEmpty) batch.agg(aggs.head, aggs.tail: _*)
            else batch.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
          // batch_id comes back as a partition column on read; the
          // overwrite makes a replayed batch idempotent
          grouped.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$summaryPath/batch_id=$batchId")
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * Stream → metastore: each micro-batch appends into the ByDay
   * table's info-date partitions derived from the event-time column
   * (a batch spanning midnight lands in both days). Downstream batch
   * pipelines read the table through the normal partition-pruned
   * metastore API.
   *
   * Delivery contract — at-least-once with a NARROW duplicate window,
   * not exactly-once: the per-batch marker makes checkpoint-driven
   * replays (the common restart path) idempotent, but a crash in the
   * instant between the completed append and the marker write replays
   * that one batch and appends it twice. A plain parquet directory
   * has no transaction that could close this window (the append and
   * the marker are separate FS operations); upgrading the table to
   * `DataFormat.Delta` and doing marker-plus-data in one transactional
   * commit is the exactly-once path.
   */
  def streamToMetastore(stream: DataFrame, metastore: graft.meta.Metastore,
                        table: String, tsCol: String,
                        checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // marker BEFORE means a crash mid-append drops the batch (data
        // loss); marker AFTER means a crash post-append duplicates it.
        // Loss is unrecoverable, duplicates are detectable/dedupable —
        // so the marker goes after.
        if (!batch.isEmpty && !metastore.batchCommitted(table, batchId)) {
          metastore.appendTable(table, batch, tsCol)
          metastore.markBatchCommitted(table, batchId)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Run a streaming query into an in-memory table until input drains
   * (local smoke path; production would target parquet/kafka). */
  def runToMemory(agg: DataFrame, name: String, mode: String = "update"): StreamingQuery = {
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }

  /**
   * Kafka source/sink configuration plumbing
   * (reference: pramen/extras .../extras/source/KafkaAvroSource.scala,
   * extras/sink/KafkaAvroSink.scala). No broker exists in this
   * environment; `toKafkaFrame` produces the exact (key, value,
   * topic) frame `format("kafka")` requires, and `kafkaReadOptions`
   * the reader config — the transport call is the only untested line.
   */
  final case class KafkaConfig(bootstrapServers: String, topic: String,
                               options: Map[String, String] = Map.empty)

  def kafkaReadOptions(cfg: KafkaConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topic,
      "startingOffsets" -> "earliest") ++ cfg.options

  /** Serialize a DataFrame to the kafka writer frame (JSON values). */
  def toKafkaFrame(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** Decode a kafka reader frame's JSON `value` back into typed
    * columns (inverse of [[toKafkaFrame]]); rows that fail to parse
    * surface as nulls for inspection rather than vanishing. */
  def fromKafkaFrame(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("value").cast("string"), schema).as("_r")).select(col("_r.*"))
}
