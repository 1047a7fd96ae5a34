package graft.pipeline

import graft.functions.TextFunctions
import graft.meta.MetastoreReader
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.time.LocalDate

/**
 * End-to-end training-data curation as ONE config-runnable pipeline
 * stage: exact dedup → quality filter → language annotation → token
 * accounting → deterministic split labels. Composes the operator
 * library the way a production corpus pipeline would — each stage is
 * a narrow declarative transform, so the whole thing is a single
 * Catalyst-planned job (one dedup shuffle; everything else map-side).
 *
 * Options:
 *   `input.table`   (required) metastore table with (id, text) columns
 *   `id.column`     default "doc_id"
 *   `text.column`   default "text"
 *   `quality.min`   default 0.3  — drop docs scoring below
 *   `max.repetition` default 0.5 — drop docs with more repeated lines
 *   `split.weights` default "0.9,0.05,0.05" (train/val/test)
 */
final class CurationTransformer extends Transformer {

  override def validate(ms: MetastoreReader, infoDate: LocalDate,
                        options: Map[String, String]): Reason =
    if (options.contains("input.table")) Reason.Ready
    else Reason.NotReady("option 'input.table' is required")

  override def run(ms: MetastoreReader, infoDate: LocalDate,
                   options: Map[String, String]): DataFrame = {
    val idCol = options.getOrElse("id.column", "doc_id")
    val textCol = options.getOrElse("text.column", "text")
    val qualityMin = options.getOrElse("quality.min", "0.3").toDouble
    val maxRepetition = options.getOrElse("max.repetition", "0.5").toDouble
    val weights = options.getOrElse("split.weights", "0.9,0.05,0.05")
      .split(",").map(_.trim.toDouble).toSeq

    val docs = ms.getTable(options("input.table"), Some(infoDate), Some(infoDate))
    val deduped = Dedup.exact(docs, textCol, idCol)
    val scored = deduped
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("repetition", round(TextFunctions.repetitionRatio(col(textCol)), 4))
      .where(col("quality") >= qualityMin && col("repetition") <= maxRepetition)
      .withColumn("lang_pred", TextFunctions.langId(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCountWs(col(textCol)))
      .withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
    Sampling.withSplitLabel(scored, idCol, weights, Seq("train", "val", "test"))
  }
}
