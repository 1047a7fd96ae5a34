package graft.pipeline

import graft.meta.MetastoreReader
import graft.operators.Validate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, size}

import java.time.LocalDate

/**
 * Config-runnable data-quality gate over one metastore table — the
 * validation stage an ingestion pipeline puts between a raw landing
 * table and everything downstream.
 *
 * Options:
 *   `input.table`      (required)
 *   `rule.<name>`      one per rule: a SQL boolean, TRUE = valid
 *                      (e.g. `rule.has_id = "doc_id IS NOT NULL"`);
 *                      a NULL verdict counts as a violation
 *   `mode`             `annotate` (default: rows + `violations`
 *                      column), `filter` (valid rows only), or
 *                      `fail` (valid rows only, but the task FAILS
 *                      when the bad fraction exceeds the breaker)
 *   `max.bad.fraction` default 0.0 — the `fail` circuit breaker: a
 *                      broken upstream produces 40% bad rows, not
 *                      0.4%, and loading that day silently is worse
 *                      than failing it loudly for re-delivery
 *
 * A typo'd rule expression fails at VALIDATE time (config parse of
 * the SQL), not mid-run.
 */
final class ValidationTransformer extends Transformer {

  private def rules(options: Map[String, String]): Seq[Validate.Rule] =
    options.toSeq
      .filter(_._1.startsWith("rule."))
      .sortBy(_._1)
      .map { case (k, sql) =>
        // Spark 4's functions.expr defers parsing to analysis; parse
        // NOW so a typo'd rule is a validate-time NotReady, not a
        // mid-run analysis exception
        org.apache.spark.sql.SparkSession.active.sessionState.sqlParser
          .parseExpression(sql)
        Validate.Rule(k.stripPrefix("rule."), expr(sql))
      }

  override def validate(ms: MetastoreReader, infoDate: LocalDate,
                        options: Map[String, String]): Reason =
    if (!options.contains("input.table"))
      Reason.NotReady("option 'input.table' is required")
    else if (!options.keys.exists(_.startsWith("rule.")))
      Reason.NotReady("at least one 'rule.<name>' option is required")
    else
      try { rules(options); Reason.Ready }
      catch {
        case e: Exception =>
          Reason.NotReady(s"unparseable rule expression: ${e.getMessage}")
      }

  override def run(ms: MetastoreReader, infoDate: LocalDate,
                   options: Map[String, String]): DataFrame = {
    val df = ms.getTable(options("input.table"), Some(infoDate), Some(infoDate))
    val rs = rules(options)
    options.getOrElse("mode", "annotate") match {
      case "annotate" => Validate.annotate(df, rs)
      case "filter" => Validate.split(df, rs)._1
      case "fail" =>
        val maxBad = options.getOrElse("max.bad.fraction", "0.0").toDouble
        val annotated = Validate.annotate(df, rs).cache()
        try {
          val counts = annotated.agg(
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.when(size(col("violations")) > 0, 1L)
                .otherwise(0L))).head()
          val total = counts.getLong(0)
          val bad = if (counts.isNullAt(1)) 0L else counts.getLong(1)
          if (total > 0 && bad.toDouble / total > maxBad)
            throw new IllegalStateException(
              f"validation breaker tripped: $bad of $total rows " +
                f"(${bad.toDouble / total}%.4f) exceed max.bad.fraction=$maxBad — " +
                "failing the task so the partition re-delivers instead of loading bad data")
          // materialized result: the cache must not be re-derived after unpersist
          annotated.where(size(col("violations")) === 0).drop("violations")
            .localCheckpoint(true)
        } finally annotated.unpersist()
      case other =>
        throw new IllegalArgumentException(
          s"validation mode must be annotate|filter|fail, got '$other'")
    }
  }
}
