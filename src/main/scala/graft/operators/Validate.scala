package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Row-level data-quality validation: named boolean rules evaluated in
 * ONE row-local projection (no UDF, no shuffle — every rule is a
 * Catalyst expression, so a hundred rules cost one codegen'd pass),
 * with the three consumption shapes a pipeline needs: annotate
 * (violations travel with the row), split (route bad rows to a
 * quarantine output), and the count-based circuit breaker (fail the
 * task when the bad fraction says the UPSTREAM is broken — a schema
 * drift or source bug produces 40% bad rows, not 0.4%, and loading
 * that day silently is worse than failing it).
 */
object Validate {

  /** A named validity predicate: `expr` is TRUE for valid rows. A
    * null verdict (the usual SQL-null contagion from a null field)
    * counts as a VIOLATION — "unknown" must quarantine, not pass. */
  final case class Rule(name: String, expr: Column)

  /** One `violations: array<string>` column listing the failed rule
    * names (empty array = fully valid; deterministic rule order). */
  def annotate(df: DataFrame, rules: Seq[Rule],
               violationsCol: String = "violations"): DataFrame = {
    require(rules.nonEmpty, "Validate: at least one rule")
    val marks = rules.map(r =>
      when(coalesce(r.expr, lit(false)), lit(null).cast("string")).otherwise(lit(r.name)))
    df.withColumn(violationsCol,
      filter(array(marks: _*), m => m.isNotNull))
  }

  /** (valid rows, quarantine rows annotated with their violations). */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val annotated = annotate(df, rules)
    (annotated.where(size(col("violations")) === 0).drop("violations"),
      annotated.where(size(col("violations")) > 0))
  }

  /** Per-rule violation counts + totals — ONE aggregate job over the
    * marks (longs through the shuffle), the report a run notification
    * embeds. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Validate: at least one rule")
    // synthetic internal aliases: rule names are user input — a dotted
    // name ("min.len", the repo's option-key convention) would be
    // re-parsed as a struct path by col(), and a rule named
    // "total_rows" would collide with the count alias
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(coalesce(r.expr, lit(false)), 0L).otherwise(1L)).as(s"_r$i")
    }
    val wide = df.agg(count(lit(1)).as("_total"), aggs: _*)
    // long format: one row per rule, stable order
    val pairs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"_r$i").as("bad_rows"))
    }
    wide.select(col("_total"), explode(array(pairs: _*)).as("_e"))
      .select(col("_e.rule").as("rule"), col("_e.bad_rows").as("bad_rows"),
        col("_total").as("total_rows"))
  }
}
