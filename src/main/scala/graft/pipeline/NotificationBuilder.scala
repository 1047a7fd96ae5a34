package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Custom notification entries from user code — sources, transformers
 * and sinks append free-form entries (or small rendered tables) that
 * the end-of-run report carries to operators
 * (reference: pramen/api .../api/NotificationBuilder.scala, accessed
 * as `Pramen.instance.notificationBuilder`; graft's counterpart is
 * `NotificationBuilder.global`).
 *
 * Thread-safe: pipeline jobs run concurrently, so entries append
 * under a lock; group one logical notification into a single call.
 * DataFrame tables are rendered AT CALL TIME (a `take(maxRecords)`
 * job) — holding live DataFrames until report time would pin lineage
 * and re-execute plans after their inputs may have changed.
 */
final class NotificationBuilder {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[NotificationEntry]

  def addEntries(entries: String*): Unit = synchronized {
    buf ++= entries.map(NotificationEntry.Unformatted.apply)
  }

  /** Typed entries — styled paragraphs, tables, raw HTML, attachments
    * (reference: api NotificationBuilder takes NotificationEntry*). */
  def addTypedEntries(entries: NotificationEntry*): Unit = synchronized { buf ++= entries }

  /** Render the first `maxRecords` rows as an aligned text table under
    * `description`. */
  def addDataFrameTable(df: DataFrame, description: String, maxRecords: Int = 10): Unit = {
    val cols = df.columns
    val rows = df.take(maxRecords).map(r =>
      cols.indices.map(i => String.valueOf(r.get(i))).toSeq)
    val widths = cols.indices.map(i =>
      (cols(i).length +: rows.map(_(i).length)).max)
    def line(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString("  ")
    val rendered = (line(cols.toSeq) +: rows.map(line)).mkString("\n")
    synchronized { buf += NotificationEntry.Unformatted(s"$description\n$rendered") }
  }

  /** Remove and return everything accumulated so far, flattened to
    * text (the text report builder drains once per pipeline run). */
  def drain(): Seq[String] = drainEntries().map(NotificationEntry.toText)

  /** Remove and return the typed entries (the HTML report path —
    * styles, tables and attachments survive). */
  def drainEntries(): Seq[NotificationEntry] = synchronized {
    val out = buf.toSeq
    buf.clear()
    out
  }
}

object NotificationBuilder {
  /** The instance handed to user code (reference:
    * `Pramen.instance.notificationBuilder` — the same process-global
    * shape). PROCESS-WIDE: when several pipelines share one JVM, the
    * first report to drain takes every pending entry, including
    * another pipeline's. Drivers running concurrent pipelines should
    * construct one `NotificationBuilder` per pipeline and pass it to
    * that pipeline's `ReportingNotifier` and transformers instead. */
  val global: NotificationBuilder = new NotificationBuilder
}
