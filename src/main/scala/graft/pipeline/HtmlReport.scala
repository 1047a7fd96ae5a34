package graft.pipeline

import graft.meta.FieldChange

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, ZoneOffset}

/**
 * HTML end-of-run report: the formatted operator-facing counterpart of
 * the plain-text [[RunReport]]
 * (reference: pramen/core .../core/notify/pipeline/PipelineNotificationBuilderHtml.scala
 * and core/src/main/resources/email_template/ — the reference renders
 * the same sections into an email body; graft renders a standalone
 * document and hands it to a pluggable transport, SMTP itself being
 * out of scope in this zero-egress environment).
 *
 * Sections, in order: status banner, run header (pipeline,
 * environment, run date, Spark application id), execution info
 * (started / finished / elapsed), per-task table with row status
 * colors, exception blocks for failed tasks (full stack trace in
 * `<pre>`), schema-difference tables, custom notification entries,
 * signature. Everything user-originated is HTML-escaped; custom
 * entries render in `<pre>` so NotificationBuilder's aligned text
 * tables survive.
 *
 * Pure string/layout code — no I/O, no clock reads (timestamps come
 * from [[PipelineInfo]]), so output is byte-deterministic and
 * golden-file testable.
 */
object HtmlReport {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss 'UTC'")

  private[pipeline] def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def fmtTs(ms: Long): String =
    Instant.ofEpochMilli(ms).atZone(ZoneOffset.UTC).format(tsFmt)

  private def fmtElapsed(ms: Long): String = {
    val s = ms / 1000
    if (s < 60) s"$s s"
    else if (s < 3600) f"${s / 60}%d m ${s % 60}%02d s"
    else f"${s / 3600}%d h ${(s % 3600) / 60}%02d m"
  }

  private def statusColor(status: String): String = status match {
    case "SUCCESS" => "#2e7d32"
    case "WARNING" => "#b26a00"
    case "FAILED" => "#c62828"
    case _ => "#546e7a" // SKIPPED / NOT READY
  }

  /** Render the full HTML document. `schemaChanges` entries are
    * (table, infoDate, field changes) — feed `Metastore.schemaChanges`
    * output for the pipeline's tables. */
  def render(info: PipelineInfo, results: Seq[TaskResult],
             customEntries: Seq[String] = Nil,
             schemaChanges: Seq[(String, LocalDate, Seq[FieldChange])] = Nil): String =
    renderTyped(info, results,
      customEntries.map(NotificationEntry.Unformatted.apply), schemaChanges)

  private def styleAttr(s: NotificationEntry.Style): String = {
    import NotificationEntry.Style._
    s match {
      case Normal => ""
      case Bold => """ style="font-weight:bold""""
      case Success => """ style="color:#2e7d32;font-weight:bold""""
      case Warning => """ style="color:#b26a00;font-weight:bold""""
      case Error => """ style="color:#c62828;font-weight:bold""""
    }
  }

  /** Typed-entry variant: styled paragraphs, native tables, lists,
    * raw HTML blocks and an attachments listing (the bytes travel via
    * the transport's `sendAttachment`). `Unformatted` entries render
    * byte-identically to the legacy string path. */
  def renderTyped(info: PipelineInfo, results: Seq[TaskResult],
                  entries: Seq[NotificationEntry],
                  schemaChanges: Seq[(String, LocalDate, Seq[FieldChange])] = Nil): String = {
    val customEntries = entries
    val report = RunReport.build(info.pipelineName, results, info.runDate)
    val banner = info.status match {
      case "failed" => ("Pipeline FAILED", "#c62828")
      case "warning" => ("Pipeline succeeded with warnings", "#b26a00")
      case _ => ("Pipeline succeeded", "#2e7d32")
    }

    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"utf-8\"/>\n"
    sb ++= s"<title>${escape(report.subject)}</title>\n"
    sb ++= """<style>
             |body { font-family: sans-serif; margin: 16px; color: #212121; }
             |table { border-collapse: collapse; margin: 8px 0; }
             |th, td { border: 1px solid #b0bec5; padding: 4px 10px; text-align: left; }
             |th { background: #eceff1; }
             |pre { background: #f5f5f5; padding: 8px; overflow-x: auto; }
             |.banner { padding: 10px 14px; color: #fff; font-size: 1.2em; font-weight: bold; }
             |.kv td:first-child { font-weight: bold; background: #eceff1; }
             |</style>
             |""".stripMargin
    sb ++= "</head>\n<body>\n"

    // ── status banner + run header ──
    sb ++= s"""<div class="banner" style="background:${banner._2}">${escape(banner._1)}</div>\n"""
    sb ++= "<table class=\"kv\">\n"
    sb ++= s"<tr><td>Pipeline</td><td>${escape(info.pipelineName)}</td></tr>\n"
    sb ++= s"<tr><td>Environment</td><td>${escape(info.environment)}</td></tr>\n"
    sb ++= s"<tr><td>Run date</td><td>${info.runDate}</td></tr>\n"
    info.sparkApplicationId.foreach(id =>
      sb ++= s"<tr><td>Spark application</td><td>${escape(id)}</td></tr>\n")
    sb ++= "</table>\n"

    // ── execution info ──
    sb ++= "<h3>Execution</h3>\n<table class=\"kv\">\n"
    sb ++= s"<tr><td>Started</td><td>${fmtTs(info.startedAtMs)}</td></tr>\n"
    sb ++= s"<tr><td>Finished</td><td>${fmtTs(info.finishedAtMs)}</td></tr>\n"
    sb ++= s"<tr><td>Elapsed</td><td>${fmtElapsed(info.finishedAtMs - info.startedAtMs)}</td></tr>\n"
    sb ++= s"<tr><td>Tasks</td><td>${report.succeeded} ok, ${report.failed} failed, " +
      s"${report.skipped} skipped, ${report.notReady} not ready</td></tr>\n"
    sb ++= "</table>\n"

    // ── task table ──
    sb ++= "<h3>Tasks</h3>\n<table>\n<tr><th>Job</th><th>Status</th><th>Detail</th></tr>\n"
    report.lines.foreach { l =>
      sb ++= s"""<tr><td>${escape(l.job)}</td><td style="color:${statusColor(l.status)};""" +
        s"""font-weight:bold">${escape(l.status)}</td><td>${escape(l.detail)}</td></tr>\n"""
    }
    sb ++= "</table>\n"

    // ── exception blocks (failed tasks, then the pipeline-level one) ──
    val failures = results.collect { case TaskResult.Failed(j, e) => (j, e) }
    if (failures.nonEmpty || info.failureException.nonEmpty) {
      sb ++= "<h3>Failures</h3>\n"
      failures.foreach { case (job, e) =>
        sb ++= s"<h4>Job ${escape(job)}</h4>\n<pre>${escape(stackTraceOf(e))}</pre>\n"
      }
      info.failureException.foreach(e =>
        sb ++= s"<h4>Pipeline</h4>\n<pre>${escape(stackTraceOf(e))}</pre>\n")
    }

    // ── schema differences ──
    if (schemaChanges.nonEmpty) {
      sb ++= "<h3>Schema changes</h3>\n"
      schemaChanges.foreach { case (table, date, changes) =>
        sb ++= s"<h4>${escape(table)} @ $date</h4>\n"
        sb ++= "<table>\n<tr><th>Change</th><th>Field</th><th>Type</th></tr>\n"
        changes.foreach {
          case FieldChange.Added(n, t) =>
            sb ++= s"<tr><td>added</td><td>${escape(n)}</td><td>${escape(t)}</td></tr>\n"
          case FieldChange.Removed(n, t) =>
            sb ++= s"<tr><td>removed</td><td>${escape(n)}</td><td>${escape(t)}</td></tr>\n"
          case FieldChange.TypeChanged(n, o, nw) =>
            sb ++= s"<tr><td>type changed</td><td>${escape(n)}</td>" +
              s"<td>${escape(o)} &rarr; ${escape(nw)}</td></tr>\n"
        }
        sb ++= "</table>\n"
      }
    }

    // ── custom entries (NotificationBuilder) ──
    if (customEntries.nonEmpty) {
      import NotificationEntry._
      sb ++= "<h3>Notifications</h3>\n"
      customEntries.foreach {
        case Unformatted(t) => sb ++= s"<pre>${escape(t)}</pre>\n"
        case Paragraph(spans) =>
          sb ++= "<p>" + spans.map(s =>
            s"<span${styleAttr(s.style)}>${escape(s.text)}</span>").mkString + "</p>\n"
        case Table(headers, rows, desc) =>
          sb ++= "<table>\n"
          if (desc.nonEmpty) sb ++= s"<caption>${escape(desc)}</caption>\n"
          if (headers.nonEmpty)
            sb ++= headers.map(h => s"<th>${escape(h)}</th>").mkString("<tr>", "", "</tr>\n")
          rows.foreach(r =>
            sb ++= r.map(c => s"<td>${escape(c)}</td>").mkString("<tr>", "", "</tr>\n"))
          sb ++= "</table>\n"
        case UnorderedList(items) =>
          sb ++= items.map(i => s"<li>${escape(i)}</li>").mkString("<ul>\n", "\n", "\n</ul>\n")
        case Html(content) => sb ++= content + "\n" // caller-vouched raw block
        case AttachedFile(name, contents) =>
          sb ++= s"<p>Attachment: <b>${escape(name)}</b> (${contents.length} bytes)</p>\n"
      }
    }

    sb ++= "<hr/>\n<p style=\"color:#78909c\">Generated by graft pipeline runner</p>\n"
    sb ++= "</body>\n</html>\n"
    sb.toString
  }

  private def stackTraceOf(e: Throwable): String = {
    val sw = new java.io.StringWriter()
    e.printStackTrace(new java.io.PrintWriter(sw))
    sw.toString.stripLineEnd
  }
}

/** Transport for rendered HTML reports. SMTP delivery is deliberately
  * stubbed in this environment — [[FileHtmlTransport]] writes the
  * document where an operator (or a mail relay side-car) picks it up. */
trait HtmlTransport {
  def send(subject: String, html: String): Unit
  /** Deliver one attached file alongside the report (reference:
    * Sendable's MIME attachments). Default no-op — transports that
    * cannot carry files (the raw-socket SMTP body) list attachments in
    * the report text only; the file transport writes them. */
  def sendAttachment(fileName: String, contents: Array[Byte]): Unit = ()
}

/** Writes each report as an .html file into `dir` (atomic rename, so a
  * half-written report is never picked up). */
final class FileHtmlTransport(dir: String) extends HtmlTransport {
  private def atomically(name: String)(write: java.nio.file.Path => Unit): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val tmp = d.resolve(s".$name.tmp")
    write(tmp)
    java.nio.file.Files.move(tmp, d.resolve(name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def safe(s: String): String = s.replaceAll("[^A-Za-z0-9._-]+", "_").take(120)

  /** Degenerate names would escape or vanish: "." / ".." are path
    * navigation, a dot-prefixed name looks like this class's own
    * half-written tmp files (a relay side-car skipping dotfiles would
    * never deliver it), empty is unaddressable. */
  private def safeAttachment(s: String): String = {
    val base = safe(s)
    // a prefix (not a strip) keeps distinct degenerate inputs distinct:
    // "attachment_.." is a legal file name, only the exact "."/".."
    // components navigate
    if (base.isEmpty || base.startsWith(".")) s"attachment_$base" else base
  }

  override def send(subject: String, html: String): Unit =
    atomically(s"${safe(subject)}.html")(tmp => java.nio.file.Files.writeString(tmp, html))

  /** Attachments land next to the report, same atomic-rename contract. */
  override def sendAttachment(fileName: String, contents: Array[Byte]): Unit =
    atomically(safeAttachment(fileName))(tmp => java.nio.file.Files.write(tmp, contents))
}

private[pipeline] object AttachmentDelivery {
  /** Ship every AttachedFile entry through one transport. Failures
    * must not kill the report (it already went out) but MUST be
    * visible — the report lists the attachment by name, and a silent
    * drop leaves the operator hunting for a file that never existed. */
  def send(transport: HtmlTransport, entries: Seq[NotificationEntry]): Unit =
    entries.foreach {
      case NotificationEntry.AttachedFile(name, bytes) =>
        try transport.sendAttachment(name, bytes)
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft] attachment '$name' not delivered: ${e.getMessage}")
        }
      case _ => ()
    }
}

/** Pipeline notification target that renders the HTML report on
  * completion and hands it to the transport, draining the
  * NotificationBuilder's custom entries like [[ReportingNotifier]]
  * does for the text report. */
final class HtmlReportingNotifier(
    transport: HtmlTransport,
    builder: NotificationBuilder = NotificationBuilder.global,
    schemaChanges: () => Seq[(String, LocalDate, Seq[FieldChange])] = () => Nil)
  extends PipelineNotificationTarget {
  override def onPipelineCompletedInfo(info: PipelineInfo, results: Seq[TaskResult]): Unit = {
    val subject = RunReport.build(info.pipelineName, results, info.runDate).subject
    val entries = builder.drainEntries()
    // a failing transport (dead SMTP relay) must not FAIL a pipeline
    // whose tasks all succeeded — the orchestrator invokes notifiers
    // unguarded, and the drained entries are already consumed, so a
    // propagated throw both kills the run and loses the entries for
    // any retry (r17 review; the fanout notifier guards identically)
    scala.util.Try(transport.send(subject,
      HtmlReport.renderTyped(info, results, entries, schemaChanges()))) match {
      case scala.util.Success(_) => AttachmentDelivery.send(transport, entries)
      case scala.util.Failure(e) =>
        System.err.println(s"[graft] report not delivered via ${transport.getClass.getSimpleName}: ${e.getMessage}")
    }
  }
}

/** Renders the report ONCE and fans it out to every transport the
  * run's status selects. Two separate [[HtmlReportingNotifier]]s each
  * drain the NotificationBuilder — whichever ran first would consume
  * the custom entries and the other would silently render without
  * them, so a file+SMTP configuration must share one drain/render. */
final class FanoutHtmlReportNotifier(
    transportsFor: (PipelineInfo, Seq[TaskResult]) => Seq[HtmlTransport],
    builder: NotificationBuilder = NotificationBuilder.global,
    schemaChanges: () => Seq[(String, LocalDate, Seq[FieldChange])] = () => Nil)
  extends PipelineNotificationTarget {
  override def onPipelineCompletedInfo(info: PipelineInfo, results: Seq[TaskResult]): Unit = {
    val transports = transportsFor(info, results)
    if (transports.nonEmpty) {
      val subject = RunReport.build(info.pipelineName, results, info.runDate).subject
      val entries = builder.drainEntries()
      val html = HtmlReport.renderTyped(info, results, entries, schemaChanges())
      // a failing transport (dead SMTP relay) must not stop the others
      // (the file report is the operator's fallback) — but the failure
      // must be visible, and shipping attachments through a transport
      // whose report send just failed only compounds the noise
      transports.foreach { t =>
        scala.util.Try(t.send(subject, html)) match {
          case scala.util.Success(_) => AttachmentDelivery.send(t, entries)
          case scala.util.Failure(e) =>
            System.err.println(s"[graft] report not delivered via ${t.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }
}
