package graft.pipeline

import java.time.LocalDate

/**
 * Pipeline completion notifications
 * (reference: pramen/api .../api/NotificationTarget.scala,
 * core/notify — graft ships console/log and collecting targets; the
 * reference's email transport is out of scope in this environment, the
 * hook surface is the same).
 */
/** Pipeline-level execution context handed to notification targets
  * (reference: pramen/api .../api/PipelineInfo.scala — trimmed to the
  * fields this environment can populate honestly). */
final case class PipelineInfo(
    pipelineName: String,
    environment: String,
    runDate: LocalDate,
    startedAtMs: Long,
    finishedAtMs: Long,
    sparkApplicationId: Option[String],
    /** "succeeded" | "failed" | "warning" (succeeded with warnings) */
    status: String,
    failureException: Option[Throwable])

trait PipelineNotificationTarget {
  def onTaskCompleted(result: TaskResult, runDate: LocalDate): Unit = ()
  def onPipelineCompleted(results: Seq[TaskResult], runDate: LocalDate): Unit = ()
  /** Rich completion hook with pipeline context; the default delegates
    * to the plain hook so existing targets keep working. */
  def onPipelineCompletedInfo(info: PipelineInfo, results: Seq[TaskResult]): Unit =
    onPipelineCompleted(results, info.runDate)
}

/** Logs task and pipeline outcomes to stderr. */
final class ConsoleNotifier extends PipelineNotificationTarget {
  override def onTaskCompleted(result: TaskResult, runDate: LocalDate): Unit =
    System.err.println(s"[graft] $runDate ${describe(result)}")

  override def onPipelineCompleted(results: Seq[TaskResult], runDate: LocalDate): Unit = {
    val ok = results.count(_.isInstanceOf[TaskResult.Succeeded])
    System.err.println(s"[graft] pipeline for $runDate done: $ok/${results.size} succeeded")
  }

  private def describe(r: TaskResult): String = r match {
    case TaskResult.Succeeded(j, t, d, n, ws) =>
      val w = if (ws.isEmpty) "" else s" [warnings: ${ws.mkString("; ")}]"
      s"job '$j' OK → $t@$d ($n records)$w"
    case TaskResult.Skipped(j, why)       => s"job '$j' skipped: $why"
    case TaskResult.NotReady(j, why)      => s"job '$j' not ready: $why"
    case TaskResult.Failed(j, e)          => s"job '$j' FAILED: ${e.getMessage}"
  }
}

/**
 * Structured end-of-pipeline report with per-task failure details
 * (reference: pramen/core .../core/notify/PipelineNotificationBuilderHtml.scala,
 * core/notify/Sendable.scala — graft renders a plain-text message and
 * hands it to a pluggable transport; SMTP itself is out of scope in
 * this zero-egress environment, the rendering + hand-off surface is
 * the reference's).
 */
object RunReport {
  final case class Line(job: String, status: String, detail: String)
  final case class Report(subject: String, lines: Seq[Line], body: String,
                          succeeded: Int, failed: Int, skipped: Int, notReady: Int)

  def build(pipelineName: String, results: Seq[TaskResult], runDate: LocalDate,
            customEntries: Seq[String] = Nil): Report = {
    val lines = results.map {
      case TaskResult.Succeeded(j, t, d, n, ws) =>
        val w = if (ws.isEmpty) "" else s" — warnings: ${ws.mkString("; ")}"
        Line(j, if (ws.isEmpty) "SUCCESS" else "WARNING", s"$t@$d: $n records$w")
      case TaskResult.Skipped(j, why)       => Line(j, "SKIPPED", why)
      case TaskResult.NotReady(j, why)      => Line(j, "NOT READY", why)
      case TaskResult.Failed(j, e)          =>
        // failure detail: exception class, message, and the topmost
        // in-repo stack frame — what an operator needs at 3am
        val frame = e.getStackTrace.headOption.map(f => s" at $f").getOrElse("")
        Line(j, "FAILED", s"${e.getClass.getSimpleName}: ${e.getMessage}$frame")
    }
    // WARNING is a success with attached warnings, not a failure class
    val nOk = lines.count(l => l.status == "SUCCESS" || l.status == "WARNING")
    val nFail = lines.count(_.status == "FAILED")
    val nSkip = lines.count(_.status == "SKIPPED")
    val nNr = lines.count(_.status == "NOT READY")
    val verdict = if (nFail > 0) "FAILED" else "succeeded"
    val subject = s"Pipeline '$pipelineName' $verdict for $runDate " +
      s"($nOk ok, $nFail failed, $nSkip skipped, $nNr not ready)"
    val custom =
      if (customEntries.isEmpty) Nil
      else "" +: "Custom notifications:" +: customEntries.map(e => "  " + e.replace("\n", "\n  "))
    val body = ((subject +: "" +: lines.map(l => f"  ${l.status}%-9s ${l.job}%-24s ${l.detail}"))
      ++ custom).mkString("\n")
    Report(subject, lines, body, nOk, nFail, nSkip, nNr)
  }
}

/** Recipient-list validation result (reference: pramen/core
  * .../core/notify/pipeline/ValidatedEmails.scala). */
final case class ValidatedEmails(valid: Seq[String],
                                 invalidFormat: Seq[String],
                                 invalidDomain: Seq[String])

/** Recipient-list validation for notification config (reference:
  * pramen/core .../core/notify/pipeline/PipelineNotificationEmail.scala
  * — same contract: `,`/`;`-separated list, one-`@` well-formedness,
  * optional allow-listed domains with or without a leading `@`).
  * Invalid entries are REPORTED, not dropped silently — a typo'd
  * on-call address that vanishes without trace is how outage mail
  * goes nowhere for months. */
object EmailValidation {
  def validate(emails: String, allowedDomains: Seq[String] = Nil): ValidatedEmails = {
    val domains = allowedDomains.map(_.trim.toLowerCase.stripPrefix("@"))
    val (wellFormed, badFormat) = emails.split("[,;]").map(_.trim).filter(_.nonEmpty)
      .toSeq.partition(_.matches("^[^@\\s]+@[^@\\s]+$"))
    // subdomains of an allowed domain pass too: allowing acme.com must
    // not reject ops@mail.acme.com (exact-suffix match on a dot
    // boundary, so acme.com never admits evilacme.com)
    val (allowed, badDomain) = wellFormed.partition { e =>
      val dom = e.split("@").last.toLowerCase
      domains.isEmpty || domains.exists(d => dom == d || dom.endsWith("." + d))
    }
    ValidatedEmails(allowed, badFormat, badDomain)
  }
}

/** Transport for rendered reports (console default; swap for SMTP/webhook). */
trait ReportTransport { def send(report: RunReport.Report): Unit }

/** Renders the end-of-run report with failure details and hands it to
  * the transport. */
final class ReportingNotifier(pipelineName: String,
                              transport: ReportTransport = r => System.err.println(r.body),
                              builder: NotificationBuilder = NotificationBuilder.global)
    extends PipelineNotificationTarget {
  override def onPipelineCompleted(results: Seq[TaskResult], runDate: LocalDate): Unit =
    transport.send(RunReport.build(pipelineName, results, runDate, builder.drain()))
}

/** Collects notifications in memory (tests, programmatic consumers). */
final class CollectingNotifier extends PipelineNotificationTarget {
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[TaskResult]()
  @volatile private var pipelineRuns: List[Seq[TaskResult]] = Nil

  override def onTaskCompleted(result: TaskResult, runDate: LocalDate): Unit = buf.add(result)
  override def onPipelineCompleted(results: Seq[TaskResult], runDate: LocalDate): Unit =
    synchronized { pipelineRuns = pipelineRuns :+ results }

  def tasks: Seq[TaskResult] = buf.toArray(Array.empty[TaskResult]).toSeq
  def pipelines: Seq[Seq[TaskResult]] = pipelineRuns
}
