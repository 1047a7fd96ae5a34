package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

/**
 * One task-completion event as seen by operations — the append-only
 * audit log behind "what did the pipeline do last night and why"
 * (reference: pramen/core .../core/journal/Journal.scala,
 * journal/model/TaskCompleted.scala — the Hadoop-FS variant's
 * semantics; JDBC/Mongo/DynamoDB backends are out of scope here).
 *
 * Unlike the [[Bookkeeper]] (latest state per (table, infoDate),
 * drives skip-if-done), the journal keeps EVERY event: re-runs,
 * failures and skips all stay visible in order.
 */
final case class TaskEvent(
    pipeline: String,
    job: String,
    table: String,
    infoDate: Option[LocalDate],
    status: String,       // "succeeded" | "failed" | "skipped" | "not_ready"
    records: Long,
    detail: String,       // warnings / failure message / skip reason
    atMs: Long)

/**
 * Storage-agnostic journal surface (reference: core/journal/Journal.scala
 * — the reference keeps JournalHadoopFs/JournalJdbc/JournalMongoDb/
 * JournalDynamoDB behind one trait so the journal always lands in the
 * SAME store as bookkeeping). Implementations: [[Journal]] (FS /
 * in-memory) and [[graft.rdb.JournalJdbc]] (the bookkeeping database).
 */
trait TaskJournal {
  def append(e: TaskEvent): Unit
  /** All events in completion order (cross-writer order after a reload). */
  def all: Seq[TaskEvent]
  /** Events with `atMs` in [fromMs, toMs], completion order —
    * the reference `Journal.getEntries(from, to)` window ("what did
    * the pipeline do last night"). Default filters the full reload;
    * stores with a queryable time column push the window down. */
  def entries(fromMs: Long, toMs: Long): Seq[TaskEvent] =
    all.filter(e => e.atMs >= fromMs && e.atMs <= toMs)
}

/**
 * Append-only task journal persisted as one-JSON-file-per-event with
 * atomic renames — the same shared-FS-safe layout as the Bookkeeper,
 * so concurrent pipelines journaling into one directory can never
 * interleave partial lines. In-memory only when no path is given.
 */
final class Journal(path: Option[String] = None) extends TaskJournal {
  private val events = new java.util.concurrent.ConcurrentLinkedQueue[TaskEvent]()
  private val writerId = java.util.UUID.randomUUID().toString.take(8)
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  path.map(Paths.get(_)).filter(Files.isDirectory(_)).foreach { dir =>
    val stream = Files.list(dir) // must close: holds a directory fd
    try stream.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .toSeq.sortBy(_.getFileName.toString)
      .foreach { f =>
        parseLine(new String(Files.readAllBytes(f), "UTF-8")).foreach(events.add)
      }
    finally stream.close()
  }

  def append(e: TaskEvent): Unit = {
    events.add(e)
    path.foreach { p =>
      val dir = Paths.get(p)
      Files.createDirectories(dir)
      val json =
        s"""{"pipeline":${q(e.pipeline)},"job":${q(e.job)},"table":${q(e.table)},""" +
          s""""infoDate":${q(e.infoDate.map(_.toString).getOrElse(""))},""" +
          s""""status":${q(e.status)},"records":${e.records},""" +
          s""""detail":${q(e.detail)},"atMs":${e.atMs}}"""
      val name = f"${e.atMs}%013d_${writerId}_${seq.getAndIncrement()}%06d.json"
      val tmp = dir.resolve(s".$name.tmp")
      Files.write(tmp, json.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** All events in append order (completion order after a reload). */
  def all: Seq[TaskEvent] = events.asScala.toSeq

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r") + "\""

  /** Single-pass left-to-right JSON-string unescape — sequential
    * global replaces would corrupt e.g. `C:\\network` (the `\\` + `n`
    * must decode to `\` + `n`, not newline). */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case other => sb.append('\\').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseLine(line: String): Option[TaskEvent] = {
    def str(k: String): Option[String] =
      (s""""$k":"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(line)
        .map(m => unescape(m.group(1)))
    def num(k: String): Option[Long] =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(line).map(_.group(1).toLong)
    for {
      p <- str("pipeline"); j <- str("job"); t <- str("table")
      d <- str("infoDate"); s <- str("status"); r <- num("records")
      det <- str("detail"); a <- num("atMs")
    } yield TaskEvent(p, j, t,
      if (d.isEmpty) None else Some(LocalDate.parse(d)), s, r, det, a)
  }
}

/** Feeds the journal from the orchestrator's notification stream —
  * journaling composes with any pipeline rather than needing its own
  * hook point. */
final class JournalNotifier(journal: TaskJournal, pipelineName: String,
                            clock: () => Long = () => System.currentTimeMillis())
    extends PipelineNotificationTarget {
  override def onTaskCompleted(r: TaskResult, runDate: LocalDate): Unit = {
    val e = r match {
      case TaskResult.Succeeded(j, t, d, n, ws) =>
        TaskEvent(pipelineName, j, t, Some(d), "succeeded", n, ws.mkString("; "), clock())
      case TaskResult.Failed(j, err) =>
        TaskEvent(pipelineName, j, "", None, "failed", 0L,
          s"${err.getClass.getSimpleName}: ${err.getMessage}", clock())
      case TaskResult.Skipped(j, why) =>
        TaskEvent(pipelineName, j, "", None, "skipped", 0L, why, clock())
      case TaskResult.NotReady(j, why) =>
        TaskEvent(pipelineName, j, "", None, "not_ready", 0L, why, clock())
    }
    journal.append(e)
  }
}
