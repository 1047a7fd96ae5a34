package graft.pipeline

import java.time.LocalDate

/**
 * Pipeline completion notifications
 * (reference: pramen/api .../api/NotificationTarget.scala,
 * core/notify — graft ships console/log and collecting targets; the
 * reference's email transport is out of scope in this environment, the
 * hook surface is the same).
 */
trait PipelineNotificationTarget {
  def onTaskCompleted(result: TaskResult, runDate: LocalDate): Unit = ()
  def onPipelineCompleted(results: Seq[TaskResult], runDate: LocalDate): Unit = ()
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
    case TaskResult.Succeeded(j, t, d, n) => s"job '$j' OK → $t@$d ($n records)"
    case TaskResult.Skipped(j, why)       => s"job '$j' skipped: $why"
    case TaskResult.NotReady(j, why)      => s"job '$j' not ready: $why"
    case TaskResult.Failed(j, e)          => s"job '$j' FAILED: ${e.getMessage}"
  }
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
