package graft.pipeline

import java.time.LocalDate
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.concurrent.TrieMap

/** The OS took the process down mid-run (reference: pramen/core
  * .../core/exceptions/OsSignalException.scala) — attached to every
  * in-flight task's Failed result so the report says WHY the task
  * never finished. */
final class PipelineInterruptedException(signalName: String)
  extends RuntimeException(s"pipeline interrupted by $signalName")

/**
 * Graceful-shutdown pipeline state (reference: pramen/core
 * .../core/state/PipelineStateImpl.scala:46 +
 * core/state/PramenSignalHandler.scala:25): when the driver gets
 * SIGINT/SIGTERM mid-run, the operator must still get the end-of-run
 * report — with the in-flight tasks marked FAILED and the reason —
 * and the fleet must not inherit stuck locks or cluster jobs still
 * burning executors.
 *
 * The orchestrator reports task lifecycle into this registry; the
 * CLI runner installs a JVM shutdown hook (which the default
 * SIGINT/SIGTERM handlers run) that calls [[abandon]]. All logic
 * lives in plain methods so specs drive the handler path directly —
 * no real signals needed.
 */
final class PipelineState(
    pipelineName: String,
    environment: String,
    runDate: LocalDate,
    notifiers: Seq[PipelineNotificationTarget],
    customShutdownHook: Option[Runnable] = None) {

  private final case class InFlight(job: String, infoDate: LocalDate,
                                    lock: Option[RunLock], cancelJobGroup: () => Unit)

  private val startedAtMs = System.currentTimeMillis()
  private val inFlight = TrieMap.empty[(String, LocalDate), InFlight]
  private val completed = new java.util.concurrent.ConcurrentLinkedQueue[TaskResult]()
  private val finalized = new AtomicBoolean(false)
  @volatile private var hook: Option[Thread] = None

  /** Task entered its attempt (lock held, Spark jobs about to run). */
  private[pipeline] def taskStarted(job: String, infoDate: LocalDate,
                                    lock: Option[RunLock],
                                    cancelJobGroup: () => Unit): Unit =
    inFlight.put((job, infoDate), InFlight(job, infoDate, lock, cancelJobGroup))

  /** Task produced a result (success, failure, skip — any outcome). */
  private[pipeline] def taskCompleted(result: TaskResult): Unit = completed.add(result)

  /** Task left the attempt path; its lock is already released by the
    * orchestrator's own finally. */
  private[pipeline] def taskEnded(job: String, infoDate: LocalDate): Unit =
    inFlight.remove((job, infoDate))

  /** Normal completion: the orchestrator already notified; the
    * shutdown hook must become a no-op. */
  def pipelineCompleted(): Unit = {
    finalized.set(true)
    hook.foreach(h => scala.util.Try(Runtime.getRuntime.removeShutdownHook(h)))
  }

  /** The signal/shutdown path, exactly once: mark every in-flight task
    * failed, cancel its cluster job group, release its lock, and emit
    * the end-of-run report through ALL notifiers (HTML file included).
    * Every step is isolated — a throwing notifier must not stop lock
    * release, and vice versa. Returns the reported results (empty when
    * the pipeline already completed normally). */
  def abandon(signalName: String): Seq[TaskResult] = {
    if (!finalized.compareAndSet(false, true)) return Seq.empty
    val cause = new PipelineInterruptedException(signalName)
    val abandoned = inFlight.values.toSeq.sortBy(t => (t.job, t.infoDate.toString)).map { t =>
      scala.util.Try(t.cancelJobGroup())       // stop cluster-side work
      t.lock.foreach(l => scala.util.Try(l.release())) // no stuck locks
      TaskResult.Failed(t.job, cause)
    }
    inFlight.clear()
    val results = {
      import scala.jdk.CollectionConverters._
      completed.iterator().asScala.toSeq ++ abandoned
    }
    val info = PipelineInfo(pipelineName, environment, runDate, startedAtMs,
      System.currentTimeMillis(),
      scala.util.Try(org.apache.spark.sql.SparkSession.active.sparkContext.applicationId).toOption,
      status = "failed", failureException = Some(cause))
    notifiers.foreach(n => scala.util.Try(n.onPipelineCompletedInfo(info, results)))
    runCustomShutdownHook()
    results
  }

  private val customHookRan = new AtomicBoolean(false)

  /** Config-declared shutdown hook (reference: HookConfig.shutdownHook)
    * — exactly once across normal completion and the signal path; a
    * throwing hook must not break either. */
  def runCustomShutdownHook(): Unit =
    if (customHookRan.compareAndSet(false, true))
      customShutdownHook.foreach(h => scala.util.Try(h.run()))

  /** Install the JVM shutdown hook (runs on SIGINT/SIGTERM under the
    * default handlers, and on System.exit). Returns the hook thread
    * for tests; idempotent via [[pipelineCompleted]] / [[abandon]]'s
    * exactly-once gate. */
  def installShutdownHook(): Thread = {
    val t = new Thread(() => { abandon("SIGINT/SIGTERM (JVM shutdown)"); () },
      s"graft-shutdown-$pipelineName")
    Runtime.getRuntime.addShutdownHook(t)
    hook = Some(t)
    t
  }
}
