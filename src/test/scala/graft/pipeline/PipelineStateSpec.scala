package graft.pipeline

import graft.SparkSpec
import graft.meta.{MetaTable, Metastore, MetastoreReader}
import org.apache.spark.sql.DataFrame

import java.time.LocalDate

/** Config-instantiable lifecycle hooks (reference: HookConfig —
  * pramen.hook.{startup,shutdown}.class). */
class FixtureStartupHook extends Runnable {
  override def run(): Unit = FixtureHooks.log.add("startup")
}
class FixtureShutdownHook extends Runnable {
  override def run(): Unit = FixtureHooks.log.add("shutdown")
}
object FixtureHooks {
  val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** Graceful shutdown: the signal path must still emit the end-of-run
  * report, mark in-flight tasks failed, cancel their job groups and
  * release their locks — driven directly (no real signals). */
class PipelineStateSpec extends SparkSpec {
  import spark.implicits._

  private val d = LocalDate.parse("2024-06-15")

  private final class FakeLock extends RunLock {
    @volatile var released = 0
    def tryAcquire(): Boolean = true
    def release(): Unit = released += 1
  }

  private final class InfoCapture extends PipelineNotificationTarget {
    @volatile var infos: List[(PipelineInfo, Seq[TaskResult])] = Nil
    override def onPipelineCompletedInfo(info: PipelineInfo, results: Seq[TaskResult]): Unit =
      synchronized { infos = infos :+ ((info, results)) }
  }

  test("abandon marks in-flight tasks failed, cancels job groups, releases locks, reports") {
    val htmlDir = java.nio.file.Files.createTempDirectory("shutdown_html_").toString
    val capture = new InfoCapture
    val html = new HtmlReportingNotifier(new FileHtmlTransport(htmlDir))
    val broken = new PipelineNotificationTarget {
      override def onPipelineCompletedInfo(i: PipelineInfo, r: Seq[TaskResult]): Unit =
        sys.error("notifier outage")
    }
    // `broken` FIRST: a throwing notifier must not stop the rest
    val state = new PipelineState("dbshut", "test", d, Seq(broken, capture, html))
    val lock = new FakeLock
    var cancels = 0
    state.taskCompleted(TaskResult.Succeeded("done_job", "t_done", d, 10L, Nil))
    state.taskEnded("done_job", d)
    state.taskStarted("stuck_job", d, Some(lock), () => cancels += 1)

    val reported = state.abandon("SIGTERM (kill)")
    assert(reported.size == 2)
    val failed = reported.collect { case f: TaskResult.Failed => f }
    assert(failed.map(_.job) == Seq("stuck_job"))
    assert(failed.head.error.isInstanceOf[PipelineInterruptedException])
    assert(failed.head.error.getMessage.contains("SIGTERM"), failed.head.error.getMessage)
    assert(cancels == 1, "the in-flight task's job group must be cancelled")
    assert(lock.released == 1, "the in-flight task's lock must be released")
    // the report went out despite the broken notifier
    val (info, results) = capture.infos.head
    assert(info.status == "failed" && info.pipelineName == "dbshut")
    assert(info.failureException.exists(_.isInstanceOf[PipelineInterruptedException]))
    assert(results.exists { case TaskResult.Succeeded(j, _, _, _, _) => j == "done_job"; case _ => false },
      "completed results must appear alongside the abandoned ones")
    val htmlFiles = new java.io.File(htmlDir).listFiles().filter(_.getName.endsWith(".html"))
    assert(htmlFiles.nonEmpty, "the HTML end-of-run report must still be written")
    assert(new String(java.nio.file.Files.readAllBytes(htmlFiles.head.toPath), "UTF-8")
      .contains("stuck_job"))
    // exactly once: a second signal (or the shutdown hook after a
    // handled signal) must not re-report or re-release
    assert(state.abandon("SIGINT").isEmpty)
    assert(capture.infos.size == 1 && lock.released == 1)
  }

  test("config-declared startup/shutdown hooks: typos fail parse; shutdown runs exactly once") {
    FixtureHooks.log.clear()
    val parsed = PipelineConfig.parse(
      """pipeline.name = hooked
        |hook.startup.class = graft.pipeline.FixtureStartupHook
        |hook.shutdown.class = graft.pipeline.FixtureShutdownHook
        |table.t.path = /tmp/hooked_t
        |""".stripMargin)
    assert(parsed.startupHook.isDefined && parsed.shutdownHook.isDefined)
    parsed.startupHook.foreach(_.run())
    // exactly-once across BOTH endings: signal path first, then the
    // normal-completion call must not re-run it
    val state = new PipelineState("hooked", "test", d, Nil,
      customShutdownHook = parsed.shutdownHook)
    state.abandon("SIGTERM")
    state.runCustomShutdownHook()
    assert(FixtureHooks.log.toArray.toSeq == Seq("startup", "shutdown"),
      FixtureHooks.log.toString)
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(
      "hook.startup.class = no.such.Hook\n"))
    assert(e.getMessage.contains("hook.startup.class"), e.getMessage)
    // a throwing shutdown hook must not break abandon
    val throwing = new PipelineState("p", "test", d, Nil,
      customShutdownHook = Some(() => sys.error("hook boom")))
    throwing.taskCompleted(TaskResult.Succeeded("j", "t", d, 1L, Nil))
    assert(throwing.abandon("SIGINT").nonEmpty)
  }

  test("pipelineCompleted disarms the shutdown path") {
    val capture = new InfoCapture
    val state = new PipelineState("p", "test", d, Seq(capture))
    state.taskCompleted(TaskResult.Succeeded("j", "t", d, 1L, Nil))
    state.pipelineCompleted()
    assert(state.abandon("SIGTERM").isEmpty, "abandon after normal completion is a no-op")
    assert(capture.infos.isEmpty, "no duplicate report after the orchestrator already sent one")
  }

  test("orchestrator reports lifecycle into the state; a signal mid-task frees its lock") {
    val base = java.nio.file.Files.createTempDirectory("shutdown_orch_").toString
    val ms = new Metastore(spark)
    ms.register(MetaTable("st_out", s"$base/out",
      scheme = graft.meta.PartitionScheme.NotPartitioned))
    val capture = new InfoCapture
    val state = new PipelineState("mid", "test", d, Seq(capture))
    val lock = new FakeLock
    // the "signal" arrives while the task is inside its transformer
    val tf = new Transformer {
      def run(r: MetastoreReader, dd: LocalDate, o: Map[String, String]): DataFrame = {
        state.abandon("SIGINT (Ctrl + C)")
        Seq((1L, "x")).toDF("id", "v")
      }
    }
    val results = new Orchestrator(ms,
      lockFactory = Some((_, _) => lock), state = Some(state))
      .run(Seq(JobDef("sig_job", "st_out", tf)), d)
    // the abandon path reported the in-flight task failed...
    val (info, reported) = capture.infos.head
    assert(info.status == "failed")
    assert(reported.collect { case TaskResult.Failed(j, e) => (j, e.getMessage) }
      .exists { case (j, m) => j == "sig_job" && m.contains("SIGINT") })
    assert(lock.released >= 1, "the signal path must release the task's lock")
    // ...and the state saw the full lifecycle (in-flight set emptied),
    // so a later shutdown-hook firing reports nothing twice
    assert(state.abandon("again").isEmpty)
    assert(capture.infos.size == 1)
    // in the test JVM (no exit), the task finished normally afterwards
    assert(results.head.isInstanceOf[TaskResult.Succeeded])
  }
}
