package graft.pipeline

import graft.SparkSpec
import graft.meta.FieldChange

import java.time.LocalDate

/** Golden-file specs for the HTML end-of-run report (success, failure
  * and warning runs, including a NotificationBuilder DataFrame table).
  * Regenerate with `GRAFT_GOLDEN_UPDATE=true sbt test` after an
  * INTENTIONAL rendering change, and review the HTML diff (tests fork,
  * so an env var reaches the test JVM where a -D flag would not). */
class HtmlReportSpec extends SparkSpec {
  import spark.implicits._

  private val runDate = LocalDate.parse("2024-06-15")
  private val goldenDir = "src/test/resources/golden"

  private def info(status: String, err: Option[Throwable] = None) = PipelineInfo(
    pipelineName = "nightly<crawl>", environment = "test&dev", runDate = runDate,
    startedAtMs = 1718409600000L, finishedAtMs = 1718413530000L,
    sparkApplicationId = Some("local-1718409599000"), status = status,
    failureException = err)

  /** Fixed frames: a live stack trace would leak host/JDK specifics
    * into the golden file. */
  private def fixedException(msg: String): RuntimeException = {
    val e = new RuntimeException(msg)
    e.setStackTrace(Array(
      new StackTraceElement("graft.pipeline.Transformer", "run", "Transformer.scala", 42),
      new StackTraceElement("graft.pipeline.Orchestrator", "executeTask", "Orchestrator.scala", 500)))
    e
  }

  private def checkGolden(name: String, html: String): Unit = {
    val path = java.nio.file.Paths.get(s"$goldenDir/$name.html")
    if (sys.env.get("GRAFT_GOLDEN_UPDATE").contains("true")) {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, html)
    }
    assert(java.nio.file.Files.exists(path),
      s"golden file missing — run once with GRAFT_GOLDEN_UPDATE=true: $path")
    val want = java.nio.file.Files.readString(path)
    assert(html == want, s"rendered HTML diverged from golden $name.html " +
      s"(if intentional, regenerate with GRAFT_GOLDEN_UPDATE=true)")
  }

  test("success run renders banner, header, task table and a DataFrame table") {
    val nb = new NotificationBuilder
    nb.addEntries("ingested 3 files from /landing/sales")
    nb.addDataFrameTable(
      Seq(("train", 400L), ("val", 50L), ("test", 50L)).toDF("split", "n_docs"),
      "Split sizes")
    val results = Seq(
      TaskResult.Succeeded("ingest_sales", "sales", runDate, 125000L),
      TaskResult.Succeeded("curate_docs", "docs_curated", runDate, 48213L))
    val html = HtmlReport.render(info("succeeded"), results, nb.drain())
    assert(html.contains("Pipeline succeeded"))
    assert(html.contains("nightly&lt;crawl&gt;"), "pipeline name must be escaped")
    assert(html.contains("test&amp;dev"), "environment must be escaped")
    assert(html.contains("Split sizes"))
    assert(html.contains("125000 records"))
    checkGolden("report_success", html)
  }

  test("failure run renders exception blocks and schema changes") {
    val results = Seq(
      TaskResult.Succeeded("ingest_sales", "sales", runDate, 125000L),
      TaskResult.Failed("curate_docs", fixedException("minimum records not met: 10 < 1000")))
    val changes = Seq(("sales", runDate, Seq[FieldChange](
      FieldChange.Added("discount_pct", "double"),
      FieldChange.TypeChanged("qty", "int", "bigint"))))
    val html = HtmlReport.render(
      info("failed", Some(fixedException("1 task(s) failed"))), results,
      customEntries = Nil, schemaChanges = changes)
    assert(html.contains("Pipeline FAILED"))
    assert(html.contains("minimum records not met"))
    assert(html.contains("Orchestrator.scala:500"), "stack trace must render")
    assert(html.contains("discount_pct"))
    assert(html.contains("int &rarr; bigint"))
    checkGolden("report_failure", html)
  }

  test("warning run renders amber banner and mixed statuses") {
    val results = Seq(
      TaskResult.Succeeded("ingest_sales", "sales", runDate, 99L,
        warnings = Seq("input looked thin: 99 records")),
      TaskResult.Skipped("export_csv", "(sales, 2024-06-15) is locked by another pipeline"),
      TaskResult.NotReady("weekly_rollup", "dependency window(s) not satisfied: sales[2024-06-09..2024-06-15]"))
    val html = HtmlReport.render(info("warning"), results)
    assert(html.contains("succeeded with warnings"))
    assert(html.contains("input looked thin"))
    assert(html.contains("NOT READY"))
    checkGolden("report_warning", html)
  }

  test("HtmlReportingNotifier writes the report through FileHtmlTransport") {
    val dir = tmpDir("html_report_")
    val notifier = new HtmlReportingNotifier(new FileHtmlTransport(dir),
      builder = new NotificationBuilder)
    notifier.onPipelineCompletedInfo(info("succeeded"),
      Seq(TaskResult.Succeeded("j", "t", runDate, 5L)))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".html"))
    assert(files.length == 1, files.map(_.getName).toSeq.toString)
    val html = java.nio.file.Files.readString(files.head.toPath)
    assert(html.contains("<!DOCTYPE html>") && html.contains("Pipeline succeeded"))
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")),
      "atomic rename must leave no temp files")
  }

  test("notification.html.dir parses and a config run drops the report file") {
    val base = tmpDir("html_cfg_")
    val conf =
      s"""pipeline.name = nightly
         |notification.html.dir = $base/reports
         |table.t.path = $base/ms/t
         |job.1.output = t
         |job.1.transformer = identity
         |job.1.option.rows = 2
         |""".stripMargin
    val parsed = PipelineConfig.parse(conf)
    assert(parsed.htmlReportDir.contains(s"$base/reports"))
    // the CLI wires parsed.htmlReportDir into an HtmlReportingNotifier;
    // replicate that wiring end-to-end
    import spark.implicits._
    val seeded = parsed.copy(jobs = parsed.jobs.map(_.copy(
      transformer = new Transformer {
        def run(r: graft.meta.MetastoreReader, dd: java.time.LocalDate,
                o: Map[String, String]) = Seq((1L, "x")).toDF("id", "v")
      })))
    val notifier = new HtmlReportingNotifier(
      new FileHtmlTransport(parsed.htmlReportDir.get), builder = new NotificationBuilder)
    val results = PipelineConfig.runParams(spark, seeded, RunParams.Normal(runDate),
      notifiers = Seq(notifier))
    assert(results.forall(_.isInstanceOf[TaskResult.Succeeded]), results.toString)
    val files = new java.io.File(s"$base/reports").listFiles()
    assert(files.length == 1 && files.head.getName.endsWith(".html"), files.toSeq.toString)
    val html = java.nio.file.Files.readString(files.head.toPath)
    assert(html.contains("nightly") && html.contains("Pipeline succeeded"))
  }

  test("escape covers the four HTML metacharacters") {
    assert(HtmlReport.escape("""a<b>&"c"""") == "a&lt;b&gt;&amp;&quot;c&quot;")
  }
}
