package graft.pipeline

import graft.SparkSpec
import graft.meta.{MetaTable, Metastore, MetastoreReader}
import org.apache.spark.sql.DataFrame

import java.time.LocalDate
import java.util.concurrent.atomic.AtomicInteger

/** Per-operation runtime policy (reference: pramen/core
  * .../core/pipeline/OperationDef.scala — isCritical, alwaysAttempt,
  * ignoreSchemaChange, consumeThreads, processingTimestampColumn,
  * expectedDelayDays, warn/kill max execution time) and the
  * Skip-vs-SkipOnce validation contract (api/Reason.scala). */
class RuntimePolicySpec extends SparkSpec {
  import spark.implicits._

  private val runDate = LocalDate.parse("2024-06-15")

  private def newMs(tables: String*): Metastore = {
    val ms = new Metastore(spark)
    val base = tmpDir("policy_")
    tables.foreach(t => ms.register(MetaTable(t, s"$base/$t")))
    ms
  }

  private def seed(n: Int): Transformer = new Transformer {
    def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame =
      (1 to n).map(i => (i.toLong, s"r$i")).toDF("id", "v")
  }

  private val failing: Transformer = new Transformer {
    def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame =
      throw new RuntimeException("boom")
  }

  test("isCritical failure aborts jobs that have not started yet") {
    val ms = newMs("a", "b")
    // b runs strictly after a (dependency edge) and would normally be
    // attempted despite a's failure (alwaysAttempt) — but a is critical,
    // so by b's turn the pipeline is aborted
    val results = new Orchestrator(ms).run(Seq(
      JobDef("a_job", "a", failing, isCritical = true),
      JobDef("b_job", "b", seed(2), inputTables = Seq("a"), alwaysAttempt = true)), runDate)
    val byJob = results.map(r => r.job -> r).toMap
    assert(byJob("a_job").isInstanceOf[TaskResult.Failed])
    byJob("b_job") match {
      case TaskResult.Skipped(_, why) => assert(why.contains("aborted"), why)
      case other => fail(s"expected abort-skip, got $other")
    }
  }

  test("alwaysAttempt runs a job whose required dependency failed") {
    val ms = newMs("a", "b", "c")
    val results = new Orchestrator(ms).run(Seq(
      JobDef("a_job", "a", failing),
      // b declares a as input but attempts anyway and succeeds without it
      JobDef("b_job", "b", seed(3), inputTables = Seq("a"), alwaysAttempt = true),
      // c has no alwaysAttempt: the failed dependency skips it
      JobDef("c_job", "c", seed(3), inputTables = Seq("a"))), runDate)
    val byJob = results.map(r => r.job -> r).toMap
    assert(byJob("b_job").isInstanceOf[TaskResult.Succeeded])
    assert(byJob("c_job").isInstanceOf[TaskResult.Skipped])
  }

  test("consumeThreads limits how many heavy jobs run concurrently") {
    val ms = newMs("t1", "t2", "t3", "t4")
    val running = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    def heavy: Transformer = new Transformer {
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame = {
        val now = running.incrementAndGet()
        peak.updateAndGet(p => math.max(p, now))
        Thread.sleep(150)
        running.decrementAndGet()
        Seq((1L, "x")).toDF("id", "v")
      }
    }
    // parallelism 2, every job claims 2 slots -> strictly serial
    val results = new Orchestrator(ms, parallelism = 2).run(
      (1 to 4).map(i => JobDef(s"j$i", s"t$i", heavy, consumeThreads = 2)), runDate)
    assert(results.forall(_.isInstanceOf[TaskResult.Succeeded]), results.toString)
    assert(peak.get() == 1, s"weighted jobs overlapped: peak=${peak.get()}")
  }

  test("processingTimestampColumn adds one task-level timestamp to the output") {
    val ms = newMs("stamped")
    val results = new Orchestrator(ms).run(Seq(
      JobDef("s_job", "stamped", seed(5), processingTimestampColumn = Some("processed_at"))),
      runDate)
    assert(results.head.isInstanceOf[TaskResult.Succeeded])
    val out = ms.getTable("stamped", Some(runDate), Some(runDate))
    assert(out.schema("processed_at").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(out.select("processed_at").distinct().count() == 1) // per task, not per row
  }

  test("expectedDelayDays shifts the Normal-mode slot back") {
    val bk = new Bookkeeper()
    val job = JobDef("d_job", "delayed", seed(1), expectedDelayDays = 2,
      infoDateExpr = "@runDate", initialDateExpr = "@runDate")
    val tasks = ScheduleStrategy.daysToRun(job, bk, RunParams.Normal(runDate))
    // the effective run date is runDate-2: that one slot, nothing later
    assert(tasks.map(_.infoDate) == List(runDate.minusDays(2)))
    // an undelayed twin sees runDate itself
    val undelayed = job.copy(expectedDelayDays = 0)
    assert(ScheduleStrategy.daysToRun(undelayed, bk, RunParams.Normal(runDate))
      .map(_.infoDate) == List(runDate))
  }

  test("warnMaxExecutionTimeSeconds attaches a warning; validate Warning flows through") {
    val ms = newMs("warned")
    val slowWithWarning = new Transformer {
      override def validate(r: MetastoreReader, d: LocalDate, o: Map[String, String]): Reason =
        Reason.Warning("input looked thin")
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame = {
        Thread.sleep(20)
        Seq((1L, "x")).toDF("id", "v")
      }
    }
    val results = new Orchestrator(ms).run(Seq(
      JobDef("w_job", "warned", slowWithWarning, warnMaxExecutionTimeSeconds = Some(0))),
      runDate)
    results.head match {
      case TaskResult.Succeeded(_, _, _, n, warnings) =>
        assert(n == 1)
        assert(warnings.exists(_.contains("input looked thin")), warnings.toString)
        assert(warnings.exists(_.contains("warning threshold")), warnings.toString)
      case other => fail(s"expected success with warnings, got $other")
    }
    // the run report renders warning successes as WARNING but counts them ok
    val report = RunReport.build("p", results, runDate)
    assert(report.succeeded == 1 && report.failed == 0)
    assert(report.lines.head.status == "WARNING")
  }

  test("killMaxExecutionTimeSeconds fails a hung task instead of pinning the slot") {
    val ms = newMs("hung")
    val hanging = new Transformer {
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame = {
        Thread.sleep(120000) // interruptible hang
        Seq((1L, "x")).toDF("id", "v")
      }
    }
    val t0 = System.currentTimeMillis()
    val results = new Orchestrator(ms).run(Seq(
      JobDef("h_job", "hung", hanging, killMaxExecutionTimeSeconds = Some(1))), runDate)
    val elapsed = System.currentTimeMillis() - t0
    results.head match {
      case TaskResult.Failed(_, e) =>
        assert(e.isInstanceOf[java.util.concurrent.TimeoutException], e.toString)
        assert(e.getMessage.contains("kill.maximum.execution.time"), e.getMessage)
      case other => fail(s"expected kill failure, got $other")
    }
    assert(elapsed < 30000, s"kill took ${elapsed}ms")
    // the failure is recorded: the slot re-delivers on the next run
    assert(!new Orchestrator(ms).run(Seq(
      JobDef("h_job", "hung", seed(1))), runDate).head.isInstanceOf[TaskResult.Skipped])
  }

  test("ignoreSchemaChange suppresses schema-evolution tracking for the job's saves") {
    val ms = newMs("drifting", "tracked")
    val wide = new Transformer {
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame =
        Seq((1L, "x", 9.9)).toDF("id", "v", "extra")
    }
    // day 1 with the narrow schema, day 2 with the wide one
    new Orchestrator(ms).run(Seq(JobDef("d1", "drifting", seed(1), ignoreSchemaChange = true)), runDate)
    new Orchestrator(ms).run(Seq(JobDef("d2", "drifting", wide, ignoreSchemaChange = true)),
      runDate.plusDays(1))
    assert(ms.schemaChanges("drifting").isEmpty)
    // the flag must not cost read correctness: a cross-day read of the
    // evolved table still merges schemas and surfaces the added column
    val both = ms.getTable("drifting", Some(runDate), Some(runDate.plusDays(1)))
    assert(both.columns.contains("extra"),
      s"evolved read lost the added column: ${both.columns.toSeq}")
    assert(both.count() == 2)
    // the tracked twin records the added column
    new Orchestrator(ms).run(Seq(JobDef("t1", "tracked", seed(1))), runDate)
    new Orchestrator(ms).run(Seq(JobDef("t2", "tracked", wide)), runDate.plusDays(1))
    assert(ms.schemaChanges("tracked").nonEmpty)
  }

  test("Reason.Skip is durable (never re-offered); SkipOnce re-offers next run") {
    val bk = new Bookkeeper()
    val ms = newMs("skippy", "oncey")
    var ranSkippy = 0
    var ranOncey = 0
    val skipT = new Transformer {
      override def validate(r: MetastoreReader, d: LocalDate, o: Map[String, String]): Reason =
        Reason.Skip("nothing to do, ever")
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame = {
        ranSkippy += 1; Seq((1L, "x")).toDF("id", "v")
      }
    }
    val skipOnceT = new Transformer {
      override def validate(r: MetastoreReader, d: LocalDate, o: Map[String, String]): Reason =
        Reason.SkipOnce("not this run")
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame = {
        ranOncey += 1; Seq((1L, "x")).toDF("id", "v")
      }
    }
    val jobs = Seq(JobDef("sk", "skippy", skipT), JobDef("on", "oncey", skipOnceT))
    val orch = new Orchestrator(ms, bookkeeper = bk)
    val first = orch.runWith(jobs, RunParams.Normal(runDate))
    assert(first.forall(_.isInstanceOf[TaskResult.Skipped]), first.toString)
    // Skip recorded the slot as done; SkipOnce left no trace
    assert(bk.isAlreadyRan("skippy", runDate))
    assert(!bk.isAlreadyRan("oncey", runDate))
    // next day's Normal run: skippy's date is NOT re-offered as late,
    // oncey's is (and gets skipped again by its validate)
    val second = orch.runWith(jobs, RunParams.Normal(runDate.plusDays(1)))
    val reasons = second.collect { case TaskResult.Skipped(j, why) => (j, why) }
    assert(!reasons.exists { case (j, w) => j == "sk" && w.contains("nothing to do") && second.size > 2 })
    assert(ranSkippy == 0 && ranOncey == 0) // validate gated every attempt
    // oncey was offered twice (new slot day1, late catch-up day2 + new day2)
    val onceySkips = (first ++ second).collect {
      case TaskResult.Skipped("on", w) if w.contains("not this run") => w
    }
    assert(onceySkips.size >= 2, s"SkipOnce date was not re-offered: $onceySkips")
  }

  test("postProcess sees the saved output; a throw fails the task but keeps the data") {
    val ms = newMs("pp_out")
    var seen = -1L
    val okT = new Transformer {
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame =
        Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      override def postProcess(out: String, r: MetastoreReader, d: LocalDate,
                               o: Map[String, String]): Unit =
        seen = r.getTable(out, Some(d), Some(d)).count()
    }
    assert(new Orchestrator(ms).run(Seq(JobDef("ok", "pp_out", okT)), runDate)
      .head.isInstanceOf[TaskResult.Succeeded])
    assert(seen == 2, s"postProcess read $seen rows of the fresh partition")

    val ms2 = newMs("pp_bad")
    val badT = new Transformer {
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame =
        Seq((1L, "x")).toDF("id", "v")
      override def postProcess(out: String, r: MetastoreReader, d: LocalDate,
                               o: Map[String, String]): Unit =
        throw new IllegalStateException("reconciliation failed")
    }
    val r = new Orchestrator(ms2).run(Seq(JobDef("bad", "pp_bad", badT)), runDate)
    assert(r.head.isInstanceOf[TaskResult.Failed])
    // the partition stays written (re-delivery semantics, not rollback)
    assert(ms2.getTable("pp_bad", Some(runDate), Some(runDate)).count() == 1)
  }

  test("date-windowed dependencies gate the run until the window has data") {
    val ms = newMs("weekly_src", "weekly_out")
    // the roll-up declares it needs the full trailing week of its input
    val job = JobDef("roll", "weekly_out", new Transformer {
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame =
        r.getTable("weekly_src", Some(d.minusDays(6)), Some(d))
          .groupBy().count()
    }, inputTables = Seq("weekly_src"),
      dependencies = Seq(Dependency(Seq("weekly_src"), "@infoDate - 6")))
    // no data at all -> NotReady, not Failed
    val r1 = new Orchestrator(ms).run(Seq(job), runDate)
    r1.head match {
      case TaskResult.NotReady(_, why) => assert(why.contains("weekly_src"), why)
      case other => fail(s"expected NotReady, got $other")
    }
    // data INSIDE the window satisfies the gate
    ms.saveTable("weekly_src", runDate.minusDays(3), Seq((1L, "x")).toDF("id", "v"))
    assert(new Orchestrator(ms).run(Seq(job), runDate)
      .head.isInstanceOf[TaskResult.Succeeded])
    // data ONLY OUTSIDE the window does not (fresh output table so
    // skip-if-done doesn't shortcut)
    val ms2 = newMs("weekly_src", "weekly_out")
    ms2.saveTable("weekly_src", runDate.minusDays(30), Seq((1L, "x")).toDF("id", "v"))
    assert(new Orchestrator(ms2).run(Seq(job), runDate)
      .head.isInstanceOf[TaskResult.NotReady])
    // optional dependencies never gate
    val opt = job.copy(dependencies = Seq(
      Dependency(Seq("weekly_src"), "@infoDate - 6", optional = true)))
    val ms3 = newMs("weekly_src", "weekly_out")
    ms3.saveTable("weekly_src", runDate.minusDays(30), Seq((1L, "x")).toDF("id", "v"))
    assert(!new Orchestrator(ms3).run(Seq(opt), runDate)
      .head.isInstanceOf[TaskResult.NotReady])
  }

  test("NotReady parents gate dependents; requireAll demands the full window") {
    val ms = newMs("gated_src", "gated_mid", "gated_out")
    val mid = JobDef("mid", "gated_mid", seed(2), inputTables = Seq("gated_src"),
      dependencies = Seq(Dependency(Seq("gated_src"), "@infoDate")))
    val outj = JobDef("out", "gated_out", seed(2), inputTables = Seq("gated_mid"))
    val rs = new Orchestrator(ms).run(Seq(mid, outj), runDate)
    val byJob = rs.map(r => r.job -> r).toMap
    assert(byJob("mid").isInstanceOf[TaskResult.NotReady])
    byJob("out") match {
      case TaskResult.Skipped(_, why) => assert(why.contains("not ready"), why)
      case other => fail(s"dependent must skip behind a NotReady parent, got $other")
    }
    // requireAll: 2 of 3 days present is not enough; 3 of 3 is
    val ms2 = newMs("wk_src", "wk_out")
    ms2.saveTable("wk_src", runDate.minusDays(2), Seq((1L, "x")).toDF("id", "v"))
    ms2.saveTable("wk_src", runDate.minusDays(1), Seq((1L, "x")).toDF("id", "v"))
    val strict = JobDef("wk", "wk_out", seed(1),
      dependencies = Seq(Dependency(Seq("wk_src"), "@infoDate - 2", requireAll = true)))
    assert(new Orchestrator(ms2).run(Seq(strict), runDate)
      .head.isInstanceOf[TaskResult.NotReady])
    ms2.saveTable("wk_src", runDate, Seq((1L, "x")).toDF("id", "v"))
    assert(new Orchestrator(ms2).run(Seq(strict), runDate)
      .head.isInstanceOf[TaskResult.Succeeded])
    // an unregistered dependency table fails THIS task as NotReady,
    // not the whole pipeline run
    val typo = JobDef("typo", "gated_out", seed(1),
      dependencies = Seq(Dependency(Seq("salez"), "@infoDate")))
    val r3 = new Orchestrator(newMs("gated_out")).run(Seq(typo), runDate)
    r3.head match {
      case TaskResult.NotReady(_, why) => assert(why.contains("not registered"), why)
      case other => fail(s"expected NotReady for unregistered table, got $other")
    }
  }

  test("inverted dependency window gates instead of passing vacuously (requireAll)") {
    // date.from AFTER date.until makes the calendar iteration empty;
    // forall over empty is true, so before the guard a misconfigured
    // window silently UN-gated the job that any-partition mode gates
    val ms = newMs("inv_src", "inv_out")
    ms.saveTable("inv_src", runDate, Seq((1L, "x")).toDF("id", "v"))
    val inverted = JobDef("inv", "inv_out", seed(1),
      dependencies = Seq(Dependency(Seq("inv_src"), "@infoDate + 3",
        dateUntilExpr = Some("@infoDate"), requireAll = true)))
    new Orchestrator(ms).run(Seq(inverted), runDate).head match {
      case TaskResult.NotReady(_, why) => assert(why.contains("inverted"), why)
      case other => fail(s"inverted window must gate as NotReady, got $other")
    }
    // any-partition mode gates the same window too
    val invertedAny = JobDef("inv2", "inv_out", seed(1),
      dependencies = Seq(Dependency(Seq("inv_src"), "@infoDate + 3",
        dateUntilExpr = Some("@infoDate"))))
    assert(new Orchestrator(ms).run(Seq(invertedAny), runDate)
      .head.isInstanceOf[TaskResult.NotReady])
  }

  test("kill-timeout cancels the task's Spark job group (cluster work stops)") {
    val ms = newMs("jg_out")
    val sawCancel = new AtomicInteger(0)
    val sparkHog = new Transformer {
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame = {
        // a genuinely RUNNING Spark job (not a sleeping thread): each of
        // the 4 tasks spins ~60 s, so only a job-group cancel stops it
        try {
          spark.range(0, 4, 1, 4).rdd.foreach { _ =>
            val end = System.currentTimeMillis() + 60000
            var x = 0L
            while (System.currentTimeMillis() < end) { x += 1 }
          }
        } catch {
          case e: Throwable => sawCancel.incrementAndGet(); throw e
        }
        Seq((1L, "x")).toDF("id", "v")
      }
    }
    val t0 = System.currentTimeMillis()
    val results = new Orchestrator(ms).run(Seq(
      JobDef("jg_job", "jg_out", sparkHog, killMaxExecutionTimeSeconds = Some(2))), runDate)
    assert(results.head.isInstanceOf[TaskResult.Failed], results.head.toString)
    // the submitted Spark job must die with the task — wait for the
    // cancellation to surface in the worker (well under the 60 s the
    // job would otherwise burn)
    val deadline = System.currentTimeMillis() + 30000
    while (sawCancel.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    val elapsed = System.currentTimeMillis() - t0
    assert(sawCancel.get() > 0,
      s"job group was not cancelled — Spark job kept running (${elapsed}ms)")
    assert(elapsed < 45000, s"cancellation took ${elapsed}ms")
  }

  test("dependency config block parses and feeds update tracking") {
    val conf =
      """pipeline.name = p
        |table.a.path = /tmp/x/a
        |job.1.output = a
        |job.1.transformer = identity
        |job.1.option.input.table = a
        |job.1.dependency.1.tables = src1, src2
        |job.1.dependency.1.date.from = @infoDate - 6
        |job.1.dependency.1.date.until = @infoDate - 1
        |job.1.dependency.1.trigger.updates = true
        |job.1.dependency.2.tables = lookup
        |job.1.dependency.2.passive = true
        |""".stripMargin
    val j = PipelineConfig.parse(conf).jobs.head
    assert(j.dependencies.size == 2)
    val d1 = j.dependencies.head
    assert(d1.tables == Seq("src1", "src2") && d1.dateFromExpr == "@infoDate - 6")
    assert(d1.dateUntilExpr.contains("@infoDate - 1") && d1.triggerUpdates)
    assert(j.dependencies(1).passive)
  }

  test("notification targets receive pipeline context (status roll-up)") {
    val ms = newMs("ok1", "bad1")
    var infos = Vector.empty[PipelineInfo]
    val target = new PipelineNotificationTarget {
      override def onPipelineCompletedInfo(info: PipelineInfo, rs: Seq[TaskResult]): Unit =
        infos :+= info
    }
    val orch = new Orchestrator(ms, notifiers = Seq(target),
      pipelineName = "nightly", environment = "test")
    orch.run(Seq(JobDef("ok", "ok1", seed(2))), runDate)
    orch.run(Seq(JobDef("bad", "bad1", failing)), runDate)
    assert(infos.map(_.status) == Vector("succeeded", "failed"))
    val i = infos.head
    assert(i.pipelineName == "nightly" && i.environment == "test")
    assert(i.runDate == runDate && i.finishedAtMs >= i.startedAtMs)
    assert(i.sparkApplicationId.nonEmpty)
    assert(infos(1).failureException.exists(_.getMessage == "boom"))
    // warning roll-up: success with warnings -> "warning"
    val warn = new Transformer {
      override def validate(r: MetastoreReader, d: LocalDate, o: Map[String, String]): Reason =
        Reason.Warning("thin")
      def run(r: MetastoreReader, d: LocalDate, o: Map[String, String]): DataFrame = {
        import spark.implicits._
        Seq((1L, "x")).toDF("id", "v")
      }
    }
    val ms2 = newMs("w1")
    new Orchestrator(ms2, notifiers = Seq(target)).run(Seq(JobDef("w", "w1", warn)), runDate)
    assert(infos.last.status == "warning")
  }

  test("disabled jobs are dropped at config parse time") {
    val conf =
      """pipeline.name = p
        |table.a.path = /tmp/x/a
        |table.b.path = /tmp/x/b
        |job.1.output = a
        |job.1.transformer = identity
        |job.1.option.input.table = a
        |job.2.output = b
        |job.2.transformer = identity
        |job.2.option.input.table = b
        |job.2.disabled = true
        |""".stripMargin
    val parsed = PipelineConfig.parse(conf)
    assert(parsed.jobs.map(_.outputTable) == Seq("a"))
  }

  test("runtime-policy keys parse from config") {
    val conf =
      """pipeline.name = p
        |table.a.path = /tmp/x/a
        |job.1.output = a
        |job.1.transformer = identity
        |job.1.option.input.table = a
        |job.1.critical = true
        |job.1.always.attempt = true
        |job.1.ignore.schema.change = true
        |job.1.consume.threads = 3
        |job.1.processing.timestamp.column = loaded_at
        |job.1.expected.delay.days = 2
        |job.1.warn.maximum.execution.time.seconds = 30
        |job.1.kill.maximum.execution.time.seconds = 600
        |""".stripMargin
    val j = PipelineConfig.parse(conf).jobs.head
    assert(j.isCritical && j.alwaysAttempt && j.ignoreSchemaChange)
    assert(j.consumeThreads == 3)
    assert(j.processingTimestampColumn.contains("loaded_at"))
    assert(j.expectedDelayDays == 2)
    assert(j.warnMaxExecutionTimeSeconds.contains(30))
    assert(j.killMaxExecutionTimeSeconds.contains(600))
  }
}
