package graft.pipeline

import graft.SparkSpec
import graft.meta.{MetaTable, Metastore}

import java.time.LocalDate

/** Backfill / historical runs, missed-slot catch-up, and late-data
  * (trackDays) re-run detection — the reference runner's
  * daily-operations core (ScheduleStrategyUtils getLate/getHistorical,
  * ScheduleStrategySourcing). */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  private def day(s: String) = LocalDate.parse(s)

  // ── pure strategy ────────────────────────────────────────────────

  test("infoDateRange maps schedule-enabled run dates to distinct info dates") {
    val weekly = Schedule.Weekly(Seq(java.time.DayOfWeek.MONDAY))
    // June 2024: Mondays are 3, 10, 17, 24
    val r = ScheduleStrategy.infoDateRange(day("2024-06-01"), day("2024-06-18"),
      "@runDate - 1", weekly)
    assert(r == List(day("2024-06-02"), day("2024-06-09"), day("2024-06-16")))
    // a monthly schedule in a window with no enabled day -> empty
    val monthly = Schedule.Monthly(Seq(1))
    assert(ScheduleStrategy.infoDateRange(day("2024-06-02"), day("2024-06-30"),
      "@runDate", monthly).isEmpty)
  }

  test("lateDates: gap between last processed and now is caught up exactly") {
    val daily = Schedule.Daily()
    val late = ScheduleStrategy.lateDates(day("2024-06-10"), daily, "@runDate",
      "@runDate", Some(day("2024-06-06")))
    assert(late.map(_.infoDate) == List(day("2024-06-07"), day("2024-06-08"), day("2024-06-09")))
    assert(late.forall(_.reason == RunReason.Late))
    // nothing processed yet: catch up from the initial sourcing date
    val fresh = ScheduleStrategy.lateDates(day("2024-06-10"), daily, "@runDate",
      "@runDate - 3", None)
    assert(fresh.map(_.infoDate) == List(day("2024-06-07"), day("2024-06-08"), day("2024-06-09")))
    // up to date: nothing late
    assert(ScheduleStrategy.lateDates(day("2024-06-10"), daily, "@runDate",
      "@runDate", Some(day("2024-06-09"))).isEmpty)
  }

  test("lateDates respects a shifted info-date expression") {
    val daily = Schedule.Daily()
    val late = ScheduleStrategy.lateDates(day("2024-06-10"), daily, "@runDate - 1",
      "@runDate", Some(day("2024-06-06")))
    // run dates 2024-06-08/09/10 would have produced info dates 07/08/09;
    // only run date 10's slot (info 09) is still the "new" day — late
    // covers 07 and 08
    assert(late.map(_.infoDate) == List(day("2024-06-07"), day("2024-06-08")))
  }

  test("historical: FillGaps picks exactly the missing dates; ForceRun re-runs all") {
    val bk = new Bookkeeper()
    val job = JobDef("j", "out", new IdentityTransformer)
    Seq("2024-06-02", "2024-06-04").foreach { d =>
      bk.record(RunRecord("out", day(d), 1, "succeeded", 0, 1))
    }
    val fill = ScheduleStrategy.daysToRun(job, bk,
      RunParams.Historical(day("2024-06-01"), day("2024-06-05")))
    assert(fill.map(_.infoDate) ==
      List(day("2024-06-01"), day("2024-06-03"), day("2024-06-05")))
    assert(fill.forall(_.reason == RunReason.New))

    val force = ScheduleStrategy.daysToRun(job, bk,
      RunParams.Historical(day("2024-06-01"), day("2024-06-03"), RunMode.ForceRun))
    assert(force.map(_.infoDate) ==
      List(day("2024-06-01"), day("2024-06-02"), day("2024-06-03")))
    assert(force.map(_.reason) == List(RunReason.New, RunReason.Rerun, RunReason.New))

    val inverse = ScheduleStrategy.daysToRun(job, bk,
      RunParams.Historical(day("2024-06-01"), day("2024-06-03"),
        RunMode.ForceRun, inverseDateOrder = true))
    assert(inverse.map(_.infoDate) ==
      List(day("2024-06-03"), day("2024-06-02"), day("2024-06-01")))
  }

  test("updatedDates flags only dates whose inputs finished AFTER the output") {
    val bk = new Bookkeeper()
    val d1 = day("2024-06-01"); val d2 = day("2024-06-02")
    // d1: output at t=100, input updated at t=200 -> needs update
    bk.record(RunRecord("out", d1, 1, "succeeded", 0, 100))
    bk.record(RunRecord("in", d1, 1, "succeeded", 150, 200))
    // d2: output at t=300 AFTER input's t=250 -> up to date
    bk.record(RunRecord("in", d2, 1, "succeeded", 240, 250))
    bk.record(RunRecord("out", d2, 1, "succeeded", 260, 300))
    val upd = ScheduleStrategy.updatedDates(day("2024-06-04"), 5, Schedule.Daily(),
      "@runDate", "out", Seq("in"), bk)
    assert(upd == List(TaskPreDef(d1, RunReason.Update)))
    // outside the track window -> not flagged
    val narrow = ScheduleStrategy.updatedDates(day("2024-06-10"), 2, Schedule.Daily(),
      "@runDate", "out", Seq("in"), bk)
    assert(narrow.isEmpty)
  }

  test("updatedDates maps through differing info-date exprs (latest-at-or-before input)") {
    val bk = new Bookkeeper()
    val d1 = day("2024-06-01"); val d3 = day("2024-06-03")
    // the input job lands data only at d1 (different infoDateExpr /
    // sparser schedule); the output at d3 consumed the input's latest
    // <= d3 slice (d1), and the input re-landed AFTER the output ran —
    // an exact-date lookup at d3 would find no input record and miss it
    bk.record(RunRecord("out", d3, 1, "succeeded", 0, 100))
    bk.record(RunRecord("in", d1, 1, "succeeded", 150, 200))
    val upd = ScheduleStrategy.updatedDates(day("2024-06-05"), 5, Schedule.Daily(),
      "@runDate", "out", Seq("in"), bk)
    assert(upd == List(TaskPreDef(d3, RunReason.Update)))
    // input landed BEFORE the output ran -> up to date, nothing flagged
    val bk2 = new Bookkeeper()
    bk2.record(RunRecord("in", d1, 1, "succeeded", 0, 50))
    bk2.record(RunRecord("out", d3, 1, "succeeded", 60, 100))
    assert(ScheduleStrategy.updatedDates(day("2024-06-05"), 5, Schedule.Daily(),
      "@runDate", "out", Seq("in"), bk2).isEmpty)
  }

  test("minimumDate filters out prehistoric dates") {
    val bk = new Bookkeeper()
    val job = JobDef("j", "out", new IdentityTransformer)
    val r = ScheduleStrategy.daysToRun(job, bk,
      RunParams.Historical(day("2024-06-01"), day("2024-06-05")),
      minimumDate = Some(day("2024-06-03")))
    assert(r.map(_.infoDate) == List(day("2024-06-03"), day("2024-06-04"), day("2024-06-05")))
  }

  // ── orchestrated end-to-end ──────────────────────────────────────

  private def pipeline(bk: Bookkeeper): (Metastore, Seq[JobDef]) = {
    val ms = new Metastore(spark)
    val base = tmpDir("bf_")
    ms.register(MetaTable("src", s"$base/src"))
    ms.register(MetaTable("mid", s"$base/mid"))
    ms.register(MetaTable("dst", s"$base/dst"))
    val jobs = Seq(
      JobDef("to_mid", "mid", new IdentityTransformer, Seq("src"),
        options = Map("input.table" -> "src"), trackDays = 7),
      JobDef("to_dst", "dst", new IdentityTransformer, Seq("mid"),
        options = Map("input.table" -> "mid"), trackDays = 7))
    (ms, jobs)
  }

  test("a 5-day gap backfills exactly the missing (table, infoDate) pairs in topo order") {
    val bk = new Bookkeeper()
    val (ms, jobs) = pipeline(bk)
    val days = (1 to 5).map(i => day(f"2024-06-0$i%d"))
    days.foreach(d => ms.saveTable("src", d, Seq((d.toString, 1)).toDF("k", "v")))

    // days 2 and 4 already completed end-to-end
    val orch = new Orchestrator(ms, bk)
    Seq(days(1), days(3)).foreach { d =>
      val r = orch.runWith(jobs, RunParams.Rerun(d))
      assert(r.forall(_.isInstanceOf[TaskResult.Succeeded]), s"seed run failed: $r")
    }

    val results = orch.runWith(jobs,
      RunParams.Historical(days.head, days.last, RunMode.FillGaps))
    val ran = results.collect { case s: TaskResult.Succeeded => (s.table, s.infoDate) }
    val missing = Seq(days(0), days(2), days(4))
    assert(ran.toSet == missing.flatMap(d => Seq(("mid", d), ("dst", d))).toSet,
      s"backfill ran the wrong set: $ran")
    // every mid run precedes every dst run (job-level topo barrier)
    val order = results.collect { case s: TaskResult.Succeeded => s.table }
    assert(order.indexOf("dst") > order.lastIndexOf("mid") ||
      order.filter(_ == "mid").size == 3, s"order: $order")
    // the table now has all 5 days
    assert(ms.listAvailableDates("dst").toSet == days.toSet)
  }

  test("a late-landing source partition triggers exactly the dependent re-runs") {
    val bk = new Bookkeeper()
    val (ms, jobs) = pipeline(bk)
    val d1 = day("2024-06-01"); val d2 = day("2024-06-02")
    val orch = new Orchestrator(ms, bk)

    // day 1 runs end-to-end on time
    ms.saveTable("src", d1, Seq(("a", 1)).toDF("k", "v"))
    bk.record(RunRecord("src", d1, 1, "succeeded", 0, System.currentTimeMillis()))
    assert(orch.runWith(jobs, RunParams.Normal(d1))
      .forall(_.isInstanceOf[TaskResult.Succeeded]))

    // day 1's source data is CORRECTED after the pipeline ran (late data)
    Thread.sleep(5)
    ms.saveTable("src", d1, Seq(("a", 1), ("late", 2)).toDF("k", "v"))
    bk.record(RunRecord("src", d1, 2, "succeeded",
      System.currentTimeMillis(), System.currentTimeMillis() + 1))

    // day 2's normal run: new slot for d2 + Update re-run of d1's mid,
    // which cascades to dst (mid's new success is later than dst's)
    ms.saveTable("src", d2, Seq(("b", 3)).toDF("k", "v"))
    bk.record(RunRecord("src", d2, 1, "succeeded",
      System.currentTimeMillis(), System.currentTimeMillis() + 1))
    val results = orch.runWith(jobs, RunParams.Normal(d2))
    val ran = results.collect { case s: TaskResult.Succeeded => (s.table, s.infoDate) }
    assert(ran.toSet == Set(("mid", d1), ("mid", d2), ("dst", d1), ("dst", d2)),
      s"expected exactly the d1 update cascade (mid then dst) plus the new d2 slots: $ran")
    // the corrected row is now visible downstream
    assert(ms.getTable("mid", Some(d1), Some(d1)).count() == 2)

    // a third run with nothing new: no Update re-runs repeat (mid's d1
    // re-run recorded AFTER src's late record, so the trigger clears)
    val quiet = orch.runWith(jobs, RunParams.Normal(d2.plusDays(1)))
    val reran = quiet.collect { case s: TaskResult.Succeeded => (s.table, s.infoDate) }
      .filter(_._2 == d1)
    assert(reran.count(_._1 == "mid") == 0, s"update must not re-trigger once recomputed: $quiet")
  }

  test("normal run catches up missed slots via the bookkeeper gap") {
    val bk = new Bookkeeper()
    val (ms, jobs) = pipeline(bk)
    val days = (1 to 4).map(i => day(f"2024-06-0$i%d"))
    days.foreach(d => ms.saveTable("src", d, Seq((d.toString, 1)).toDF("k", "v")))
    val orch = new Orchestrator(ms, bk)

    // day 1 ran; days 2-3 were missed (outage); day 4's normal run
    // must execute 2, 3 (Late) and 4 (New)
    assert(orch.runWith(jobs, RunParams.Normal(days.head))
      .forall(_.isInstanceOf[TaskResult.Succeeded]))
    val results = orch.runWith(jobs, RunParams.Normal(days.last))
    val ran = results.collect { case s: TaskResult.Succeeded => (s.table, s.infoDate) }
    val expect = Seq(days(1), days(2), days(3)).flatMap(d => Seq(("mid", d), ("dst", d)))
    assert(ran.toSet == expect.toSet, s"catch-up ran the wrong set: $ran")
  }

  test("date-parallel backfill: independent dates run concurrently, results identical") {
    val bk = new Bookkeeper()
    val (ms, jobs) = pipeline(bk)
    val days = (1 to 6).map(i => day(f"2024-06-0$i%d"))
    days.foreach(d => ms.saveTable("src", d, Seq((d.toString, 1)).toDF("k", "v")))
    val orch = new Orchestrator(ms, bk)
    val results = orch.runWith(jobs,
      RunParams.Historical(days.head, days.last), dateParallelism = 3)
    val ran = results.collect { case s: TaskResult.Succeeded => (s.table, s.infoDate) }
    assert(ran.toSet == days.flatMap(d => Seq(("mid", d), ("dst", d))).toSet, s"ran: $ran")
    assert(ms.listAvailableDates("dst").toSet == days.toSet)
    days.foreach(d => assert(ms.getTable("dst", Some(d), Some(d)).count() == 1))
  }

  test("date parallelism is rejected under an offset manager (double-consume guard)") {
    val (ms, jobs) = pipeline(new Bookkeeper())
    val orch = new Orchestrator(ms, offsetManager = Some(new graft.offset.OffsetManager()))
    assertThrows[IllegalArgumentException](
      orch.runWith(jobs, RunParams.Normal(day("2024-06-01")), dateParallelism = 4))
  }

  test("plan (dry run) reports exactly what runWith would execute, running nothing") {
    val bk = new Bookkeeper()
    val (ms, jobs) = pipeline(bk)
    val days = (1 to 3).map(i => day(f"2024-06-0$i%d"))
    days.foreach(d => ms.saveTable("src", d, Seq((d.toString, 1)).toDF("k", "v")))
    val orch = new Orchestrator(ms, bk)
    assert(orch.runWith(jobs, RunParams.Rerun(days(1))).forall(_.isInstanceOf[TaskResult.Succeeded]))

    val planned = orch.plan(jobs, RunParams.Historical(days.head, days.last))
    planned.foreach { case (_, tasks) =>
      assert(tasks.map(_.infoDate) == Seq(days(0), days(2)), s"plan wrong: $tasks")
    }
    // planning executed nothing
    assert(ms.listAvailableDates("dst") == Seq(days(1)))
  }

  test("run reason and input run-info are visible to transformers") {
    val bk = new Bookkeeper()
    val ms = new Metastore(spark)
    val base = tmpDir("reason_")
    ms.register(MetaTable("rsrc", s"$base/src"))
    ms.register(MetaTable("rout", s"$base/out"))
    val d1 = day("2024-06-01")
    ms.saveTable("rsrc", d1, Seq(("a", 1)).toDF("k", "v"))
    bk.record(RunRecord("rsrc", d1, 1, "succeeded", 10, 20))
    @volatile var seen: (String, Option[graft.meta.TableRunInfo]) = ("", None)
    val t = new Transformer {
      def run(r: graft.meta.MetastoreReader, dd: java.time.LocalDate, o: Map[String, String]) = {
        seen = (r.getRunReason, r.getTableRunInfo("rsrc", dd))
        r.getTable("rsrc", Some(dd), Some(dd))
      }
    }
    val jobs = Seq(JobDef("rj", "rout", t, Seq("rsrc")))
    val orch = new Orchestrator(ms, bk)
    orch.runWith(jobs, RunParams.Normal(d1))
    assert(seen._1 == "New")
    assert(seen._2.exists(i => i.recordCount == 1 && i.status == "succeeded"))
    orch.runWith(jobs, RunParams.Rerun(d1))
    assert(seen._1 == "Rerun")
  }

  test("rerun forces execution despite a succeeded bookkeeper record") {
    val bk = new Bookkeeper()
    val (ms, jobs) = pipeline(bk)
    val d = day("2024-06-01")
    ms.saveTable("src", d, Seq(("a", 1)).toDF("k", "v"))
    val orch = new Orchestrator(ms, bk)
    assert(orch.runWith(jobs, RunParams.Normal(d)).forall(_.isInstanceOf[TaskResult.Succeeded]))
    // plain normal run again: skipped (already succeeded)
    assert(orch.runWith(jobs, RunParams.Normal(d)).forall(_.isInstanceOf[TaskResult.Skipped]))
    // --rerun: executes again
    assert(orch.runWith(jobs, RunParams.Rerun(d)).forall(_.isInstanceOf[TaskResult.Succeeded]))
  }
}
