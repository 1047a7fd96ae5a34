package graft.pipeline

import graft.SparkSpec
import graft.meta.{CachePolicy, MetaTable, Metastore, MetastoreReader}
import org.apache.spark.sql.DataFrame

import java.time.LocalDate

/** Task journal (append-only audit log), custom notification entries,
  * and read cache policies. */
class JournalSpec extends SparkSpec {
  import spark.implicits._

  private val runDate = LocalDate.parse("2024-06-15")

  test("journal keeps every event in order, incl. re-runs and failures") {
    val dir = tmpDir("journal_")
    val j = new Journal(Some(dir))
    val n = new JournalNotifier(j, "nightly", clock = { var t = 0L; () => { t += 1; t } })
    n.onTaskCompleted(TaskResult.Succeeded("a", "t1", runDate, 10), runDate)
    n.onTaskCompleted(TaskResult.Failed("b", new RuntimeException("boom")), runDate)
    n.onTaskCompleted(TaskResult.Succeeded("b", "t2", runDate, 5, Seq("thin input")), runDate)
    n.onTaskCompleted(TaskResult.Skipped("c", "already succeeded"), runDate)
    assert(j.all.map(_.status) == Seq("succeeded", "failed", "succeeded", "skipped"))
    // a fresh instance reloads the same history from disk, in order
    val reloaded = new Journal(Some(dir))
    assert(reloaded.all == j.all)
    assert(reloaded.all(1).detail.contains("boom"))
    assert(reloaded.all(2).detail.contains("thin input"))
  }

  test("entries(from, to) windows the history inclusively (the getEntries contract)") {
    val j = new Journal()
    Seq(100L, 200L, 250L, 300L, 400L).zipWithIndex.foreach { case (ms, i) =>
      j.append(TaskEvent("p", s"j$i", "t", None, "succeeded", i.toLong, "", ms))
    }
    assert(j.entries(200L, 300L).map(_.atMs) == Seq(200L, 250L, 300L))
    assert(j.entries(401L, 500L).isEmpty)
    assert(j.entries(Long.MinValue, Long.MaxValue).size == 5)
  }

  test("journal events with special characters survive the roundtrip") {
    val dir = tmpDir("journal_esc_")
    val j = new Journal(Some(dir))
    val e = TaskEvent("p", "j", "t", Some(runDate), "failed", 0L,
      "line1\nline2 \"quoted\" back\\slash", 42L)
    // the adversarial case: a literal backslash followed by 'n' (e.g. a
    // Windows path C:\network or a regex \n+) must NOT decode to newline
    val e2 = TaskEvent("p", "j2", "t", None, "failed", 0L,
      "path C:\\network and regex \\n+ and \\\\n doubled", 43L)
    j.append(e); j.append(e2)
    assert(new Journal(Some(dir)).all == Seq(e, e2))
  }

  test("two journals writing one directory interleave without loss") {
    val dir = tmpDir("journal_cc_")
    val a = new Journal(Some(dir))
    val b = new Journal(Some(dir))
    (1 to 50).foreach { i =>
      a.append(TaskEvent("p", s"a$i", "t", None, "succeeded", i.toLong, "", i.toLong))
      b.append(TaskEvent("p", s"b$i", "t", None, "succeeded", i.toLong, "", i.toLong))
    }
    val all = new Journal(Some(dir)).all
    assert(all.size == 100)
    assert(all.map(_.job).toSet.size == 100)
  }

  test("notification builder entries flow into the run report once") {
    val nb = new NotificationBuilder
    nb.addEntries("reconciliation ok", "42 rows quarantined")
    nb.addDataFrameTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), "sample rows", maxRecords = 1)
    var sent: Option[RunReport.Report] = None
    val notifier = new ReportingNotifier("p", r => sent = Some(r), nb)
    notifier.onPipelineCompleted(Seq(TaskResult.Succeeded("j", "t", runDate, 1)), runDate)
    val body = sent.get.body
    assert(body.contains("Custom notifications:"))
    assert(body.contains("reconciliation ok") && body.contains("42 rows quarantined"))
    assert(body.contains("sample rows") && body.contains("id") && body.contains("1"))
    assert(!body.contains("2  b"), "maxRecords=1 must truncate the table")
    // drained: a second pipeline run reports no stale custom entries
    notifier.onPipelineCompleted(Seq(TaskResult.Succeeded("j", "t", runDate, 1)), runDate)
    assert(!sent.get.body.contains("Custom notifications:"))
  }

  test("cache policies: cache and persist reuse one read; save invalidates") {
    def mkMs(policy: Option[CachePolicy]): (Metastore, String) = {
      val ms = new Metastore(spark)
      val name = s"cp_${policy.map(_.name).getOrElse("default")}"
      ms.register(MetaTable(name, s"${tmpDir("cp_")}/$name", cachePolicy = policy))
      (ms, name)
    }
    Seq(Some(CachePolicy.Cache): Option[CachePolicy], Some(CachePolicy.Persist)).foreach { p =>
      val (ms, name) = mkMs(p)
      ms.saveTable(name, runDate, Seq((1L, "x")).toDF("id", "v"))
      val first = ms.getTable(name, Some(runDate), Some(runDate))
      first.count()
      // reads over a cached base relation scan the in-memory relation
      assert(first.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
        s"$p read did not hit the cache")
      if (p.contains(CachePolicy.Persist)) {
        val diskOnly = spark.sparkContext.getRDDStorageInfo.exists(i =>
          i.storageLevel.useDisk && !i.storageLevel.useMemory)
        assert(diskOnly, "Persist must materialize a disk-only cache")
      }
      // save invalidates: the next read sees the new data
      ms.saveTable(name, runDate, Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
      assert(ms.getTable(name, Some(runDate), Some(runDate)).count() == 2)
    }
    // NoCache (default): plain scan, no in-memory relation
    val (ms, name) = mkMs(None)
    ms.saveTable(name, runDate, Seq((1L, "x")).toDF("id", "v"))
    val df = ms.getTable(name, Some(runDate), Some(runDate))
    df.count()
    assert(!df.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
  }
}
