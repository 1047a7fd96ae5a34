package graft.pipeline

import java.time.LocalDate

import graft.SparkSpec

/** Spark-storage bookkeeper backends (reference BookkeeperText /
  * BookkeeperDeltaBase re-expressions): cross-instance persistence,
  * newest-wins reduction, done semantics, concurrent lock-free
  * writers, the delta classpath gate, and config-key resolution —
  * parity with the FS journal's OrchestratorSpec cases. */
class BookkeeperSparkSpec extends SparkSpec {

  private val d = LocalDate.parse("2024-03-01")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("text: records persist across instances; newest record per (table, date) wins") {
    val path = tmp("bktext_")
    val bk1 = new BookkeeperText(spark, path)
    bk1.record(RunRecord("t", d, 42, "failed", 1, 2))
    bk1.record(RunRecord("t", d, 43, "succeeded", 3, 4))  // retry wins
    bk1.record(RunRecord("t", d.plusDays(1), 0, "failed", 5, 6))
    val bk2 = new BookkeeperText(spark, path)               // fresh driver
    assert(bk2.isAlreadyRan("t", d), "newest (succeeded) record must win over the failed attempt")
    assert(!bk2.isAlreadyRan("t", d.plusDays(1)))
    assert(bk2.get("t", d).map(_.recordCount).contains(43L))
    assert(bk2.latestSuccess("t").contains(d))
    assert(bk2.all.size == 2, "all reduces to one record per (table, infoDate)")
  }

  test("text: skipped is durably done; latestSuccessRecord respects until") {
    val path = tmp("bktext_skip_")
    val bk = new BookkeeperText(spark, path)
    bk.record(RunRecord("t", d, 0, "skipped", 1, 2))
    bk.record(RunRecord("t", d.plusDays(1), 9, "succeeded", 3, 4))
    bk.record(RunRecord("t", d.plusDays(2), 11, "succeeded", 5, 6))
    assert(bk.isAlreadyRan("t", d), "skipped slots must never be re-offered")
    assert(bk.latestSuccessRecord("t", d.plusDays(1)).map(_.recordCount).contains(9L),
      "until must exclude the newer success")
    assert(bk.latestSuccessRecord("t", d.plusDays(9)).map(_.recordCount).contains(11L))
  }

  test("text: two concurrent lock-free writers on shared storage lose no records") {
    val path = tmp("bktext_conc_")
    val bkA = new BookkeeperText(spark, path)
    val bkB = new BookkeeperText(spark, path)
    val n = 50
    val threads = Seq(
      new Thread(() => (0 until n).foreach(i =>
        bkA.record(RunRecord("ta", d.plusDays(i.toLong), i.toLong, "succeeded", i.toLong, i.toLong + 1)))),
      new Thread(() => (0 until n).foreach(i =>
        bkB.record(RunRecord("tb", d.plusDays(i.toLong), i.toLong, "succeeded", i.toLong, i.toLong + 1)))))
    threads.foreach(_.start()); threads.foreach(_.join())
    val fresh = new BookkeeperText(spark, path)
    assert(fresh.all.size == 2 * n, "one-file-per-record appends cannot clobber each other")
    assert(fresh.get("ta", d.plusDays(7)).map(_.recordCount).contains(7L))
    assert(fresh.get("tb", d.plusDays(7)).map(_.recordCount).contains(7L))
  }

  test("text: the journal is plain Spark-readable pipe CSV; separator collisions rejected") {
    val path = tmp("bktext_csv_")
    val bk = new BookkeeperText(spark, path)
    bk.record(RunRecord("sales", d, 5, "succeeded", 1, 2))
    val df = spark.read.option("sep", "|")
      .schema(BookkeeperSpark.schema).csv(s"$path/records")
    val row = df.collect().head
    assert(row.getString(0) == "sales" && row.getLong(2) == 5L,
      "ops tooling must be able to read the journal without graft code")
    intercept[IllegalArgumentException](
      bk.record(RunRecord("bad|name", d, 1, "succeeded", 1, 2)))
  }

  test("delta: classpath gate fails loudly with the metastore's actionable message") {
    assume(!graft.meta.Metastore.deltaAvailable, "env has delta — gate not testable")
    val e = intercept[IllegalStateException](new BookkeeperDelta(spark, tmp("bkdelta_")))
    assert(e.getMessage.contains("delta-spark"), e.getMessage)
    assert(e.getMessage.contains("bookkeeping.text.path"), "must point at the alternatives")
  }

  test("delta plumbing on a stand-in batch format: append commits, cross-instance reads, newest wins") {
    val path = tmp("bkfmt_") + "/journal"
    val bk1 = new BookkeeperDelta(spark, path, format = "parquet")
    bk1.record(RunRecord("t", d, 1, "failed", 1, 2))
    bk1.record(RunRecord("t", d, 2, "succeeded", 3, 4))
    bk1.record(RunRecord("u", d, 3, "succeeded", 5, 6))
    val bk2 = new BookkeeperDelta(spark, path, format = "parquet")
    assert(bk2.isAlreadyRan("t", d) && bk2.isAlreadyRan("u", d))
    assert(bk2.get("t", d).map(_.recordCount).contains(2L))
    assert(bk2.all.size == 2)
    assert(bk2.latestSuccess("t").contains(d))
    // empty path: a reader before any record sees an empty journal,
    // not a missing-path error
    val empty = new BookkeeperDelta(spark, tmp("bkfmt_e_") + "/none", format = "parquet")
    assert(empty.all.isEmpty && empty.latestSuccess("t").isEmpty)
  }

  test("config: bookkeeping.text.path resolves the text backend; delta path gates; jdbc still wins") {
    val textPath = tmp("bkcfg_")
    val parsedText = PipelineConfig.parse(s"bookkeeping.text.path = $textPath\n")
    val stores = PipelineConfig.resolveStores(parsedText, new Bookkeeper(), Some(spark))
    assert(stores.bookkeeper.isInstanceOf[BookkeeperText])
    stores.bookkeeper.record(RunRecord("t", d, 1, "succeeded", 1, 2))
    assert(new BookkeeperText(spark, textPath).isAlreadyRan("t", d),
      "the resolved store must write to the configured path")
    // a Spark backend without a session at resolution must fail loudly
    val e = intercept[IllegalStateException](
      PipelineConfig.resolveStores(parsedText, new Bookkeeper()))
    assert(e.getMessage.contains("bookkeeping.text.path"), e.getMessage)
    // delta path wins over text and trips the classpath gate here
    assume(!graft.meta.Metastore.deltaAvailable)
    val parsedDelta = PipelineConfig.parse(
      s"bookkeeping.delta.path = ${tmp("bkcfg_d_")}\nbookkeeping.text.path = $textPath\n")
    val e2 = intercept[IllegalStateException](
      PipelineConfig.resolveStores(parsedDelta, new Bookkeeper(), Some(spark)))
    assert(e2.getMessage.contains("delta-spark"), e2.getMessage)
  }

  test("orchestrator runs against the text backend: skip-if-done across drivers") {
    val path = tmp("bktext_orch_")
    val ms = new graft.meta.Metastore(spark)
    import org.apache.spark.sql.functions._
    ms.register(graft.meta.MetaTable("bk_src", tmp("bktext_ms_") + "/src"))
    ms.register(graft.meta.MetaTable("bk_out", tmp("bktext_ms_") + "/out"))
    import spark.implicits._
    ms.saveTable("bk_src", d, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val job = JobDef(name = "copy", outputTable = "bk_out",
      transformer = new IdentityTransformer, inputTables = Seq("bk_src"),
      infoDateExpr = "@runDate",
      options = Map("input.table" -> "bk_src"))
    val r1 = new Orchestrator(ms, new BookkeeperText(spark, path))
      .run(Seq(job), d)
    assert(r1.head.isInstanceOf[TaskResult.Succeeded], r1.head.toString)
    // a SECOND driver with a FRESH bookkeeper instance sees the
    // completion through storage and skips
    val r2 = new Orchestrator(ms, new BookkeeperText(spark, path))
      .run(Seq(job), d)
    assert(r2.head.isInstanceOf[TaskResult.Skipped], r2.head.toString)
  }

  test("lock factory follows the bookkeeping backend: dynamo and mongo locks resolve") {
    // locks must live in the SAME store every driver shares — whatever
    // coordinates bookkeeping; hand-built factories stand in for the
    // wire clients (their lock semantics are pinned in DynamoSpec /
    // MongoSpec against the scripted servers)
    class NoopLock extends RunLock {
      def tryAcquire(): Boolean = true
      def release(): Unit = ()
    }
    val noopBk = new Bookkeeper() // in-memory stand-in
    val base = PipelineConfig.parse("allow.empty.pipeline = true\n")
    val dynLock = (t: String, dd: LocalDate) => new NoopLock: RunLock
    val withDyn = base.copy(dynamoBookkeeping = Some(() =>
      (null.asInstanceOf[graft.dynamo.BookkeeperDynamo], None, Some(dynLock), None)))
    assert(PipelineConfig.resolveStores(withDyn, noopBk).lockFactory.contains(dynLock),
      "dynamo bookkeeping must carry its conditional-put lock factory")
    val mongoLock = (t: String, dd: LocalDate) => new NoopLock: RunLock
    val withMongo = base.copy(mongoBookkeeping = Some(() =>
      (null.asInstanceOf[graft.mongo.BookkeeperMongo], Some(mongoLock), None)))
    assert(PipelineConfig.resolveStores(withMongo, noopBk).lockFactory.contains(mongoLock),
      "mongo bookkeeping must carry its unique-index lock factory")
    // dynamo wins over mongo (bookkeeping precedence) and the losing
    // backend's factory must NOT be invoked (it would open a socket)
    val both = base.copy(
      dynamoBookkeeping = Some(() =>
        (null.asInstanceOf[graft.dynamo.BookkeeperDynamo], None, Some(dynLock), None)),
      mongoBookkeeping = Some(() => fail("losing backend must not connect")))
    assert(PipelineConfig.resolveStores(both, noopBk).lockFactory.contains(dynLock))
    // declining locks declines the factory
    val noLocks = base.copy(dynamoBookkeeping = Some(() =>
      (null.asInstanceOf[graft.dynamo.BookkeeperDynamo], None, None, None)))
    assert(PipelineConfig.resolveStores(noLocks, noopBk).lockFactory.isEmpty)
  }

  test("journal follows the bookkeeping backend: dynamo > mongo > journal.path") {
    val noopBk = new Bookkeeper()
    val noopJournal = new Journal() // in-memory stand-in
    val fsDir = tmp("bkjnl_fs_")
    val base = PipelineConfig.parse(
      s"allow.empty.pipeline = true\njournal.path = $fsDir\n")
    // dynamo journal wins over journal.path
    val withDyn = base.copy(dynamoBookkeeping = Some(() =>
      (null.asInstanceOf[graft.dynamo.BookkeeperDynamo], None, None, Some(noopJournal))))
    assert(PipelineConfig.resolveStores(withDyn, noopBk).journal.contains(noopJournal),
      "the dynamo journal must win over journal.path")
    // mongo journal wins over journal.path too
    val withMongo = base.copy(mongoBookkeeping = Some(() =>
      (null.asInstanceOf[graft.mongo.BookkeeperMongo], None, Some(noopJournal))))
    assert(PipelineConfig.resolveStores(withMongo, noopBk).journal.contains(noopJournal))
    // a backend that declines its journal falls back to journal.path
    val declined = base.copy(dynamoBookkeeping = Some(() =>
      (null.asInstanceOf[graft.dynamo.BookkeeperDynamo], None, None, None)))
    val resolved = PipelineConfig.resolveStores(declined, noopBk).journal
    assert(resolved.exists(_.isInstanceOf[Journal]),
      "journal=false on the backend must fall back to the FS journal")
  }
}
