package graft.pipeline

import java.time.LocalDate

import graft.SparkSpec
import graft.databricks.HttpTransport
import graft.meta.{DataFormat, MetaTable}

/** Extras notification targets (reference EcsNotificationTarget /
  * HyperdriveNotificationTarget): request shapes against a scripted
  * transport, eligibility rules, failure isolation, FQCN + configure
  * wiring, and one live-HTTP e2e over the JDK's built-in server. */
class ExtrasTargetsSpec extends SparkSpec {

  private val d = LocalDate.parse("2024-05-01")

  private final class ScriptedHttp(status: Int = 200,
                                   fail: Boolean = false) extends HttpTransport {
    val calls = collection.mutable.ArrayBuffer.empty[(String, String, String, Map[String, String])]
    override def post(url: String, body: String, headers: Map[String, String]): (Int, String) =
      throw new IllegalStateException("ECS cleanup must use DELETE")
    override def get(url: String, headers: Map[String, String]): (Int, String) =
      throw new IllegalStateException("unexpected GET")
    override def delete(url: String, body: String, headers: Map[String, String]): (Int, String) = {
      if (fail) throw new java.io.IOException("connection refused")
      calls += (("DELETE", url, body, headers))
      (status, "{}")
    }
  }

  private def s3Table(name: String = "sales") =
    MetaTable(name, s"s3a://bucket/data/$name")

  test("ecs: succeeded parquet s3a task fires DELETE <url>/kk with x-api-key and the partition path") {
    val http = new ScriptedHttp()
    val t = new EcsCleanupTarget("https://ecs.local/api", "sekret", http,
      Map("sales" -> s3Table()).get)
    t.onTaskCompleted(TaskResult.Succeeded("j1", "sales", d, 10), d)
    assert(http.calls.size == 1)
    val (_, url, body, headers) = http.calls.head
    assert(url == "https://ecs.local/api/kk", url)
    assert(body == """{"ecs_path":"bucket/data/sales/info_date=2024-05-01"}""", body)
    assert(headers.get("x-api-key").contains("sekret"))
    // an url already ending in /kk is not doubled
    val t2 = new EcsCleanupTarget("https://ecs.local/api/kk", "k", http, Map("sales" -> s3Table()).get)
    t2.onTaskCompleted(TaskResult.Succeeded("j1", "sales", d, 1), d)
    assert(http.calls.last._2 == "https://ecs.local/api/kk")
  }

  test("ecs: non-s3 paths, non-parquet formats, unknown tables and failed tasks are all skipped") {
    val http = new ScriptedHttp()
    val tables = Map(
      "hdfs_t" -> MetaTable("hdfs_t", "/data/hdfs_t"),
      "delta_t" -> MetaTable("delta_t", "s3a://b/delta_t", format = DataFormat.Delta))
    val t = new EcsCleanupTarget("https://e/api", "k", http, tables.get)
    t.onTaskCompleted(TaskResult.Succeeded("j", "hdfs_t", d, 1), d)   // not s3
    t.onTaskCompleted(TaskResult.Succeeded("j", "delta_t", d, 1), d)  // not parquet
    t.onTaskCompleted(TaskResult.Succeeded("j", "ghost", d, 1), d)    // unknown table
    t.onTaskCompleted(TaskResult.Failed("j", new RuntimeException("x")), d)
    t.onTaskCompleted(TaskResult.Skipped("j", "done"), d)
    assert(http.calls.isEmpty, http.calls.toSeq.toString)
  }

  test("ecs: transport failures and non-200 responses log, never propagate to the pipeline") {
    val boom = new EcsCleanupTarget("https://e", "k", new ScriptedHttp(fail = true),
      Map("sales" -> s3Table()).get)
    boom.onTaskCompleted(TaskResult.Succeeded("j", "sales", d, 1), d) // must not throw
    val bad = new ScriptedHttp(status = 500)
    val t = new EcsCleanupTarget("https://e", "k", bad, Map("sales" -> s3Table()).get)
    t.onTaskCompleted(TaskResult.Succeeded("j", "sales", d, 1), d)    // must not throw
    assert(bad.calls.size == 1)
  }

  test("ecs pipeline-level sweep: ONE pass at completion cleans every succeeded eligible table exactly once") {
    val http = new ScriptedHttp()
    val tables = Map(
      "sales" -> s3Table("sales"),
      "stock" -> s3Table("stock"),
      "hdfs_t" -> MetaTable("hdfs_t", "/data/hdfs_t"))
    val t = new EcsPipelineCleanupTarget("https://ecs.local/api", "sekret", http, tables.get)
    val results = Seq(
      TaskResult.Succeeded("j1", "sales", d, 10),
      TaskResult.Succeeded("j2", "stock", d.plusDays(1), 5),
      TaskResult.Succeeded("j3", "hdfs_t", d, 3),              // ineligible path: skipped
      TaskResult.Failed("j4", new RuntimeException("boom")),   // not a success: skipped
      TaskResult.Skipped("j5", "already done"))
    // per-task hook is a no-op for the pipeline-level target
    results.foreach(r => t.onTaskCompleted(r, d))
    assert(http.calls.isEmpty, "pipeline-level target must not fire per task")
    t.onPipelineCompleted(results, d)
    assert(http.calls.size == 2, http.calls.toSeq.toString)
    val bodies = http.calls.map(_._3).toSet
    assert(bodies == Set(
      """{"ecs_path":"bucket/data/sales/info_date=2024-05-01"}""",
      """{"ecs_path":"bucket/data/stock/info_date=2024-05-02"}"""), bodies)
    assert(http.calls.forall(_._2 == "https://ecs.local/api/kk"))
    assert(http.calls.forall(_._4.get("x-api-key").contains("sekret")))
    // never-fail rule holds for the sweep too
    val boom = new EcsPipelineCleanupTarget("https://e", "k", new ScriptedHttp(fail = true), tables.get)
    boom.onPipelineCompleted(results, d) // must not throw
  }

  test("ecs pipeline-level: FQCN + configure wiring over a multi-table config") {
    val cfg = PipelineConfig.parse(
      """notification.targets = graft.pipeline.EcsPipelineCleanupTarget
        |ecs.api.url = https://ecs.local/api
        |ecs.api.key = sekret
        |table.sales.path = s3a://bucket/data/sales
        |allow.empty.pipeline = true
        |""".stripMargin)
    val target = cfg.notificationTargets.collectFirst {
      case t: EcsPipelineCleanupTarget => t }.getOrElse(fail("target not instantiated"))
    assert(target.apiUrl.contains("https://ecs.local/api"))
    target.http = new ScriptedHttp() // swap transport after configure
    target.onPipelineCompleted(Seq(TaskResult.Succeeded("j", "sales", d, 1)), d)
    assert(target.http.asInstanceOf[ScriptedHttp].calls.size == 1)
    // missing required key still fails the CONFIG LOAD
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(
      """notification.targets = graft.pipeline.EcsPipelineCleanupTarget
        |ecs.api.key = k
        |allow.empty.pipeline = true
        |""".stripMargin))
    assert(e.getMessage.contains("ecs.api.url"), e.getMessage)
  }

  test("ecs: FQCN + configure wiring — missing required keys fail the CONFIG LOAD") {
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(
      """notification.targets = graft.pipeline.EcsCleanupTarget
        |ecs.api.key = k
        |allow.empty.pipeline = true
        |""".stripMargin))
    assert(e.getMessage.contains("ecs.api.url"), e.getMessage)
  }

  test("ecs: e2e over a live local HTTP server through config-declared FQCN target") {
    val received = new java.util.concurrent.LinkedBlockingQueue[(String, String, String)]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/kk", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      received.put((ex.getRequestMethod, ex.getRequestHeaders.getFirst("x-api-key"), body))
      val resp = "{}".getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val parsed = PipelineConfig.parse(
        s"""notification.targets = graft.pipeline.EcsCleanupTarget
           |ecs.api.url = http://127.0.0.1:$port/api
           |ecs.api.key = e2e-key
           |table.sales.path = s3a://bucket/data/sales
           |allow.empty.pipeline = true
           |""".stripMargin)
      val target = parsed.notificationTargets.head
      target.onTaskCompleted(TaskResult.Succeeded("j1", "sales", d, 5), d)
      val got = received.poll(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(got != null, "no HTTP call arrived")
      assert(got == (("DELETE", "e2e-key",
        """{"ecs_path":"bucket/data/sales/info_date=2024-05-01"}""")), got.toString)
    } finally server.stop(0)
  }

  private final class ScriptedProducer extends SingleMessageProducer {
    val sent = collection.mutable.ArrayBuffer.empty[(String, String)]
    var connects = 0; var closes = 0
    override def connect(): Unit = connects += 1
    override def send(topic: String, message: String): Unit = sent += ((topic, message))
    override def close(): Unit = closes += 1
  }

  test("hyperdrive: token sent on success only; tokenless jobs warn and skip; producer lifecycle") {
    val p = new ScriptedProducer
    val t = new HyperdriveNotifyTarget(p, "hd.topic",
      Map("ingest_sales" -> "token-123").get)
    t.onTaskCompleted(TaskResult.Succeeded("ingest_sales", "sales", d, 10), d)
    t.onTaskCompleted(TaskResult.Failed("ingest_sales", new RuntimeException("x")), d)
    t.onTaskCompleted(TaskResult.Succeeded("other_job", "t2", d, 1), d) // no token
    assert(p.sent.toSeq == Seq(("hd.topic", "token-123")))
    assert(p.connects == 1 && p.closes == 1, "connect/close must bracket exactly the sends")
  }

  test("hyperdrive: configure builds the job-name -> token map from job options; missing topic fails the load") {
    val t = new HyperdriveNotifyTarget(new ScriptedProducer, "", _ => None)
    t.configure(Map(
      "hyperdrive.kafka.topic" -> "hd",
      "hyperdrive.kafka.bootstrap.servers" -> "b:9092",
      "job.1.name" -> "ingest_a",
      "job.1.option.notification.hyperdrive.token" -> "tok-a",
      "job.2.name" -> "ingest_b"), Nil)
    assert(t.topic == "hd")
    assert(t.tokensByJob("ingest_a").contains("tok-a"))
    assert(t.tokensByJob("ingest_b").isEmpty)
    val e = intercept[IllegalArgumentException](
      new HyperdriveNotifyTarget().configure(Map.empty, Nil))
    assert(e.getMessage.contains("hyperdrive.kafka.topic"), e.getMessage)
  }

  test("hyperdrive: orchestrator e2e — the token fires exactly when the configured job succeeds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val p = new ScriptedProducer
    val target = new HyperdriveNotifyTarget(p, "hd", Map("copy" -> "tok-copy").get)
    val base = java.nio.file.Files.createTempDirectory("hd_ms_").toString
    val ms = new graft.meta.Metastore(spark)
    ms.register(MetaTable("hd_src", s"$base/src"))
    ms.register(MetaTable("hd_out", s"$base/out"))
    ms.saveTable("hd_src", d, Seq((1, "a")).toDF("id", "v"))
    val job = JobDef(name = "copy", outputTable = "hd_out",
      transformer = new IdentityTransformer, inputTables = Seq("hd_src"),
      infoDateExpr = "@runDate", options = Map("input.table" -> "hd_src"))
    val bk = new Bookkeeper()
    val res = new Orchestrator(ms, bk, notifiers = Seq(target)).run(Seq(job), d)
    assert(res.head.isInstanceOf[TaskResult.Succeeded], res.head.toString)
    assert(p.sent.toSeq == Seq(("hd", "tok-copy")))
    // second run skips via the bookkeeper -> no duplicate token
    val res2 = new Orchestrator(ms, bk, notifiers = Seq(target)).run(Seq(job), d)
    assert(!res2.head.isInstanceOf[TaskResult.Succeeded])
    assert(p.sent.size == 1, "a skipped run must not re-trigger downstream ingestion")
  }
}
