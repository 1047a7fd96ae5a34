package graft.databricks

import org.scalatest.funsuite.AnyFunSuite

/** Protocol specs against a scripted transport — no egress in this
  * environment, so URLs/auth/payloads/polling are what's verifiable
  * (reference: core/databricks/DatabricksClientImpl.scala). */
final class FakeTransport extends HttpTransport {
  val posts = scala.collection.mutable.ArrayBuffer.empty[(String, String, Map[String, String])]
  val gets = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String])]
  var postResponses: List[(Int, String)] = Nil
  var getResponses: List[(Int, String)] = Nil

  override def post(url: String, body: String, headers: Map[String, String]): (Int, String) = {
    posts += ((url, body, headers))
    val r = postResponses.head; postResponses = postResponses.tail; r
  }
  override def get(url: String, headers: Map[String, String]): (Int, String) = {
    gets += ((url, headers))
    val r = getResponses.head; getResponses = getResponses.tail; r
  }
}

class DatabricksClientSpec extends AnyFunSuite {
  private def client(t: FakeTransport) =
    new DatabricksClient("https://dbx.example.com/", "tok123", t,
      pollIntervalMs = 1, sleeper = _ => ())

  test("createFile posts base64 content to the dbfs put endpoint with bearer auth") {
    val t = new FakeTransport
    t.postResponses = List((200, "{}"))
    client(t).createFile("hello config", "/pramen/cfg.yml", overwrite = true)
    val (url, body, headers) = t.posts.head
    assert(url == "https://dbx.example.com/api/2.0/dbfs/put", "trailing slash must strip")
    assert(headers("Authorization") == "Bearer tok123")
    assert(body.contains("\"path\": \"/pramen/cfg.yml\""))
    val b64 = java.util.Base64.getEncoder.encodeToString("hello config".getBytes("UTF-8"))
    assert(body.contains(s""""contents": "$b64""""), body)
    assert(body.contains("\"overwrite\": true"))
  }

  test("createFile surfaces 4xx failures") {
    val t = new FakeTransport
    t.postResponses = List((403, """{"error":"nope"}"""))
    val e = intercept[RuntimeException](client(t).createFile("x", "/y"))
    assert(e.getMessage.contains("/y") && e.getMessage.contains("nope"))
  }

  test("runTransientJob submits, polls through pending states, returns on TERMINATED/SUCCESS") {
    val t = new FakeTransport
    t.postResponses = List((200, """{"run_id": 42}"""))
    t.getResponses = List(
      (200, """{"run_id":"42","state":{"life_cycle_state":"PENDING"}}"""),
      (200, """{"run_id":"42","state":{"life_cycle_state":"RUNNING"}}"""),
      (200, """{"run_id":"42","run_page_url":"https://dbx/run/42","state":{"life_cycle_state":"TERMINATED","result_state":"SUCCESS"}}"""))
    val r = client(t).runTransientJob("""{"run_name":"graft-job"}""")
    assert(r.runId == 42L && r.isSuccess)
    assert(t.posts.head._1.endsWith("/api/2.1/jobs/runs/submit"))
    assert(t.gets.map(_._1).distinct ==
      Seq("https://dbx.example.com/api/2.1/jobs/runs/get?run_id=42"))
    assert(t.gets.size == 3, "must poll until a terminal life-cycle state")
  }

  test("runTransientJob throws on submit rejection and on failed terminal states") {
    val t1 = new FakeTransport
    t1.postResponses = List((400, """{"error":"bad cluster"}"""))
    assert(intercept[RuntimeException](client(t1).runTransientJob("{}"))
      .getMessage.contains("bad cluster"))

    val t2 = new FakeTransport
    t2.postResponses = List((200, """{"run_id": 7}"""))
    t2.getResponses = List(
      (200, """{"state":{"life_cycle_state":"TERMINATED","result_state":"FAILED"}}"""))
    val e2 = intercept[RuntimeException](client(t2).runTransientJob("{}"))
    assert(e2.getMessage.contains("TERMINATED/FAILED"), e2.getMessage)

    val t3 = new FakeTransport
    t3.postResponses = List((200, """{"run_id": 8}"""))
    t3.getResponses = List(
      (200, """{"state":{"life_cycle_state":"INTERNAL_ERROR"}}"""))
    assert(intercept[RuntimeException](client(t3).runTransientJob("{}"))
      .getMessage.contains("INTERNAL_ERROR"))
  }

  test("poll treats SKIPPED as terminal and fails instead of spinning") {
    val t = new FakeTransport
    t.postResponses = List((200, """{"run_id": 9}"""))
    t.getResponses = List(
      (200, """{"state":{"life_cycle_state":"SKIPPED"}}"""))
    val e = intercept[RuntimeException](client(t).runTransientJob("{}"))
    assert(e.getMessage.contains("SKIPPED"), e.getMessage)
    assert(t.gets.size == 1, "SKIPPED is terminal — no further polling")
  }

  test("a failed run-status call throws instead of polling forever") {
    val t = new FakeTransport
    t.postResponses = List((200, """{"run_id": 10}"""))
    // an expired token returns 403 with an error body carrying no
    // life_cycle_state — before the fix this read as a permanent
    // non-terminal UNKNOWN and the client looped forever
    t.getResponses = List((403, """{"error_code":"PERMISSION_DENIED"}"""))
    val e = intercept[RuntimeException](client(t).runTransientJob("{}"))
    assert(e.getMessage.contains("403") && e.getMessage.contains("PERMISSION_DENIED"),
      e.getMessage)
  }

  test("job template substitutes variables JSON-escaped, longest key first") {
    val template =
      """{"run_name": "graft @transformerClass @infoDate",
        |"notebook_params": {"config": "@configLocation", "note": "@noteLong"}}""".stripMargin
    val rendered = DatabricksJobTemplate.render(template,
      DatabricksJobTemplate.transformerVars(
        "jobs.MyTransform", "dbfs:/cfg/a.yml", java.time.LocalDate.parse("2024-06-15"))
        ++ Map("note" -> "WRONG", "noteLong" -> "has \"quotes\"\nand newline"))
    assert(rendered.contains("graft jobs.MyTransform 2024-06-15"))
    assert(rendered.contains("\"config\": \"dbfs:/cfg/a.yml\""))
    // longest-key-first: @noteLong must not be clipped by @note; the
    // quotes and newline arrive JSON-escaped so the document stays valid
    assert(rendered.contains("has \\\"quotes\\\"\\u000aand newline"), rendered)
    assert(!rendered.contains("WRONGLong"))
  }

  test("json helpers: escaping and field extraction") {
    assert(Json.str("a\"b\\c") == "\"a\\\"b\\\\c\"")
    assert(Json.long("""{"run_id": 42, "x": 1}""", "run_id").contains(42L))
    assert(Json.field("""{"a" : "v1"}""", "a").contains("v1"))
    assert(Json.field("""{"a":"v"}""", "missing").isEmpty)
  }

  test("poll gives up at maxWaitMs when the run never reaches a terminal state") {
    val t = new FakeTransport
    t.postResponses = List((200, """{"run_id": 11}"""))
    // endless PENDING: a zombie queue must not hold the task thread forever
    t.getResponses = List.fill(1000)(
      (200, """{"state":{"life_cycle_state":"PENDING"}}"""))
    var clock = 0L
    val c = new DatabricksClient("https://dbx.example.com", "tok", t,
      pollIntervalMs = 1, sleeper = _ => clock += 60000L,
      maxWaitMs = 300000L, nowMs = () => clock)
    val e = intercept[RuntimeException](c.runTransientJob("{}"))
    assert(e.getMessage.contains("300000 ms") && e.getMessage.contains("PENDING"), e.getMessage)
    assert(t.gets.size == 6, s"5 minutes at one poll per minute, then give up: ${t.gets.size}")
  }

  test("run state comes from the TOP-LEVEL state object, not a task's nested state") {
    val t = new FakeTransport
    t.postResponses = List((200, """{"run_id": 42}"""))
    // real multi-task Jobs 2.1 body: a task-level state still says
    // RUNNING while the run itself TERMINATED — first-match-anywhere
    // extraction would latch RUNNING and poll forever
    t.getResponses = List((200,
      """{"run_id": 42,
        | "tasks": [{"task_key": "a", "state": {"life_cycle_state": "RUNNING"}},
        |           {"task_key": "b", "state": {"life_cycle_state": "TERMINATED", "result_state": "FAILED"}}],
        | "state": {"life_cycle_state": "TERMINATED", "result_state": "SUCCESS"},
        | "run_page_url": "https://dbx/run?name=\"quoted\""}""".stripMargin))
    val r = client(t).runTransientJob("{}")
    assert(r.isSuccess, "must read the run-level state, not task b's FAILED")
    assert(t.gets.size == 1, "TERMINATED at the run level ends polling")
    assert(r.runPageUrl == "https://dbx/run?name=\"quoted\"",
      "escaped quotes in string values must parse intact")
  }

  test("template render is single-pass: substituted values are never rescanned") {
    // user data that LOOKS like a template token must arrive as data
    val rendered = DatabricksJobTemplate.render(
      """{"cls": "@transformerClass", "cfg": "@configLocation"}""",
      Map("transformerClass" -> "evil @configLocation",
          "configLocation" -> "dbfs:/secret.yml"))
    assert(rendered.contains("\"cls\": \"evil @configLocation\""),
      s"value must not be re-substituted: $rendered")
    assert(rendered.contains("\"cfg\": \"dbfs:/secret.yml\""))
    // unknown tokens stay verbatim (same as the sequential renderer)
    assert(DatabricksJobTemplate.render("""{"x": "@unknownVar"}""", Map("a" -> "b"))
      == """{"x": "@unknownVar"}""")
  }

  test("json parser: nested structures, arrays, numbers, escapes, malformed input") {
    val parsed = Json.parseObj(
      """{"a": [1, 2.5, {"b": "c\nd"}], "t": true, "n": null, "neg": -7}""")
    assert(parsed("a").asInstanceOf[List[Any]].head == 1L)
    assert(parsed("a").asInstanceOf[List[Any]](1) == 2.5)
    assert(parsed("a").asInstanceOf[List[Any]](2).asInstanceOf[Map[String, Any]]("b") == "c\nd")
    assert(parsed("t") == true && parsed("neg") == -7L)
    assert(Json.parse("""{"broken": """).isEmpty)
    assert(Json.parseObj("<html>error page</html>").isEmpty)
    assert(Json.parse("{\"u\": \"\\u00e9\"}").contains(Map("u" -> "\u00e9")),
      "\\u escapes must decode")
  }

  test("trust-all is per-client: mismatched self-signed HTTPS works WITHOUT the global property") {
    // r18 ADVICE: the old implementation set the JVM-GLOBAL
    // jdk.internal.httpclient.disableHostnameVerification property —
    // disabling hostname verification for EVERY HttpClient in the
    // process, and a no-op if any client was built first. The
    // X509ExtendedTrustManager no-ops both cert validation and
    // endpoint identification for THIS client only.
    val dir = java.nio.file.Files.createTempDirectory("graft-dbx-tls")
    val ksPath = dir.resolve("server.p12")
    import scala.sys.process._
    // CN deliberately NOT the connect address: hostname verification
    // would reject even a trusted cert (the SAN-less self-signed case)
    val rc = Seq("keytool", "-genkeypair", "-alias", "k", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", ksPath.toString,
      "-storepass", "changeit", "-dname", "CN=bogus-host", "-validity", "1").!
    assert(rc == 0, "keytool failed")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fin = java.nio.file.Files.newInputStream(ksPath)
    try ks.load(fin, "changeit".toCharArray) finally fin.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val server = com.sun.net.httpserver.HttpsServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(serverCtx))
    server.createContext("/ping", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = "pong".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    server.start()
    val url = s"https://127.0.0.1:${server.getAddress.getPort}/ping"
    try {
      val (status, body) = new JdkHttpTransport(trustAllSslCerts = true).get(url, Map.empty)
      assert(status == 200 && body == "pong")
      assert(System.getProperty("jdk.internal.httpclient.disableHostnameVerification") == null,
        "trust-all must not weaken TLS process-wide")
      // the default transport still rejects the bogus cert — trust-all
      // genuinely is opt-in, not ambient state left by the first call
      intercept[java.io.IOException](new JdkHttpTransport().get(url, Map.empty))
    } finally server.stop(0)
  }
}
