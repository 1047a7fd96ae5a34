package graft.databricks

/**
 * Databricks job-submission client (reference: pramen/core
 * .../core/databricks/DatabricksClientImpl.scala,
 * core/databricks/Responses.scala — DBFS file upload + transient-job
 * submit + poll-to-completion against the Jobs 2.1 API).
 *
 * HTTP goes through the [[HttpTransport]] seam: production uses the
 * JDK's `java.net.http` (no extra dependency), and this zero-egress
 * environment exercises the full protocol — URLs, bearer auth,
 * payload shapes, polling state machine, failure mapping — against a
 * scripted fake, the same driverless strategy as the JDBC layer.
 */
trait HttpTransport {
  /** POST `body` (JSON) to `url`; returns (statusCode, responseBody). */
  def post(url: String, body: String, headers: Map[String, String]): (Int, String)
  def get(url: String, headers: Map[String, String]): (Int, String)
  /** DELETE with a JSON body (the ECS cleanup API's verb — RFC 9110
    * allows a DELETE body and the JDK client sends it). Default throws
    * so transports predating the verb fail loudly instead of mapping
    * it onto POST silently. */
  def delete(url: String, body: String, headers: Map[String, String]): (Int, String) =
    throw new UnsupportedOperationException(s"${getClass.getName}: DELETE not implemented")
}

/** JDK-native transport — no client library dependency.
  * `trustAllSslCerts` installs an accept-anything trust manager for
  * endpoints with self-signed certs (reference:
  * extras/utils/httpclient/SimpleHttpClient trust-all mode) — opt-in,
  * never the default. */
final class JdkHttpTransport(timeoutSeconds: Long = 60,
                             trustAllSslCerts: Boolean = false) extends HttpTransport {
  private lazy val client = {
    val b = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
    if (trustAllSslCerts) {
      // X509ExtendedTrustManager, not X509TrustManager (r18 ADVICE):
      // when the endpoint-identification algorithm is set (the JDK
      // HttpClient forces "HTTPS" per connection), JSSE performs the
      // HOSTNAME check inside the trust manager's SSLEngine/Socket
      // checkServerTrusted variants — a plain X509TrustManager gets
      // wrapped by JSSE with a wrapper that re-adds the identity
      // check, which is why the r17 fix reached for the JVM-GLOBAL
      // jdk.internal.httpclient.disableHostnameVerification property
      // (read once at class load, weakening TLS for EVERY HttpClient
      // in the process). Overriding the extended variants as no-ops
      // bypasses both cert validation and endpoint identification for
      // THIS client only — per-client opt-in stays per-client.
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, Array[javax.net.ssl.TrustManager](
        new javax.net.ssl.X509ExtendedTrustManager {
          import java.security.cert.X509Certificate
          override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
          override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
          override def checkClientTrusted(c: Array[X509Certificate], a: String,
                                          s: java.net.Socket): Unit = ()
          override def checkServerTrusted(c: Array[X509Certificate], a: String,
                                          s: java.net.Socket): Unit = ()
          override def checkClientTrusted(c: Array[X509Certificate], a: String,
                                          e: javax.net.ssl.SSLEngine): Unit = ()
          override def checkServerTrusted(c: Array[X509Certificate], a: String,
                                          e: javax.net.ssl.SSLEngine): Unit = ()
          override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
        }), new java.security.SecureRandom())
      b.sslContext(ctx)
    }
    b.build()
  }

  private def send(b: java.net.http.HttpRequest.Builder,
                   headers: Map[String, String]): (Int, String) = {
    // setHeader REPLACES — a caller's Content-Type (e.g. the SigV4-signed
    // application/x-amz-json-1.0) must override the JSON default, not be
    // APPENDED as a second value that breaks the signature
    headers.foreach { case (k, v) => b.setHeader(k, v) }
    val resp = client.send(b.timeout(java.time.Duration.ofSeconds(timeoutSeconds)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  override def post(url: String, body: String, headers: Map[String, String]): (Int, String) =
    send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json"), headers)

  override def get(url: String, headers: Map[String, String]): (Int, String) =
    send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET(), headers)

  override def delete(url: String, body: String, headers: Map[String, String]): (Int, String) =
    send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .method("DELETE", java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json"), headers)
}

/** Terminal outcome of a polled run. */
final case class RunResult(runId: Long, lifeCycleState: String, resultState: String,
                           runPageUrl: String) {
  def isSuccess: Boolean = resultState == "SUCCESS"
}

final class DatabricksClient(host: String, token: String, http: HttpTransport,
                             pollIntervalMs: Long = 5000,
                             sleeper: Long => Unit = Thread.sleep,
                             maxWaitMs: Long = 12L * 3600 * 1000,
                             nowMs: () => Long = () => System.currentTimeMillis()) {
  private val baseUrl = host.stripSuffix("/")
  private val auth = Map("Authorization" -> s"Bearer $token")

  private[databricks] def createFileUrl = s"$baseUrl/api/2.0/dbfs/put"
  private[databricks] def runSubmitUrl = s"$baseUrl/api/2.1/jobs/runs/submit"
  private[databricks] def runStatusUrl(runId: Long) =
    s"$baseUrl/api/2.1/jobs/runs/get?run_id=$runId"

  /** Upload a small file to DBFS (the reference stages pramen-py job
    * configs this way before submitting the run that reads them). */
  def createFile(content: String, destination: String, overwrite: Boolean = false): Unit = {
    val payload = Json.obj(
      "path" -> Json.str(destination),
      "contents" -> Json.str(java.util.Base64.getEncoder.encodeToString(
        content.getBytes("UTF-8"))),
      "overwrite" -> overwrite.toString)
    val (code, body) = http.post(createFileUrl, payload, auth)
    // strict 2xx like runTransientJob: the JDK client never follows
    // redirects by default, so a 3xx here means NO upload happened —
    // '< 400 is fine' let the transient job fail later hunting for a
    // config file that was never staged (r17 review)
    if (code < 200 || code >= 300)
      throw new RuntimeException(s"Failed to create file at $destination (HTTP $code): $body")
  }

  /** Submit a transient (one-time) job and block until it terminates;
    * throws on submit rejection or non-SUCCESS terminal state. */
  def runTransientJob(jobJson: String): RunResult = {
    val (code, body) = http.post(runSubmitUrl, jobJson, auth)
    if (code < 200 || code >= 300)
      throw new RuntimeException(s"Could not submit a run to Databricks. Response: $body")
    val runId = Json.long(body, "run_id").getOrElse(
      throw new RuntimeException(s"Submit response carried no run_id: $body"))
    val result = waitForFinish(runId)
    if (!result.isSuccess)
      throw new RuntimeException(s"Databricks run $runId failed: " +
        s"${result.lifeCycleState}/${result.resultState} (${result.runPageUrl})")
    result
  }

  /** Terminal life-cycle states per the Jobs API: TERMINATED (ran to
    * an end state), SKIPPED (never ran — e.g. concurrency limit) and
    * INTERNAL_ERROR. Anything else keeps polling. */
  private val TerminalStates = Set("TERMINATED", "SKIPPED", "INTERNAL_ERROR")

  private[databricks] def waitForFinish(runId: Long): RunResult = {
    // hard deadline: a run stuck in a queued/pending life-cycle state
    // (zombie cluster, concurrency starvation) must fail the pipeline
    // task loudly, not hold its thread forever
    val deadline = nowMs() + maxWaitMs
    var status = runStatus(runId)
    while (!TerminalStates.contains(status.lifeCycleState)) {
      if (nowMs() >= deadline)
        throw new RuntimeException(s"Databricks run $runId did not reach a terminal " +
          s"state within $maxWaitMs ms (last: ${status.lifeCycleState}); giving up")
      sleeper(pollIntervalMs)
      status = runStatus(runId)
    }
    status
  }

  private[databricks] def runStatus(runId: Long): RunResult = {
    val (code, body) = http.get(runStatusUrl(runId), auth)
    // a failed status call must throw, not poll forever: an error body
    // carries no life_cycle_state, which would read as a permanent
    // non-terminal "UNKNOWN" (expired token, deleted run, bad host)
    if (code < 200 || code >= 300)
      throw new RuntimeException(s"Databricks run-status call failed for run $runId " +
        s"(HTTP $code): $body")
    // life-cycle fields come from the TOP-LEVEL "state" object: a
    // multi-task run carries one state per task inside `tasks`, and a
    // first-match-anywhere read could latch a task still RUNNING after
    // the run itself TERMINATED
    val root = Json.parseObj(body)
    val state = root.get("state") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => root // 2.0-style flat body
    }
    def strAt(m: Map[String, Any], k: String) = m.get(k).collect { case s: String => s }
    RunResult(runId,
      strAt(state, "life_cycle_state").getOrElse("UNKNOWN"),
      strAt(state, "result_state").getOrElse(""),
      strAt(root, "run_page_url").getOrElse(""))
  }
}

/**
 * Job-definition templating for transient runs (reference: pramen/core
 * .../core/databricks/PramenPyJobTemplate.scala — the reference holds
 * the user's job map in config and substitutes the python class,
 * metastore config location and info date into its string values).
 * graft keeps the template as the JSON document `runTransientJob`
 * takes, with `@name` tokens replaced by JSON-escaped values — a
 * substituted value containing quotes or newlines cannot break the
 * document.
 */
object DatabricksJobTemplate {
  private val Token = "@([A-Za-z][A-Za-z0-9_]*)".r

  /** Replace each `@key` token with its JSON-string-escaped value in
    * ONE pass over the original template — a substituted value that
    * itself contains an `@key` token is never rescanned (sequential
    * replacement would let user data inject into later variables).
    * Per token, the longest matching key wins so `@infoDateStr` is
    * never clipped by `@infoDate`. */
  def render(templateJson: String, vars: Map[String, String]): String = {
    val keysByLength = vars.keys.toSeq.sortBy(-_.length)
    Token.replaceAllIn(templateJson, m => {
      val tok = m.group(1)
      java.util.regex.Matcher.quoteReplacement(
        keysByLength.find(tok.startsWith) match {
          case Some(k) =>
            Json.str(vars(k)).stripPrefix("\"").stripSuffix("\"") + tok.substring(k.length)
          case None => m.matched // unknown token: left verbatim
        })
    })
  }

  /** The standard variable set for a transformer run (the reference's
    * PYTHON_CLASS_VAR / METASTORE_CONFIG_VAR / INFO_DATE_VAR trio,
    * generalized past python). */
  def transformerVars(transformerClass: String, configLocation: String,
                      infoDate: java.time.LocalDate): Map[String, String] =
    Map("transformerClass" -> transformerClass,
      "configLocation" -> configLocation,
      "infoDate" -> infoDate.toString)
}

/** Minimal JSON helpers: render (escaped strings, flat objects) and a
  * small recursive-descent parser — regex extraction read the FIRST
  * `"field": "..."` anywhere in the body, which breaks on multi-task
  * run states nested in `tasks` and on values with escaped quotes. A
  * parser dependency would buy nothing in this environment. */
private[graft] object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")

  /** Parse a JSON document to Map[String, Any] / List[Any] / String /
    * Long / Double / Boolean / null; None on malformed input. */
  def parse(json: String): Option[Any] =
    try {
      val p = new Parser(json)
      val v = p.value()
      p.skipWs()
      if (p.atEnd) Some(v) else None
    } catch { case _: Exception => None }

  /** Top-level object fields; empty map when the body is not an object
    * (error pages, truncated responses) so callers degrade to their
    * "UNKNOWN" defaults instead of crashing the poll loop. */
  def parseObj(json: String): Map[String, Any] = parse(json) match {
    case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }

  def field(json: String, name: String): Option[String] =
    parseObj(json).get(name).collect { case s: String => s }
  def long(json: String, name: String): Option[Long] =
    parseObj(json).get(name).collect { case l: Long => l }

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def ch: Char = { require(i < s.length, "unexpected end"); s.charAt(i) }
    private def expect(lit: String): Unit = {
      require(s.regionMatches(i, lit, 0, lit.length), s"expected $lit at $i")
      i += lit.length
    }

    def value(): Any = { skipWs(); ch match {
      case '{' => objValue()
      case '[' => arrValue()
      case '"' => stringValue()
      case 't' => expect("true"); true
      case 'f' => expect("false"); false
      case 'n' => expect("null"); null
      case _   => numberValue()
    }}

    private def objValue(): Map[String, Any] = {
      i += 1; skipWs()
      val b = Map.newBuilder[String, Any]
      if (ch == '}') { i += 1; return b.result() }
      var more = true
      while (more) {
        skipWs()
        val k = stringValue()
        skipWs(); require(ch == ':', s"expected : at $i"); i += 1
        b += k -> value()
        skipWs()
        ch match {
          case ',' => i += 1
          case '}' => i += 1; more = false
          case c   => throw new IllegalArgumentException(s"expected , or }} got $c at $i")
        }
      }
      b.result()
    }

    private def arrValue(): List[Any] = {
      i += 1; skipWs()
      val b = List.newBuilder[Any]
      if (ch == ']') { i += 1; return b.result() }
      var more = true
      while (more) {
        b += value()
        skipWs()
        ch match {
          case ',' => i += 1
          case ']' => i += 1; more = false
          case c   => throw new IllegalArgumentException(s"expected , or ] got $c at $i")
        }
      }
      b.result()
    }

    private def stringValue(): String = {
      require(ch == '"', s"expected string at $i"); i += 1
      val sb = new StringBuilder
      while (ch != '"') {
        if (ch == '\\') {
          i += 1
          sb += (ch match {
            case '"'  => '"'
            case '\\' => '\\'
            case '/'  => '/'
            case 'b'  => '\b'
            case 'f'  => '\f'
            case 'n'  => '\n'
            case 'r'  => '\r'
            case 't'  => '\t'
            case 'u'  =>
              val cp = Integer.parseInt(s.substring(i + 1, i + 5), 16); i += 4; cp.toChar
            case c => throw new IllegalArgumentException(s"bad escape \\$c at $i")
          })
          i += 1
        } else { sb += ch; i += 1 }
      }
      i += 1
      sb.toString
    }

    private def numberValue(): Any = {
      val start = i
      while (i < s.length && (ch.isDigit || "+-.eE".indexOf(ch) >= 0)) i += 1
      val text = s.substring(start, i)
      if (text.exists(c => c == '.' || c == 'e' || c == 'E')) text.toDouble else text.toLong
    }
  }
}
