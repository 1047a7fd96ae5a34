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
}

/** JDK-native transport — no client library dependency. */
final class JdkHttpTransport(timeoutSeconds: Long = 60) extends HttpTransport {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()

  private def send(b: java.net.http.HttpRequest.Builder,
                   headers: Map[String, String]): (Int, String) = {
    headers.foreach { case (k, v) => b.header(k, v) }
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
}

/** Terminal outcome of a polled run. */
final case class RunResult(runId: Long, lifeCycleState: String, resultState: String,
                           runPageUrl: String) {
  def isSuccess: Boolean = resultState == "SUCCESS"
}

final class DatabricksClient(host: String, token: String, http: HttpTransport,
                             pollIntervalMs: Long = 5000,
                             sleeper: Long => Unit = Thread.sleep) {
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
    if (code >= 400)
      throw new RuntimeException(s"Failed to create file at $destination: $body")
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
    var status = runStatus(runId)
    while (!TerminalStates.contains(status.lifeCycleState)) {
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
    RunResult(runId,
      Json.field(body, "life_cycle_state").getOrElse("UNKNOWN"),
      Json.field(body, "result_state").getOrElse(""),
      Json.field(body, "run_page_url").getOrElse(""))
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
  /** Replace each `@key` token with its JSON-string-escaped value.
    * Longer keys substitute first so `@infoDateStr` is never clipped
    * by `@infoDate`. */
  def render(templateJson: String, vars: Map[String, String]): String =
    vars.toSeq.sortBy(-_._1.length).foldLeft(templateJson) { case (acc, (k, v)) =>
      acc.replace("@" + k, Json.str(v).stripPrefix("\"").stripSuffix("\""))
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

/** Minimal fixed-shape JSON helpers (same approach as the bookkeeper
  * journal: the API's relevant fields are flat strings/longs, a
  * parser dependency would buy nothing in this environment). */
private[databricks] object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")
  def field(json: String, name: String): Option[String] =
    ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(json).map(_.group(1))
  def long(json: String, name: String): Option[Long] =
    ("\"" + name + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json).map(_.group(1).toLong)
}
