package graft.pipeline

import java.time.LocalDate

import graft.databricks.{HttpTransport, JdkHttpTransport}
import graft.meta.{DataFormat, MetaTable, PartitionScheme}

/**
 * The reference's "extras" notification targets, re-expressed over
 * graft's seams: ECS storage cleanup over the [[HttpTransport]] HTTP
 * seam (reference: pramen/extras .../extras/notification/
 * EcsNotificationTarget.scala:35) and the Hyperdrive token notify
 * over a single-message producer seam (reference:
 * .../extras/notification/HyperdriveNotificationTarget.scala:28 +
 * notification/mq/SingleMessageProducerKafka.scala).
 *
 * Both are hosted by the M38 FQCN mechanism (`notification.targets`)
 * and pick up their settings through [[ConfigurableTarget]] — the
 * no-arg-constructible bridge between FQCN instantiation and
 * config-driven targets.
 */
/** A config-declared target that needs pipeline config after its
  * no-arg FQCN instantiation: `configure` runs once at parse time
  * with the raw key-value config and the declared tables; a missing
  * required key must throw there (config-load failure), never at
  * first notification. */
trait ConfigurableTarget {
  def configure(kv: Map[String, String], tables: Seq[MetaTable]): Unit
}

/**
 * Runs the ECS storage-cleanup API against the task's output
 * partition after the task completes (reference:
 * EcsNotificationTarget.scala:35 — DELETE `<api>/kk` with
 * `{"ecs_path":"bucket/path"}` and an `x-api-key` header; the ECS
 * appliance expunges stale S3 object versions under the path).
 *
 * Semantics kept from the reference: only parquet tables on an
 * `s3a://` path are eligible (other formats/filesystems skip with a
 * log line); the scheme+authority reduce to `host/path`; a cleanup
 * failure LOGS and never fails the pipeline — version buildup is an
 * ops concern, not a data-correctness one. Day-partitioned tables
 * clean one partition dir; other schemes clean the table root (their
 * saves rewrite in place).
 *
 * Config: `ecs.api.url` (required), `ecs.api.key` (required),
 * `ecs.api.trust.all.ssl.certificates` (default false).
 */
final class EcsCleanupTarget(
    private[pipeline] var http: HttpTransport,
    tablesByName: String => Option[MetaTable])
    extends PipelineNotificationTarget with ConfigurableTarget {

  /** FQCN-instantiation constructor: transport and table registry
    * arrive via [[configure]]. */
  def this() = this(null, _ => None)

  private[pipeline] var apiUrl: Option[String] = None
  private[pipeline] var apiKey: String = ""
  private var tables: String => Option[MetaTable] = tablesByName

  /** Secondary constructor for direct (non-config) wiring. */
  def this(apiUrl: String, apiKey: String, http: HttpTransport,
           tablesByName: String => Option[MetaTable]) = {
    this(http, tablesByName)
    this.apiUrl = Some(apiUrl)
    this.apiKey = apiKey
  }

  override def configure(kv: Map[String, String], declared: Seq[MetaTable]): Unit = {
    val url = kv.getOrElse("ecs.api.url",
      throw new IllegalArgumentException("EcsCleanupTarget: 'ecs.api.url' is required"))
    apiKey = kv.getOrElse("ecs.api.key",
      throw new IllegalArgumentException("EcsCleanupTarget: 'ecs.api.key' is required"))
    apiUrl = Some(url)
    val byName = declared.map(t => t.name -> t).toMap
    tables = byName.get
    if (http == null)
      http = new JdkHttpTransport(
        trustAllSslCerts = kv.get("ecs.api.trust.all.ssl.certificates").contains("true"))
  }

  override def onTaskCompleted(result: TaskResult, runDate: LocalDate): Unit = result match {
    case TaskResult.Succeeded(_, table, infoDate, _, _) =>
      for (url <- apiUrl; t <- tables(table))
        EcsCleanupTarget.cleanUp(t, infoDate, url, apiKey, http)
    case _ => () // failed/skipped tasks wrote nothing worth cleaning
  }
}

object EcsCleanupTarget {
  /** Only these URI schemes are ECS-cleanable (reference ECS_PREFIXES). */
  val EligiblePrefixes: Seq[String] = Seq("s3a://")

  /** `s3a://bucket/a/b` → `bucket/a/b` (the API wants bucket-relative
    * paths, reference removeAuthority). String-based, because URI
    * parsing THROWS on keys with spaces and returns a null host for
    * legacy underscore buckets — both legal on S3-compatible stores. */
  def removeAuthority(path: String): String = {
    val i = path.indexOf("://")
    if (i < 0) path else path.substring(i + 3)
  }

  /** The shared cleanup call — the per-task target fires it per
    * completion, the pipeline-level sweep once per succeeded task at
    * pipeline end. Same eligibility and never-fail rules either way. */
  private[pipeline] def cleanUp(t: MetaTable, infoDate: LocalDate, url: String,
                                apiKey: String, http: HttpTransport): Unit = {
    if (t.format != DataFormat.Parquet) {
      System.err.println(s"[graft ecs] format ${t.format.name} not supported; skipping ${t.name}")
      return
    }
    if (!EligiblePrefixes.exists(t.path.toLowerCase.startsWith)) {
      System.err.println(s"[graft ecs] ${t.path} is not on S3; skipping ${t.name}")
      return
    }
    val target = t.scheme match {
      case PartitionScheme.ByDay => s"${t.path}/${t.infoDateColumn}=$infoDate"
      case _ => t.path
    }
    // EVERYTHING from here sits inside the guard: path parsing and
    // body construction run on untrusted table paths (spaces, quotes,
    // legacy underscore buckets) and must degrade like the HTTP call
    try {
      // value escaped via Json.str; body shape kept byte-identical to
      // the reference contract ({"ecs_path":"..."}, no spaces)
      val body = "{\"ecs_path\":" +
        graft.databricks.Json.str(removeAuthority(target)) + "}"
      val effectiveUrl = if (url.endsWith("/kk")) url else s"$url/kk"
      val (status, respBody) = http.delete(effectiveUrl, body, Map("x-api-key" -> apiKey))
      if (status != 200)
        System.err.println(s"[graft ecs] cleanup FAILED for $target: $status $respBody")
      else
        System.err.println(s"[graft ecs] cleanup ok for $target")
    } catch {
      // never fail the pipeline over a cleanup call (reference
      // EcsNotificationTarget.scala:125 does the same)
      case e: Throwable =>
        System.err.println(s"[graft ecs] cleanup call failed for $target: ${e.getMessage}")
    }
  }
}

/**
 * Pipeline-level ECS cleanup (reference: pramen/extras
 * .../extras/notification/EcsPipelineNotificationTarget.scala:40):
 * instead of firing per task, ONE sweep at `onPipelineCompleted`
 * walks every SUCCEEDED task and runs the same cleanup call with the
 * same eligibility and never-fail rules as [[EcsCleanupTarget]].
 * Failed/skipped tasks are passed over with a log line, exactly like
 * the reference. Deploy one or the other, not both — a table swept
 * twice is harmless but wasteful.
 *
 * Config keys are shared with the per-task target: `ecs.api.url`,
 * `ecs.api.key`, `ecs.api.trust.all.ssl.certificates`.
 */
final class EcsPipelineCleanupTarget(
    private[pipeline] var http: HttpTransport,
    tablesByName: String => Option[MetaTable])
    extends PipelineNotificationTarget with ConfigurableTarget {

  def this() = this(null, _ => None)

  private[pipeline] var apiUrl: Option[String] = None
  private[pipeline] var apiKey: String = ""
  private var tables: String => Option[MetaTable] = tablesByName

  def this(apiUrl: String, apiKey: String, http: HttpTransport,
           tablesByName: String => Option[MetaTable]) = {
    this(http, tablesByName)
    this.apiUrl = Some(apiUrl)
    this.apiKey = apiKey
  }

  override def configure(kv: Map[String, String], declared: Seq[MetaTable]): Unit = {
    val url = kv.getOrElse("ecs.api.url",
      throw new IllegalArgumentException("EcsPipelineCleanupTarget: 'ecs.api.url' is required"))
    apiKey = kv.getOrElse("ecs.api.key",
      throw new IllegalArgumentException("EcsPipelineCleanupTarget: 'ecs.api.key' is required"))
    apiUrl = Some(url)
    val byName = declared.map(t => t.name -> t).toMap
    tables = byName.get
    if (http == null)
      http = new JdkHttpTransport(
        trustAllSslCerts = kv.get("ecs.api.trust.all.ssl.certificates").contains("true"))
  }

  override def onPipelineCompleted(results: Seq[TaskResult], runDate: LocalDate): Unit =
    apiUrl.foreach { url =>
      results.foreach {
        case TaskResult.Succeeded(_, table, infoDate, _, _) =>
          tables(table) match {
            case Some(t) => EcsCleanupTarget.cleanUp(t, infoDate, url, apiKey, http)
            case None =>
              System.err.println(s"[graft ecs] no metatable registered for '$table'; skipping")
          }
        case TaskResult.Skipped(j, _) =>
          System.err.println(s"[graft ecs] job '$j' was skipped; skipping ECS cleanup")
        case TaskResult.NotReady(j, _) =>
          System.err.println(s"[graft ecs] job '$j' was not ready; skipping ECS cleanup")
        case TaskResult.Failed(j, _) =>
          System.err.println(s"[graft ecs] job '$j' failed; skipping ECS cleanup")
      }
    }
}

/** One-message producer seam for token notifications — the Kafka
  * transport is swappable so the protocol logic is testable without a
  * broker (reference: extras/notification/mq/SingleMessageProducer
  * .scala). */
trait SingleMessageProducer {
  def connect(): Unit = ()
  def send(topic: String, message: String): Unit
  def close(): Unit = ()
}

/** Wire-protocol Kafka producer: sends the single token message
  * straight through [[graft.kafka.KafkaWireClient]] (reference
  * SingleMessageProducerKafka wraps the kafka-clients producer around
  * exactly this one-message shape). A token has no key, so it lands
  * on partition 0 — routing tokens are ordering signals and must not
  * scatter across partitions. The connection lives for one send,
  * mirroring the reference's connect/send/close lifecycle. */
final class KafkaSingleMessageProducer(bootstrapServers: String,
                                       options: Map[String, String] = Map.empty)
    extends SingleMessageProducer {
  // the wire client speaks PLAINTEXT only; configured security options
  // must be surfaced, not silently dropped — a token send to a secured
  // cluster with auth settings quietly ignored would just fail opaquely
  if (options.nonEmpty)
    System.err.println(s"[graft hyperdrive] wire producer is plaintext-only; " +
      s"ignoring options: ${options.keys.mkString(", ")}")

  override def send(topic: String, message: String): Unit = {
    val client = new graft.kafka.KafkaWireClient(
      graft.kafka.KafkaBatch.parseBrokers(bootstrapServers))
    try {
      client.produce(topic, 0, Seq(graft.kafka.KafkaWire.OutRecord(
        null, message.getBytes("UTF-8"), System.currentTimeMillis())))
      ()
    } finally client.close()
  }
}

/**
 * Sends a per-job routing token to a Kafka topic when the job
 * SUCCEEDS — the trigger message a downstream Hyperdrive ingestion
 * listens for (reference: HyperdriveNotificationTarget.scala:28).
 * Failed/skipped jobs send nothing (the reference logs and moves on);
 * jobs with no configured token are skipped with a warning.
 *
 * Config: `hyperdrive.kafka.topic` (required),
 * `hyperdrive.kafka.bootstrap.servers` (required for the real
 * producer), per-job token `job.N.option.notification.hyperdrive
 * .token` (the reference's `notification.hyperdrive.token` task
 * option).
 */
final class HyperdriveNotifyTarget(
    private[pipeline] var producer: SingleMessageProducer,
    private[pipeline] var topic: String,
    private[pipeline] var tokensByJob: String => Option[String])
    extends PipelineNotificationTarget with ConfigurableTarget {

  def this() = this(null, "", _ => None)

  override def configure(kv: Map[String, String], tables: Seq[MetaTable]): Unit = {
    topic = kv.getOrElse("hyperdrive.kafka.topic",
      throw new IllegalArgumentException("HyperdriveNotifyTarget: 'hyperdrive.kafka.topic' is required"))
    // job.N.name + job.N.option.notification.hyperdrive.token → token by job name
    val tokens: Map[String, String] = kv.collect {
      case (k, name) if k.matches("job\\.\\d+\\.name") =>
        val idx = k.split("\\.")(1)
        name -> kv.get(s"job.$idx.option.notification.hyperdrive.token")
    }.collect { case (name, Some(tok)) => name -> tok }.toMap
    tokensByJob = tokens.get
    if (producer == null) {
      val servers = kv.getOrElse("hyperdrive.kafka.bootstrap.servers",
        throw new IllegalArgumentException(
          "HyperdriveNotifyTarget: 'hyperdrive.kafka.bootstrap.servers' is required"))
      producer = new KafkaSingleMessageProducer(servers,
        kv.collect { case (k, v) if k.startsWith("hyperdrive.kafka.option.") =>
          k.stripPrefix("hyperdrive.kafka.option.") -> v })
    }
  }

  override def onTaskCompleted(result: TaskResult, runDate: LocalDate): Unit = result match {
    case TaskResult.Succeeded(job, _, _, _, _) =>
      tokensByJob(job) match {
        case Some(token) =>
          // a notify failure must not abort a pipeline whose task
          // already SUCCEEDED and landed (the orchestrator invokes
          // notifiers unguarded; the reference logs and moves on)
          try {
            producer.connect()
            try producer.send(topic, token)
            finally producer.close()
          } catch {
            case e: Throwable => System.err.println(
              s"[graft hyperdrive] token send failed for job '$job': ${e.getMessage}")
          }
        case None =>
          System.err.println(s"[graft hyperdrive] no notification.hyperdrive.token for job '$job'; not sending")
      }
    case _ => () // only successful loads trigger downstream ingestion
  }
}
