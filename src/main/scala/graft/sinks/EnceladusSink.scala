package graft.sinks

import java.time.LocalDate

import graft.meta.HiveDdl
import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Enceladus/Standardization raw-folder sink — the partner-ecosystem
 * export conventions of the reference's largest extras surface
 * (reference: pramen/extras .../extras/sink/EnceladusSink.scala:151,
 * StandardizationSink.scala:155, sink/EnceladusUtils.scala,
 * utils/PartitionUtils.scala:38):
 *
 *  - data lands under a VERSIONED partition layout
 *    `<raw>/{year}/{month}/{day}/v{version}` that the downstream
 *    standardization tool expects,
 *  - the info version resolves per (date): an explicit number, or
 *    `auto` = max version already PUBLISHED for that date + 1 (first
 *    run = 1) — re-exports never overwrite a published version,
 *  - an Atum `_INFO` metadata file (S11) lands next to the data AFTER
 *    the write, carrying the resolved version,
 *  - optionally a configured standardization command runs with
 *    `@datasetName @datasetVersion @infoDate @infoVersion @rawPath
 *    @rawFormat` substituted (the reference shells out to Enceladus
 *    the same way), stale same-version publish output is removed
 *    first, and the publish-side Hive table gets its new partition
 *    registered through the M43 QueryExecutor seam (O(1) ADD
 *    PARTITION, not MSCK).
 *
 * Layout arithmetic is driver-side string work; the data write is one
 * Spark batch write with optional `records.per.partition` sizing —
 * nothing here adds a shuffle beyond the optional repartition the
 * file-count contract requires.
 */
object EnceladusLayout {
  val DefaultRawPattern = "{year}/{month}/{day}/v{version}"
  val DefaultPublishPattern =
    "enceladus_info_date={year}-{month}-{day}/enceladus_info_version={version}"

  /** `{year}/{month}/{day}/{version}/{column}` substitution (zero-pad
    * month/day — reference PartitionUtils.unpackCustomPartitionPattern). */
  def unpackPattern(pattern: String, infoDateColumn: String,
                    infoDate: LocalDate, version: Int): String =
    pattern.replace("{year}", infoDate.getYear.toString)
      .replace("{month}", f"${infoDate.getMonthValue}%02d")
      .replace("{day}", f"${infoDate.getDayOfMonth}%02d")
      .replace("{version}", version.toString)
      .replace("{column}", infoDateColumn)

  /** Highest published version for the date under the CONFIGURED
    * publish layout (reference EnceladusUtils.getMaxVersionInPublish):
    * the pattern's `{version}` segment is located, its parent dir
    * listed once, and sibling names matched against the segment with
    * `{version}` as a capture — a custom publish pattern detects
    * versions in ITS OWN layout, not the default one (scanning the
    * default under a custom layout found nothing, resolved every run
    * to v1, and re-ran over published data). */
  def maxPublishedVersion(hadoopConf: org.apache.hadoop.conf.Configuration,
                          publishBase: String, infoDate: LocalDate,
                          pattern: String = DefaultPublishPattern,
                          infoDateColumn: String = ""): Option[Int] = {
    val sentinel = "\u0000V\u0000"
    val unpacked = unpackPattern(pattern.replace("{version}", sentinel),
      infoDateColumn, infoDate, 0)
    val segs = unpacked.split("/")
    val vIdx = segs.indexWhere(_.contains(sentinel))
    if (vIdx < 0) return None // pattern carries no version: nothing to detect
    val parent = new org.apache.hadoop.fs.Path(
      (publishBase +: segs.take(vIdx).toSeq).mkString("/"))
    val fs = parent.getFileSystem(hadoopConf)
    if (!fs.exists(parent)) None
    else {
      val re = ("^" + segs(vIdx).split(java.util.regex.Pattern.quote(sentinel), -1)
        .map(java.util.regex.Pattern.quote).mkString("(\\d+)") + "$").r
      val versions = fs.listStatus(parent).toSeq
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .flatMap(n => re.findFirstMatchIn(n).map(_.group(1).toInt))
      if (versions.isEmpty) None else Some(versions.max)
    }
  }

  /** Quote-aware argv split (double or single quotes group a token):
    * substituted paths may contain spaces, and naive whitespace
    * splitting corrupted them into separate arguments. */
  def tokenize(cmd: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var emitted = false // a quoted EMPTY string is still an argument
    cmd.foreach { c =>
      if (quote != 0) {
        if (c == quote) { quote = 0; emitted = true } else cur += c
      }
      else if (c == '"' || c == '\'') quote = c
      else if (c.isWhitespace) {
        if (cur.nonEmpty || emitted) { out += cur.toString; cur.clear(); emitted = false }
      }
      else cur += c
    }
    if (cur.nonEmpty || emitted) out += cur.toString
    out.result()
  }

  def nextVersion(hadoopConf: org.apache.hadoop.conf.Configuration,
                  publishBase: String, infoDate: LocalDate,
                  pattern: String = DefaultPublishPattern,
                  infoDateColumn: String = ""): Int =
    maxPublishedVersion(hadoopConf, publishBase, infoDate, pattern, infoDateColumn)
      .fold(1)(_ + 1)
}

final class EnceladusSink(
    format: String = "parquet",
    mode: SaveMode = SaveMode.Overwrite,
    formatOptions: Map[String, String] = Map.empty,
    rawPartitionPattern: String = EnceladusLayout.DefaultRawPattern,
    publishPartitionPattern: String = EnceladusLayout.DefaultPublishPattern,
    infoDateColumn: String = "enceladus_info_date",
    recordsPerPartition: Option[Long] = None,
    infoFile: Option[InfoFileConfig] = None,
    /** M43 seam for publish-side Hive DDL; None disables repair. */
    hiveExecutor: Option[HiveDdl.QueryExecutor] = None,
    hiveTemplates: HiveDdl.Templates = HiveDdl.Templates(),
    commandTimeoutSeconds: Long = 600) extends GraftSink {

  /** Resolved (rawPartitionPath, infoVersion) for a send — exposed for
    * layout tests. */
  private[sinks] def resolveLayout(hadoopConf: org.apache.hadoop.conf.Configuration,
                                   infoDate: LocalDate,
                                   options: Map[String, String]): (String, Int) = {
    val base = options.getOrElse("path", throw new IllegalArgumentException(
      "EnceladusSink: option 'path' (raw base path) is required"))
    val version = options.getOrElse("info.version", "auto") match {
      case auto if auto.equalsIgnoreCase("auto") =>
        val publishBase = options.getOrElse("publish.base.path",
          throw new IllegalArgumentException(
            "EnceladusSink: info.version=auto needs option 'publish.base.path' " +
              "(version detection scans the published layout)"))
        EnceladusLayout.nextVersion(hadoopConf, publishBase, infoDate,
          publishPartitionPattern, infoDateColumn)
      case n => n.toInt
    }
    (s"$base/${EnceladusLayout.unpackPattern(rawPartitionPattern, infoDateColumn, infoDate, version)}",
      version)
  }

  override def send(df: DataFrame, tableName: String, infoDate: LocalDate,
                    options: Map[String, String]): SinkResult = {
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val t0 = System.currentTimeMillis()
    val (rawPath, version) = resolveLayout(hadoopConf, infoDate, options)

    val obs = new org.apache.spark.sql.Observation()
    val observed = df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("cnt"))
    // file-count contract: ceil(n/recordsPerPartition) output files.
    // The pre-count costs one extra pass only when the option is set —
    // the repartition target must be known BEFORE the write job.
    val out = recordsPerPartition match {
      case Some(rpp) =>
        val n = df.count()
        observed.repartition(math.max(1, math.ceil(n.toDouble / rpp).toInt))
      case None => observed
    }
    out.write.format(format).mode(mode).options(formatOptions).save(rawPath)
    val count = obs.get("cnt").asInstanceOf[Long]

    // _INFO lands AFTER the data with the RESOLVED version: pollers
    // that key on it see a complete, correctly-versioned drop
    infoFile.foreach { c =>
      InfoFile.write(rawPath,
        InfoFile.render(c.application, c.country, c.historyType, tableName,
          infoDate, count, version, c.zone,
          Seq(InfoFile.Checkpoint("Raw", "Enceladus", 1, t0, System.currentTimeMillis(), count))),
        hadoopConf)
    }

    runStandardizationIfConfigured(spark, tableName, infoDate, version, rawPath, options)
    SinkResult(count)
  }

  /** The publish leg (reference runEnceladusIfNeeded): requires
    * `dataset.name` + `enceladus.run.command`; removes a stale
    * same-version publish dir first, runs the command, then registers
    * the partition in Hive when a table + executor are wired. */
  private def runStandardizationIfConfigured(spark: org.apache.spark.sql.SparkSession,
                                             tableName: String, infoDate: LocalDate,
                                             version: Int, rawPath: String,
                                             options: Map[String, String]): Unit = {
    val datasetName = options.get("dataset.name")
    val template = options.get("enceladus.run.command")
    if (datasetName.isEmpty || template.isEmpty) return
    val publishBase = options.getOrElse("publish.base.path",
      throw new IllegalArgumentException(
        "EnceladusSink: running standardization needs option 'publish.base.path'"))
    val publishPart =
      EnceladusLayout.unpackPattern(publishPartitionPattern, infoDateColumn, infoDate, version)
    val publishPath = new org.apache.hadoop.fs.Path(s"$publishBase/$publishPart")

    // guarded stale-output removal (reference EnceladusSink.scala:320):
    // delete only a path that is provably a VERSIONED leaf — the guard
    // is that the CONFIGURED pattern carries {version}, not a literal
    // 'enceladus_info_version=' substring (r17 review: the literal
    // check silently skipped deletion under custom publish patterns
    // like 'pub_date={year}-{month}-{day}/v{version}', leaving stale
    // files mixed with the fresh publish). A version-less pattern
    // cannot scope the delete to one version, so warn loudly instead
    // of deleting or staying silent.
    val fs = publishPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(publishPath)) {
      if (publishPartitionPattern.contains("{version}") && publishPart.nonEmpty) {
        System.err.println(s"[graft enceladus] removing stale publish output $publishPath")
        fs.delete(publishPath, true)
      } else {
        // two distinct skip causes, two distinct messages (r18 ADVICE:
        // the single no-{version} message misdescribed the
        // empty-partition-path case to the operator)
        val why =
          if (!publishPartitionPattern.contains("{version}"))
            s"the publish pattern '$publishPartitionPattern' has no {version} segment to scope a safe delete"
          else
            s"the pattern '$publishPartitionPattern' unpacked to an EMPTY partition path " +
              "(deleting would target the publish base itself)"
        System.err.println(s"[graft enceladus] publish path $publishPath exists but $why " +
          "— standardization will write ALONGSIDE the existing files")
      }
    }

    val cmd = template.get
      .replace("@datasetName", datasetName.get)
      .replace("@datasetVersion", options.getOrElse("dataset.version", "1"))
      .replace("@infoDate", infoDate.toString)
      .replace("@infoVersion", version.toString)
      .replace("@rawPath", rawPath)
      .replace("@rawFormat", format)
      .replace("@publishPath", publishPath.toString)
    val argv = EnceladusLayout.tokenize(cmd)
    require(argv.nonEmpty, s"EnceladusSink: empty standardization command after substitution: '$cmd'")
    val proc = new ProcessBuilder(argv: _*).redirectErrorStream(true).start()
    // drain stdout on a daemon thread (the ProcessTransformer lesson):
    // a chatty standardization run fills the 64 KB pipe, blocks, and
    // the timeout would fire on a HEALTHY child; bounded capture keeps
    // the tail for the failure report without buffering gigabytes
    val outBuf = new graft.pipeline.TailBuffer(64 * 1024)
    val drainer = new Thread(() => {
      try proc.getInputStream.transferTo(outBuf)
      catch { case _: java.io.IOException => () }
    }, "graft-enceladus-drain")
    drainer.setDaemon(true)
    drainer.start()
    val finished = proc.waitFor(commandTimeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      proc.destroyForcibly()
      throw new RuntimeException(s"EnceladusSink standardization timed out: $cmd")
    }
    drainer.join(10000)
    if (proc.exitValue() != 0)
      throw new RuntimeException(
        s"EnceladusSink standardization failed (exit ${proc.exitValue()}): $cmd\n${outBuf.render}")

    // publish-side Hive registration: O(1) ADD PARTITION through the
    // M43 seam (reference updateTable + repair on publish)
    if (options.contains("hive.table") && hiveExecutor.isEmpty)
      System.err.println("[graft enceladus] 'hive.table' is set but no Hive query " +
        "executor is wired (config-declared sinks have none); partition NOT registered")
    for (table <- options.get("hive.table"); ex <- hiveExecutor) {
      // partition spec FROM the configured publish pattern, not
      // hardcoded enceladus_info_* columns (r17 review: a custom
      // pattern like 'pub_date=.../v3' made the hardcoded ADD
      // PARTITION fail on unknown columns — or worse, register a spec
      // that doesn't match the directory layout). A Hive-registrable
      // layout needs every segment in col=value form; anything else
      // warns and skips rather than issuing wrong DDL after a
      // successful publish.
      val segs = publishPart.split("/").toSeq.filter(_.nonEmpty)
        .map(_.split("=", 2))
      if (segs.nonEmpty && segs.forall(_.length == 2)) {
        HiveDdl.addPartition(ex, hiveTemplates, table,
          segs.map(a => a(0) -> a(1)), publishPath.toString)
      } else
        System.err.println(s"[graft enceladus] publish pattern " +
          s"'$publishPartitionPattern' is not col=value partition layout; " +
          s"Hive partition for $publishPath NOT registered")
    }
  }
}

/** Factory so `sink.<name>.type = enceladus` works alongside the FQCN
  * route (reference: EnceladusSink's ExternalChannelFactoryV2). */
object EnceladusSink extends SinkFactory {
  override def apply(options: Map[String, String]): GraftSink = {
    val infoFile =
      if (options.get("info.file").contains("true"))
        Some(InfoFileConfig(
          application = options.getOrElse("info.file.application", "graft"),
          country = options.getOrElse("info.file.country", "ZZ"),
          historyType = options.getOrElse("info.file.history.type", "snapshot")))
      else None
    new EnceladusSink(
      format = options.getOrElse("format", "parquet"),
      mode = if (options.get("mode").contains("append")) SaveMode.Append else SaveMode.Overwrite,
      formatOptions = options.collect {
        case (k, v) if k.startsWith("option.") => k.stripPrefix("option.") -> v },
      rawPartitionPattern =
        options.getOrElse("partition.pattern", EnceladusLayout.DefaultRawPattern),
      publishPartitionPattern =
        options.getOrElse("publish.partition.pattern", EnceladusLayout.DefaultPublishPattern),
      infoDateColumn = options.getOrElse("info.date.column", "enceladus_info_date"),
      recordsPerPartition = options.get("records.per.partition").map(_.toLong),
      infoFile = infoFile,
      commandTimeoutSeconds = options.get("timeout.seconds").map(_.toLong).getOrElse(600L))
  }
}
