package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

import java.time.LocalDate

/** Result of a sink write (reference: pramen/api .../api/SinkResult.scala). */
final case class SinkResult(recordsSent: Long)

/**
 * A target external to the metastore; sink jobs push metastore data
 * out (reference: pramen/api .../api/Sink.scala).
 */
trait GraftSink {
  def send(df: DataFrame, tableName: String, infoDate: LocalDate,
           options: Map[String, String] = Map.empty): SinkResult
}

/**
 * Factory for config-declared CUSTOM sinks (reference:
 * pramen/api .../api/ExternalChannelFactory.scala:25). Set
 * `sink.<name>.type` to the factory's fully-qualified class (or
 * object) name; `options` carries every `sink.<name>.*` key with the
 * prefix stripped. A SparkSession is not part of the contract — sinks
 * receive live DataFrames (`df.sparkSession` when needed).
 */
trait SinkFactory {
  def apply(options: Map[String, String]): GraftSink
}

/** Context-aware sink factory (the reference's
  * ExternalChannelFactoryV2): receives the pipeline name, environment
  * and full workflow config. Sinks are built at parse time, so
  * `context.infoDate` is None — `send` gets the date per call. */
trait SinkFactoryV2 {
  def apply(options: Map[String, String],
            context: graft.sources.ChannelContext): GraftSink
}

/** Column-name normalization applied before writing (reference:
 * pramen/core .../core/sink/ColumnNameTransform.scala — NoChange /
 * MakeUpper / MakeLower / sanitize for CSV headers). */
sealed trait ColumnNameTransform {
  def apply(df: DataFrame): DataFrame = this match {
    case ColumnNameTransform.NoChange => df
    case ColumnNameTransform.MakeUpper =>
      df.toDF(df.columns.toIndexedSeq.map(_.toUpperCase): _*)
    case ColumnNameTransform.MakeLower =>
      df.toDF(df.columns.toIndexedSeq.map(_.toLowerCase): _*)
    case ColumnNameTransform.Sanitize =>
      df.toDF(df.columns.toIndexedSeq.map(_.replaceAll("[^A-Za-z0-9_]", "_")): _*)
  }
}
object ColumnNameTransform {
  case object NoChange extends ColumnNameTransform
  case object MakeUpper extends ColumnNameTransform
  case object MakeLower extends ColumnNameTransform
  case object Sanitize extends ColumnNameTransform
}

/**
 * Any-format Spark write sink — parquet/csv/json/orc, optional
 * repartition and partitionBy
 * (reference: pramen/core .../core/sink/SparkSink.scala).
 */
/** `_INFO` generation settings for a sink (reference: pramen/extras
  * .../extras/infofile/InfoFileGeneration.scala config keys —
  * source application, country, history type). */
final case class InfoFileConfig(application: String, country: String,
                                historyType: String = "snapshot",
                                zone: java.time.ZoneId = java.time.ZoneOffset.UTC)

final class SparkSink(
    basePath: String,
    format: String = "parquet",
    mode: SaveMode = SaveMode.Overwrite,
    formatOptions: Map[String, String] = Map.empty,
    partitionBy: Seq[String] = Seq.empty,
    numberOfPartitions: Option[Int] = None,
    infoFile: Option[InfoFileConfig] = None) extends GraftSink {

  override def send(df: DataFrame, tableName: String, infoDate: LocalDate,
                    options: Map[String, String]): SinkResult = {
    val t0 = System.currentTimeMillis()
    // record count observed inside the write job itself — a count()
    // after the save would re-execute the whole upstream plan
    val obs = new org.apache.spark.sql.Observation()
    val out = numberOfPartitions.fold(df)(n => df.repartition(n))
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val w = out.write.format(format).mode(mode).options(formatOptions)
    val path = s"$basePath/$tableName/info_date=$infoDate"
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
    val n = obs.get("cnt").asInstanceOf[Long]
    // the metadata file lands AFTER the data: consumers polling for
    // _INFO see it only once the export is complete
    infoFile.foreach { c =>
      InfoFile.write(path,
        InfoFile.render(c.application, c.country, c.historyType, tableName,
          infoDate, n, version = 1, c.zone,
          Seq(InfoFile.Checkpoint("Sink", "Sink", 1, t0, System.currentTimeMillis(), n))),
        df.sparkSession.sparkContext.hadoopConfiguration)
    }
    SinkResult(n)
  }
}

/**
 * CSV export sink with header/separator/quote controls and column-name
 * transforms (reference: pramen/core .../core/sink/LocalCsvSink.scala,
 * core/sink/CsvConversionParams.scala). Writes a single CSV file per
 * (table, infoDate) — an export surface, so the coalesce(1) is the
 * explicit contract, not an accident.
 */
final class LocalCsvSink(
    outputPath: String,
    separator: String = ",",
    header: Boolean = true,
    quoteAll: Boolean = false,
    nameTransform: ColumnNameTransform = ColumnNameTransform.NoChange) extends GraftSink {

  override def send(df: DataFrame, tableName: String, infoDate: LocalDate,
                    options: Map[String, String]): SinkResult = {
    val obs = new org.apache.spark.sql.Observation()
    val out = nameTransform(df).observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("cnt"))
    out.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("sep", separator)
      .option("header", header.toString)
      .option("quoteAll", quoteAll.toString)
      .csv(s"$outputPath/$tableName/$infoDate")
    SinkResult(obs.get("cnt").asInstanceOf[Long])
  }
}

/**
 * Export-then-exec sink: writes the data as CSV to a staging
 * directory, then runs a configurable command with `@path` (and
 * `@count`) substituted — the hand-off pattern for downstream systems
 * that ingest files via their own tooling
 * (reference: pramen/core .../core/sink/CmdLineSink.scala).
 * The command runs once on the driver AFTER the distributed write —
 * it never touches row data.
 */
final class CmdLineSink(
    stagingPath: String,
    commandTemplate: String,
    timeoutSeconds: Long = 300) extends GraftSink {

  override def send(df: DataFrame, tableName: String, infoDate: LocalDate,
                    options: Map[String, String]): SinkResult = {
    val dir = s"$stagingPath/$tableName/$infoDate"
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)
    // count the STAGED files, not the input: re-running the upstream
    // plan would execute the whole pipeline a second time, and a
    // nondeterministic df could report a count disagreeing with what
    // was actually handed to the command. multiLine: a quoted field
    // holding an embedded newline is ONE record in the staged file —
    // the line-per-record default would inflate @count (r17 review)
    val count = df.sparkSession.read
      .option("header", "true").option("multiLine", "true").csv(dir).count()
    val cmd = commandTemplate.replace("@path", dir).replace("@count", count.toString)
    // quote-aware argv (EnceladusLayout.tokenize — staging paths with
    // spaces corrupted into two arguments under split("\\s+"); r17)
    val argv = EnceladusLayout.tokenize(cmd)
    require(argv.nonEmpty, s"CmdLineSink: empty command after substitution: '$cmd'")
    val proc = new ProcessBuilder(argv: _*)
      .redirectErrorStream(true).start()
    // drain stdout on a daemon thread (the ProcessTransformer lesson,
    // r17 review): a command printing past the ~64 KB pipe buffer
    // blocks forever un-drained and the timeout kills a HEALTHY child
    val outBuf = new graft.pipeline.TailBuffer(64 * 1024)
    val drainer = new Thread(() => {
      try proc.getInputStream.transferTo(outBuf)
      catch { case _: java.io.IOException => () }
    }, "graft-cmdline-drain")
    drainer.setDaemon(true)
    drainer.start()
    val finished = proc.waitFor(timeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      proc.destroyForcibly()
      drainer.join(10000) // the kill closes the pipe; collect what the child last printed
      throw new RuntimeException(
        s"CmdLineSink timed out: $cmd\n${outBuf.render}")
    }
    drainer.join(10000)
    if (proc.exitValue() != 0)
      throw new RuntimeException(
        s"CmdLineSink command failed (exit ${proc.exitValue()}): $cmd\n${outBuf.render}")
    SinkResult(count)
  }
}

/** Runs a sink job: metastore table window → sink. */
final class SinkJob(metastore: graft.meta.Metastore, sink: GraftSink) {
  def run(tableName: String, infoDate: LocalDate,
          columns: Seq[String] = Seq.empty,
          filter: Option[String] = None): SinkResult = {
    val df0 = metastore.getTable(tableName, Some(infoDate), Some(infoDate))
    val df1 = if (columns.nonEmpty) df0.select(columns.map(col): _*) else df0
    val df2 = filter.fold(df1)(df1.where)
    sink.send(df2, tableName, infoDate)
  }
}
