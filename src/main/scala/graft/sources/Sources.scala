package graft.sources

import graft.offset.{OffsetInfo, OffsetManager, OffsetStore, OffsetValue}
import graft.sql.{SqlConfig, SqlDialect, SqlGenerator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** Result of a source read (reference: pramen/api .../api/SourceResult.scala). */
final case class SourceResult(df: DataFrame, recordCount: Option[Long] = None)

/**
 * A data system external to the metastore; ingestion jobs pull a
 * date window (batch) or an offset tail (incremental) from it
 * (reference: pramen/api .../api/Source.scala:28).
 */
trait GraftSource {
  def hasInfoDateColumn: Boolean
  def getRecordCount(from: LocalDate, to: LocalDate): Long
  def getData(from: LocalDate, to: LocalDate, columns: Seq[String] = Seq.empty): SourceResult
  def getOffsetInfo: Option[OffsetInfo] = None
  def getDataIncremental(offsetFrom: Option[OffsetValue], columns: Seq[String] = Seq.empty): SourceResult =
    throw new UnsupportedOperationException(s"${getClass.getSimpleName} does not support incremental reads")
}

/**
 * Factory for config-declared CUSTOM sources (reference:
 * pramen/api .../api/ExternalChannelFactory.scala:25 — the reference
 * instantiates user source/sink factories by class name from config).
 * Set `source.<name>.type` to the factory's fully-qualified class (or
 * object) name; `options` carries every `source.<name>.*` key with the
 * prefix stripped, so `path`, `format` and `option.*` are all visible,
 * the same scope the reference hands its factories as `conf`.
 */
trait SourceFactory {
  def apply(spark: SparkSession, options: Map[String, String]): GraftSource
}

/**
 * Pipeline/workflow context handed to V2 channel factories
 * (reference: pramen/api .../api/ExternalChannelFactoryV2.scala:25 —
 * the V2 contract adds the whole workflow config to the channel's own
 * scope; graft also passes the run's info date directly instead of
 * making factories dig it out of config).
 */
final case class ChannelContext(
    pipelineName: String,
    environment: String,
    /** EVERY parsed workflow config key (not just the channel's own
      * `source.<name>.*` scope) — cross-cutting facts like table paths
      * or other channels' settings. */
    workflowConfig: Map[String, String],
    /** The task's info date. Sources are built per task run, so this
      * is always set for them; sinks are built at config parse, before
      * any task exists (their `send` receives the date per call). */
    infoDate: Option[java.time.LocalDate])

/** Context-aware source factory (the reference's
  * ExternalChannelFactoryV2): built per task run, so `context`
  * carries the run's info date. Declare either this or the plain
  * [[SourceFactory]] — config dispatches on the implemented trait. */
trait SourceFactoryV2 {
  def apply(spark: SparkSession, options: Map[String, String],
            context: ChannelContext): GraftSource
}

/**
 * Batch source over any Spark DataSource format — parquet, csv, json,
 * orc (reference: pramen/core .../core/source/SparkSource.scala).
 * The info-date window becomes a plan-time filter: pushed to the scan
 * (parquet min/max stats, partition pruning) so a 1-day ingest of a
 * huge source reads only matching files/row-groups.
 */
final class SparkSource(
    spark: SparkSession,
    path: String,
    format: String = "parquet",
    options: Map[String, String] = Map.empty,
    infoDateColumn: Option[String] = None,
    infoDateType: String = "date",   // "date" | "timestamp" | "string"
    offsetInfo: Option[OffsetInfo] = None) extends GraftSource {

  private def readAll(): DataFrame =
    spark.read.format(format).options(options).load(path)

  override def hasInfoDateColumn: Boolean = infoDateColumn.isDefined

  private def windowFilter(df: DataFrame, from: LocalDate, to: LocalDate): DataFrame =
    SourceWindow.filter(df, infoDateColumn, infoDateType, from, to)

  override def getRecordCount(from: LocalDate, to: LocalDate): Long =
    windowFilter(readAll(), from, to).count()

  override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult = {
    val df = windowFilter(readAll(), from, to)
    SourceResult(if (columns.isEmpty) df else df.select(columns.map(col): _*))
  }

  override def getOffsetInfo: Option[OffsetInfo] = offsetInfo

  override def getDataIncremental(offsetFrom: Option[OffsetValue], columns: Seq[String]): SourceResult = {
    val info = offsetInfo.getOrElse(
      throw new IllegalStateException("offsetInfo not configured for incremental reads"))
    val df = readAll()
    val filtered = offsetFrom match {
      case Some(OffsetValue.IntegralValue(n)) => df.where(col(info.column) > n)
      case Some(OffsetValue.DateTimeValue(ms)) => df.where(col(info.column) > new java.sql.Timestamp(ms))
      case Some(OffsetValue.StringValue(s)) => df.where(col(info.column) > s)
      case Some(o) => throw new IllegalArgumentException(
        s"unsupported offset type '${o.typeName}' for a column-predicate incremental read")
      case None => df
    }
    SourceResult(if (columns.isEmpty) filtered else filtered.select(columns.map(col): _*))
  }
}

/** Info-date window predicate shared by the date-windowed sources —
  * always a plain comparison on the column, so it pushes into scans. */
private[sources] object SourceWindow {
  def filter(df: DataFrame, infoDateColumn: Option[String], infoDateType: String,
             from: LocalDate, to: LocalDate): DataFrame =
    infoDateColumn match {
      case None => df
      case Some(c) => infoDateType match {
        case "date" =>
          df.where(col(c) >= java.sql.Date.valueOf(from) && col(c) <= java.sql.Date.valueOf(to))
        case "timestamp" =>
          df.where(col(c) >= java.sql.Timestamp.valueOf(from.atStartOfDay()) &&
            col(c) < java.sql.Timestamp.valueOf(to.plusDays(1).atStartOfDay()))
        case "string" =>
          df.where(col(c) >= from.toString && col(c) <= to.toString)
        case other => throw new IllegalArgumentException(s"Unknown info date type: $other")
      }
    }
}

/**
 * Catalog-backed source (reference: pramen/api `Query.Table` and
 * `Query.Sql` — sources can name a catalog table or an arbitrary SQL
 * statement, not just a path): reads `spark.table(name)` or
 * `spark.sql(statement)` and windows on the info-date column. Date
 * filters on a catalog table prune its partitions exactly like path
 * reads; for SQL, `@infoDateFrom`/`@infoDateTo` are substituted so
 * the predicate can live INSIDE the statement (pushed into whatever
 * the SQL reads) instead of wrapping it.
 */
final class CatalogSource(
    spark: SparkSession,
    tableOrSql: String,
    isSql: Boolean = false,
    infoDateColumn: Option[String] = None,
    infoDateType: String = "date",
    offsetInfo: Option[OffsetInfo] = None) extends GraftSource {

  override def hasInfoDateColumn: Boolean = infoDateColumn.isDefined

  private def readAll(from: LocalDate, to: LocalDate): DataFrame =
    if (isSql) {
      val sql = tableOrSql
        .replace("@infoDateFrom", s"DATE'$from'")
        .replace("@infoDateTo", s"DATE'$to'")
      val df = spark.sql(sql)
      // window already substituted inside the statement? Only wrap when
      // the column survives into the result.
      if (tableOrSql.contains("@infoDateFrom") || tableOrSql.contains("@infoDateTo")) df
      else SourceWindow.filter(df, infoDateColumn, infoDateType, from, to)
    } else
      SourceWindow.filter(spark.table(tableOrSql), infoDateColumn, infoDateType, from, to)

  override def getRecordCount(from: LocalDate, to: LocalDate): Long =
    readAll(from, to).count()

  override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult = {
    val df = readAll(from, to)
    SourceResult(if (columns.isEmpty) df else df.select(columns.map(col): _*))
  }

  override def getOffsetInfo: Option[OffsetInfo] = offsetInfo

  override def getDataIncremental(offsetFrom: Option[OffsetValue], columns: Seq[String]): SourceResult = {
    val info = offsetInfo.getOrElse(
      throw new IllegalStateException("offsetInfo not configured for incremental reads"))
    require(!isSql, "incremental reads need a table, not a SQL statement")
    val df = spark.table(tableOrSql)
    val filtered = offsetFrom match {
      case Some(OffsetValue.IntegralValue(n)) => df.where(col(info.column) > n)
      case Some(OffsetValue.DateTimeValue(ms)) => df.where(col(info.column) > new java.sql.Timestamp(ms))
      case Some(OffsetValue.StringValue(s)) => df.where(col(info.column) > s)
      case Some(o) => throw new IllegalArgumentException(
        s"unsupported offset type '${o.typeName}' for a column-predicate incremental read")
      case None => df
    }
    SourceResult(if (columns.isEmpty) filtered else filtered.select(columns.map(col): _*))
  }
}

/**
 * JDBC source: generates dialect-correct SQL for the date window /
 * offset tail and reads through Spark's JDBC datasource with optional
 * predicate-based parallel partitioning
 * (reference: pramen/core .../core/source/JdbcSource.scala,
 * core/reader/TableReaderJdbc.scala). No driver is bundled in this
 * environment — query generation is fully spec'd; the read path is
 * exercised when a driver is on the classpath.
 */
final class JdbcSource(
    spark: SparkSession,
    url: String,
    table: String,
    infoDateColumn: String,
    dialect: SqlDialect = SqlDialect.Generic,
    connectionOptions: Map[String, String] = Map.empty,
    numPartitions: Int = 1,
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    infoDateType: graft.sql.SqlColumnType = graft.sql.SqlColumnType.Date,
    dateFormatApp: String = "yyyy-MM-dd",
    fallbackUrls: Seq[String] = Nil,
    connectionRetries: Option[Int] = None,
    probeConnection: Option[String => Unit] = None,
    backoffSleep: Long => Unit = Thread.sleep,
    correctDecimals: Boolean = false,
    correctDecimalsFixPrecision: Boolean = false,
    timestampsToDates: Boolean = false,
    driverJarPath: Option[String] = None) extends GraftSource {

  // runtime-loaded driver jar (S18): loaded lazily ONCE, used by the
  // failover probe. The distributed read itself still needs the jar on
  // executors (spark.jars) — this covers the launcher-side probe the
  // reference loads it for.
  private lazy val dynamicDriver: Option[DynamicDriver] = driverJarPath.map { jar =>
    DynamicDriver.load(jar, connectionOptions.getOrElse("driver",
      throw new IllegalArgumentException(
        "driverJarPath requires connectionOptions(\"driver\") naming the driver class")))
  }

  private val gen = new SqlGenerator(dialect,
    SqlConfig(infoDateColumn, dateFormatApp = dateFormatApp, infoDateType = infoDateType))

  // distinct: redundantly listing the primary among the fallbacks is a
  // harmless operator habit, not an error
  private val selector =
    new JdbcUrlSelector((url +: fallbackUrls).distinct, connectionRetries, sleep = backoffSleep)

  // which URL a read hands to Spark's JDBC datasource: with a failover
  // pool configured, a working URL is resolved DRIVER-side first (one
  // raw open/close probe, the reference's getWorkingUrl split) — Spark
  // executors then all connect to an endpoint known alive moments ago.
  // Without fallbacks or retries there is nothing to resolve and no
  // probe runs (a probe would also require the JDBC driver at options-
  // build time, which plain reads do not).
  private[sources] def resolvedUrl: String =
    if (!selector.haveFallbackUrls && connectionRetries.forall(_ <= 1)) selector.currentUrl
    else selector.withUrl { u => probe(u); u }

  private def probe(u: String): Unit = probeConnection match {
    case Some(p) => p(u)
    case None =>
      val props = new java.util.Properties()
      connectionOptions.foreach { case (k, v) => props.put(k, v) }
      dynamicDriver match {
        case Some(dd) =>
          // direct Driver.connect — DriverManager's caller-classloader
          // check would refuse the runtime-loaded driver
          dd.connect(u, props).close()
        case None =>
          // DriverManager (system classloader) does not see jars Spark
          // loads via DriverRegistry — registering the configured driver
          // class first is what makes the probe see the same driver the
          // executors will
          connectionOptions.get("driver").foreach(Class.forName(_))
          java.sql.DriverManager.getConnection(u, props).close()
      }
  }

  override def hasInfoDateColumn: Boolean = true

  def dataQuery(from: LocalDate, to: LocalDate, columns: Seq[String] = Seq.empty): String =
    gen.getDataQuery(table, from, to, columns)

  def countQuery(from: LocalDate, to: LocalDate): String = gen.getCountQuery(table, from, to)

  /** The min/max probe issued when a partitioned read has no
    * configured bounds (one cheap aggregate on the RDBMS). */
  def boundsQuery(from: LocalDate, to: LocalDate): String =
    gen.getBoundsQuery(table, partitionColumn.getOrElse(
      throw new IllegalStateException("boundsQuery needs a partitionColumn")), from, to)

  /**
   * The full option map for one read. Spark's JDBC source requires
   * partitionColumn, lowerBound, upperBound and numPartitions all
   * together — a partitioned read without bounds throws at runtime, so
   * bounds are either taken from config or probed via
   * [[boundsQuery]] before the data read.
   */
  def jdbcOptions(sql: String, bounds: Option[(Long, Long)]): Map[String, String] = {
    val base = connectionOptions ++ Map("url" -> url, "dbtable" -> gen.getDtable(sql))
    (partitionColumn, bounds) match {
      case (Some(pc), Some((lo, hi))) if numPartitions > 1 =>
        base ++ Map(
          "partitionColumn" -> pc,
          "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString,
          "numPartitions" -> numPartitions.toString)
      case _ => base
    }
  }

  private def probeBounds(url: String, from: LocalDate, to: LocalDate): Option[(Long, Long)] =
    (lowerBound, upperBound) match {
      case (Some(lo), Some(hi)) => Some((lo, hi))
      case _ if partitionColumn.isDefined && numPartitions > 1 =>
        // single-partition probe read of MIN/MAX over the same window
        val row = spark.read.format("jdbc")
          .options(connectionOptions)
          .option("url", url)
          .option("dbtable", gen.getDtable(boundsQuery(from, to)))
          .load().head()
        if (row.isNullAt(0) || row.isNullAt(1)) None // empty window: plain read
        else Some((row.getAs[Number](0).longValue(), row.getAs[Number](1).longValue()))
      case _ => None
    }

  private def jdbcRead(url: String, sql: String,
                       bounds: Option[(Long, Long)] = None): DataFrame = {
    val opts = jdbcOptions(sql, bounds) + ("url" -> url)
    val df = spark.read.format("jdbc").options(opts).load()
    // decimal corrections re-issue the read WITH a customSchema so the
    // datasource itself reads the corrected types (a post-hoc cast
    // would read the lossy decimal first); the schema-only first load
    // costs one metadata round trip, which the reference pays too
    val corrected =
      (if (correctDecimals)
        JdbcSchemaCorrections.correctedDecimalsSchema(df.schema, correctDecimalsFixPrecision)
      else None) match {
        case Some(cs) =>
          spark.read.format("jdbc").options(opts).option("customSchema", cs).load()
        case None => df
      }
    if (timestampsToDates) JdbcSchemaCorrections.convertTimestampsToDates(corrected)
    else corrected
  }

  override def getRecordCount(from: LocalDate, to: LocalDate): Long =
    jdbcRead(resolvedUrl, countQuery(from, to)).head().getAs[Number](0).longValue()

  override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult = {
    // ONE failover resolution per operation — the bounds probe and the
    // data read reuse it (each resolution opens a raw probe connection)
    val url = resolvedUrl
    SourceResult(jdbcRead(url, dataQuery(from, to, columns), probeBounds(url, from, to)))
  }
}

/**
 * Whole-file (binary) ingestion: each file becomes a row with path,
 * modification time and content bytes
 * (reference: pramen/core .../core/source/RawFileSource.scala). Built
 * on Spark's `binaryFile` datasource — distributed read, no driver
 * bottleneck; the same plumbing carries image/audio blobs for the
 * multimodal pipeline.
 */
final class RawFileSource(
    spark: SparkSession,
    globPath: String,
    pathDateFormat: Option[String] = None) extends GraftSource {

  override def hasInfoDateColumn: Boolean = false

  private def readAll(): DataFrame =
    spark.read.format("binaryFile").load(globPath)

  override def getRecordCount(from: LocalDate, to: LocalDate): Long = readAll().count()

  override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult = {
    val df = readAll()
    SourceResult(if (columns.isEmpty) df else df.select(columns.map(col): _*))
  }
}

/**
 * Local-filesystem staged ingestion
 * (reference: pramen/core .../core/source/LocalSparkSource.scala):
 * files that exist only on the DRIVER's local disk are copied to a
 * cluster-visible Hadoop temp path first, then read through the
 * normal Spark datasource — executors never touch the driver's disk.
 * `close()` removes the staged copy.
 */
final class LocalSparkSource(
    spark: SparkSession,
    localPath: String,
    hadoopTempPath: String,
    format: String = "csv",
    options: Map[String, String] = Map.empty,
    fileNamePattern: String = "*",
    recursive: Boolean = false,
    infoDateColumn: Option[String] = None,
    infoDateType: String = "date") extends GraftSource {

  private var staged: Option[String] = None

  override def hasInfoDateColumn: Boolean = infoDateColumn.isDefined

  /** Copy matching local files into a fresh temp dir (once per source instance). */
  private[sources] def stage(): String = staged.getOrElse {
    val fs = new org.apache.hadoop.fs.Path(hadoopTempPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(
      hadoopTempPath, s"graft_local_${java.util.UUID.randomUUID().toString.take(8)}")
    fs.mkdirs(dest)
    val matcher = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$fileNamePattern")
    val base = java.nio.file.Paths.get(localPath)
    val stream =
      if (recursive) java.nio.file.Files.walk(base)
      else java.nio.file.Files.list(base)
    try {
      stream.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          matcher.matches(p.getFileName) &&
          !p.getFileName.toString.startsWith("."))
        .foreach { p =>
          // stage under the RELATIVE path flattened with a separator
          // that can't appear in file names — a/part-0.csv and
          // b/part-0.csv must not overwrite each other in the flat
          // staging dir (recursive trees commonly repeat basenames)
          val rel = base.relativize(p).toString.replace(java.io.File.separatorChar, '~')
          fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(p.toAbsolutePath.toString),
            new org.apache.hadoop.fs.Path(dest, rel))
        }
    } finally stream.close()
    staged = Some(dest.toString)
    dest.toString
  }

  /** Delete the staged copy. */
  def close(): Unit = staged.foreach { d =>
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    staged = None
  }

  private def reader(): SparkSource =
    new SparkSource(spark, stage(), format, options, infoDateColumn, infoDateType)

  override def getRecordCount(from: LocalDate, to: LocalDate): Long =
    reader().getRecordCount(from, to)

  override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult =
    reader().getData(from, to, columns)
}

/** Runs ingestion: source window/tail → metastore table (an "ingestion job").
  * `specialCharsInColumnNames` non-empty turns on column-name
  * sanitization of what the source returns (see [[ColumnSanitizer]]). */
final class IngestionJob(
    source: GraftSource,
    metastore: graft.meta.Metastore,
    offsets: OffsetStore = new OffsetManager(),
    specialCharsInColumnNames: String = "") {

  private def sanitized(df: org.apache.spark.sql.DataFrame) =
    ColumnSanitizer.sanitize(df, specialCharsInColumnNames)

  /** Batch ingest of one info-date window. */
  def ingest(outputTable: String, infoDate: LocalDate): graft.meta.TableStats = {
    val res = source.getData(infoDate, infoDate)
    metastore.saveTable(outputTable, infoDate, sanitized(res.df))
  }

  /**
   * Incremental ingest: read past the committed offset, APPEND the
   * batch, advance the offset.
   *
   * Two ordering guarantees (reference: pramen/core
   * .../core/pipeline/IncrementalIngestionJob.scala:156):
   *  - the max offset is pinned BEFORE the save and the batch is
   *    bounded `<= max` — rows appended to the source between the pin
   *    and the save fall outside both the saved batch and the
   *    committed offset, so they deliver on the next run instead of
   *    being silently skipped (the lazy-plan re-execution race);
   *  - the batch is saved with Append, so a second incremental run on
   *    the same infoDate adds to the partition rather than dynamic-
   *    overwriting the first batch away; partition overwrite stays
   *    reserved for explicit full re-runs (`ingest`).
   */
  def ingestIncremental(outputTable: String, infoDate: LocalDate): graft.meta.TableStats = {
    val info = source.getOffsetInfo.getOrElse(
      throw new IllegalStateException("source has no offset column configured"))
    // fail BEFORE reading or saving: a store that rejected only at
    // commit time would append the batch, crash, and re-deliver the
    // same window every run
    require(offsets.supports(info.offsetType),
      s"offset store ${offsets.getClass.getSimpleName} cannot commit " +
        s"'${info.offsetType}' offsets for '$outputTable' — use the FS or JDBC offset store")
    val from = offsets.getLatestOffset(outputTable)
    val res = source.getDataIncremental(from)
    offsets.maxOffset(res.df, info) match {
      case None => graft.meta.TableStats(0L, None) // nothing new: no save, no commit
      case Some(pinned) =>
        // sanitize AFTER offset pinning/bounding: the offset column is
        // addressed by its SOURCE name, which sanitization may rename
        val bounded = sanitized(offsets.boundedAbove(res.df, info, pinned))
        val stats = metastore.saveTable(outputTable, infoDate, bounded,
          org.apache.spark.sql.SaveMode.Append)
        offsets.commit(outputTable, pinned) // only after a successful save
        stats
    }
  }
}
