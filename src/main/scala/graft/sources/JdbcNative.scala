package graft.sources

import graft.sql.{SqlColumnType, SqlConfig, SqlDialect, SqlGenerator}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.time.LocalDate

/**
 * Driver-side typed JDBC fetch (reference: pramen/core
 * .../core/reader/TableReaderJdbcNative.scala +
 * .../core/utils/JdbcNativeUtils.scala): some dialects generate SQL
 * that Spark's JDBC relation cannot wrap in its `SELECT * FROM (...)`
 * subquery (SAS sharenet, Denodo quirks) — the reference falls back
 * to plain JDBC there. Rows land on the DRIVER, so this is for
 * dimension/config tables, never facts: `maxRows` hard-fails the read
 * past the cap instead of silently OOMing the driver.
 */
object JdbcNative {

  /** Varchar columns longer than this carry no maxLength metadata
    * (reference: JdbcSparkUtils.MAXIMUM_VARCHAR_LENGTH). */
  private[sources] val MaxVarcharLength = 8192

  /** Spark type for a JDBC column (reference: JdbcNativeUtils
    * getStructField — same families). `incorrectDecimalsAsString`
    * (reference: ResultSetToRowIterator.getDecimalSparkSchema) reads
    * decimals whose reported precision/scale are unusable — scale at
    * or above precision, nonpositive precision, precision past 38 —
    * as STRINGS instead of a lossy decimal(38,18): engines like SAS
    * report such metadata for computed columns, and a string
    * round-trips the value exactly. */
  private[sources] def sparkType(sqlType: Int, precision: Int, scale: Int,
                                 incorrectDecimalsAsString: Boolean = false): DataType = {
    import java.sql.Types._
    sqlType match {
      case BIGINT => LongType
      case INTEGER | SMALLINT | TINYINT => IntegerType
      case FLOAT | REAL => FloatType
      case DOUBLE => DoubleType
      case NUMERIC | DECIMAL =>
        val unusable = scale >= precision || precision <= 0 || scale < 0 ||
          precision > 38 || precision + scale > 38
        if (unusable && incorrectDecimalsAsString) StringType
        else if (precision <= 0 || precision > 38) DecimalType(38, 18)
        else DecimalType(precision, math.min(math.max(scale, 0), precision))
      case BOOLEAN | BIT => BooleanType
      case DATE => DateType
      case TIMESTAMP | TIMESTAMP_WITH_TIMEZONE => TimestampType
      case _ => StringType
    }
  }

  // Spark/parquet-safe date and timestamp range (reference:
  // ResultSetToRowIterator MIN/MAX_SAFE — Oracle happily stores year
  // 10000+ or negative-year values that break downstream writers):
  // clamp to [0001-01-01, 9999-12-31]. Boundaries are built with
  // java.sql.Date/Timestamp.valueOf — the SAME default-timezone,
  // Julian-cutover calendar rs.getDate/getTimestamp values carry — so
  // a legal boundary date never compares out-of-range merely because
  // UTC-proleptic millis disagree with the JVM zone by a few hours.
  private[sources] val MinSafeMilli: Long =
    java.sql.Timestamp.valueOf("0001-01-01 00:00:00").getTime
  private[sources] val MaxSafeDateMilli: Long =
    java.sql.Date.valueOf("9999-12-31").getTime
  private[sources] val MaxSafeTimestampMilli: Long =
    java.sql.Timestamp.valueOf("9999-12-31 23:59:59.999999999").getTime

  private def clampDate(d: java.sql.Date): java.sql.Date =
    if (d == null) d
    else if (d.getTime > MaxSafeDateMilli) new java.sql.Date(MaxSafeDateMilli)
    else if (d.getTime < MinSafeMilli) new java.sql.Date(MinSafeMilli)
    else d

  private def clampTimestamp(t: java.sql.Timestamp): java.sql.Timestamp =
    if (t == null) t
    else if (t.getTime > MaxSafeTimestampMilli) new java.sql.Timestamp(MaxSafeTimestampMilli)
    else if (t.getTime < MinSafeMilli) new java.sql.Timestamp(MinSafeMilli)
    else t

  /** Materialize a ResultSet as (schema, rows) using its metadata —
    * the TYPED twin of the bookkeeping layer's string-flattening
    * `SqlExecutor.query` (bookkeeping needs no types; data does).
    * `sanitizeDateTime` clamps out-of-range date/timestamp values to
    * the Spark-safe range instead of letting them poison the write. */
  def fetch(rs: java.sql.ResultSet, maxRows: Long,
            sanitizeDateTime: Boolean = false,
            incorrectDecimalsAsString: Boolean = false): (StructType, Seq[Row]) = {
    val meta = rs.getMetaData
    val n = meta.getColumnCount
    val fields = (1 to n).map { i =>
      val sqlType = meta.getColumnType(i)
      val dt = sparkType(sqlType, meta.getPrecision(i), meta.getScale(i),
        incorrectDecimalsAsString)
      // varchar width survives as maxLength metadata (reference:
      // addMetadataFromJdbc) — downstream Hive DDL can size VARCHAR
      // columns instead of falling back to STRING. GENUINE character
      // types only: a decimal read as string has a precision-derived
      // width that understates the rendered value and would truncate
      // it right back. Best-effort: not every driver answers
      // getColumnDisplaySize.
      val isCharType = {
        import java.sql.Types._
        sqlType == CHAR || sqlType == VARCHAR || sqlType == LONGVARCHAR ||
          sqlType == NCHAR || sqlType == NVARCHAR || sqlType == LONGNVARCHAR
      }
      val md =
        if (isCharType && dt == StringType) {
          val len = try math.max(meta.getColumnDisplaySize(i), meta.getPrecision(i))
            catch { case _: Exception => 0 }
          if (len > 0 && len <= MaxVarcharLength)
            new MetadataBuilder().putLong("maxLength", len.toLong).build()
          else Metadata.empty
        } else Metadata.empty
      StructField(meta.getColumnLabel(i), dt, metadata = md)
    }
    val schema = StructType(fields)
    val rows = Vector.newBuilder[Row]
    var count = 0L
    while (rs.next()) {
      count += 1
      if (count > maxRows)
        throw new IllegalStateException(
          s"JdbcNative read exceeded maxRows=$maxRows — this driver-side path is for " +
            "small dimension tables; use the Spark JDBC source for anything bigger")
      val values = new Array[Any](n)
      var i = 0
      while (i < n) {
        val v: Any = fields(i).dataType match {
          case LongType      => rs.getLong(i + 1)
          case IntegerType   => rs.getInt(i + 1)
          case FloatType     => rs.getFloat(i + 1)
          case DoubleType    => rs.getDouble(i + 1)
          case _: DecimalType => rs.getBigDecimal(i + 1)
          case BooleanType   => rs.getBoolean(i + 1)
          case DateType      =>
            val d = rs.getDate(i + 1)
            if (sanitizeDateTime) clampDate(d) else d
          case TimestampType =>
            val t = rs.getTimestamp(i + 1)
            if (sanitizeDateTime) clampTimestamp(t) else t
          case _             => rs.getString(i + 1)
        }
        values(i) = if (rs.wasNull()) null else v
        i += 1
      }
      rows += Row.fromSeq(values.toIndexedSeq)
      i = 0
    }
    (schema, rows.result())
  }
}

/**
 * GraftSource over plain JDBC: dialect-generated info-date-windowed
 * SQL executed on a driver connection, results typed via
 * [[JdbcNative.fetch]] and handed to Spark as a local DataFrame.
 */
final class JdbcNativeSource(
    spark: SparkSession,
    connect: () => java.sql.Connection,
    table: String,
    infoDateColumn: String,
    dialect: SqlDialect = SqlDialect.Generic,
    infoDateType: SqlColumnType = SqlColumnType.Date,
    dateFormatApp: String = "yyyy-MM-dd",
    maxRows: Long = 1000000L,
    fallbackConnects: Seq[() => java.sql.Connection] = Nil,
    connectionRetries: Option[Int] = None,
    backoffSleep: Long => Unit = Thread.sleep,
    columnDescriptions: Boolean = false,
    sanitizeDateTime: Boolean = false,
    incorrectDecimalsAsString: Boolean = false) extends GraftSource {

  private val gen = new SqlGenerator(dialect,
    SqlConfig(infoDateColumn, dateFormatApp = dateFormatApp, infoDateType = infoDateType))

  override def hasInfoDateColumn: Boolean = true

  def dataQuery(from: LocalDate, to: LocalDate, columns: Seq[String] = Seq.empty): String =
    gen.getDataQuery(table, from, to, columns)

  override def getRecordCount(from: LocalDate, to: LocalDate): Long = withConnection { conn =>
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(gen.getCountQuery(table, from, to))
      if (rs.next()) rs.getLong(1) else 0L
    } finally st.close()
  }

  override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult =
    withConnection { conn =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(dataQuery(from, to, columns))
        val (schema, rows) =
          JdbcNative.fetch(rs, maxRows, sanitizeDateTime, incorrectDecimalsAsString)
        // warehouse column comments survive ingestion as `comment`
        // field metadata (best-effort — a metadata failure never fails
        // the read)
        val described =
          if (columnDescriptions)
            JdbcSchemaCorrections.withColumnDescriptions(schema,
              JdbcSchemaCorrections.columnRemarks(conn, table))
          else schema
        SourceResult(spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          described))
      } finally st.close()
    }

  private val endpoints = (connect +: fallbackConnects).toIndexedSeq
  private val endpointLabels =
    endpoints.indices.map(i => if (i == 0) "primary" else s"fallback-$i")
  // sticky last-known-good endpoint, same discipline as JdbcUrlSelector
  @volatile private var currentEndpoint = 0

  // only the connection OPEN rides the failover loop — a query failure
  // on a live connection propagates (re-running it on another replica
  // could double-execute and would mask real errors as connectivity)
  private def withConnection[A](f: java.sql.Connection => A): A = {
    val (conn, idx) = JdbcUrlSelector.run(endpointLabels, currentEndpoint,
      connectionRetries, maxBackoffMs = 10000L, backoffSleep)(i => endpoints(i)())
    currentEndpoint = idx
    try f(conn) finally conn.close()
  }
}

object JdbcNativeSource {

  /** Connection factory through a runtime-loaded driver jar — the
    * native-read twin of the reference's
    * JdbcNativeUtils.getResultSetForRDD(driverJarPath)
    * (JdbcNativeUtils.scala:190). The [[DynamicDriver]] loads lazily
    * ONCE on first open and is shared by every subsequent open, so the
    * failover loop's retries do not re-open the jar. */
  def dynamicConnectFactory(jarPath: String, driverClass: String, url: String,
                            props: Map[String, String] = Map.empty): () => java.sql.Connection = {
    lazy val dd = DynamicDriver.load(jarPath, driverClass)
    () => {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.put(k, v) }
      dd.connect(url, p)
    }
  }
}
