package graft.sql

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** How the information-date column is typed in the SOURCE database —
  * literals in generated WHERE clauses must match it (reference:
  * pramen/api .../api/sql/SqlColumnType.scala). */
sealed trait SqlColumnType
object SqlColumnType {
  case object Date extends SqlColumnType
  case object Datetime extends SqlColumnType
  /** Dates stored as strings in `dateFormatApp`. */
  case object StringType extends SqlColumnType
  /** Dates stored as numbers, e.g. 20240615 for yyyyMMdd. */
  case object Number extends SqlColumnType

  def parse(s: String): SqlColumnType = s.trim.toLowerCase match {
    case "date" => Date
    case "datetime" => Datetime
    case "string" => StringType
    case "number" => Number
    case other => throw new IllegalArgumentException(s"unknown info.date.type '$other'")
  }
}

/**
 * SQL generation for JDBC ingestion queries across RDBMS dialects
 * (reference: pramen/api .../api/sql/SqlGeneratorBase.scala,
 * core/sql/SqlGenerator{PostgreSQL,MySQL,Oracle,Microsoft,Hive,
 * Databricks,Db2,HsqlDb,Denodo,Sas,Generic}.scala — date-literal
 * syntax, identifier quoting, and limit clauses differ per engine;
 * the generated query pushes the info-date range into the source
 * database so only the requested window leaves the RDBMS).
 */
sealed trait SqlDialect {
  def name: String
  def quote(ident: String): String = "\"" + ident + "\""
  def dateLiteral(d: LocalDate): String = s"DATE '${d.format(DateTimeFormatter.ISO_LOCAL_DATE)}'"
  /** Midnight-of-day timestamp literal — the boundary value for
    * datetime-typed info-date columns. */
  def timestampLiteral(d: LocalDate): String =
    s"TIMESTAMP '${d.format(DateTimeFormatter.ISO_LOCAL_DATE)} 00:00:00'"
  def limitClause(sql: String, n: Int): String = s"$sql LIMIT $n"
  /** Column type for long machine-generated text values the store
    * must compare with `=` (committed offsets: a Kafka per-partition
    * vector at 1000 partitions is ~18 KB — VARCHAR(255) truncates or
    * rejects it). TEXT where the dialect compares it natively; Oracle
    * keeps a (documented) VARCHAR2 cap because CLOB equality is not
    * SQL-comparable — an over-cap offset fails LOUDLY at insert and
    * the commit path restores the previous value. */
  def longTextType: String = "VARCHAR(32000)"
  /** `ALTER TABLE` column-retype statement (schema migrations); the
    * column stays NOT NULL on dialects that need it restated. */
  def alterColumnType(table: String, column: String, newType: String): String =
    s"ALTER TABLE $table ALTER COLUMN $column SET DATA TYPE $newType"
}
object SqlDialect {
  private val Iso = DateTimeFormatter.ISO_LOCAL_DATE

  case object Generic extends SqlDialect { val name = "generic" }
  case object Postgres extends SqlDialect {
    val name = "postgresql"
    override def longTextType: String = "TEXT"
    override def alterColumnType(table: String, column: String, newType: String): String =
      s"ALTER TABLE $table ALTER COLUMN $column TYPE $newType"
  }
  case object MySql extends SqlDialect {
    val name = "mysql"
    override def quote(ident: String): String = s"`$ident`"
    override def longTextType: String = "TEXT"
    override def alterColumnType(table: String, column: String, newType: String): String =
      s"ALTER TABLE $table MODIFY $column $newType NOT NULL"
  }
  case object Oracle extends SqlDialect {
    val name = "oracle"
    override def dateLiteral(d: LocalDate): String = s"date'${d.format(Iso)}'"
    override def limitClause(sql: String, n: Int): String = s"SELECT * FROM ($sql) WHERE ROWNUM <= $n"
    // CLOB is not =-comparable in Oracle SQL; 4000 is the classic
    // VARCHAR2 cap (32767 with extended string size) — over-cap
    // offsets fail loudly at insert, never silently truncate
    override def longTextType: String = "VARCHAR2(4000)"
    override def alterColumnType(table: String, column: String, newType: String): String =
      s"ALTER TABLE $table MODIFY ($column $newType)"
  }
  case object SqlServer extends SqlDialect {
    val name = "sqlserver"
    override def quote(ident: String): String = s"[$ident]"
    override def dateLiteral(d: LocalDate): String = s"CONVERT(DATE, '${d.format(Iso)}')"
    override def limitClause(sql: String, n: Int): String =
      sql.replaceFirst("(?i)^SELECT ", s"SELECT TOP $n ")
    override def longTextType: String = "VARCHAR(MAX)"
    override def alterColumnType(table: String, column: String, newType: String): String =
      s"ALTER TABLE $table ALTER COLUMN $column $newType NOT NULL"
  }
  /** Hive over JDBC: backtick identifiers, `to_date` literals. */
  case object Hive extends SqlDialect {
    val name = "hive"
    override def quote(ident: String): String = s"`$ident`"
    override def dateLiteral(d: LocalDate): String = s"to_date('${d.format(Iso)}')"
    // HiveQL has no bounded-VARCHAR pressure and no `ALTER COLUMN ...
    // SET DATA TYPE` form — the default spelling fails to parse, which
    // would brick a Hive-backed bookkeeping DB at the v1→v2 migration
    // (r17 meta-review)
    override def longTextType: String = "STRING"
    override def alterColumnType(table: String, column: String, newType: String): String =
      s"ALTER TABLE $table CHANGE $column $column $newType"
  }
  /** Databricks SQL warehouses: Spark-SQL dialect — backticks, ANSI
    * date literals. Spark-SQL grammar has no `ALTER COLUMN ... SET
    * DATA TYPE` form and no bounded-VARCHAR pressure (r18 ADVICE —
    * the inherited defaults would brick a Databricks-backed
    * bookkeeping DB at the v1→v2 offsets migration, the same failure
    * class the Hive dialect already fixed; Delta additionally
    * restricts retypes, so the widened column is STRING, a widening
    * Delta accepts only via explicit `ALTER COLUMN ... TYPE`). */
  case object Databricks extends SqlDialect {
    val name = "databricks"
    override def quote(ident: String): String = s"`$ident`"
    override def dateLiteral(d: LocalDate): String = s"date'${d.format(Iso)}'"
    override def longTextType: String = "STRING"
    override def alterColumnType(table: String, column: String, newType: String): String =
      s"ALTER TABLE $table ALTER COLUMN $column TYPE $newType"
  }
  case object Db2 extends SqlDialect {
    val name = "db2"
    override def dateLiteral(d: LocalDate): String = s"DATE '${d.format(Iso)}'"
    // the default VARCHAR(32000) exceeds DB2's row limit on default
    // 4K-page tablespaces (~4005 bytes), and DB2 LOBs are not allowed
    // in basic predicates (the offsets CAS DELETE compares with =) —
    // so DB2 keeps a documented VARCHAR cap sized to fit a 4K page;
    // an over-cap offset fails LOUDLY at insert and the commit path
    // restores the previous value
    override def longTextType: String = "VARCHAR(3500)"
    override def alterColumnType(table: String, column: String, newType: String): String =
      s"ALTER TABLE $table ALTER COLUMN $column SET DATA TYPE $newType"
  }
  case object HsqlDb extends SqlDialect {
    val name = "hsqldb"
    override def dateLiteral(d: LocalDate): String = s"TO_DATE('${d.format(Iso)}', 'YYYY-MM-DD')"
  }
  /** Denodo virtual databases: no reliable LIMIT pushdown across
    * underlying sources — limits are applied Spark-side instead. */
  case object Denodo extends SqlDialect {
    val name = "denodo"
    override def dateLiteral(d: LocalDate): String = s"date'${d.format(Iso)}'"
    override def limitClause(sql: String, n: Int): String = sql
  }
  /** SAS sharenet JDBC: name literals quoted as 'ident'n. */
  case object Sas extends SqlDialect {
    val name = "sas"
    override def quote(ident: String): String = s"'$ident'n"
    override def dateLiteral(d: LocalDate): String = s"date'${d.format(Iso)}'"
  }

  val All: Seq[SqlDialect] =
    Seq(Generic, Postgres, MySql, Oracle, SqlServer, Hive, Databricks, Db2, HsqlDb, Denodo, Sas)

  def forName(n: String): SqlDialect = All.find(_.name == n.toLowerCase)
    .getOrElse(throw new IllegalArgumentException(s"Unknown SQL dialect: $n"))
}

/**
 * @param infoDateType  source-side type of the info-date column: DATE
 *        columns get engine date literals; STRING/NUMBER columns get
 *        the date rendered through `dateFormatApp` as a quoted string
 *        / bare number (reference: api/sql/SqlConfig.scala)
 */
final case class SqlConfig(
    infoDateColumn: String,
    dateFormatApp: String = "yyyy-MM-dd",
    identifierQuoting: Boolean = false,
    infoDateType: SqlColumnType = SqlColumnType.Date)

/**
 * Builds SELECT/COUNT queries for a date window over a source table
 * (reference: pramen/api .../api/sql/SqlGenerator.scala — getDataQuery
 * / getCountQuery / getDtable).
 */
final class SqlGenerator(dialect: SqlDialect, cfg: SqlConfig) {
  private def id(s: String): String = if (cfg.identifierQuoting) dialect.quote(s) else s

  private val appFmt = DateTimeFormatter.ofPattern(cfg.dateFormatApp)

  /** Info-date literal respecting the column's source-side type. */
  def dateValue(d: LocalDate): String = cfg.infoDateType match {
    case SqlColumnType.Date => dialect.dateLiteral(d)
    case SqlColumnType.Datetime => dialect.timestampLiteral(d)
    case SqlColumnType.StringType => s"'${d.format(appFmt)}'"
    case SqlColumnType.Number => d.format(appFmt)
  }

  private def dateWhere(from: LocalDate, to: LocalDate): String = {
    val c = id(cfg.infoDateColumn)
    cfg.infoDateType match {
      // a datetime column holds intra-day times: a day (or day range)
      // is the half-open interval [from 00:00, to+1 00:00) — an
      // equality/closed-range on the DATE would match only midnight
      // rows and silently drop the rest of every day
      case SqlColumnType.Datetime =>
        s"$c >= ${dateValue(from)} AND $c < ${dateValue(to.plusDays(1))}"
      case _ if from == to => s"$c = ${dateValue(from)}"
      case _ => s"$c >= ${dateValue(from)} AND $c <= ${dateValue(to)}"
    }
  }

  def getDataQuery(table: String, from: LocalDate, to: LocalDate,
                   columns: Seq[String] = Seq.empty, limit: Option[Int] = None): String = {
    val cols = if (columns.isEmpty) "*" else columns.map(id).mkString(", ")
    val base = s"SELECT $cols FROM ${id(table)} WHERE ${dateWhere(from, to)}"
    limit.fold(base)(n => dialect.limitClause(base, n))
  }

  def getCountQuery(table: String, from: LocalDate, to: LocalDate): String =
    s"SELECT COUNT(*) FROM ${id(table)} WHERE ${dateWhere(from, to)}"

  def getCountQuery(table: String): String = s"SELECT COUNT(*) FROM ${id(table)}"

  /** Incremental tail query: rows strictly after `offsetFrom` on `offsetCol`. */
  def getIncrementalQuery(table: String, offsetCol: String, offsetFrom: String,
                          columns: Seq[String] = Seq.empty): String = {
    val cols = if (columns.isEmpty) "*" else columns.map(id).mkString(", ")
    s"SELECT $cols FROM ${id(table)} WHERE ${id(offsetCol)} > $offsetFrom"
  }

  /** Min/max probe for a partition column over the date window — the
    * bounds Spark's range-partitioned JDBC read requires (reference:
    * pramen/core .../core/reader/TableReaderJdbc.scala — the
    * partitioned read path must supply lowerBound/upperBound). */
  def getBoundsQuery(table: String, partitionColumn: String,
                     from: LocalDate, to: LocalDate): String =
    s"SELECT MIN(${id(partitionColumn)}) AS lo, MAX(${id(partitionColumn)}) AS hi " +
      s"FROM ${id(table)} WHERE ${dateWhere(from, to)}"

  /** Wraps an arbitrary SQL query so it can be used as a JDBC dbtable. */
  def getDtable(sql: String): String = s"($sql) t"
}
