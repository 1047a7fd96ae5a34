package graft.sql

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/**
 * SQL generation for JDBC ingestion queries across RDBMS dialects
 * (reference: pramen/api .../api/sql/SqlGeneratorBase.scala,
 * core/sql/dialects — date-literal syntax, identifier quoting, and
 * limit clauses differ per engine; the generated query pushes the
 * info-date range into the source database so only the requested
 * window leaves the RDBMS).
 */
sealed trait SqlDialect {
  def name: String
  def quote(ident: String): String = "\"" + ident + "\""
  def dateLiteral(d: LocalDate): String = s"DATE '${d.format(DateTimeFormatter.ISO_LOCAL_DATE)}'"
  def limitClause(sql: String, n: Int): String = s"$sql LIMIT $n"
}
object SqlDialect {
  case object Generic extends SqlDialect { val name = "generic" }
  case object Postgres extends SqlDialect { val name = "postgresql" }
  case object MySql extends SqlDialect {
    val name = "mysql"
    override def quote(ident: String): String = s"`$ident`"
  }
  case object Oracle extends SqlDialect {
    val name = "oracle"
    override def dateLiteral(d: LocalDate): String = s"date'${d.format(DateTimeFormatter.ISO_LOCAL_DATE)}'"
    override def limitClause(sql: String, n: Int): String = s"SELECT * FROM ($sql) WHERE ROWNUM <= $n"
  }
  case object SqlServer extends SqlDialect {
    val name = "sqlserver"
    override def quote(ident: String): String = s"[$ident]"
    override def dateLiteral(d: LocalDate): String = s"CONVERT(DATE, '${d.format(DateTimeFormatter.ISO_LOCAL_DATE)}')"
    override def limitClause(sql: String, n: Int): String =
      sql.replaceFirst("(?i)^SELECT ", s"SELECT TOP $n ")
  }

  def forName(n: String): SqlDialect = Seq(Generic, Postgres, MySql, Oracle, SqlServer)
    .find(_.name == n.toLowerCase)
    .getOrElse(throw new IllegalArgumentException(s"Unknown SQL dialect: $n"))
}

final case class SqlConfig(
    infoDateColumn: String,
    dateFormatApp: String = "yyyy-MM-dd",
    identifierQuoting: Boolean = false)

/**
 * Builds SELECT/COUNT queries for a date window over a source table
 * (reference: pramen/api .../api/sql/SqlGenerator.scala — getDataQuery
 * / getCountQuery / getDtable).
 */
final class SqlGenerator(dialect: SqlDialect, cfg: SqlConfig) {
  private def id(s: String): String = if (cfg.identifierQuoting) dialect.quote(s) else s

  private def dateWhere(from: LocalDate, to: LocalDate): String = {
    val c = id(cfg.infoDateColumn)
    if (from == to) s"$c = ${dialect.dateLiteral(from)}"
    else s"$c >= ${dialect.dateLiteral(from)} AND $c <= ${dialect.dateLiteral(to)}"
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
