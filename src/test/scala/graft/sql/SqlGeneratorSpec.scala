package graft.sql

import org.scalatest.funsuite.AnyFunSuite

import java.time.LocalDate

/** S2: SQL dialect generation for JDBC ingestion. */
class SqlGeneratorSpec extends AnyFunSuite {
  private val from = LocalDate.parse("2024-06-01")
  private val to = LocalDate.parse("2024-06-30")

  test("generic data query, range and single-day windows") {
    val g = new SqlGenerator(SqlDialect.Generic, SqlConfig("info_date"))
    assert(g.getDataQuery("sales", from, to) ==
      "SELECT * FROM sales WHERE info_date >= DATE '2024-06-01' AND info_date <= DATE '2024-06-30'")
    assert(g.getDataQuery("sales", from, from) ==
      "SELECT * FROM sales WHERE info_date = DATE '2024-06-01'")
    assert(g.getDataQuery("sales", from, to, Seq("a", "b")) ==
      "SELECT a, b FROM sales WHERE info_date >= DATE '2024-06-01' AND info_date <= DATE '2024-06-30'")
  }

  test("count and incremental queries") {
    val g = new SqlGenerator(SqlDialect.Generic, SqlConfig("d"))
    assert(g.getCountQuery("t", from, from) == "SELECT COUNT(*) FROM t WHERE d = DATE '2024-06-01'")
    assert(g.getCountQuery("t") == "SELECT COUNT(*) FROM t")
    assert(g.getIncrementalQuery("t", "seq", "100") == "SELECT * FROM t WHERE seq > 100")
  }

  test("identifier quoting per dialect") {
    def gen(d: SqlDialect) = new SqlGenerator(d, SqlConfig("info date", identifierQuoting = true))
    assert(gen(SqlDialect.Generic).getCountQuery("my table", from, from)
      .contains("\"my table\""))
    assert(gen(SqlDialect.MySql).getCountQuery("my table", from, from)
      .contains("`my table`"))
    assert(gen(SqlDialect.SqlServer).getCountQuery("my table", from, from)
      .contains("[my table]"))
  }

  test("bounds probe query per dialect (partitioned-read min/max)") {
    val g = new SqlGenerator(SqlDialect.Generic, SqlConfig("info_date"))
    assert(g.getBoundsQuery("sales", "id", from, to) ==
      "SELECT MIN(id) AS lo, MAX(id) AS hi FROM sales " +
        "WHERE info_date >= DATE '2024-06-01' AND info_date <= DATE '2024-06-30'")
    val q = new SqlGenerator(SqlDialect.SqlServer, SqlConfig("info date", identifierQuoting = true))
    assert(q.getBoundsQuery("my table", "row id", from, from) ==
      "SELECT MIN([row id]) AS lo, MAX([row id]) AS hi FROM [my table] " +
        "WHERE [info date] = CONVERT(DATE, '2024-06-01')")
  }

  test("date literal and limit per dialect") {
    val base = "SELECT * FROM t WHERE d = X"
    assert(SqlDialect.Oracle.dateLiteral(from) == "date'2024-06-01'")
    assert(SqlDialect.SqlServer.dateLiteral(from) == "CONVERT(DATE, '2024-06-01')")
    assert(SqlDialect.Generic.limitClause(base, 10) == s"$base LIMIT 10")
    assert(SqlDialect.Oracle.limitClause(base, 10) == s"SELECT * FROM ($base) WHERE ROWNUM <= 10")
    assert(SqlDialect.SqlServer.limitClause(base, 10) == base.replaceFirst("SELECT ", "SELECT TOP 10 "))
  }

  test("dtable wrapping and dialect lookup") {
    val g = new SqlGenerator(SqlDialect.Postgres, SqlConfig("d"))
    assert(g.getDtable("SELECT 1") == "(SELECT 1) t")
    assert(SqlDialect.forName("mysql") == SqlDialect.MySql)
    assertThrows[IllegalArgumentException](SqlDialect.forName("db2000"))
  }

  test("warehouse dialects: hive/databricks/db2/hsqldb/denodo/sas") {
    assert(SqlDialect.Hive.dateLiteral(from) == "to_date('2024-06-01')")
    assert(SqlDialect.Hive.quote("my col") == "`my col`")
    assert(SqlDialect.Databricks.dateLiteral(from) == "date'2024-06-01'")
    assert(SqlDialect.Databricks.quote("c") == "`c`")
    assert(SqlDialect.Db2.dateLiteral(from) == "DATE '2024-06-01'")
    assert(SqlDialect.HsqlDb.dateLiteral(from) == "TO_DATE('2024-06-01', 'YYYY-MM-DD')")
    // Denodo: limits never push into the federated query
    assert(SqlDialect.Denodo.limitClause("SELECT * FROM t", 5) == "SELECT * FROM t")
    assert(SqlDialect.Denodo.dateLiteral(from) == "date'2024-06-01'")
    // SAS name literals
    assert(SqlDialect.Sas.quote("my col") == "'my col'n")
    assert(SqlDialect.forName("databricks") == SqlDialect.Databricks)
    assert(SqlDialect.All.size == 11)
  }

  test("migration DDL matrix: every dialect's column-retype statement parses in ITS grammar") {
    // r18 ADVICE: Databricks inherited the generic 'ALTER COLUMN ...
    // SET DATA TYPE' + VARCHAR(32000) — Spark SQL's grammar is
    // 'ALTER COLUMN col TYPE type' and Delta restricts retypes, so the
    // v1->v2 offsets migration would brick a Databricks-backed
    // bookkeeping DB exactly like the Hive case fixed in r17
    def alter(d: SqlDialect) = d.alterColumnType("t", "c", d.longTextType)
    assert(alter(SqlDialect.Databricks) == "ALTER TABLE t ALTER COLUMN c TYPE STRING")
    assert(alter(SqlDialect.Hive) == "ALTER TABLE t CHANGE c c STRING")
    assert(alter(SqlDialect.Postgres) == "ALTER TABLE t ALTER COLUMN c TYPE TEXT")
    assert(alter(SqlDialect.MySql) == "ALTER TABLE t MODIFY c TEXT NOT NULL")
    assert(alter(SqlDialect.Oracle) == "ALTER TABLE t MODIFY (c VARCHAR2(4000))")
    assert(alter(SqlDialect.SqlServer) == "ALTER TABLE t ALTER COLUMN c VARCHAR(MAX) NOT NULL")
    assert(alter(SqlDialect.Db2) == "ALTER TABLE t ALTER COLUMN c SET DATA TYPE VARCHAR(3500)")
    // no dialect keeps BOTH generic defaults by accident: anything on
    // the generic 'SET DATA TYPE' spelling must be a dialect where
    // that grammar is real (generic itself, DB2, HSQLDB, Denodo, SAS)
    val genericOk = Set[SqlDialect](SqlDialect.Generic, SqlDialect.Db2,
      SqlDialect.HsqlDb, SqlDialect.Denodo, SqlDialect.Sas)
    SqlDialect.All.filterNot(genericOk).foreach { d =>
      assert(!alter(d).contains("SET DATA TYPE"),
        s"${d.name} must override the generic retype spelling: ${alter(d)}")
    }
  }

  test("info-date column typed STRING or NUMBER renders app-format literals") {
    val str = new SqlGenerator(SqlDialect.Generic,
      SqlConfig("d", dateFormatApp = "yyyy-MM-dd", infoDateType = SqlColumnType.StringType))
    assert(str.getDataQuery("t", from, from) == "SELECT * FROM t WHERE d = '2024-06-01'")
    val num = new SqlGenerator(SqlDialect.Oracle,
      SqlConfig("dk", dateFormatApp = "yyyyMMdd", infoDateType = SqlColumnType.Number))
    assert(num.getDataQuery("t", from, to) ==
      "SELECT * FROM t WHERE dk >= 20240601 AND dk <= 20240630")
    // DATE type keeps the engine literal
    val dt = new SqlGenerator(SqlDialect.Hive, SqlConfig("d"))
    assert(dt.getCountQuery("t", from, from) ==
      "SELECT COUNT(*) FROM t WHERE d = to_date('2024-06-01')")
    assert(SqlColumnType.parse("number") == SqlColumnType.Number)
    assertThrows[IllegalArgumentException](SqlColumnType.parse("uuid"))
  }
  test("datetime-typed info-date columns get half-open day ranges") {
    val g = new SqlGenerator(SqlDialect.Generic, SqlConfig("ts_col", infoDateType = SqlColumnType.Datetime))
    assert(g.getDataQuery("t", from, from) ==
      "SELECT * FROM t WHERE ts_col >= TIMESTAMP '2024-06-01 00:00:00' AND ts_col < TIMESTAMP '2024-06-02 00:00:00'")
    assert(g.getCountQuery("t", from, to) ==
      "SELECT COUNT(*) FROM t WHERE ts_col >= TIMESTAMP '2024-06-01 00:00:00' AND ts_col < TIMESTAMP '2024-07-01 00:00:00'")
  }
}
