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
}
