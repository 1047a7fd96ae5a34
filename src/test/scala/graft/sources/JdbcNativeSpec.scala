package graft.sources

import graft.SparkSpec
import graft.sql.SqlDialect
import org.apache.spark.sql.types._

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.time.LocalDate

/** Typed driver-side JDBC reads (the reference's TableReaderJdbcNative
  * fallback) — scripted java.sql proxies stand in for a live driver,
  * the same strategy as the rest of the JDBC layer. */
class JdbcNativeSpec extends SparkSpec {

  private def proxy[T](cls: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          h(m.getName, if (args == null) Array.empty else args)
      }).asInstanceOf[T]

  /** columns: (label, java.sql.Types code, precision, scale); rows of Any (null ok). */
  private def fakeResultSet(cols: Seq[(String, Int, Int, Int)],
                            rows: Seq[Seq[Any]]): java.sql.ResultSet = {
    var cursor = -1
    var lastWasNull = false
    val meta = proxy(classOf[java.sql.ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(cols.size)
      case ("getColumnLabel", a) => cols(a(0).asInstanceOf[Integer] - 1)._1
      case ("getColumnType", a) => Integer.valueOf(cols(a(0).asInstanceOf[Integer] - 1)._2)
      case ("getPrecision", a) => Integer.valueOf(cols(a(0).asInstanceOf[Integer] - 1)._3)
      case ("getScale", a) => Integer.valueOf(cols(a(0).asInstanceOf[Integer] - 1)._4)
      case _ => null
    }
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) => cursor += 1; java.lang.Boolean.valueOf(cursor < rows.size)
      case ("getMetaData", _) => meta
      case ("wasNull", _) => java.lang.Boolean.valueOf(lastWasNull)
      case (g, a) if g.startsWith("get") && a.length == 1 && a(0).isInstanceOf[Integer] =>
        val v = rows(cursor)(a(0).asInstanceOf[Integer] - 1)
        lastWasNull = v == null
        (g, v) match {
          case (_, null) => g match { // primitive getters cannot return null
            case "getLong" => java.lang.Long.valueOf(0L)
            case "getInt" => Integer.valueOf(0)
            case "getBoolean" => java.lang.Boolean.FALSE
            case "getDouble" => java.lang.Double.valueOf(0)
            case "getFloat" => java.lang.Float.valueOf(0f)
            case _ => null
          }
          case (_, value) => value.asInstanceOf[AnyRef]
        }
      case _ => null
    }
  }

  import java.sql.Types._
  private val cols = Seq(
    ("id", BIGINT, 0, 0), ("name", VARCHAR, 0, 0), ("amount", DECIMAL, 18, 4),
    ("born", DATE, 0, 0), ("ok", BOOLEAN, 0, 0))
  private def rows = Seq(
    Seq[Any](java.lang.Long.valueOf(1L), "alice", new java.math.BigDecimal("12.5000"),
      java.sql.Date.valueOf("2024-06-15"), java.lang.Boolean.TRUE),
    Seq[Any](java.lang.Long.valueOf(2L), null, null, null, java.lang.Boolean.FALSE))

  test("fetch types columns from ResultSet metadata; nulls survive primitive getters") {
    val (schema, out) = JdbcNative.fetch(fakeResultSet(cols, rows), maxRows = 10)
    assert(schema == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DecimalType(18, 4)),
      StructField("born", DateType), StructField("ok", BooleanType))))
    assert(out.size == 2)
    assert(out.head.getLong(0) == 1L && out.head.getString(1) == "alice")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(!out(1).getBoolean(4))
  }

  test("maxRows hard-fails instead of buffering a fact table on the driver") {
    val big = (1 to 100).map(i => Seq[Any](java.lang.Long.valueOf(i.toLong), s"r$i",
      null, null, java.lang.Boolean.TRUE))
    val e = intercept[IllegalStateException](
      JdbcNative.fetch(fakeResultSet(cols, big), maxRows = 10))
    assert(e.getMessage.contains("maxRows=10"), e.getMessage)
  }

  test("incorrectDecimalsAsString: unusable precision/scale reads as string, sane decimals untouched") {
    import java.sql.Types._
    // SAS-style metadata: scale >= precision, zero precision, 38+ overflow
    val weird = Seq(
      ("frac", NUMERIC, 5, 8), ("bare", NUMERIC, 0, 0),
      ("wide", NUMERIC, 38, 6), ("money", NUMERIC, 18, 4))
    val rows = Seq(Seq[Any]("123.456", "9", "1.5", new java.math.BigDecimal("12.5000")))
    val (schema, out) = JdbcNative.fetch(fakeResultSet(weird, rows), maxRows = 10,
      incorrectDecimalsAsString = true)
    assert(schema("frac").dataType == StringType)
    assert(schema("bare").dataType == StringType)
    assert(schema("wide").dataType == StringType, "precision+scale past 38 is unusable")
    assert(schema("money").dataType == DecimalType(18, 4), "sane decimals stay decimals")
    assert(out.head.getString(0) == "123.456", "the string round-trips the value exactly")
    // without the flag, the old clamping behavior stands (schema only:
    // these cells hold strings the decimal getter could not read)
    val (defSchema, _) = JdbcNative.fetch(fakeResultSet(weird, Seq.empty), maxRows = 10)
    assert(defSchema("bare").dataType == DecimalType(38, 18))
  }

  test("varchar width survives as maxLength metadata when the driver reports it") {
    import java.sql.Types._
    var displaySize = 40
    val cols = Seq(("name", VARCHAR, 0, 0))
    val meta = proxy(classOf[java.sql.ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(1)
      case ("getColumnLabel", _) => "name"
      case ("getColumnType", _) => Integer.valueOf(VARCHAR)
      case ("getPrecision", _) => Integer.valueOf(0)
      case ("getScale", _) => Integer.valueOf(0)
      case ("getColumnDisplaySize", _) => Integer.valueOf(displaySize)
      case _ => null
    }
    val rs = proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) => java.lang.Boolean.FALSE
      case ("getMetaData", _) => meta
      case _ => null
    }
    val (schema, _) = JdbcNative.fetch(rs, maxRows = 10)
    assert(schema("name").metadata.getLong("maxLength") == 40L)
    // CLOB-ish widths carry no cap (Hive DDL would fall back to STRING)
    displaySize = 1 << 20
    val (wide, _) = JdbcNative.fetch(rs, maxRows = 10)
    assert(!wide("name").metadata.contains("maxLength"))
    // the reference cap itself is inclusive
    displaySize = JdbcNative.MaxVarcharLength
    assert(JdbcNative.fetch(rs, maxRows = 10)._1("name")
      .metadata.getLong("maxLength") == JdbcNative.MaxVarcharLength.toLong)
    // a decimal READ AS STRING keeps no maxLength: its precision-based
    // width understates the rendered value and would truncate it
    val numMeta = proxy(classOf[java.sql.ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(1)
      case ("getColumnLabel", _) => "frac"
      case ("getColumnType", _) => Integer.valueOf(java.sql.Types.NUMERIC)
      case ("getPrecision", _) => Integer.valueOf(5)
      case ("getScale", _) => Integer.valueOf(8)
      case ("getColumnDisplaySize", _) => Integer.valueOf(7)
      case _ => null
    }
    val numRs = proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) => java.lang.Boolean.FALSE
      case ("getMetaData", _) => numMeta
      case _ => null
    }
    val (numSchema, _) = JdbcNative.fetch(numRs, maxRows = 10,
      incorrectDecimalsAsString = true)
    assert(numSchema("frac").dataType == StringType)
    assert(!numSchema("frac").metadata.contains("maxLength"))
  }

  test("sanitizeDateTime clamps out-of-range dates/timestamps to the Spark-safe range") {
    val cols = Seq(("d", DATE, 0, 0), ("ts", TIMESTAMP, 0, 0))
    // Oracle-style garbage: year 10000+ and a negative-year value
    val farFuture = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    farFuture.setTime(JdbcNative.MaxSafeTimestampMilli + 86400000L)
    val farPast = new java.sql.Date(JdbcNative.MinSafeMilli - 86400000L)
    val inRange = java.sql.Date.valueOf("2024-06-15")
    val rows = Seq(
      Seq[Any](farPast, farFuture),
      Seq[Any](inRange, java.sql.Timestamp.valueOf("2024-06-15 12:00:00")))
    val (_, out) = JdbcNative.fetch(fakeResultSet(cols, rows), maxRows = 10,
      sanitizeDateTime = true)
    assert(out.head.getDate(0).getTime == JdbcNative.MinSafeMilli, "past date clamps to 0001-01-01")
    assert(out.head.getTimestamp(1).getTime == JdbcNative.MaxSafeTimestampMilli,
      "future timestamp clamps to 9999-12-31")
    assert(out(1).getDate(0) == inRange && out(1).getTimestamp(1).toString.startsWith("2024-06-15"),
      "in-range values pass through untouched")
    // default: raw values survive (the caller asked for no sanitation)
    val (_, raw) = JdbcNative.fetch(fakeResultSet(cols, rows), maxRows = 10)
    assert(raw.head.getDate(0).getTime == JdbcNative.MinSafeMilli - 86400000L)
  }

  test("source end-to-end: windowed dialect SQL in, typed local DataFrame out") {
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    def connection(): java.sql.Connection = {
      val st = proxy(classOf[java.sql.Statement]) {
        case ("executeQuery", a) =>
          val sql = a(0).asInstanceOf[String]
          executed += sql
          if (sql.startsWith("SELECT COUNT"))
            fakeResultSet(Seq(("cnt", BIGINT, 0, 0)),
              Seq(Seq[Any](java.lang.Long.valueOf(2L))))
          else fakeResultSet(cols, rows)
        case _ => null
      }
      proxy(classOf[java.sql.Connection]) {
        case ("createStatement", _) => st
        case _ => null
      }
    }
    val src = new JdbcNativeSource(spark, () => connection(), "dim_customers",
      infoDateColumn = "info_date", dialect = SqlDialect.Postgres)
    val d = LocalDate.parse("2024-06-15")
    assert(src.getRecordCount(d, d) == 2L)
    val df = src.getData(d, d).df
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "amount", "born", "ok"))
    assert(df.count() == 2)
    assert(df.where(df("name") === "alice").head().getLong(0) == 1L)
    // the generated SQL pushed the info-date window to the RDBMS
    assert(executed.exists(s => s.contains("dim_customers") && s.contains("info_date")
      && s.contains("2024-06-15")), executed.mkString("\n"))
  }
}
