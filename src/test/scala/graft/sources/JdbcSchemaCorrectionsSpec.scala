package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** S17: JDBC read-time schema corrections — customSchema generation
  * for problematic decimals (driven from both plain StructTypes and a
  * NUMBER-without-scale JDBC metadata fake) and timestamp-to-date
  * conversion. */
class JdbcSchemaCorrectionsSpec extends SparkSpec {
  import spark.implicits._

  test("corrected decimals: int/long/ceiling rules match the reference semantics") {
    val schema = StructType(Seq(
      StructField("small_id", DecimalType(9, 0)),    // -> integer
      StructField("big_id", DecimalType(18, 0)),     // -> long
      StructField("huge", DecimalType(38, 20)),      // -> decimal(38, 18) ceiling
      StructField("money", DecimalType(18, 4)),      // fine as-is
      StructField("name", StringType)))              // not a decimal
    val got = JdbcSchemaCorrections.correctedDecimalsSchema(schema)
    assert(got.contains("`small_id` integer, `big_id` long, `huge` decimal(38, 18)"), got)
    // nothing to correct -> None (the read must not pay a second load)
    val clean = StructType(Seq(StructField("money", DecimalType(18, 4))))
    assert(JdbcSchemaCorrections.correctedDecimalsSchema(clean).isEmpty)
  }

  test("fixPrecision widens integral-digit precision by the scale, capped at 38") {
    val schema = StructType(Seq(
      StructField("frac", DecimalType(10, 4)),   // engine meant 10 integral digits -> decimal(14, 4)
      StructField("near_cap", DecimalType(36, 6)), // 36+6 caps at 38 -> decimal(38, 6)
      StructField("wide", DecimalType(38, 6))))  // cap does not widen -> untouched
    val got = JdbcSchemaCorrections.correctedDecimalsSchema(schema, fixPrecision = true)
    assert(got.contains("`frac` decimal(14, 4), `near_cap` decimal(38, 6)"), got)
    // without the flag, scaled decimals are trusted
    assert(JdbcSchemaCorrections.correctedDecimalsSchema(schema).isEmpty)
  }

  test("column names with backticks escape; NUMBER-without-scale metadata fake end-to-end") {
    val weird = StructType(Seq(StructField("odd`name", DecimalType(5, 0))))
    assert(JdbcSchemaCorrections.correctedDecimalsSchema(weird)
      .contains("`odd``name` integer"))
    // the Oracle shape: NUMBER(10) arrives as NUMERIC precision 10
    // scale 0, NUMBER (no precision at all) as precision 0 — typed via
    // the same JDBC-metadata mapping the native reader uses
    val oracleish = StructType(Seq(
      StructField("n10", JdbcNative.sparkType(java.sql.Types.NUMERIC, 10, 0)),
      StructField("n5", JdbcNative.sparkType(java.sql.Types.NUMERIC, 5, 0)),
      StructField("bare", JdbcNative.sparkType(java.sql.Types.NUMERIC, 0, 0))))
    assert(oracleish("n10").dataType == DecimalType(10, 0))
    assert(oracleish("bare").dataType == DecimalType(38, 18), "bare NUMBER maps to the ceiling")
    val got = JdbcSchemaCorrections.correctedDecimalsSchema(oracleish)
    // n10 -> long, n5 -> integer; the (38,18) ceiling is already the
    // widest Spark can hold and stays untouched
    assert(got.contains("`n10` long, `n5` integer"), got)
  }

  test("column descriptions: REMARKS become comment metadata, existing metadata survives") {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    def proxy[T](cls: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
            h(m.getName, if (args == null) Array.empty else args)
        }).asInstanceOf[T]
    val cols = Seq(("ID", "surrogate key"), ("NAME", null), ("AMOUNT", "gross, EUR"))
    var cursor = -1
    val rs = proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) => cursor += 1; java.lang.Boolean.valueOf(cursor < cols.size)
      case ("getString", a) if a(0) == "COLUMN_NAME" => cols(cursor)._1
      case ("getString", a) if a(0) == "REMARKS" => cols(cursor)._2
      case _ => null
    }
    val asked = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val meta = proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("getColumns", a) =>
        asked += ((String.valueOf(a(0)), String.valueOf(a(1)), String.valueOf(a(2)))); rs
      case _ => null
    }
    val conn = proxy(classOf[java.sql.Connection]) {
      case ("getMetaData", _) => meta
      case _ => null
    }
    val remarks = JdbcSchemaCorrections.columnRemarks(conn, "dw.sales")
    assert(asked.toSeq == Seq(("null", "dw", "sales")), "dotted names split into schema.table")
    assert(remarks == Map("id" -> "surrogate key", "amount" -> "gross, EUR"),
      "null remarks dropped, names lowered")
    val prior = new MetadataBuilder().putString("originalName", "ID#").build()
    val schema = StructType(Seq(
      StructField("id", LongType, metadata = prior),
      StructField("name", StringType),
      StructField("amount", DecimalType(18, 4))))
    val described = JdbcSchemaCorrections.withColumnDescriptions(schema, remarks)
    assert(described("id").metadata.getString("comment") == "surrogate key")
    assert(described("id").metadata.getString("originalName") == "ID#", "prior metadata survives")
    assert(!described("name").metadata.contains("comment"))
    assert(described("amount").metadata.getString("comment") == "gross, EUR")
    // a dead metadata call is never fatal
    val dead = proxy(classOf[java.sql.Connection]) {
      case ("getMetaData", _) => throw new RuntimeException("boom")
      case _ => null
    }
    assert(JdbcSchemaCorrections.columnRemarks(dead, "t").isEmpty)
  }

  test("timestamps convert to dates in place; frames without timestamps pass through") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-06-15 13:45:00"), "x"))
      .toDF("id", "loaded_at", "v")
    val out = JdbcSchemaCorrections.convertTimestampsToDates(df)
    assert(out.schema.fieldNames.toSeq == Seq("id", "loaded_at", "v"), "order preserved")
    assert(out.schema("loaded_at").dataType == DateType)
    assert(out.head().getDate(1).toString == "2024-06-15")
    val plain = Seq((1L, "x")).toDF("id", "v")
    assert(JdbcSchemaCorrections.convertTimestampsToDates(plain) eq plain,
      "no timestamps -> same frame, no projection")
  }
}
