package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Template-driven Hive DDL for external-metastore registration —
  * rendered text pinned, then driven end-to-end through the Spark
  * executor (with a Spark-dialect template: the in-memory catalog has
  * no Hive SerDe support, which is exactly what custom templates are
  * for) and through a recording JDBC executor. */
class HiveDdlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType),
    StructField("amount", DecimalType(18, 4)),
    StructField("info_date", DateType)))

  test("default templates render classic parquet EXTERNAL TABLE DDL") {
    val recorded = scala.collection.mutable.ArrayBuffer.empty[String]
    val rec = new HiveDdl.QueryExecutor {
      override def execute(sql: String): Unit = recorded += sql
      override def tableExists(n: String): Boolean = false
    }
    HiveDdl.createTable(rec, HiveDdl.Templates(), "dw.sales", "/data/ms/sales",
      schema, partitionBy = Seq("info_date"))
    assert(recorded.size == 2, recorded)
    val create = recorded.head
    assert(create.startsWith("CREATE EXTERNAL TABLE IF NOT EXISTS dw.sales"), create)
    assert(create.contains("`id` bigint, `v` string, `amount` decimal(18,4)"), create)
    assert(!create.contains("`info_date` date,"),
      "partition column must not appear in the column list")
    assert(create.contains("PARTITIONED BY (`info_date` date)"), create)
    assert(create.contains("LOCATION '/data/ms/sales'"), create)
    assert(recorded(1) == "MSCK REPAIR TABLE dw.sales")
    // non-partitioned: no repair statement, empty @partitionedBy line
    recorded.clear()
    HiveDdl.createTable(rec, HiveDdl.Templates(), "t2", "/p", schema, Nil)
    assert(recorded.size == 1 && !recorded.head.contains("PARTITIONED"), recorded)
  }

  test("add-partition and replace-schema render; values escape; tokens substitute once") {
    val recorded = scala.collection.mutable.ArrayBuffer.empty[String]
    val rec = new HiveDdl.QueryExecutor {
      override def execute(sql: String): Unit = recorded += sql
      override def tableExists(n: String): Boolean = true
    }
    HiveDdl.addPartition(rec, HiveDdl.Templates(), "dw.sales",
      Seq("info_date" -> "2024-06-15"), "/data/ms/sales/info_date=2024-06-15")
    assert(recorded.head ==
      "ALTER TABLE dw.sales ADD IF NOT EXISTS PARTITION (`info_date` = '2024-06-15') " +
        "LOCATION '/data/ms/sales/info_date=2024-06-15'")
    HiveDdl.replaceSchema(rec, HiveDdl.Templates(), "dw.sales", schema, Seq("info_date"))
    assert(recorded(1).startsWith("ALTER TABLE dw.sales REPLACE COLUMNS"), recorded(1))
    // single-pass: a path containing an @token arrives verbatim
    recorded.clear()
    HiveDdl.createTable(rec, HiveDdl.Templates(), "t", "/data/@schema/x", schema, Nil)
    assert(recorded.head.contains("LOCATION '/data/@schema/x'"), recorded.head)
  }

  test("spark executor end-to-end with a site-custom (Spark-dialect) template") {
    val base = java.nio.file.Files.createTempDirectory("hive_ddl_").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$base/tbl")
    // the in-memory catalog rejects Hive SerDe DDL — a site template
    // swaps in Spark's USING syntax, which is the configurability the
    // reference's template keys exist for
    val sparkTemplates = HiveDdl.Templates(
      createTable = "CREATE TABLE IF NOT EXISTS @fullTableName USING parquet LOCATION '@path'")
    val ex = new HiveDdl.SparkQueryExecutor(spark)
    val dataSchema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    HiveDdl.createTable(ex, sparkTemplates, "hive_ddl_t", s"$base/tbl", dataSchema)
    assert(ex.tableExists("hive_ddl_t"))
    assert(spark.sql("SELECT count(*) FROM hive_ddl_t").head().getLong(0) == 2L)
    // idempotent re-create; createOrUpdate drops and recreates
    HiveDdl.createTable(ex, sparkTemplates, "hive_ddl_t", s"$base/tbl", dataSchema)
    HiveDdl.createOrUpdateTable(ex, sparkTemplates, "hive_ddl_t", s"$base/tbl", dataSchema)
    assert(spark.sql("SELECT count(*) FROM hive_ddl_t").head().getLong(0) == 2L)
    HiveDdl.dropTable(ex, sparkTemplates, "hive_ddl_t")
    assert(!ex.tableExists("hive_ddl_t"))
  }

  test("jdbc executor routes DDL through executeUpdate; existence probe is a zero-row select") {
    val statements = scala.collection.mutable.ArrayBuffer.empty[String]
    var exists = false
    val jdbc = new HiveDdl.JdbcQueryExecutor(new graft.rdb.SqlExecutor {
      override def executeUpdate(sql: String, params: Seq[Any] = Nil): Int = {
        statements += sql; 0
      }
      override def query(sql: String, params: Seq[Any] = Nil): Seq[Map[String, String]] = {
        statements += sql
        // a live connection answers the table-independent probe even
        // when the table is missing
        if (!exists && sql.contains("dw.sales")) throw new RuntimeException("Table not found")
        Seq.empty
      }
    })
    assert(!jdbc.tableExists("dw.sales"))
    exists = true
    assert(jdbc.tableExists("dw.sales"))
    assert(statements.count(_ == "SELECT 1 FROM dw.sales WHERE 0 = 1") == 2)
    HiveDdl.createTable(jdbc, HiveDdl.Templates(), "dw.sales", "/p", schema, Seq("info_date"))
    assert(statements.exists(_.startsWith("CREATE EXTERNAL TABLE")))
    assert(statements.exists(_.startsWith("MSCK REPAIR")))
  }

  test("jdbc existence probe discriminates outage from missing table") {
    // a dead HiveServer2 fails EVERY query — reporting that as
    // "table absent" would send the caller into CREATE DDL against an
    // outage; the original failure must surface instead
    val dead = new HiveDdl.JdbcQueryExecutor(new graft.rdb.SqlExecutor {
      override def executeUpdate(sql: String, params: Seq[Any] = Nil): Int =
        throw new RuntimeException("connection refused")
      override def query(sql: String, params: Seq[Any] = Nil): Seq[Map[String, String]] =
        throw new RuntimeException("connection refused")
    })
    val e = intercept[RuntimeException](dead.tableExists("dw.sales"))
    assert(e.getMessage.contains("connection refused"))
  }
}
