package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** Catalog registration of metastore tables (reference: pramen/core
  * .../core/metastore/MetastoreImpl.scala Hive paths): saved tables are
  * readable as `spark.table(...)` with pruned partitions, and new info
  * dates appear after each save (partition recovery). */
class CatalogSyncSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = LocalDate.parse("2024-06-01")
  private val d2 = LocalDate.parse("2024-06-02")
  private val d3 = LocalDate.parse("2024-06-03")

  private def data(tag: String, n: Int) =
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")

  test("saved table is readable via spark.table with partition pruning; new saves appear") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("cat_t", tmpDir("cat_") + "/t", catalogSync = true))
    ms.saveTable("cat_t", d1, data("a", 3))
    ms.saveTable("cat_t", d2, data("b", 4))

    val viaCatalog = spark.table("cat_t")
    assert(viaCatalog.count() == 7)
    assert(viaCatalog.columns.contains("info_date"))

    // a date filter prunes to one partition through the catalog table
    val pruned = viaCatalog.where(col("info_date") === java.sql.Date.valueOf(d1))
    assert(pruned.count() == 3)
    val parts = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount
    }
    assert(parts.forall(_ == 1), s"catalog read must prune partitions, got $parts")

    // a later save is visible without re-registering (partition recovery)
    ms.saveTable("cat_t", d3, data("c", 5))
    assert(spark.table("cat_t").count() == 12)
    assert(spark.sql("SELECT count(*) FROM cat_t WHERE info_date = DATE'2024-06-03'")
      .head().getLong(0) == 5)
  }

  test("CSV option values survive SQL-literal escaping (quote char = ')") {
    // the registered DDL carries the CSV options as SQL string
    // literals; a value that IS a single quote exercises the escaping
    // (doubling, the ANSI convention, concatenates adjacent literals
    // in Spark SQL and silently drops the quote)
    val ms = new Metastore(spark)
    ms.register(MetaTable("cat_csv", tmpDir("catq_") + "/t",
      format = DataFormat.Csv(Map("header" -> "true", "quote" -> "'")),
      catalogSync = true))
    // a value containing the separator needs the quote char to roundtrip
    ms.saveTable("cat_csv", d1, Seq((1L, "a,b")).toDF("id", "v"))
    val rows = spark.table("cat_csv").select("v").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("a,b"),
      s"catalog read must parse with quote=' intact, got ${rows.toSeq}")
  }

  test("AddPartition repair registers exactly the saved date, O(1) per save") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("cat_add", tmpDir("cata_") + "/t",
      catalogSync = true, catalogRepair = CatalogRepair.AddPartition))
    ms.saveTable("cat_add", d1, data("a", 3))
    ms.saveTable("cat_add", d2, data("b", 4))
    // both saves visible through the catalog without any MSCK
    assert(spark.table("cat_add").count() == 7)
    val parts = spark.sql("SHOW PARTITIONS cat_add").collect().map(_.getString(0)).sorted
    assert(parts.toSeq == Seq("info_date=2024-06-01", "info_date=2024-06-02"))
    // re-saving an existing date is idempotent (ADD IF NOT EXISTS)
    ms.saveTable("cat_add", d1, data("a2", 2))
    assert(spark.sql("SELECT count(*) FROM cat_add WHERE info_date = DATE'2024-06-01'")
      .head().getLong(0) == 2)
  }

  test("per-table read/write options flow into every write and read") {
    val ms = new Metastore(spark)
    // CSV gives observable knobs on both sides: write without header,
    // read back with a custom delimiter declared per table
    ms.register(MetaTable("opt_t", tmpDir("opts_") + "/t",
      format = DataFormat.Csv(Map("header" -> "true")),
      readOptions = Map("header" -> "false", "inferSchema" -> "false"),
      writeOptions = Map("header" -> "false")))
    ms.saveTable("opt_t", d1, Seq((1L, "x")).toDF("id", "v"))
    // writeOptions won over the format default: no header row written,
    // and the header-less read sees exactly one data row with default names
    val back = ms.getTable("opt_t", Some(d1), Some(d1))
    assert(back.count() == 1)
    assert(back.columns.exists(_.startsWith("_c")),
      s"read must use per-table options (no header -> _c columns), got ${back.columns.toSeq}")
  }

  test("catalogName overrides the identifier; no sync when disabled") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("internal_name", tmpDir("cat2_") + "/t",
      catalogSync = true, catalogName = Some("analytics_events")))
    ms.register(MetaTable("quiet", tmpDir("cat3_") + "/t"))
    ms.saveTable("internal_name", d1, data("a", 2))
    ms.saveTable("quiet", d1, data("b", 2))
    assert(spark.table("analytics_events").count() == 2)
    assert(!spark.catalog.tableExists("internal_name"))
    assert(!spark.catalog.tableExists("quiet"))
  }
}
