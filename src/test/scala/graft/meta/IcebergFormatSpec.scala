package graft.meta

import graft.SparkSpec

import java.time.LocalDate

/** Iceberg metastore format (reference: pramen/core
  * .../core/metastore/peristence/MetastorePersistenceIceberg.scala,
  * DataFormatParser.scala:63). The zero-egress build has no Iceberg
  * runtime jar, so the catalog roundtrip is exercised only when the
  * runtime is present; the dispatch, the lowercase-name rule, the
  * partition-transform DDL text, and the clear-failure contract are
  * always asserted (the S8 Delta discipline). */
class IcebergFormatSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = LocalDate.parse("2024-06-01")

  test("catalog table names are lowercased (Iceberg's naming rule)") {
    assert(DataFormat.Iceberg("Db.MyTable").fullName == "db.mytable")
    assert(DataFormat.Iceberg("catalog.DB.T2").fullName == "catalog.db.t2")
  }

  test("config surface: 'table' mandatory, 'path' optional location, properties collected") {
    val parsed = graft.pipeline.PipelineConfig.parse(
      """table.ice.format = iceberg
        |table.ice.table = Local.DB.Events
        |table.ice.path = /warehouse/events
        |table.ice.property.write.target-file-size-bytes = 134217728
        |job.1.output = ice
        |job.1.transformer = identity
        |""".stripMargin)
    val fmt = parsed.tables.head.format.asInstanceOf[DataFormat.Iceberg]
    assert(fmt.catalogTable == "local.db.events") // lowercased at parse, reference rule
    assert(fmt.location.contains("/warehouse/events"))
    assert(fmt.properties == Map("write.target-file-size-bytes" -> "134217728"))
    // 'table' is mandatory for iceberg (reference DataFormatParser:59)
    val e = intercept[IllegalArgumentException](graft.pipeline.PipelineConfig.parse(
      """table.ice.format = iceberg
        |job.1.output = ice
        |job.1.transformer = identity
        |""".stripMargin))
    assert(e.getMessage.contains("table.ice.table"), e.getMessage)
  }

  test("partition scheme maps to hidden-transform DDL; ByYearMonth is rejected") {
    assert(IcebergPersistence.partitionFieldDdl("db.t", "info_date", PartitionScheme.ByMonth()) ==
      Seq("ALTER TABLE db.t ADD PARTITION FIELD year(info_date)",
          "ALTER TABLE db.t ADD PARTITION FIELD month(info_date)"))
    assert(IcebergPersistence.partitionFieldDdl("db.t", "info_date", PartitionScheme.ByYear()) ==
      Seq("ALTER TABLE db.t ADD PARTITION FIELD year(info_date)"))
    // identity / unpartitioned / snapshot schemes need no DDL
    assert(IcebergPersistence.partitionFieldDdl("db.t", "info_date", PartitionScheme.ByDay).isEmpty)
    assert(IcebergPersistence.partitionFieldDdl("db.t", "info_date", PartitionScheme.NotPartitioned).isEmpty)
    assert(IcebergPersistence.partitionFieldDdl("db.t", "info_date", PartitionScheme.Overwrite).isEmpty)
    intercept[UnsupportedOperationException](
      IcebergPersistence.partitionFieldDdl("db.t", "info_date", PartitionScheme.ByYearMonth()))
  }

  test("compactPartition refuses Iceberg tables (file swap would corrupt the snapshot log)") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("icc", "", format = DataFormat.Iceberg("db.icc")))
    val e = intercept[IllegalArgumentException](ms.compactPartition("icc", d1))
    assert(e.getMessage.contains("Iceberg"), s"unhelpful error: ${e.getMessage}")
  }

  test("iceberg tables roundtrip when the runtime is present, fail clearly when absent") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("ice", "", format = DataFormat.Iceberg("db.ice")))
    if (IcebergPersistence.available) {
      ms.saveTable("ice", d1, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      assert(ms.getTable("ice", Some(d1), Some(d1)).count() == 2)
      assert(ms.listAvailableDates("ice") == Seq(d1))
    } else {
      val e = intercept[IllegalStateException](
        ms.saveTable("ice", d1, Seq((1L, "a")).toDF("id", "v")))
      assert(e.getMessage.contains("iceberg-spark-runtime"), s"unhelpful error: ${e.getMessage}")
      val r = intercept[IllegalStateException](ms.getTable("ice"))
      assert(r.getMessage.contains("iceberg-spark-runtime"))
      val l = intercept[IllegalStateException](ms.listAvailableDates("ice"))
      assert(l.getMessage.contains("iceberg-spark-runtime"))
    }
  }
}
