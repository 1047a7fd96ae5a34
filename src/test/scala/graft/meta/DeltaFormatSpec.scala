package graft.meta

import graft.SparkSpec

import java.time.LocalDate

/** Delta Lake metastore format plumbing (reference: pramen/core
  * .../core/metastore/peristence/MetastorePersistenceDelta.scala).
  * The zero-egress build has no delta-spark jar, so the roundtrip is
  * exercised only when the datasource is present; the dispatch and the
  * clear-failure contract are always asserted. */
class DeltaFormatSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = LocalDate.parse("2024-06-01")

  test("delta format dispatches through the standard writer path") {
    assert(DataFormat.Delta.name == "delta")
    // config surface maps it
    val parsed = graft.pipeline.PipelineConfig.parse(
      s"""table.t.path = ${tmpDir("delta_")}/t
         |table.t.format = delta
         |job.1.output = t
         |job.1.transformer = identity
         |""".stripMargin)
    assert(parsed.tables.head.format == DataFormat.Delta)
  }

  test("compactPartition refuses Delta tables (file swap would corrupt the _delta_log)") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("dlc", tmpDir("dlc_") + "/dlc", format = DataFormat.Delta))
    val e = intercept[IllegalArgumentException](ms.compactPartition("dlc", d1))
    assert(e.getMessage.contains("Delta"), s"unhelpful error: ${e.getMessage}")
  }

  test("delta tables roundtrip when the datasource is present, fail clearly when absent") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("dl", tmpDir("dl_") + "/dl", format = DataFormat.Delta))
    if (Metastore.deltaAvailable) {
      ms.saveTable("dl", d1, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      assert(ms.getTable("dl", Some(d1), Some(d1)).count() == 2)
      assert(ms.listAvailableDates("dl") == Seq(d1))
    } else {
      val e = intercept[IllegalStateException](
        ms.saveTable("dl", d1, Seq((1L, "a")).toDF("id", "v")))
      assert(e.getMessage.contains("delta-spark"), s"unhelpful error: ${e.getMessage}")
      val r = intercept[IllegalStateException](ms.getTable("dl"))
      assert(r.getMessage.contains("delta-spark"))
    }
  }
}
