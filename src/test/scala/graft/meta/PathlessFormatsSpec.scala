package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

import java.time.LocalDate

/** The path-less metastore formats (reference: pramen/core
  * .../metastore/peristence/MetastorePersistenceNull.scala and
  * MetastorePersistenceTransientEager.scala + TransientTableManager):
  * `null` is a sink-only no-op; `transient_eager` materializes at save
  * time into a session-scoped store and is never written to disk. */
class PathlessFormatsSpec extends SparkSpec {
  import spark.implicits._

  private val d1 = LocalDate.parse("2024-06-01")
  private val d2 = LocalDate.parse("2024-06-02")

  test("null format: save is a zero-stat no-op, read is empty, dates are empty") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("sink", "", format = DataFormat.NullFormat))
    val stats = ms.saveTable("sink", d1, Seq((1L, "a")).toDF("id", "v"))
    assert(stats.recordCount == 0L)
    // the empty read still carries the info-date column, so callers'
    // range filters resolve instead of failing analysis
    assert(ms.getTable("sink", Some(d1), Some(d1)).count() == 0)
    assert(ms.listAvailableDates("sink").isEmpty)
  }

  test("transient_eager: materialized at save, readable per date, no files on disk") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("tmp", "", format = DataFormat.TransientEager()))
    val s1 = ms.saveTable("tmp", d1, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(s1.recordCount == 2L)
    ms.saveTable("tmp", d2, Seq((3L, "c")).toDF("id", "v"))
    assert(ms.getTable("tmp", Some(d1), Some(d1)).count() == 2)
    assert(ms.getTable("tmp").count() == 3)
    assert(ms.listAvailableDates("tmp") == Seq(d1, d2))
    // overwrite replaces the day; append unions into it
    ms.saveTable("tmp", d1, Seq((9L, "z")).toDF("id", "v"))
    assert(ms.getTable("tmp", Some(d1), Some(d1)).select("id").as[Long].collect().toSet == Set(9L))
    ms.saveTable("tmp", d1, Seq((10L, "y")).toDF("id", "v"), mode = SaveMode.Append)
    assert(ms.getTable("tmp", Some(d1), Some(d1)).select("id").as[Long].collect().toSet == Set(9L, 10L))
  }

  test("transient_eager: reading before any save fails with a clear message") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("tmp2", "", format = DataFormat.TransientEager()))
    val e = intercept[NoSuchElementException](ms.getTable("tmp2").count())
    assert(e.getMessage.contains("transient"), e.getMessage)
  }

  test("config surface: both formats parse with no path; compaction refuses them") {
    val parsed = graft.pipeline.PipelineConfig.parse(
      """table.s.format = null
        |table.e.format = transient_eager
        |table.e.cache.policy = persist
        |job.1.output = s
        |job.1.transformer = identity
        |""".stripMargin)
    val byName = parsed.tables.map(t => t.name -> t.format).toMap
    assert(byName("s") == DataFormat.NullFormat)
    assert(byName("e") == DataFormat.TransientEager(CachePolicy.Persist))
    val ms = new Metastore(spark)
    ms.register(MetaTable("s2", "", format = DataFormat.NullFormat))
    val e = intercept[IllegalArgumentException](ms.compactPartition("s2", d1))
    assert(e.getMessage.contains("storage-backed"), e.getMessage)
  }
}
