package graft.sources

import graft.SparkSpec
import graft.meta.{MetaTable, Metastore}
import graft.offset.{OffsetInfo, OffsetManager}
import graft.sinks.{ColumnNameTransform, LocalCsvSink, SinkJob, SparkSink}
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** S1/S3/S4/S5: batch sources, raw-file source, sinks, ingestion jobs. */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  private val d = LocalDate.parse("2024-06-01")

  test("S1 SparkSource windows on the info-date column per type") {
    val dir = tmpDir("src_")
    Seq(("2024-06-01", 1), ("2024-06-02", 2), ("2024-06-03", 3))
      .toDF("day", "v")
      .withColumn("day", to_date(col("day")))
      .write.mode("overwrite").parquet(dir)
    val src = new SparkSource(spark, dir, infoDateColumn = Some("day"))
    assert(src.hasInfoDateColumn)
    assert(src.getRecordCount(d, d.plusDays(1)) == 2)
    val res = src.getData(d, d, Seq("v"))
    assert(res.df.columns.toSeq == Seq("v"))
    assert(res.df.as[Int].collect().toSeq == Seq(1))
  }

  test("S1 SparkSource csv with options + incremental reads") {
    val dir = tmpDir("srccsv_")
    (1L to 10L).map(i => (i, s"n$i")).toDF("seq", "name")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val src = new SparkSource(spark, dir, format = "csv",
      options = Map("header" -> "true", "inferSchema" -> "true"),
      offsetInfo = Some(OffsetInfo("seq", "integral")))
    assert(src.getData(d, d).df.count() == 10) // no info-date column -> whole table
    import graft.offset.OffsetValue
    assert(src.getDataIncremental(Some(OffsetValue.IntegralValue(7))).df.count() == 3)
    assert(src.getDataIncremental(None).df.count() == 10)
  }

  test("S3 RawFileSource reads whole files as binary rows") {
    val dir = tmpDir("raw_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.bin"), Array[Byte](4, 5))
    val src = new RawFileSource(spark, dir)
    val df = src.getData(d, d).df
    assert(df.count() == 2)
    assert(df.columns.contains("content") && df.columns.contains("path"))
    val sizes = df.select("length").as[Long].collect().sorted.toSeq
    assert(sizes == Seq(2L, 3L))
  }

  test("S4 SparkSink writes the requested format/partitioning; S5 csv sink transforms names") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("src", tmpDir("snk_") + "/src"))
    ms.saveTable("src", d, Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "Name Col", "v"))

    val outBase = tmpDir("snkout_")
    val sink = new SparkSink(outBase, format = "json")
    val res = new SinkJob(ms, sink).run("src", d, columns = Seq("id", "v"))
    assert(res.recordsSent == 2)
    val written = spark.read.json(s"$outBase/src/info_date=$d")
    assert(written.columns.toSet == Set("id", "v"))

    val csvBase = tmpDir("csvout_")
    val csvSink = new LocalCsvSink(csvBase, separator = ";",
      nameTransform = ColumnNameTransform.Sanitize)
    new SinkJob(ms, csvSink).run("src", d)
    val lines = spark.read.text(s"$csvBase/src/$d").as[String].collect()
    assert(lines.exists(_.startsWith("id;Name_Col;v")), s"header wrong: ${lines.toSeq}")
  }

  test("S4b sinks execute the input plan exactly once (observed count, no recount)") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("once", tmpDir("once_") + "/once"))
    ms.saveTable("once", d, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))

    def jobsDuring(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try { body; Thread.sleep(500); jobs.get() }
      finally spark.sparkContext.removeSparkListener(listener)
    }

    // build the input df up front: the parquet schema-inference job at
    // read time is not part of what the sink executes
    val input = ms.getTable("once", Some(d), Some(d))

    val n1 = jobsDuring {
      val r = new SparkSink(tmpDir("so_"), format = "parquet").send(input, "once", d)
      assert(r.recordsSent == 3)
    }
    assert(n1 == 1, s"SparkSink should run one job (the write), saw $n1")

    val n2 = jobsDuring {
      val r = new LocalCsvSink(tmpDir("sc_")).send(input, "once", d)
      assert(r.recordsSent == 3)
    }
    assert(n2 == 1, s"LocalCsvSink should run one job (the write), saw $n2")
  }

  test("IngestionJob: batch ingest and offset-advancing incremental ingest") {
    val srcDir = tmpDir("ing_")
    (1L to 20L).map(i => (i, i * 10)).toDF("seq", "v").write.mode("overwrite").parquet(srcDir)
    val src = new SparkSource(spark, srcDir, offsetInfo = Some(OffsetInfo("seq", "integral")))
    val ms = new Metastore(spark)
    ms.register(MetaTable("landed", tmpDir("ingout_") + "/landed"))
    val offsets = new OffsetManager()
    val job = new IngestionJob(src, ms, offsets)

    val s1 = job.ingestIncremental("landed", d)
    assert(s1.recordCount == 20)
    import graft.offset.OffsetValue
    assert(offsets.getLatestOffset("landed").contains(OffsetValue.IntegralValue(20)))

    // new rows arrive; only the tail is ingested on the next run
    (1L to 25L).map(i => (i, i * 10)).toDF("seq", "v").write.mode("overwrite").parquet(srcDir)
    val s2 = job.ingestIncremental("landed", d.plusDays(1))
    assert(s2.recordCount == 5)
    assert(offsets.getLatestOffset("landed").contains(OffsetValue.IntegralValue(25)))
  }
}
