package graft.sources

import graft.SparkSpec
import graft.meta.{MetaTable, Metastore}
import graft.offset.{OffsetInfo, OffsetManager}
import graft.sinks.{ColumnNameTransform, LocalCsvSink, SinkJob, SparkSink}
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** Shared across executions of the growing-source plan (local mode: one JVM). */
object GrowingSourceState {
  val executions = new java.util.concurrent.atomic.AtomicInteger(0)
}

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

  test("CatalogSource reads tables and SQL with the date window pushed in") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("cat_src", tmpDir("catsrc_") + "/t", catalogSync = true))
    ms.saveTable("cat_src", d, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    ms.saveTable("cat_src", d.plusDays(1), Seq((3L, "c")).toDF("id", "v"))

    // table mode: the window prunes to one day
    val tsrc = new CatalogSource(spark, "cat_src", infoDateColumn = Some("info_date"))
    assert(tsrc.getRecordCount(d, d) == 2)
    assert(tsrc.getData(d.plusDays(1), d.plusDays(1), Seq("id")).df
      .as[Long].collect().toSeq == Seq(3L))

    // sql mode with the window substituted INSIDE the statement
    val ssrc = new CatalogSource(spark,
      "SELECT id, v FROM cat_src WHERE info_date BETWEEN @infoDateFrom AND @infoDateTo",
      isSql = true)
    assert(ssrc.getRecordCount(d, d.plusDays(1)) == 3)
    assert(ssrc.getRecordCount(d, d) == 2)

    // incremental over a catalog table
    val isrc = new CatalogSource(spark, "cat_src",
      offsetInfo = Some(OffsetInfo("id", "integral")))
    assert(isrc.getDataIncremental(Some(graft.offset.OffsetValue.IntegralValue(1L))).df.count() == 2)
  }

  test("LocalSparkSource stages driver-local files to a Hadoop path and cleans up") {
    val localDir = tmpDir("lsrc_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$localDir/a.csv"),
      "id,v\n1,x\n2,y\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$localDir/b.csv"),
      "id,v\n3,z\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$localDir/skip.txt"),
      "not,me\n".getBytes)
    val tempHadoop = tmpDir("lstage_")
    val src = new LocalSparkSource(spark, localDir, tempHadoop,
      format = "csv", options = Map("header" -> "true", "inferSchema" -> "true"),
      fileNamePattern = "*.csv")
    assert(src.getRecordCount(d, d) == 3) // only the two csv files staged
    val df = src.getData(d, d).df
    assert(df.columns.toSet == Set("id", "v"))
    val stagedDir = src.stage()
    val staged = java.nio.file.Files.list(java.nio.file.Paths.get(
      stagedDir.stripPrefix("file:"))).iterator()
    val visible = Iterator.continually(staged).takeWhile(_.hasNext).map(_.next())
      .filterNot(_.getFileName.toString.startsWith(".")).toSeq // Hadoop .crc files
    assert(visible.map(_.getFileName.toString).sorted == Seq("a.csv", "b.csv"))
    src.close()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(stagedDir.stripPrefix("file:"))),
      "close() must remove the staged copy")
  }

  test("LocalSparkSource recursive staging keeps same-basename files apart") {
    val localDir = tmpDir("lrec_")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$localDir/a"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$localDir/b"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$localDir/a/part.csv"),
      "id\n1\n2\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$localDir/b/part.csv"),
      "id\n3\n".getBytes)
    val src = new LocalSparkSource(spark, localDir, tmpDir("lrecst_"),
      format = "csv", options = Map("header" -> "true", "inferSchema" -> "true"),
      fileNamePattern = "*.csv", recursive = true)
    assert(src.getRecordCount(d, d) == 3,
      "a/part.csv and b/part.csv must both survive staging")
    src.close()
  }

  test("S2 JdbcSource partitioned reads carry all four range options (or none)") {
    val src = new JdbcSource(spark, "jdbc:postgresql://h/db", "sales", "info_date",
      numPartitions = 8, partitionColumn = Some("id"),
      connectionOptions = Map("user" -> "u"))
    val sql = src.dataQuery(d, d)
    // bounds present -> the complete quadruple Spark requires
    val opts = src.jdbcOptions(sql, Some((5L, 5000L)))
    assert(opts("partitionColumn") == "id" && opts("numPartitions") == "8" &&
      opts("lowerBound") == "5" && opts("upperBound") == "5000",
      s"partitioned read must set all four options together: $opts")
    assert(opts("user") == "u" && opts("url").startsWith("jdbc:postgresql"))
    // no bounds (empty window probe) -> a plain unpartitioned read, not
    // the three-of-four combination Spark rejects
    val plain = src.jdbcOptions(sql, None)
    assert(!plain.contains("partitionColumn") && !plain.contains("numPartitions"),
      s"boundless read must not carry partitioning options: $plain")
    // the probe the read issues first
    assert(src.boundsQuery(d, d) ==
      "SELECT MIN(id) AS lo, MAX(id) AS hi FROM sales WHERE info_date = DATE '2024-06-01'")
    // unpartitioned source: never any partition options
    val single = new JdbcSource(spark, "jdbc:h2:mem", "t", "info_date")
    assert(!single.jdbcOptions(single.dataQuery(d, d), Some((1L, 2L))).contains("partitionColumn"))
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

  test("incremental ingest APPENDS: a second batch on the same infoDate keeps the first") {
    val srcDir = tmpDir("incapp_")
    (1L to 20L).map(i => (i, i * 10)).toDF("seq", "v").write.mode("overwrite").parquet(srcDir)
    val src = new SparkSource(spark, srcDir, offsetInfo = Some(OffsetInfo("seq", "integral")))
    val ms = new Metastore(spark)
    ms.register(MetaTable("same_day", tmpDir("incappout_") + "/t"))
    val job = new IngestionJob(src, ms, new OffsetManager())

    assert(job.ingestIncremental("same_day", d).recordCount == 20)
    // 5 more rows land; the SAME infoDate runs again (intra-day batches)
    (1L to 25L).map(i => (i, i * 10)).toDF("seq", "v").write.mode("overwrite").parquet(srcDir)
    assert(job.ingestIncremental("same_day", d).recordCount == 5)
    assert(ms.getTable("same_day", Some(d), Some(d)).count() == 25,
      "second intra-day batch must not dynamic-overwrite the first")
    // nothing new -> no save, no commit, and crucially no empty overwrite
    assert(job.ingestIncremental("same_day", d).recordCount == 0)
    assert(ms.getTable("same_day", Some(d), Some(d)).count() == 25)
  }

  test("incremental ingest pins the offset BEFORE saving: mid-job source growth is never skipped") {
    // a source whose data GROWS between plan executions: rows 1..20 on
    // the first execution, 1..25 from the second on — models rows
    // appended to the source while the ingest job runs
    import org.apache.spark.sql.{DataFrame, Row}
    import org.apache.spark.sql.types._
    val src = new GraftSource {
      override def hasInfoDateColumn = false
      override def getRecordCount(from: LocalDate, to: LocalDate): Long = 0L
      override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]) =
        throw new UnsupportedOperationException
      override def getOffsetInfo = Some(OffsetInfo("seq", "integral"))
      override def getDataIncremental(offsetFrom: Option[graft.offset.OffsetValue],
                                      columns: Seq[String]): SourceResult = {
        val schema = StructType(Seq(StructField("seq", LongType)))
        val rdd = spark.sparkContext.parallelize(Seq(1), 1).mapPartitions { _ =>
          val exec = GrowingSourceState.executions.incrementAndGet()
          val upTo = if (exec >= 2) 25L else 20L
          (1L to upTo).iterator.map(Row(_))
        }
        val df = spark.createDataFrame(rdd, schema)
        val filtered = offsetFrom match {
          case Some(graft.offset.OffsetValue.IntegralValue(n)) => df.where(col("seq") > n)
          case _ => df
        }
        SourceResult(filtered)
      }
    }
    GrowingSourceState.executions.set(0)
    val ms = new Metastore(spark)
    ms.register(MetaTable("race", tmpDir("incrace_") + "/t"))
    val om = new OffsetManager()
    val job = new IngestionJob(src, ms, om)

    // run 1: the pin (execution 1) sees max=20; the save (execution 2)
    // sees 25 rows but must be bounded <= 20
    val s1 = job.ingestIncremental("race", d)
    assert(s1.recordCount == 20, s"first run must save exactly the pinned window, got ${s1.recordCount}")
    import graft.offset.OffsetValue
    assert(om.getLatestOffset("race").contains(OffsetValue.IntegralValue(20L)),
      s"committed offset must be the pinned max of what was SAVED, got ${om.getLatestOffset("race")}")

    // run 2: rows 21..25 (the mid-job growth) deliver now — nothing lost
    val s2 = job.ingestIncremental("race", d.plusDays(1))
    assert(s2.recordCount == 5, s"mid-job growth must re-deliver on the next run, got ${s2.recordCount}")
    assert(om.getLatestOffset("race").contains(OffsetValue.IntegralValue(25L)))
    assert(ms.getTable("race").count() == 25)
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
