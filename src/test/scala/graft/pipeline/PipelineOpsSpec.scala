package graft.pipeline

import graft.SparkSpec

import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** Config-driven operation types beyond transformations: ingestion
  * (source → metastore), sink (metastore → sink) and transfer
  * (source → sink) — reference: pramen/core
  * .../core/pipeline/OperationType.scala, SinkJob.scala,
  * TransferJob.scala. */
class PipelineOpsSpec extends SparkSpec {

  private val d = LocalDate.parse("2024-06-15")

  private def writeCsv(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/data.csv"),
      ("id,amount,txn_date\n" +
        "1,10.5,2024-06-15\n2,20.0,2024-06-15\n3,7.25,2024-06-15\n" +
        "4,99.0,2024-06-16\n").getBytes("UTF-8"))
  }

  test("ingestion -> transformation -> sink pipeline runs from one config") {
    val base = tmpDir("ops_")
    writeCsv(s"$base/landing")
    val conf =
      s"""pipeline.name = ops
         |table.sales.path = $base/ms/sales
         |table.sales_clean.path = $base/ms/sales_clean
         |source.landing.type = spark
         |source.landing.path = $base/landing
         |source.landing.format = csv
         |source.landing.option.header = true
         |source.landing.option.inferSchema = true
         |source.landing.info.date.column = txn_date
         |source.landing.info.date.type = string
         |sink.exports.type = localcsv
         |sink.exports.path = $base/exports
         |job.1.type = ingestion
         |job.1.source = landing
         |job.1.output = sales
         |job.2.output = sales_clean
         |job.2.transformer = identity
         |job.2.inputs = sales
         |job.2.option.input.table = sales
         |job.2.option.filter = amount > 8
         |job.3.type = sink
         |job.3.input = sales_clean
         |job.3.sink = exports
         |""".stripMargin
    val parsed = PipelineConfig.parse(conf)
    assert(parsed.jobs.map(_.outputTable) == Seq("sales", "sales_clean", "sales_clean->exports"))

    val bk = new Bookkeeper()
    val results = PipelineConfig.runParams(spark, parsed, RunParams.Normal(d), bookkeeper = bk)
    assert(results.forall(_.isInstanceOf[TaskResult.Succeeded]), s"results: $results")

    // ingestion landed only the info date's window (3 of 4 csv rows)
    val ms = new graft.meta.Metastore(spark)
    parsed.tables.foreach(ms.register)
    assert(ms.getTable("sales", Some(d), Some(d)).count() == 3)
    // the filter transformation dropped amount <= 8
    assert(ms.getTable("sales_clean", Some(d), Some(d)).count() == 2)
    // the sink exported exactly the clean rows as CSV
    val exported = spark.read.option("header", "true")
      .csv(s"$base/exports/sales_clean/$d")
    assert(exported.count() == 2)
    // sink bookkeeping under the virtual table->sink name with the sent count
    val rec = bk.get("sales_clean->exports", d)
    assert(rec.exists(r => r.status == "succeeded" && r.recordCount == 2), s"got $rec")
  }

  test("transfer moves source data to a sink without touching the metastore") {
    val base = tmpDir("opst_")
    writeCsv(s"$base/landing")
    val conf =
      s"""source.landing.path = $base/landing
         |source.landing.format = csv
         |source.landing.option.header = true
         |source.landing.info.date.column = txn_date
         |source.landing.info.date.type = string
         |sink.out.type = spark
         |sink.out.path = $base/sunk
         |sink.out.format = parquet
         |job.1.type = transfer
         |job.1.source = landing
         |job.1.sink = out
         |""".stripMargin
    val parsed = PipelineConfig.parse(conf)
    assert(parsed.tables.isEmpty && parsed.jobs.head.outputTable == "landing->out")
    val results = PipelineConfig.runParams(spark, parsed, RunParams.Normal(d))
    assert(results.forall(_.isInstanceOf[TaskResult.Succeeded]), s"results: $results")
    val sunk = spark.read.parquet(s"$base/sunk/landing/info_date=$d")
    assert(sunk.count() == 3)
  }

  test("unknown types and undeclared sources/sinks fail at parse time") {
    assertThrows[IllegalArgumentException](PipelineConfig.parse(
      "job.1.type = teleport\njob.1.output = t"))
    assertThrows[IllegalArgumentException](PipelineConfig.parse(
      "job.1.type = ingestion\njob.1.source = nope\njob.1.output = t"))
    assertThrows[IllegalArgumentException](PipelineConfig.parse(
      "job.1.type = sink\njob.1.input = t\njob.1.sink = nope"))
  }
}
