package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions.col

import java.time.{LocalDate, ZoneOffset}

/** `_INFO` metadata file on export (reference: pramen/extras
  * .../extras/infofile/InfoFileGeneration.scala). */
class InfoFileSpec extends SparkSpec {
  import spark.implicits._

  private val d = LocalDate.parse("2024-06-15")

  test("render is deterministic and carries metadata + ordered checkpoint controls") {
    val doc = InfoFile.render("crm_exports", "ZA", "snapshot", "sales", d,
      recordCount = 12345L, version = 1, ZoneOffset.UTC,
      Seq(InfoFile.Checkpoint("Sink", "Sink", 2, 1718409600000L, 1718409660000L, 12345L),
        InfoFile.Checkpoint("Source", "Source", 1, 1718409500000L, 1718409600000L, 12400L)))
    assert(doc.contains("\"sourceApplication\" : \"crm_exports\""))
    assert(doc.contains("\"informationDate\" : \"2024-06-15\""))
    assert(doc.contains("\"controlValue\" : \"12345\""))
    // checkpoints render in order despite the unordered input
    assert(doc.indexOf("\"Source\"") < doc.indexOf("\"Sink\""), doc)
    assert(doc.contains("\"processStartTime\" : \"2024-06-15 00:00:00 +0000\""))
    // stable bytes: same args, same document
    assert(doc == InfoFile.render("crm_exports", "ZA", "snapshot", "sales", d,
      12345L, 1, ZoneOffset.UTC,
      Seq(InfoFile.Checkpoint("Sink", "Sink", 2, 1718409600000L, 1718409660000L, 12345L),
        InfoFile.Checkpoint("Source", "Source", 1, 1718409500000L, 1718409600000L, 12400L))))
  }

  test("SparkSink with info-file config writes _INFO next to the data, after it") {
    val base = tmpDir("info_sink_")
    val sink = new SparkSink(base,
      infoFile = Some(InfoFileConfig("crm_exports", "ZA")))
    val r = sink.send(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), "sales", d)
    assert(r.recordsSent == 3L)
    val partDir = s"$base/sales/info_date=$d"
    val info = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$partDir/_INFO")), "UTF-8")
    assert(info.contains("\"controlValue\" : \"3\""), info)
    assert(info.contains("\"dataFilename\" : \"sales\""))
    // the underscore prefix keeps the file invisible to Spark reads
    assert(spark.read.parquet(partDir).count() == 3)
    // no temp residue from the atomic rename
    assert(!new java.io.File(partDir).listFiles().exists(_.getName == "._INFO.tmp"))
  }

  test("config wiring: sink.*.info.file = true flows through a config-run pipeline") {
    val base = tmpDir("info_cfg_")
    val conf =
      s"""pipeline.name = p
         |table.t.path = $base/ms/t
         |sink.exp.type = spark
         |sink.exp.path = $base/out
         |sink.exp.info.file = true
         |sink.exp.info.file.application = warehouse
         |sink.exp.info.file.country = DE
         |job.1.output = t
         |job.1.transformer = ${classOf[SeedThree].getName}
         |job.2.type = sink
         |job.2.input = t
         |job.2.sink = exp
         |""".stripMargin
    val parsed = graft.pipeline.PipelineConfig.parse(conf)
    val results = graft.pipeline.PipelineConfig.runParams(spark, parsed,
      graft.pipeline.RunParams.Normal(d))
    assert(results.forall(_.isInstanceOf[graft.pipeline.TaskResult.Succeeded]), results.toString)
    val info = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/out/t/info_date=$d/_INFO")), "UTF-8")
    assert(info.contains("\"sourceApplication\" : \"warehouse\""))
    assert(info.contains("\"country\" : \"DE\""))
    assert(info.contains("\"controlValue\" : \"3\""))
  }
}

/** Config-instantiable fixture transformer (FQCN path). */
class SeedThree extends graft.pipeline.Transformer {
  def run(r: graft.meta.MetastoreReader, dd: LocalDate,
          o: Map[String, String]): org.apache.spark.sql.DataFrame = {
    val s = graft.SparkSpec.session
    import s.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
  }
}
