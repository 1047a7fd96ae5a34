package graft.pipeline

import graft.SparkSpec
import graft.sinks.{GraftSink, SinkFactory, SinkResult}
import graft.sources.{GraftSource, SourceFactory, SourceResult}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.time.LocalDate

/** A config-instantiable custom source: serves `rows` synthetic rows,
  * windowed on a synthetic date column (factory contract under test —
  * reference: api/ExternalChannelFactory.scala:25). */
object FixtureSourceFactory extends SourceFactory {
  override def apply(spark: SparkSession, options: Map[String, String]): GraftSource =
    new GraftSource {
      private val rows = options.getOrElse("rows", "3").toInt
      private val tag = options.getOrElse("option.tag", "none")
      override def hasInfoDateColumn: Boolean = false
      override def getRecordCount(from: LocalDate, to: LocalDate): Long = rows.toLong
      override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult = {
        import spark.implicits._
        SourceResult((1 to rows).map(i => (i.toLong, s"$tag-$i")).toDF("id", "v"))
      }
    }
}

/** A config-instantiable custom sink (class form: no-arg constructor)
  * collecting what it was sent into a static buffer the spec reads. */
class FixtureSinkFactory extends SinkFactory {
  override def apply(options: Map[String, String]): GraftSink =
    new GraftSink {
      override def send(df: DataFrame, tableName: String, infoDate: LocalDate,
                        opts: Map[String, String]): SinkResult = {
        val n = df.count()
        FixtureSinkFactory.sent.add((tableName, infoDate, n, options.getOrElse("label", "?")))
        SinkResult(n)
      }
    }
}
object FixtureSinkFactory {
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, LocalDate, Long, String)]()
}

/** A V2 (context-aware) custom source: emits one row carrying the
  * RUN's info date and pipeline facts straight from the
  * ChannelContext (factory contract under test — reference:
  * api/ExternalChannelFactoryV2.scala:25). */
object FixtureSourceFactoryV2 extends graft.sources.SourceFactoryV2 {
  override def apply(spark: SparkSession, options: Map[String, String],
                     context: graft.sources.ChannelContext): GraftSource =
    new GraftSource {
      override def hasInfoDateColumn: Boolean = false
      override def getRecordCount(from: LocalDate, to: LocalDate): Long = 1L
      override def getData(from: LocalDate, to: LocalDate, columns: Seq[String]): SourceResult = {
        import spark.implicits._
        SourceResult(Seq((
          context.infoDate.map(_.toString).getOrElse("NONE"),
          context.pipelineName,
          // cross-cutting workflow config: another block's key
          context.workflowConfig.getOrElse("table.ctx_out.path", "?")
        )).toDF("ctx_info_date", "ctx_pipeline", "ctx_other_key"))
      }
    }
}

/** A V2 sink: records the parse-time context it was built with. */
class FixtureSinkFactoryV2 extends graft.sinks.SinkFactoryV2 {
  override def apply(options: Map[String, String],
                     context: graft.sources.ChannelContext): GraftSink = {
    FixtureSinkFactoryV2.contexts.add(context)
    new GraftSink {
      override def send(df: DataFrame, tableName: String, infoDate: LocalDate,
                        opts: Map[String, String]): SinkResult = SinkResult(df.count())
    }
  }
}
object FixtureSinkFactoryV2 {
  val contexts = new java.util.concurrent.ConcurrentLinkedQueue[graft.sources.ChannelContext]()
}

/** A config-instantiable notification target (FQCN path). */
class FixtureTarget extends PipelineNotificationTarget {
  override def onPipelineCompleted(results: Seq[TaskResult],
                                   runDate: LocalDate): Unit =
    FixtureTarget.completed.incrementAndGet()
}
object FixtureTarget {
  val completed = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** A config-instantiable seed transformer (FQCN path). */
class FixtureSeed extends Transformer {
  def run(r: graft.meta.MetastoreReader, d: LocalDate,
          o: Map[String, String]): DataFrame = {
    val s = graft.SparkSpec.session
    import s.implicits._
    Seq((1L, "x")).toDF("id", "v")
  }
}

/** FQCN source/sink factories declared in config — the reference's
  * ExternalChannelFactory surface (transformers already took FQCNs;
  * sources/sinks get the symmetric path). */
class ExternalChannelSpec extends SparkSpec {

  private val d = LocalDate.parse("2024-06-15")

  test("config-declared custom source feeds the metastore and a custom sink exports it") {
    val base = tmpDir("extchan_")
    val conf =
      s"""pipeline.name = ext
         |table.fixture_data.path = $base/ms/fixture_data
         |source.fx.type = graft.pipeline.FixtureSourceFactory
         |source.fx.rows = 4
         |source.fx.option.tag = ext
         |sink.collect.type = graft.pipeline.FixtureSinkFactory
         |sink.collect.label = run1
         |job.1.type = ingestion
         |job.1.source = fx
         |job.1.output = fixture_data
         |job.2.type = sink
         |job.2.input = fixture_data
         |job.2.sink = collect
         |""".stripMargin
    val parsed = PipelineConfig.parse(conf)
    FixtureSinkFactory.sent.clear()
    val results = PipelineConfig.runParams(spark, parsed, RunParams.Normal(d))
    assert(results.forall(_.isInstanceOf[TaskResult.Succeeded]), s"results: $results")

    // the custom source's rows landed in the metastore
    val ms = new graft.meta.Metastore(spark)
    parsed.tables.foreach(ms.register)
    val landed = ms.getTable("fixture_data", Some(d), Some(d))
    assert(landed.count() == 4)
    assert(landed.select("v").collect().map(_.getString(0)).forall(_.startsWith("ext-")),
      "factory options (source.fx.option.tag) must reach the source")

    // and the custom sink received them, with its own config visible
    val sent = FixtureSinkFactory.sent.toArray(Array.empty[(String, LocalDate, Long, String)])
    assert(sent.length == 1 && sent.head._3 == 4L, sent.toSeq.toString)
    assert(sent.head._4 == "run1", "factory options (sink.collect.label) must reach the sink")
  }

  test("V2 factories receive pipeline context: the source reads the run's info date") {
    val base = tmpDir("extchan_v2_")
    val conf =
      s"""pipeline.name = ctx_pipe
         |table.ctx_out.path = $base/ms/ctx_out
         |source.cx.type = graft.pipeline.FixtureSourceFactoryV2
         |sink.kx.type = graft.pipeline.FixtureSinkFactoryV2
         |job.1.type = ingestion
         |job.1.source = cx
         |job.1.output = ctx_out
         |job.2.type = sink
         |job.2.input = ctx_out
         |job.2.sink = kx
         |""".stripMargin
    FixtureSinkFactoryV2.contexts.clear()
    val parsed = PipelineConfig.parse(conf)
    val results = PipelineConfig.runParams(spark, parsed, RunParams.Normal(d))
    assert(results.forall(_.isInstanceOf[TaskResult.Succeeded]), s"results: $results")

    val ms = new graft.meta.Metastore(spark)
    parsed.tables.foreach(ms.register)
    val row = ms.getTable("ctx_out", Some(d), Some(d))
      .select("ctx_info_date", "ctx_pipeline", "ctx_other_key").head()
    assert(row.getString(0) == d.toString,
      "the V2 source factory must see the RUN's info date in its context")
    assert(row.getString(1) == "ctx_pipe")
    assert(row.getString(2) == s"$base/ms/ctx_out",
      "the whole workflow config must be visible, not just the source's scope")

    // the V2 sink was built at parse time: context carries pipeline
    // facts but no info date yet
    val sinkCtx = FixtureSinkFactoryV2.contexts.peek()
    assert(sinkCtx != null && sinkCtx.pipelineName == "ctx_pipe" && sinkCtx.infoDate.isEmpty)
  }

  test("a class that is neither V1 nor V2 factory fails the parse naming both traits") {
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(
      "source.s.type = graft.pipeline.IdentityTransformer\n" +
        "job.1.type = ingestion\njob.1.source = s\njob.1.output = t\ntable.t.path = /tmp/t"))
    assert(e.getMessage.contains("SourceFactory") && e.getMessage.contains("SourceFactoryV2"),
      e.getMessage)
  }

  test("object factories resolve with a trailing $ in the FQCN too") {
    // the module class's ctor is PRIVATE (IllegalAccessException, not
    // NoSuchMethod) — the MODULE$ fallback must still fire
    val parsed = PipelineConfig.parse(
      s"""table.t.path = /tmp/t
         |source.s.type = graft.pipeline.FixtureSourceFactory$$
         |source.s.rows = 2
         |job.1.type = ingestion
         |job.1.source = s
         |job.1.output = t
         |""".stripMargin)
    assert(parsed.jobs.size == 1)
  }

  test("notification.targets: config-declared FQCN targets observe the pipeline run") {
    val base = tmpDir("notif_tgt_")
    FixtureTarget.completed.set(0)
    val parsed = PipelineConfig.parse(
      s"""pipeline.name = p
         |notification.targets = graft.pipeline.FixtureTarget
         |table.t.path = $base/t
         |job.1.output = t
         |job.1.transformer = graft.pipeline.FixtureSeed
         |""".stripMargin)
    assert(parsed.notificationTargets.size == 1)
    val results = PipelineConfig.runParams(spark, parsed, RunParams.Normal(d),
      notifiers = parsed.notificationTargets)
    assert(results.forall(_.isInstanceOf[TaskResult.Succeeded]), results.toString)
    assert(FixtureTarget.completed.get() == 1, "config-declared target must observe completion")
    // a typo'd target FQCN fails the parse, pointing at the key
    val e = intercept[IllegalArgumentException](PipelineConfig.parse(
      "notification.targets = no.such.Target\ntable.t.path = /tmp/t"))
    assert(e.getMessage.contains("notification.targets"), e.getMessage)
  }

  test("factory errors point at the config key") {
    val e1 = intercept[IllegalArgumentException](PipelineConfig.parse(
      "source.s1.type = no.such.ClassAtAll\njob.1.type = ingestion\njob.1.source = s1\njob.1.output = t\ntable.t.path = /tmp/t"))
    assert(e1.getMessage.contains("source.s1.type"), e1.getMessage)
    // a real class that is NOT a factory fails with the trait name
    val e2 = intercept[IllegalArgumentException](PipelineConfig.parse(
      "sink.k1.type = graft.pipeline.IdentityTransformer\njob.1.type = sink\njob.1.input = t\njob.1.sink = k1\ntable.t.path = /tmp/t"))
    assert(e2.getMessage.contains("SinkFactory"), e2.getMessage)
    // dot-less unknown types still fail as before
    assertThrows[IllegalArgumentException](PipelineConfig.parse(
      "source.s2.type = teleport\njob.1.type = ingestion\njob.1.source = s2\njob.1.output = t\ntable.t.path = /tmp/t"))
  }
}
