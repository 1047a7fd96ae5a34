package graft.pipeline

import java.time.LocalDate

import graft.SparkSpec
import graft.meta.{MetaTable, Metastore}
import org.apache.spark.sql.functions._

/** pramen-py interop (M24): the pyclient/graft_py.py helper driven
  * end-to-end through ProcessTransformer — Scala orchestrator stages
  * parquet, python3 + pyarrow transforms it, the result lands as a
  * metastore partition. Skips cleanly if the host lacks python3 or
  * pyarrow (the driver environment has both). */
class PyClientSpec extends SparkSpec {
  import spark.implicits._

  private val d = LocalDate.parse("2024-07-01")

  private lazy val pyAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import pyarrow.parquet").start().waitFor() == 0
    catch { case _: Throwable => false }

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("e2e: orchestrator → python transformer → metastore partition, values exact") {
    assume(pyAvailable, "python3 + pyarrow not available")
    val ms = new Metastore(spark)
    ms.register(MetaTable("docs_py", tmp("py_src_")))
    ms.register(MetaTable("docs_py_out", tmp("py_out_")))
    ms.saveTable("docs_py", d,
      Seq((1L, 10L), (2L, 25L), (3L, 0L)).toDF("doc_id", "n_chars"))
    val script = graft.SparkEntry.pyClientScript("double_chars.py")
    val res = new Orchestrator(ms).run(Seq(JobDef(
      name = "py_double", outputTable = "docs_py_out",
      transformer = new ProcessTransformer(
        s"python3 $script @in @out @infoDate", tmp("py_stage_"), Seq("docs_py")),
      inputTables = Seq("docs_py"), infoDateExpr = "@runDate")), d)
    assert(res.head.isInstanceOf[TaskResult.Succeeded], res.head.toString)
    val out = ms.getTable("docs_py_out", Some(d), Some(d))
      .select("doc_id", "n_chars", "n2").orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L, 20L), (2L, 25L, 50L), (3L, 0L, 0L)), out.toString)
  }

  test("a python failure fails the task with the captured traceback, not a hang or a silent pass") {
    assume(pyAvailable, "python3 + pyarrow not available")
    val ms = new Metastore(spark)
    ms.register(MetaTable("docs_py2", tmp("py_src2_")))
    ms.register(MetaTable("docs_py2_out", tmp("py_out2_")))
    ms.saveTable("docs_py2", d, Seq((1L, 10L)).toDF("doc_id", "n_chars"))
    // asking for a table that was never staged must raise KeyError in
    // graft_py and surface as a Failed task with the python error text
    val bad = java.nio.file.Files.createTempFile("bad_tf_", ".py")
    java.nio.file.Files.write(bad,
      ("""import sys, pathlib
         |sys.path.insert(0, str(pathlib.Path(sys.argv[0]).resolve().parent))
         |""".stripMargin +
        s"sys.path.insert(0, ${"\"" + java.nio.file.Paths.get(graft.SparkEntry.pyClientScript("graft_py.py")).getParent + "\""})\n" +
        """import graft_py
          |def transform(ms, info_date):
          |    return ms.get_table("no_such_table")
          |graft_py.run_transformer(transform)
          |""".stripMargin).getBytes("UTF-8"))
    val res = new Orchestrator(ms).run(Seq(JobDef(
      name = "py_bad", outputTable = "docs_py2_out",
      transformer = new ProcessTransformer(
        s"python3 $bad @in @out @infoDate", tmp("py_stage2_"), Seq("docs_py2")),
      inputTables = Seq("docs_py2"), infoDateExpr = "@runDate")), d)
    res.head match {
      case TaskResult.Failed(_, e) =>
        assert(e.getMessage.contains("no_such_table"),
          s"captured python output must carry the error: ${e.getMessage}")
      case other => fail(s"expected Failed, got $other")
    }
  }

  test("standalone runner: `graft_py.py run <Name> --config --info-date` against the metastore layout") {
    assume(pyAvailable, "python3 + pyarrow not available")
    // the reference's `pramen-py transformations run` UX: a yaml
    // config declaring metastore tables + run entries, a discovered
    // Transformation subclass, partition-layout reads and writes —
    // all WITHOUT the Scala orchestrator in the loop. Spark verifies
    // the written partition.
    val root = java.nio.file.Files.createTempDirectory("py_runner_")
    val inPath = s"$root/data/sales"
    val outPath = s"$root/data/sales_out"
    // seed a day partition exactly as the metastore lays it out
    Seq((1L, 10L), (2L, 25L)).toDF("id", "amount")
      .write.parquet(s"$inPath/info_date=$d")
    val tfDir = java.nio.file.Files.createDirectories(root.resolve("transformations"))
    val helperDir = java.nio.file.Paths.get(
      graft.SparkEntry.pyClientScript("graft_py.py")).getParent
    java.nio.file.Files.write(tfDir.resolve("taxed.py"),
      (s"import sys\nsys.path.insert(0, ${"\"" + helperDir + "\""})\n" +
        """import pyarrow as pa
          |import graft_py
          |class TaxedSales(graft_py.Transformation):
          |    def run(self, metastore, info_date, options):
          |        t = metastore.get_table("sales", info_date)
          |        rate = float(options.get("rate", 0))
          |        taxed = pa.compute.multiply(t["amount"], rate)
          |        return t.append_column("taxed", pa.compute.cast(taxed, pa.int64()))
          |""".stripMargin).getBytes("UTF-8"))
    java.nio.file.Files.write(root.resolve("config.yaml"),
      s"""# pramen-py style runner config
         |run_transformers:
         |- info_date: 2020-01-01
         |  output_table: sales_out
         |  name: TaxedSales
         |  options:
         |    rate: 2
         |metastore_tables:
         |- name: sales
         |  format: parquet
         |  info_date_settings:
         |    column: info_date
         |    format: yyyy-MM-dd
         |  path: $inPath
         |- name: sales_out
         |  format: parquet
         |  info_date_settings:
         |    column: info_date
         |  path: $outPath
         |  records_per_partition: 1
         |""".stripMargin.getBytes("UTF-8"))
    val helper = graft.SparkEntry.pyClientScript("graft_py.py")
    // --info-date overrides the config's 2020 date, like the reference
    val proc = new ProcessBuilder("python3", helper, "run", "TaxedSales",
      "--config", s"$root/config.yaml", "--info-date", d.toString,
      "--transformations-dir", tfDir.toString)
      .redirectErrorStream(true).start()
    val outTxt = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"runner failed: $outTxt")
    assert(outTxt.contains("ran 1 entry"), outTxt)
    // records_per_partition=1 → one part file per row
    val parts = new java.io.File(s"$outPath/info_date=$d").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length == 2, parts.mkString(", "))
    val got = spark.read.parquet(s"$outPath/info_date=$d")
      .orderBy("id").select("id", "amount", "taxed")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L, 20L), (2L, 25L, 50L)), got.toString)
    // ls discovers the class from the transformations dir
    val ls = new ProcessBuilder("python3", helper, "ls",
      "--transformations-dir", tfDir.toString).redirectErrorStream(true).start()
    val lsOut = new String(ls.getInputStream.readAllBytes(), "UTF-8")
    assert(ls.waitFor() == 0 && lsOut.contains("TaxedSales"), lsOut)
  }

  test("helper surface: tables() listing and multi-table reads through a direct run") {
    assume(pyAvailable, "python3 + pyarrow not available")
    // two staged tables; the transformer joins their row counts — the
    // python-side listing must see both
    val stage = java.nio.file.Files.createTempDirectory("py_direct_")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$stage/in/t_one")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.parquet(s"$stage/in/t_two")
    val helperDir = java.nio.file.Paths.get(
      graft.SparkEntry.pyClientScript("graft_py.py")).getParent
    val script = java.nio.file.Files.createTempFile("list_tf_", ".py")
    java.nio.file.Files.write(script,
      (s"import sys\nsys.path.insert(0, ${"\"" + helperDir + "\""})\n" +
        """import pyarrow as pa
          |import graft_py
          |def transform(ms, info_date):
          |    names = ms.tables()
          |    counts = [ms.get_table(n).num_rows for n in names]
          |    return pa.table({"name": names, "rows": pa.array(counts, pa.int64()),
          |                     "day": pa.array([str(info_date)] * len(names))})
          |graft_py.run_transformer(transform)
          |""".stripMargin).getBytes("UTF-8"))
    val proc = new ProcessBuilder("python3", script.toString,
      s"$stage/in", s"$stage/out", d.toString).redirectErrorStream(true).start()
    val outTxt = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"python failed: $outTxt")
    val out = spark.read.parquet(s"$stage/out").orderBy("name")
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("t_one", 1L, "2024-07-01"), ("t_two", 2L, "2024-07-01")), out.toString)
  }
}
