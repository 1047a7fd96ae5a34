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
