package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dumps each query's result to `outDir/<name>` parquet; returns the
    * failures (name → message). A failed query must leave a LOUD
    * artifact, not a missing row: in r10 a broken gate vanished from
    * CORRECTNESS because the throw was only printed to stderr. Now
    * every failure (a) still prints, (b) leaves `<query>/_error.txt`
    * in an otherwise-empty output dir so the driver's parquet read
    * errors into an `err` row instead of silently dropping the query,
    * and (c) is returned for errors.json + the exit code. */
  private[graft] def dump(spark: SparkSession, sfDir: String, outDir: String,
                          queries: Map[String, (SparkSession, String) => DataFrame])
      : Map[String, String] = {
    // codegen-failure attribution (r17): a silent interpreted fallback
    // keeps every gate green while losing whole-stage codegen — count
    // per query and leave a loud artifact (codegen_failures.json) so
    // the regression is readable without grepping megabytes of stderr
    CodegenMonitor.install()
    val codegen = scala.collection.mutable.LinkedHashMap[String, Long]()
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      val cg0 = CodegenMonitor.count
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = String.valueOf(e.getMessage)
        val qDir = Paths.get(outDir, name)
        // wipe any partial parquet output: a half-written result must
        // not read as a (wrong) answer
        if (Files.exists(qDir)) {
          import scala.jdk.CollectionConverters._
          Files.walk(qDir).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.deleteIfExists)
        }
        Files.createDirectories(qDir)
        Files.writeString(qDir.resolve("_error.txt"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
      val d = CodegenMonitor.count - cg0
      if (d > 0) codegen(name) = d
    }
    if (codegen.nonEmpty)
      System.err.println(s"[verify] codegen compile FAILURES (interpreted fallback): " +
        codegen.map { case (q, n) => s"$q=$n" }.mkString(", "))
    // written UNCONDITIONALLY (the errors.json discipline): a clean run
    // into a reused outDir must overwrite the previous run's artifact,
    // or a fixed regression keeps reading as live
    Files.writeString(Paths.get(outDir, "codegen_failures.json"),
      codegen.map { case (q, n) => s""""$q": $n""" }.mkString("{", ",", "}"))
    failures.toMap
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def toJson(m: Map[String, String]): String =
    m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (builder-side
    // subset runs while iterating; the driver always passes 2 args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failures = dump(spark, sfDir, outDir,
      SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) })
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), toJson(SparkEntry.oracleSql))
    Files.writeString(Paths.get(s"$outDir/errors.json"), toJson(failures))
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} quer" +
        s"${if (failures.size == 1) "y" else "ies"} FAILED: " +
        failures.keys.mkString(", "))
      sys.exit(1)
    }
  }
}
