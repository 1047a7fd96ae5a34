// Diagnostic tool (not part of the library build): dump
// .explain("formatted") for named SparkEntry queries to a directory.
// Compile with the Spark-embedded scala compiler (see
// .claude/skills/verify/SKILL.md) against target/scala-2.13/classes.
//
//   java -cp "$CP" scala.tools.nsc.Main -classpath "$CP" -d /tmp/ed ExplainDump.scala
//   java -cp "/tmp/ed:$CP" $JOPTS ExplainDump /root/testdata/sf0.1 plans/r20 _before q_a,q_b
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      spark.sparkContext.setJobDescription(s"explain: $n")
      val df = fn(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$n$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/$n$suffix.txt (${txt.length} chars)")
      // drop cached/persisted state between queries, mirroring Bench
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
