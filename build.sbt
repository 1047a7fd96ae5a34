ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pramenspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Unprefixed program stdout (r21): with the default LoggedOutput
// strategy sbt rewrote every forked stdout line as "[info] <line>",
// which is why the driver's bench-line parse failed in EVERY round —
// the r01 BENCH artifact shows the complete JSON line inside the
// captured tail, unparseable behind the prefix. StdoutOutput passes
// the forked process's stdout/stderr straight through to sbt's own.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 70+ suites share one forked JVM in parallel; 8g showed rare
  // abort-without-failure runs under full-suite load, and at 10g the
  // BENCH fork spent its tail in GC (dozens of gates accumulate
  // localCheckpoint blocks + broadcast vars in one JVM — q_dedup_simhash
  // measured 34 s under 10g vs ~3 s with headroom). The host has
  // 128 GiB; 24g keeps the suite and the bench out of GC pressure.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
