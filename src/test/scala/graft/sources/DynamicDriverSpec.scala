package graft.sources

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** S18: runtime JDBC driver loading — a fake `java.sql.Driver` is
  * COMPILED AND JARRED AT TEST TIME (javax.tools), then loaded through
  * [[DynamicDriver]]: direct connects, classloader isolation, the
  * DriverManager shim lifecycle, the JdbcSource failover probe and the
  * config-declared bookkeeping database all ride the loaded driver. */
class DynamicDriverSpec extends SparkSpec {

  private lazy val jarPath: String = DynamicDriverSpec.fakeDriverJar

  private def connects(dd: DynamicDriver): Int =
    dd.driver.getClass.getField("CONNECTS").getInt(null)

  test("loads a driver from a jar and connects directly; jar classes stay isolated") {
    val dd = DynamicDriver.load(jarPath, "FakeDriver")
    try {
      val before = connects(dd)
      val c = dd.connect("jdbc:fake:mem")
      assert(c != null)
      c.close()
      assert(connects(dd) == before + 1, "connect must go through the loaded driver")
      // driver returns null for a foreign URL -> named error, not an NPE
      val e = intercept[java.sql.SQLException](dd.connect("jdbc:other:mem"))
      assert(e.getMessage.contains("FakeDriver") && e.getMessage.contains("jdbc:other:mem"))
      // the jar is NOT on the application classpath
      intercept[ClassNotFoundException](Class.forName("FakeDriver"))
    } finally dd.close()
  }

  test("DriverShim lifecycle: DriverManager resolves only between registerShim and close") {
    val dd = DynamicDriver.load(jarPath, "FakeDriver")
    intercept[java.sql.SQLException](
      java.sql.DriverManager.getConnection("jdbc:fake:mem"))
    dd.registerShim()
    dd.registerShim() // idempotent
    try {
      val c = java.sql.DriverManager.getConnection("jdbc:fake:mem")
      assert(c != null)
      c.close()
    } finally dd.close()
    intercept[java.sql.SQLException](
      java.sql.DriverManager.getConnection("jdbc:fake:mem"))
  }

  test("JdbcSource failover probe rides the runtime-loaded driver") {
    // primary endpoint scripted dead (the fake driver throws on URLs
    // containing 'dead') -> probe rotates to the fallback through the
    // DYNAMIC driver; DriverManager knows nothing about jdbc:fake:
    val src = new JdbcSource(spark, url = "jdbc:fake:dead-primary", table = "t",
      infoDateColumn = "d",
      connectionOptions = Map("driver" -> "FakeDriver"),
      fallbackUrls = Seq("jdbc:fake:replica"),
      backoffSleep = _ => (),
      driverJarPath = Some(jarPath))
    assert(src.resolvedUrl == "jdbc:fake:replica")
  }

  test("JdbcNativeSource.dynamicConnectFactory opens through the loaded driver, lazily once") {
    val factory = JdbcNativeSource.dynamicConnectFactory(
      jarPath, "FakeDriver", "jdbc:fake:native", Map("user" -> "u"))
    val c1 = factory(); val c2 = factory()
    assert(c1 != null && c2 != null)
    c1.close(); c2.close()
  }

  test("config-declared bookkeeping db connects through the runtime-loaded driver") {
    val parsed = graft.pipeline.PipelineConfig.parse(
      s"""pipeline.name = dyn
         |bookkeeping.jdbc.url = jdbc:fake:bookdb
         |bookkeeping.jdbc.driver = FakeDriver
         |bookkeeping.jdbc.driver.jar = $jarPath
         |""".stripMargin)
    // DriverManager cannot resolve jdbc:fake: -> success proves the
    // connection went through the dynamically loaded driver
    val exec = parsed.jdbc.get.makeExecutor()
    assert(exec != null)
  }

  test("config validation: driver.jar without a driver class is a parse error") {
    val e = intercept[IllegalArgumentException](graft.pipeline.PipelineConfig.parse(
      s"""pipeline.name = dyn
         |bookkeeping.jdbc.url = jdbc:fake:bookdb
         |bookkeeping.jdbc.driver.jar = $jarPath
         |""".stripMargin))
    assert(e.getMessage.contains("bookkeeping.jdbc.driver"))
  }

  test("missing jar and wrong class name fail with errors naming the offender") {
    val e1 = intercept[IllegalArgumentException](
      DynamicDriver.load("/no/such/driver.jar", "FakeDriver"))
    assert(e1.getMessage.contains("/no/such/driver.jar"))
    val e2 = intercept[IllegalArgumentException](
      DynamicDriver.load(jarPath, "NoSuchDriver"))
    assert(e2.getMessage.contains("NoSuchDriver"))
  }
}

object DynamicDriverSpec {

  /** Compile FakeDriver.java with the in-process JDK compiler and pack
    * it into a jar — a real driver jar with zero external deps. Built
    * once per JVM (the suite's tests share it). */
  lazy val fakeDriverJar: String = {
    val dir = Files.createTempDirectory("fakedriver")
    val src = dir.resolve("FakeDriver.java")
    Files.writeString(src,
      """import java.sql.*;
        |import java.util.Properties;
        |import java.util.logging.Logger;
        |
        |public class FakeDriver implements Driver {
        |    public static int CONNECTS = 0;
        |
        |    public Connection connect(String url, Properties info) throws SQLException {
        |        if (!acceptsURL(url)) return null;
        |        if (url.contains("dead")) throw new SQLException("endpoint down: " + url);
        |        CONNECTS++;
        |        return (Connection) java.lang.reflect.Proxy.newProxyInstance(
        |            FakeDriver.class.getClassLoader(),
        |            new Class<?>[]{Connection.class},
        |            (proxy, method, args) -> {
        |                Class<?> rt = method.getReturnType();
        |                if (rt == boolean.class) return Boolean.FALSE;
        |                if (rt == int.class) return Integer.valueOf(0);
        |                if (rt == long.class) return Long.valueOf(0L);
        |                return null;
        |            });
        |    }
        |
        |    public boolean acceptsURL(String url) {
        |        return url != null && url.startsWith("jdbc:fake:");
        |    }
        |    public DriverPropertyInfo[] getPropertyInfo(String url, Properties info) {
        |        return new DriverPropertyInfo[0];
        |    }
        |    public int getMajorVersion() { return 9; }
        |    public int getMinorVersion() { return 1; }
        |    public boolean jdbcCompliant() { return false; }
        |    public Logger getParentLogger() { return Logger.getLogger("fake"); }
        |}
        |""".stripMargin)
    val compiler = javax.tools.ToolProvider.getSystemJavaCompiler
    require(compiler != null, "JDK compiler unavailable in test JVM")
    val rc = compiler.run(null, null, null, src.toString)
    require(rc == 0, s"FakeDriver.java failed to compile: rc=$rc")
    val jar = dir.resolve("fake-driver.jar")
    val jos = new java.util.jar.JarOutputStream(Files.newOutputStream(jar))
    try {
      Files.list(dir).filter(_.toString.endsWith(".class")).forEach { p =>
        jos.putNextEntry(new java.util.jar.JarEntry(p.getFileName.toString))
        jos.write(Files.readAllBytes(p))
        jos.closeEntry()
      }
    } finally jos.close()
    jar.toString
  }
}
