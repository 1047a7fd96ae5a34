package graft.sources

import java.net.URLClassLoader
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo}
import java.util.Properties
import java.util.logging.Logger

/**
 * Runtime-loaded JDBC driver (reference: pramen/core
 * .../core/reader/DynamicDriver.scala:22 + JdbcUrlSelector.scala:71
 * `loadDriver`, keyed by `driver.jar.path` in
 * TableReaderJdbcNative.scala:158): production launchers routinely run
 * WITHOUT the warehouse's JDBC jar on the application classpath — the
 * Oracle/Teradata jar lives at an ops-managed path and is loaded at
 * run time from config. The jar is opened in its own URLClassLoader
 * and the driver class instantiated from it.
 *
 * Two use shapes:
 *  - [[connect]] — direct `Driver.connect`, for driver-side opens
 *    (the [[JdbcNativeSource]] connection factories and
 *    [[JdbcSource]]'s failover probe). DriverManager is deliberately
 *    bypassed here: its caller-classloader check refuses drivers owned
 *    by a foreign loader, which is exactly what a runtime-loaded
 *    driver is.
 *  - [[registerShim]] — registers a [[DriverShim]] (owned by the app
 *    classloader, so DriverManager accepts it) delegating to the
 *    loaded driver, for code paths that insist on
 *    `DriverManager.getConnection`.
 *
 * Driver-side machinery only: a distributed Spark JDBC READ still
 * needs the jar shipped to executors (`spark.jars`) — this class
 * covers the launcher-side probes, native reads and bookkeeping
 * connections the reference uses it for.
 */
final class DynamicDriver private[sources] (val driver: Driver,
                                            loader: URLClassLoader)
    extends AutoCloseable {

  /** Open a connection through the loaded driver directly. A driver
    * signals "not my URL" by returning null — surfaced as an error
    * naming the driver, not a downstream NPE. */
  def connect(url: String, props: Properties = new Properties()): Connection = {
    val c = driver.connect(url, props)
    if (c == null)
      throw new java.sql.SQLException(
        s"driver ${driver.getClass.getName} does not accept URL: $url")
    c
  }

  @volatile private var shim: Option[DriverShim] = None

  /** Make the loaded driver reachable via DriverManager. Idempotent;
    * undone by [[close]]. */
  def registerShim(): Unit = synchronized {
    if (shim.isEmpty) {
      val s = new DriverShim(driver)
      DriverManager.registerDriver(s)
      shim = Some(s)
    }
  }

  override def close(): Unit = synchronized {
    shim.foreach(DriverManager.deregisterDriver)
    shim = None
    loader.close()
  }
}

object DynamicDriver {

  /** Load `driverClass` from the jar at `jarPath`. The loader parents
    * to this class's loader so the driver sees the JDK (java.sql) but
    * the application never sees the jar's classes — two sources can
    * load two versions of the same driver without interference. */
  def load(jarPath: String, driverClass: String): DynamicDriver = {
    val f = new java.io.File(jarPath)
    if (!f.isFile)
      throw new IllegalArgumentException(s"JDBC driver jar not found: $jarPath")
    val loader = new URLClassLoader(Array(f.toURI.toURL), getClass.getClassLoader)
    val drv =
      try loader.loadClass(driverClass).getDeclaredConstructor()
        .newInstance().asInstanceOf[Driver]
      catch {
        case e: Exception =>
          loader.close()
          throw new IllegalArgumentException(
            s"cannot load JDBC driver '$driverClass' from $jarPath: ${e.getMessage}", e)
      }
    new DynamicDriver(drv, loader)
  }
}

/** DriverManager-visible delegate for a driver owned by a foreign
  * classloader: DriverManager's security check looks at the
  * REGISTERING class's loader, sees the shim (app classloader) and
  * accepts it, while every call forwards to the dynamically loaded
  * driver. */
final class DriverShim(underlying: Driver) extends Driver {
  override def connect(url: String, info: Properties): Connection =
    underlying.connect(url, info)
  override def acceptsURL(url: String): Boolean = underlying.acceptsURL(url)
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    underlying.getPropertyInfo(url, info)
  override def getMajorVersion: Int = underlying.getMajorVersion
  override def getMinorVersion: Int = underlying.getMinorVersion
  override def jdbcCompliant(): Boolean = underlying.jdbcCompliant()
  override def getParentLogger: Logger = underlying.getParentLogger
}
