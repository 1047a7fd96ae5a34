package graft.sources

import graft.SparkSpec
import graft.sql.SqlDialect

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.time.LocalDate

/** S16: JDBC URL failover pool — scripted fail-then-succeed endpoints
  * pin rotation order, backoff growth, the retry bound, stickiness and
  * the all-urls-exhausted error, then the pool rides through both
  * JdbcSource (driver-side URL resolution) and JdbcNativeSource
  * (connection factories). */
class JdbcUrlSelectorSpec extends SparkSpec {

  private def selector(urls: Seq[String], retries: Option[Int] = None,
                       sleeps: scala.collection.mutable.ArrayBuffer[Long] =
                         scala.collection.mutable.ArrayBuffer.empty[Long]) =
    new JdbcUrlSelector(urls, retries, sleep = sleeps.append(_))

  test("rotation is declared-order, backoff grows capped, winner becomes sticky") {
    val attempts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sel = selector(Seq("jdbc:a", "jdbc:b", "jdbc:c"), sleeps = sleeps)
    val got = sel.withUrl { u =>
      attempts += u
      if (u != "jdbc:c") throw new RuntimeException(s"refused $u") else u
    }
    assert(got == "jdbc:c")
    assert(attempts.toSeq == Seq("jdbc:a", "jdbc:b", "jdbc:c"), "primary first, declared order")
    assert(sleeps.toSeq == Seq(1000L, 2000L), "capped exponential backoff between attempts")
    // sticky: the next call starts at the URL that worked
    attempts.clear()
    sel.withUrl { u => attempts += u; u }
    assert(attempts.toSeq == Seq("jdbc:c"), "last-known-good URL must be tried first")
    assert(sel.currentUrl == "jdbc:c")
  }

  test("retry bound caps total attempts; retries beyond the pool size wrap around") {
    val attempts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sel = selector(Seq("jdbc:a", "jdbc:b"), retries = Some(3))
    intercept[IllegalStateException] {
      sel.withUrl { u => attempts += u; throw new RuntimeException("down") }
    }
    assert(attempts.toSeq == Seq("jdbc:a", "jdbc:b", "jdbc:a"),
      "3 retries over 2 URLs wrap deterministically")
  }

  test("exhaustion raises ONE error naming every URL and failure, first failure as cause") {
    val sel = selector(Seq("jdbc:a", "jdbc:b"))
    val e = intercept[IllegalStateException] {
      sel.withUrl { u => throw new RuntimeException(s"no route to $u") }
    }
    assert(e.getMessage.contains("jdbc:a (no route to jdbc:a)"), e.getMessage)
    assert(e.getMessage.contains("jdbc:b (no route to jdbc:b)"), e.getMessage)
    assert(e.getMessage.contains("2 attempt(s)"), e.getMessage)
    assert(e.getCause.getMessage == "no route to jdbc:a", "cause is the FIRST failure")
  }

  test("single URL with no retries configured fails after one attempt") {
    var n = 0
    val e = intercept[IllegalStateException] {
      selector(Seq("jdbc:only")).withUrl { _ => n += 1; throw new RuntimeException("down") }
    }
    assert(n == 1)
    assert(e.getMessage.contains("1 attempt(s)"))
    // explicit retries on a single URL retry the SAME url (the
    // reference's no-fallback behavior)
    n = 0
    intercept[IllegalStateException] {
      selector(Seq("jdbc:only"), retries = Some(3))
        .withUrl { _ => n += 1; throw new RuntimeException("down") }
    }
    assert(n == 3)
  }

  test("JdbcSource resolves a working URL driver-side; plain sources never probe") {
    val probed = scala.collection.mutable.ArrayBuffer.empty[String]
    val src = new JdbcSource(spark, "jdbc:primary", "t", "info_date",
      dialect = SqlDialect.Postgres,
      fallbackUrls = Seq("jdbc:standby"),
      probeConnection = Some { u =>
        probed += u
        if (u == "jdbc:primary") throw new RuntimeException("primary down")
      },
      backoffSleep = _ => ())
    assert(src.resolvedUrl == "jdbc:standby")
    assert(probed.toSeq == Seq("jdbc:primary", "jdbc:standby"))
    // sticky across reads: the dead primary is not re-probed
    probed.clear()
    assert(src.resolvedUrl == "jdbc:standby")
    assert(probed.toSeq == Seq("jdbc:standby"))
    // no pool, no retries: nothing to resolve, no probe required
    val plain = new JdbcSource(spark, "jdbc:single", "t", "info_date",
      probeConnection = Some(_ => fail("plain source must not probe")))
    assert(plain.resolvedUrl == "jdbc:single")
  }

  test("JdbcNativeSource rotates connection factories and stays on the survivor") {
    def proxy[T](cls: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
            h(m.getName, if (args == null) Array.empty else args)
        }).asInstanceOf[T]
    def liveConnection(): java.sql.Connection = {
      val rs = {
        var cursor = -1
        val meta = proxy(classOf[java.sql.ResultSetMetaData]) {
          case ("getColumnCount", _) => Integer.valueOf(1)
          case ("getColumnLabel", _) => "cnt"
          case ("getColumnType", _) => Integer.valueOf(java.sql.Types.BIGINT)
          case _ => Integer.valueOf(0)
        }
        proxy(classOf[java.sql.ResultSet]) {
          case ("next", _) => cursor += 1; java.lang.Boolean.valueOf(cursor < 1)
          case ("getMetaData", _) => meta
          case ("getLong", _) => java.lang.Long.valueOf(7L)
          case ("wasNull", _) => java.lang.Boolean.FALSE
          case _ => null
        }
      }
      val st = proxy(classOf[java.sql.Statement]) {
        case ("executeQuery", _) => rs
        case _ => null
      }
      proxy(classOf[java.sql.Connection]) {
        case ("createStatement", _) => st
        case _ => null
      }
    }
    val opened = scala.collection.mutable.ArrayBuffer.empty[String]
    val src = new JdbcNativeSource(spark,
      connect = () => { opened += "primary"; throw new RuntimeException("primary refused") },
      table = "dim", infoDateColumn = "info_date", dialect = SqlDialect.Postgres,
      fallbackConnects = Seq(() => { opened += "fallback"; liveConnection() }),
      backoffSleep = _ => ())
    val d = LocalDate.parse("2024-06-15")
    assert(src.getRecordCount(d, d) == 7L)
    assert(opened.toSeq == Seq("primary", "fallback"), "primary tried first, then fallback")
    // sticky: the second read opens only the survivor
    opened.clear()
    assert(src.getRecordCount(d, d) == 7L)
    assert(opened.toSeq == Seq("fallback"))
  }
}
