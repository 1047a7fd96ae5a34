package graft.sources

/**
 * JDBC URL failover pool (reference: pramen/core
 * .../core/reader/JdbcUrlSelectorImpl.scala:30): production RDBMS
 * fleets sit behind HA pairs, so a read must rotate to a fallback URL
 * on connect failure instead of failing the task on the first dead
 * endpoint. Shared by [[JdbcSource]] (which resolves a working URL
 * driver-side before handing it to Spark's JDBC datasource — the same
 * split as the reference's getWorkingUrl) and [[JdbcNativeSource]]
 * (which rotates its connection factories directly).
 *
 * Deliberate re-expressions of the reference's behavior:
 *  - rotation is DETERMINISTIC (declared order, wrapping, sticky on
 *    the last URL that worked) rather than random-from-pool — failover
 *    order is an operational property worth being able to read off the
 *    config;
 *  - backoff is capped exponential (1s, 2s, 4s ... maxBackoffMs)
 *    rather than uniform random 1-10s — same bound, reproducible.
 *
 * Only CONNECTION attempts ride the failover loop. Query failures
 * must propagate: re-running a statement against another replica can
 * double-execute side effects and masks real errors as connectivity.
 */
final class JdbcUrlSelector(
    urls: Seq[String],
    retries: Option[Int] = None,
    maxBackoffMs: Long = 10000L,
    sleep: Long => Unit = Thread.sleep) {
  require(urls.nonEmpty, "JdbcUrlSelector needs at least one URL")
  require(urls.distinct.size == urls.size, s"duplicate JDBC URLs in pool: $urls")

  private val pool = urls.toIndexedSeq
  // sticky: after a success the winning URL stays first choice, so a
  // long-running pipeline does not re-probe a known-dead primary on
  // every read
  @volatile private var current = 0

  def currentUrl: String = pool(current)
  def numberOfUrls: Int = pool.size
  def haveFallbackUrls: Boolean = pool.size > 1

  /** Run `attempt` against the current URL; on failure rotate through
    * the pool with bounded backoff, up to `retries` total attempts
    * (default: one per URL). Exhaustion raises one error naming every
    * URL tried and its failure, with the first failure as the cause. */
  def withUrl[A](attempt: String => A): A = {
    val (a, idx) = JdbcUrlSelector.run(pool, current, retries, maxBackoffMs, sleep)(
      i => attempt(pool(i)))
    current = idx
    a
  }
}

object JdbcUrlSelector {

  /** The failover loop over labeled endpoints, shared with
    * [[JdbcNativeSource]]'s connection factories: try `attempt(idx)`
    * starting at `start`, wrapping through the pool, sleeping a capped
    * exponential backoff between attempts. Returns the result and the
    * winning index. */
  private[sources] def run[A](labels: IndexedSeq[String], start: Int,
                              retries: Option[Int], maxBackoffMs: Long,
                              sleep: Long => Unit)(attempt: Int => A): (A, Int) = {
    val maxAttempts = math.max(retries.getOrElse(labels.size), 1)
    var failures = List.empty[(String, Throwable)]
    var i = 0
    while (i < maxAttempts) {
      val idx = (start + i) % labels.size
      try return (attempt(idx), idx)
      catch {
        case e: Exception =>
          failures = (labels(idx), e) :: failures
          i += 1
          if (i < maxAttempts)
            sleep(math.min(1000L << math.min(i - 1, 10), maxBackoffMs))
      }
    }
    val ordered = failures.reverse
    val tried = ordered.map { case (l, t) => s"$l (${t.getMessage})" }.mkString("; ")
    throw new IllegalStateException(
      s"all JDBC endpoints failed after $maxAttempts attempt(s): $tried", ordered.head._2)
  }
}
