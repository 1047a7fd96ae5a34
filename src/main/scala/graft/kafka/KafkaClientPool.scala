package graft.kafka

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/**
 * Executor-local pool of [[KafkaWireClient]]s for the streaming
 * source, keyed by (broker list, security config).
 *
 * Why: the DataSource V2 micro-batch stream re-plans every trigger,
 * so each topic partition gets a fresh PartitionReader per
 * micro-batch. Building a new client there means a new TCP connect —
 * and on SASL listeners a full SCRAM exchange (one PBKDF2 derivation
 * plus two round trips) — PER PARTITION PER TRIGGER. On a
 * 1000-partition topic at a 1-second trigger that is a
 * reauthentication storm the broker sees as a credential-stuffing
 * load test. Real kafka-clients consumers keep one authenticated
 * connection per (consumer, broker) alive across polls; this pool
 * gives graft's readers the same amortization: a reader borrows a
 * client, fetches its slice, and returns it for the NEXT trigger's
 * reader on the same executor.
 *
 * Concurrency: [[KafkaWireClient]] is not thread-safe, so the pool
 * never shares one client across concurrent tasks — borrow removes it
 * from the queue; concurrent readers on one executor each get their
 * own. Idle clients are capped per key (extras close); a pooled
 * client whose socket the broker idle-closed self-heals, because the
 * client evicts broken sockets on IOException and the reader's
 * failover wrapper retries.
 */
private[kafka] object KafkaClientPool {

  /** Keyed by the broker SET (sorted), not the caller's ordering: a
    * partition reader passes its planned leader first, so ordering-
    * sensitive keys would fragment one logical cluster into up to B
    * pools — B × maxIdle idle sockets, and after a leadership
    * migration the old ordering's clients would strand unborrowed
    * until broker reap. Any pooled client reaches any leader via
    * metadata, so ordering is a first-connect preference, not an
    * identity. */
  private final case class Key(brokers: Seq[(String, Int)], security: KafkaSecurity)
  private object Key {
    def normalized(brokers: Seq[(String, Int)], security: KafkaSecurity): Key =
      Key(brokers.sorted, security)
  }

  private val pools = new ConcurrentHashMap[Key, ConcurrentLinkedQueue[KafkaWireClient]]()

  /** Idle clients retained per (brokers, security): enough for every
    * concurrent task slot on the executor to have its own. */
  private val maxIdle = math.max(8, Runtime.getRuntime.availableProcessors())

  def borrow(brokers: Seq[(String, Int)], security: KafkaSecurity): KafkaWireClient = {
    val q = pools.computeIfAbsent(Key.normalized(brokers, security), _ => new ConcurrentLinkedQueue)
    Option(q.poll()).getOrElse(new KafkaWireClient(brokers, security = security))
  }

  /** Return a client for reuse by a later reader (same key). Over-cap
    * clients close instead of accumulating sockets. */
  def release(brokers: Seq[(String, Int)], security: KafkaSecurity,
              client: KafkaWireClient): Unit = {
    val q = pools.computeIfAbsent(Key.normalized(brokers, security), _ => new ConcurrentLinkedQueue)
    if (q.size < maxIdle) q.offer(client) else client.close()
  }

  /** Close everything (tests; a streaming query teardown does not need
    * this — idle sockets are bounded and brokers reap them). */
  def clear(): Unit = {
    val it = pools.values().iterator()
    while (it.hasNext) {
      val q = it.next()
      var c = q.poll()
      while (c != null) { c.close(); c = q.poll() }
    }
    pools.clear()
  }
}
