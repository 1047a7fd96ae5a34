package graft.kafka

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger

/**
 * Leader failover: a rolling broker restart moves partition
 * leadership MID-READ, and the read must re-resolve and complete with
 * every record exactly once — the regime a long batch read of a big
 * topic meets on any real cluster under routine maintenance. Both
 * failure shapes run e2e against a two-broker [[LoopbackCluster]]:
 * the old leader stays up answering NOT_LEADER_FOR_PARTITION (6), and
 * the old leader DIES (connections reset, metadata only reachable via
 * the surviving broker).
 */
class KafkaFailoverSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("withLeaderFailover: bounded retries on retryable errors, instant passthrough otherwise") {
    val cluster = new LoopbackCluster(Map("t" -> 1))
    try {
      val client = new KafkaWireClient(KafkaBatch.parseBrokers(cluster.bootstrapServers))
      try {
        // recovers once the underlying error clears
        var calls = 0
        val got = KafkaBatch.withLeaderFailover(client, maxRetries = 5, backoffMs = 0,
          KafkaBatch.retryableFetchError, "test") {
          calls += 1
          if (calls < 3) throw new KafkaProtocolException(6, "NOT_LEADER_FOR_PARTITION")
          "ok"
        }
        assert(got == "ok" && calls == 3)

        // retry budget is bounded: exhaustion surfaces the cause
        var always = 0
        val e = intercept[java.io.IOException] {
          KafkaBatch.withLeaderFailover(client, maxRetries = 2, backoffMs = 0,
            KafkaBatch.retryableFetchError, "t/0") {
            always += 1; throw new KafkaProtocolException(6, "still not leader")
          }
        }
        assert(always == 3 && e.getMessage.contains("leader-failover"))
        assert(e.getCause.isInstanceOf[KafkaProtocolException])

        // non-retryable protocol errors pass straight through (e.g.
        // OFFSET_OUT_OF_RANGE is data loss, not a leadership blip)
        var once = 0
        intercept[KafkaProtocolException] {
          KafkaBatch.withLeaderFailover(client, maxRetries = 5, backoffMs = 0,
            KafkaBatch.retryableFetchError, "t/0") {
            once += 1; throw new KafkaProtocolException(1, "OFFSET_OUT_OF_RANGE")
          }
        }
        assert(once == 1)
      } finally client.close()
    } finally cluster.close()
  }

  test("batch read survives a mid-fetch leadership migration (old leader answers NOT_LEADER), exactly once") {
    val cluster = new LoopbackCluster(Map("mig" -> 1), numBrokers = 2)
    try {
      // enough records that a 300-byte fetch window needs many pages
      val n = 80
      cluster.append("mig", 0,
        (0 until n).map(i => (b(s"k$i"), b(s"value-$i-" + "x" * 40))))
      assert(cluster.leaderId(0) == 0, "partition 0 must start on broker 0")

      // after the third fetch request, leadership moves to broker 1:
      // the old leader keeps serving — and starts answering 6
      val fetches = new AtomicInteger(0)
      cluster.onFetch = (t, p, _) =>
        if (t == "mig" && p == 0 && fetches.incrementAndGet() == 3)
          cluster.migrateLeader(0, 1)

      val df = KafkaBatch.read(spark, cluster.bootstrapServers, "mig",
        maxBytes = 300, failoverBackoffMs = 1)
      val rows = df.select(col("offset"), col("value").cast("string")).collect()
      assert(fetches.get() > 3, "the migration must have fired mid-read")
      assert(rows.length == n, s"exactly-once: expected $n rows, got ${rows.length}")
      assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until n.toLong),
        "every offset exactly once, no gaps, no duplicates")
      assert(rows.sortBy(_.getLong(0)).map(_.getString(1)).zipWithIndex
        .forall { case (v, i) => v.startsWith(s"value-$i-") })
    } finally cluster.close()
  }

  test("batch read survives the old leader DYING mid-fetch: re-bootstraps via the surviving broker") {
    val cluster = new LoopbackCluster(Map("die" -> 1), numBrokers = 2)
    try {
      val n = 60
      cluster.append("die", 0,
        (0 until n).map(i => (null: Array[Byte], b(s"rec-$i-" + "y" * 40))))

      // third fetch: leadership moves AND the old leader's sockets
      // reset (the crash shape — the client's in-flight request dies
      // with an IOException, and the dead broker must be SKIPPED
      // during metadata re-bootstrap)
      val fetches = new AtomicInteger(0)
      cluster.onFetch = (t, p, _) =>
        if (t == "die" && p == 0 && fetches.incrementAndGet() == 3) {
          cluster.migrateLeader(0, 1)
          cluster.brokers.head.close()
        }

      val df = KafkaBatch.read(spark, cluster.bootstrapServers, "die",
        maxBytes = 300, failoverBackoffMs = 1)
      val offsets = df.select("offset").collect().map(_.getLong(0)).sorted.toSeq
      assert(offsets == (0L until n.toLong),
        s"exactly-once through a leader crash: got ${offsets.size} offsets")
    } finally cluster.close()
  }

  test("produce survives a leadership migration: NOT_LEADER flushes re-resolve and land exactly once") {
    val cluster = new LoopbackCluster(Map("pw" -> 1), numBrokers = 2)
    try {
      val client = new KafkaWireClient(KafkaBatch.parseBrokers(cluster.bootstrapServers))
      try {
        val producer = new KafkaBatch.PartitionedProducer(client, "pw", 1,
          roundRobinSeed = 0, batchSize = 4, failoverBackoffMs = 1)
        (0 until 4).foreach(i => producer.send(null, b(s"before-$i")))
        // leadership moves between flushes; the old leader answers 6
        cluster.migrateLeader(0, 1)
        (0 until 4).foreach(i => producer.send(null, b(s"after-$i")))
        producer.flushAll()
      } finally client.close()
      val got = cluster.log("pw", 0).records.map(r => new String(r._3, "UTF-8"))
      assert(got.size == 8, s"exactly once through migration: $got")
      assert(got.toSet == ((0 until 4).map(i => s"before-$i") ++
        (0 until 4).map(i => s"after-$i")).toSet)
    } finally cluster.close()
  }

  test("streaming source reuses authenticated connections across triggers (no per-trigger SASL storm)") {
    KafkaClientPool.clear()
    val cluster = new LoopbackCluster(Map("amort" -> 2), sasl = Some(("svc", "pw")))
    try {
      cluster.append("amort", 0, Seq((null, b("seed-0"))))
      cluster.append("amort", 1, Seq((null, b("seed-1"))))
      val q = spark.readStream.format("graft.kafka.KafkaStreamProvider")
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "amort")
        .option("startingOffsets", "earliest")
        .option("kafka.security.protocol", "SASL_PLAINTEXT")
        .option("kafka.sasl.mechanism", "SCRAM-SHA-256")
        .option("kafka.sasl.username", "svc")
        .option("kafka.sasl.password", "pw")
        .load()
        .selectExpr("cast(value as string) as v")
        .writeStream.format("memory").queryName("amort_q").start()
      try {
        q.processAllAvailable()
        val afterFirst = cluster.saslAuthentications.get()
        assert(afterFirst >= 1, "the first trigger must have authenticated")
        // five more triggers, each with fresh data on both partitions:
        // pooled readers must NOT re-run the SCRAM exchange per
        // partition per trigger — the executor-side client pool holds
        // the authenticated connections between micro-batches
        (1 to 5).foreach { i =>
          cluster.append("amort", 0, Seq((null, b(s"m$i-0"))))
          cluster.append("amort", 1, Seq((null, b(s"m$i-1"))))
          q.processAllAvailable()
        }
        assert(spark.table("amort_q").count() == 12, "all records delivered")
        val afterSix = cluster.saslAuthentications.get()
        assert(afterSix == afterFirst,
          s"steady-state triggers re-authenticated: $afterFirst -> $afterSix " +
            "(readers must reuse pooled authenticated connections)")
      } finally q.stop()
    } finally {
      cluster.close()
      KafkaClientPool.clear()
    }
  }

  test("a programmatic SSLContext fails fast at plan time, not with NotSerializableException in a task") {
    val ctx = javax.net.ssl.SSLContext.getDefault
    val sec = KafkaSecurity(tlsContext = Some(ctx))
    val e = intercept[IllegalArgumentException](sec.requireSerializable("kafka batch scan"))
    assert(e.getMessage.contains("cannot be serialized") && e.getMessage.contains("tls=true"))
    // config-derived security never carries a context — always shippable
    KafkaSecurity.fromOptions(Map("kafka.security.protocol" -> "SSL"))
      .requireSerializable("ok")
  }

  test("KafkaBatch.read/write with a CAPTURED tlsContext fail at plan time with the clear message") {
    // the guard serializes the factory CLOSURE itself, BEFORE any
    // metadata call or task serialization — a bogus broker address
    // proves no connection is even attempted
    val ctx = javax.net.ssl.SSLContext.getDefault
    val factory = (bs: Seq[(String, Int)]) =>
      new KafkaWireClient(bs, security = KafkaSecurity(tlsContext = Some(ctx)))
    val eR = intercept[IllegalArgumentException](
      KafkaBatch.read(spark, "localhost:1", "t", clientFactory = factory))
    assert(eR.getMessage.contains("kafka batch read") &&
      eR.getMessage.contains("cannot be serialized") &&
      eR.getMessage.contains("INSIDE the factory lambda"), eR.getMessage)
    import spark.implicits._
    val df = Seq(("k", "v")).toDF("key", "value")
    val eW = intercept[IllegalArgumentException](
      KafkaBatch.write(df, "localhost:1", "t", clientFactory = factory))
    assert(eW.getMessage.contains("kafka batch write") &&
      eW.getMessage.contains("cannot be serialized"), eW.getMessage)
  }

  test("a factory that CONSTRUCTS its SSLContext inside the lambda passes the plan-time guard") {
    // each executor builds its own context when the factory re-runs
    // there — genuinely serializable, so rejecting it (the first r18
    // guard draft probed only the driver client's security) would
    // break a previously-working distributed TLS pattern
    val factory = (bs: Seq[(String, Int)]) =>
      new KafkaWireClient(bs, security =
        KafkaSecurity(tlsContext = Some(javax.net.ssl.SSLContext.getDefault)))
    KafkaBatch.requireShippableFactory(factory, "kafka batch read")
  }
}
