package graft.kafka

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structured Streaming over the wire client: micro-batch planning,
  * checkpointed offsets, exactly-once file-sink delivery across
  * restarts — all against the loopback cluster. */
class KafkaStreamSpec extends SparkSpec {

  private val fmt = "graft.kafka.KafkaStreamProvider"
  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("KafkaSourceOffset json round trip matches the per-partition spelling") {
    val o = KafkaSourceOffset(Map(1 -> 7L, 0 -> 12L))
    assert(o.json == """{"0":12,"1":7}""")
    assert(KafkaSourceOffset.fromJson(o.json) == o)
  }

  test("micro-batches deliver the topic tail per trigger, one input partition per topic partition") {
    val cluster = new LoopbackCluster(Map("s" -> 2))
    try {
      cluster.append("s", 0, Seq((b("k"), b("m0"))), timestamp = 1000L)
      cluster.append("s", 1, Seq((null, b("m1"))), timestamp = 2000L)
      val stream = spark.readStream.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "s")
        .option("startingOffsets", "earliest")
        .load()
      assert(stream.schema == KafkaBatch.kafkaSchema)
      val q = stream.selectExpr("cast(value as string) as v", "partition", "offset")
        .writeStream.format("memory").queryName("kstream").outputMode("append").start()
      try {
        q.processAllAvailable()
        val got1 = spark.table("kstream").collect()
        assert(got1.map(_.getString(0)).sorted.toSeq == Seq("m0", "m1"))

        // second trigger sees only the delta
        cluster.append("s", 0, Seq((null, b("m2"))))
        q.processAllAvailable()
        val got2 = spark.table("kstream").collect()
        assert(got2.length == 3)
        assert(got2.map(_.getString(0)).count(_ == "m2") == 1, "delta delivered exactly once")

        // idle trigger adds nothing
        q.processAllAvailable()
        assert(spark.table("kstream").count() == 3)
      } finally q.stop()
    } finally cluster.close()
  }

  test("checkpointed restart resumes from committed offsets: exactly-once into a file sink") {
    val cluster = new LoopbackCluster(Map("cp" -> 2))
    try {
      val out = tmpDir("kstream_out_")
      val ckpt = tmpDir("kstream_ckpt_")
      def run(): Unit = {
        val q = spark.readStream.format(fmt)
          .option("kafka.bootstrap.servers", cluster.bootstrapServers)
          .option("subscribe", "cp")
          .option("startingOffsets", "earliest")
          .load()
          .selectExpr("cast(value as string) as v", "offset", "partition")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      cluster.append("cp", 0, Seq((null, b("a")), (null, b("b"))))
      cluster.append("cp", 1, Seq((null, b("c"))))
      run()
      cluster.append("cp", 0, Seq((null, b("d"))))
      cluster.append("cp", 1, Seq((null, b("e")), (null, b("f"))))
      run()
      val rows = spark.read.parquet(out).collect()
      assert(rows.length == 6, s"exactly-once delivery expected 6 rows, got ${rows.length}")
      assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c", "d", "e", "f"))
    } finally cluster.close()
  }

  test("the same provider serves one-shot batch reads") {
    val cluster = new LoopbackCluster(Map("bt" -> 1))
    try {
      cluster.append("bt", 0, Seq((b("x"), b("one")), (null, b("two"))))
      val df = spark.read.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "bt")
        .load()
      assert(df.schema == KafkaBatch.kafkaSchema)
      assert(df.select(col("value").cast("string")).collect().map(_.getString(0)).sorted.toSeq ==
        Seq("one", "two"))
      assert(df.where(col("offset") === 1L).count() == 1)
    } finally cluster.close()
  }

  test("SASL options ride the DataFrame reader/writer into every executor-side client") {
    // a SASL_PLAINTEXT cluster serving zstd batches: the stream source's
    // planner client, each partition reader, AND the stream writer must
    // all authenticate from the kafka.sasl.* options (the config-derived
    // KafkaSecurity serializes into the input partitions)
    val cluster = new LoopbackCluster(Map("sec" -> 2),
      sasl = Some(("svc", "pw")), fetchCodec = 4)
    try {
      cluster.append("sec", 0, Seq((b("k"), b("locked-0"))))
      cluster.append("sec", 1, Seq((null, b("locked-1"))))
      val df = spark.read.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "sec")
        .option("kafka.security.protocol", "SASL_PLAINTEXT")
        .option("kafka.sasl.mechanism", "SCRAM-SHA-256")
        .option("kafka.sasl.username", "svc")
        .option("kafka.sasl.password", "pw")
        .load()
      assert(df.select(col("value").cast("string")).collect().map(_.getString(0)).sorted.toSeq ==
        Seq("locked-0", "locked-1"))
      // without credentials the same read fails loudly (connection cut)
      val naked = spark.read.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "sec")
        .load()
      intercept[Exception](naked.collect())
      // write path: produce through the sink with the same options
      import spark.implicits._
      Seq(("wk", "written")).toDF("key", "value")
        .write.format(fmt).mode("append")
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("topic", "sec")
        .option("kafka.security.protocol", "SASL_PLAINTEXT")
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.username", "svc")
        .option("kafka.sasl.password", "pw")
        .save()
      val all = spark.read.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "sec")
        .option("kafka.security.protocol", "SASL_PLAINTEXT")
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.username", "svc")
        .option("kafka.sasl.password", "pw")
        .load()
      assert(all.where(col("value").cast("string") === "written").count() == 1)
    } finally cluster.close()
  }

  test("streaming rows carry usable kafka metadata: timestamps in millis, topic, types") {
    val cluster = new LoopbackCluster(Map("md" -> 1))
    try {
      cluster.append("md", 0, Seq((b("kk"), b("vv"))), timestamp = 1723650000000L)
      val q = spark.readStream.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "md")
        .load()
        .writeStream.format("memory").queryName("kmd").start()
      try {
        q.processAllAvailable()
        val r = spark.table("kmd").head()
        assert(new String(r.getAs[Array[Byte]]("key"), "UTF-8") == "kk")
        assert(r.getAs[String]("topic") == "md")
        assert(r.getAs[java.sql.Timestamp]("timestamp").getTime == 1723650000000L)
        assert(r.getAs[Int]("timestampType") == 0)
      } finally q.stop()
    } finally cluster.close()
  }
}

/** Write side of the V2 provider: streaming and batch produce. */
class KafkaStreamWriteSpec extends SparkSpec {

  private val fmt = "graft.kafka.KafkaStreamProvider"

  test("writeStream produces micro-batches to the topic: keyed murmur2 routing, keyless round-robin") {
    val cluster = new LoopbackCluster(Map("wout" -> 4))
    try {
      val src = tmpDir("kwrite_src_")
      val ckpt = tmpDir("kwrite_ckpt_")
      import spark.implicits._
      Seq(("alpha", "v-alpha"), ("beta", "v-beta"), (null, "v-nokey"))
        .toDF("key", "value")
        .write.mode("overwrite").parquet(src)
      val q = spark.readStream.schema("key string, value string").parquet(src)
        .writeStream.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("topic", "wout")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
      val all = (0 until 4).flatMap(p =>
        cluster.log("wout", p).records.map(r => (p, Option(r._2).map(new String(_, "UTF-8")),
          new String(r._3, "UTF-8"))))
      assert(all.size == 3, s"expected 3 records, got $all")
      Seq("alpha", "beta").foreach { k =>
        val expected = KafkaWire.partitionForKey(k.getBytes("UTF-8"), 4)
        assert(all.contains((expected, Some(k), s"v-$k")),
          s"key $k must land on murmur2 partition $expected: $all")
      }
      assert(all.exists(r => r._2.isEmpty && r._3 == "v-nokey"))
    } finally cluster.close()
  }

  test("batch df.write produces; the records read back through the same provider") {
    val cluster = new LoopbackCluster(Map("bw" -> 2))
    try {
      import spark.implicits._
      Seq(("k1", "first"), ("k2", "second")).toDF("key", "value")
        .write.format(fmt).mode("append")
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("topic", "bw")
        .save()
      val back = spark.read.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "bw")
        .load()
      assert(back.selectExpr("cast(value as string)").collect()
        .map(_.getString(0)).sorted.toSeq == Seq("first", "second"))
    } finally cluster.close()
  }

  test("a write without a value column fails actionably") {
    val cluster = new LoopbackCluster(Map("nv" -> 1))
    try {
      import spark.implicits._
      val e = intercept[Exception] {
        Seq(("only", "wrong")).toDF("a", "b")
          .write.format(fmt).mode("append")
          .option("kafka.bootstrap.servers", cluster.bootstrapServers)
          .option("topic", "nv")
          .save()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("value")), chain(e).mkString(" | "))
    } finally cluster.close()
  }
}

/** Admission control: maxOffsetsPerTrigger caps each micro-batch. */
class KafkaStreamRateSpec extends SparkSpec {
  private val fmt = "graft.kafka.KafkaStreamProvider"
  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("a backlog drains in capped micro-batches, proportional across partitions, nothing lost") {
    val cluster = new LoopbackCluster(Map("rl" -> 2))
    try {
      // 30-record backlog: 20 on partition 0, 10 on partition 1
      cluster.append("rl", 0, (1 to 20).map(i => (null: Array[Byte], b(s"p0-$i"))))
      cluster.append("rl", 1, (1 to 10).map(i => (null: Array[Byte], b(s"p1-$i"))))
      val progress = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format(fmt)
        .option("kafka.bootstrap.servers", cluster.bootstrapServers)
        .option("subscribe", "rl")
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", "9")
        .load()
        .writeStream.format("memory").queryName("krl").start()
      try {
        q.processAllAvailable()
        val batches = q.recentProgress.filter(_.numInputRows > 0)
        batches.foreach(p => progress += p.numInputRows)
        assert(spark.table("krl").count() == 30, "the whole backlog must drain")
        assert(progress.forall(_ <= 9 + 2), s"micro-batches must respect the cap (+1/partition floor): $progress")
        assert(progress.length >= 3, s"a 30-row backlog at cap 9 needs several triggers: $progress")
      } finally q.stop()
    } finally cluster.close()
  }
}
