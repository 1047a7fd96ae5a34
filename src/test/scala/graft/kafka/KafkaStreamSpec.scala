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
