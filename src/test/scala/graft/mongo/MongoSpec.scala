package graft.mongo

import java.time.LocalDate

import graft.pipeline.RunRecord
import org.scalatest.funsuite.AnyFunSuite

/** Mongo wire protocol + bookkeeper: the BSON codec pinned against
  * the bsonspec.org canonical byte vector (external ground truth, not
  * a self-round-trip), OP_MSG framing driven against a scripted
  * in-process server (the raw-socket SMTP discipline), cursor
  * batching via getMore, and the BookkeeperStore semantics. */
class MongoSpec extends AnyFunSuite {

  private val d = LocalDate.parse("2024-04-01")

  test("BSON: the bsonspec.org canonical {\"hello\": \"world\"} vector, both directions") {
    val expected = Array(
      0x16, 0x00, 0x00, 0x00, 0x02, 'h', 'e', 'l', 'l', 'o', 0x00,
      0x06, 0x00, 0x00, 0x00, 'w', 'o', 'r', 'l', 'd', 0x00, 0x00
    ).map(_.toByte)
    val got = Bson.encode(Seq("hello" -> "world"))
    assert(java.util.Arrays.equals(got, expected),
      s"encode drifted: ${got.map(b => f"${b & 0xFF}%02x").mkString(" ")}")
    val (doc, end) = Bson.decode(expected)
    assert(doc == Map("hello" -> "world") && end == expected.length)
  }

  test("BSON: int32/int64/double/bool/null/array/embedded-doc round-trip with exact types") {
    val doc = Seq(
      "i" -> 42, "l" -> 9876543210L, "dd" -> 2.5, "t" -> true, "n" -> null,
      "arr" -> List("a", 7), "sub" -> Bson.Doc(Seq("k" -> "v")))
    val (back, _) = Bson.decode(Bson.encode(doc))
    assert(back("i") == 42 && back("l") == 9876543210L && back("dd") == 2.5)
    assert(back("t") == true && back("n") == null)
    assert(back("arr") == List("a", 7))
    assert(back("sub") == Map("k" -> "v"))
  }

  /** Scripted mongod subset: OP_MSG only, commands ping / insert /
    * find / getMore / createIndexes; cursors batch at `batchSize` so
    * getMore is actually exercised. */
  private final class FakeMongod(batchSize: Int = 1000) {
    val collections = collection.mutable.Map.empty[String, collection.mutable.ArrayBuffer[Map[String, Any]]]
    val indexes = collection.mutable.ArrayBuffer.empty[String]
    // cursor id -> (remaining hits) — explicit lists, not iterators
    // (an Iterator after take() is contractually unusable)
    private val cursors = collection.mutable.Map.empty[Long, List[Map[String, Any]]]
    private var nextCursor = 1L
    private val server = new java.net.ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort

    private def toBson(v: Any): Any = v match {
      case m: Map[_, _] => Bson.Doc(m.asInstanceOf[Map[String, Any]].toSeq)
      case l: List[_] => l.map(toBson)
      case other => other
    }

    private val thread = new Thread(() => {
      try {
        val sock = server.accept()
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        while (true) {
          val header = new Array[Byte](16 + 4 + 1)
          in.readFully(header)
          val len = Bson.readInt32(header, 0)
          val reqId = Bson.readInt32(header, 4)
          val body = new Array[Byte](len - 21)
          in.readFully(body)
          val (cmd, _) = Bson.decode(body)
          val reply: Seq[(String, Any)] = handle(cmd)
          val rbody = Bson.encode(reply)
          val h = new java.io.ByteArrayOutputStream()
          def i32(v: Int): Unit = { h.write(v & 0xFF); h.write((v >> 8) & 0xFF); h.write((v >> 16) & 0xFF); h.write((v >> 24) & 0xFF) }
          i32(16 + 4 + 1 + rbody.length); i32(99); i32(reqId); i32(2013); i32(0)
          out.write(h.toByteArray); out.write(0); out.write(rbody); out.flush()
        }
      } catch { case _: Throwable => () } // socket closed at teardown
    })
    thread.setDaemon(true); thread.start()

    private def handle(cmd: Map[String, Any]): Seq[(String, Any)] = {
      def coll(key: String) = collections.getOrElseUpdate(
        cmd(key).asInstanceOf[String], collection.mutable.ArrayBuffer.empty)
      if (cmd.contains("ping")) Seq("ok" -> 1.0)
      else if (cmd.contains("insert")) {
        val docs = cmd("documents").asInstanceOf[List[Any]].map(_.asInstanceOf[Map[String, Any]])
        coll("insert") ++= docs
        Seq("n" -> docs.length, "ok" -> 1.0)
      } else if (cmd.contains("createIndexes")) {
        indexes += cmd("indexes").asInstanceOf[List[Any]].head
          .asInstanceOf[Map[String, Any]]("name").asInstanceOf[String]
        Seq("ok" -> 1.0)
      } else if (cmd.contains("find")) {
        val filter = cmd("filter").asInstanceOf[Map[String, Any]]
        val hits = coll("find").filter(doc => filter.forall { case (k, v) => doc.get(k).contains(v) }).toList
        val (first, rest) = hits.splitAt(batchSize)
        val id = if (rest.nonEmpty) { cursors(nextCursor) = rest; nextCursor += 1; nextCursor - 1 } else 0L
        Seq("cursor" -> Bson.Doc(Seq(
          "firstBatch" -> first.map(toBson),
          "id" -> id,
          "ns" -> "test")), "ok" -> 1.0)
      } else if (cmd.contains("getMore")) {
        val id = cmd("getMore").asInstanceOf[Long]
        val (batch, rest) = cursors(id).splitAt(batchSize)
        val nid = if (rest.nonEmpty) { cursors(id) = rest; id } else { cursors.remove(id); 0L }
        Seq("cursor" -> Bson.Doc(Seq(
          "nextBatch" -> batch.map(toBson),
          "id" -> nid,
          "ns" -> "test")), "ok" -> 1.0)
      } else Seq("ok" -> 0.0, "errmsg" -> s"unknown command: ${cmd.keys.mkString(",")}")
    }

    def close(): Unit = server.close()
  }

  test("config: bookkeeping.mongodb.uri resolves a live store against the scripted server; bad uris fail the load") {
    val srv = new FakeMongod()
    try {
      val parsed = graft.pipeline.PipelineConfig.parse(
        s"""bookkeeping.mongodb.uri = mongodb://127.0.0.1:${srv.port}/graftdb
           |allow.empty.pipeline = true
           |""".stripMargin)
      val bk = parsed.mongoBookkeeping.getOrElse(fail("factory must be declared"))()
      bk.record(RunRecord("t", d, 5, "succeeded", 1, 2))
      assert(bk.isAlreadyRan("t", d))
      assert(srv.collections("bookkeeping").nonEmpty, "the record must land over the wire")
      val e = intercept[IllegalArgumentException](graft.pipeline.PipelineConfig.parse(
        "bookkeeping.mongodb.uri = mongodb://host:27017\nallow.empty.pipeline = true\n"))
      assert(e.getMessage.contains("database name"), e.getMessage)
    } finally srv.close()
  }

  test("client: ping, insert, filtered find against the scripted server; errors surface") {
    val srv = new FakeMongod()
    val c = new MongoClient("127.0.0.1", srv.port)
    try {
      c.ping("graft")
      c.insert("graft", "docs", Seq(Seq("a" -> 1L, "b" -> "x"), Seq("a" -> 2L, "b" -> "y")))
      val hits = c.find("graft", "docs", Seq("b" -> "y"))
      assert(hits.map(_("a")) == Seq(2L), hits.toString)
      assert(c.find("graft", "docs").size == 2)
      val e = intercept[RuntimeException](c.runCommand("graft", Seq("bogus" -> 1)))
      assert(e.getMessage.contains("unknown command"), e.getMessage)
    } finally { c.close(); srv.close() }
  }

  test("bookkeeper over the wire: index created, newest wins, skip-if-done, getMore pagination") {
    val srv = new FakeMongod(batchSize = 5)
    val c = new MongoClient("127.0.0.1", srv.port)
    try {
      val bk = new BookkeeperMongo(c, "graft")
      assert(srv.indexes.contains("graft_bk_idx"), "the (tableName, infoDate) index must be created")
      bk.record(RunRecord("t", d, 1, "failed", 1, 100))
      bk.record(RunRecord("t", d, 2, "succeeded", 2, 200))
      (0 until 17).foreach(i =>
        bk.record(RunRecord("t", d.plusDays(i.toLong + 1), i.toLong, "succeeded", 1, 1)))
      assert(bk.get("t", d).map(_.recordCount).contains(2L), "newest attempt wins")
      assert(bk.isAlreadyRan("t", d))
      assert(bk.latestSuccess("t").contains(d.plusDays(17)),
        "a 19-attempt journal must read past the 5-doc cursor batches")
      assert(bk.all.size == 18)
      assert(bk.latestSuccessRecord("t", d).map(_.recordCount).contains(2L))
    } finally { c.close(); srv.close() }
  }
}
