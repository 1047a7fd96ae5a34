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
    /** Documents that crossed the wire in find/getMore batches — what
      * the journal window-pushdown spec counts. */
    var docsReturned = 0
    // collection -> unique key sets declared via createIndexes
    private val uniqueIdx = collection.mutable.Map.empty[String, List[Seq[String]]]
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
        val c = coll("insert")
        val uniq = uniqueIdx.getOrElse(cmd("insert").asInstanceOf[String], Nil)
        val docs = cmd("documents").asInstanceOf[List[Any]].map(_.asInstanceOf[Map[String, Any]])
        val errs = scala.collection.mutable.ArrayBuffer.empty[Any]
        var n = 0
        docs.zipWithIndex.foreach { case (doc, i) =>
          // unique-index enforcement (real mongod's E11000): reject the
          // doc, keep processing the rest, report in writeErrors
          val dup = uniq.exists(ks => c.exists(e => ks.forall(k => e.get(k) == doc.get(k))))
          if (dup) errs += Bson.Doc(Seq(
            "index" -> i, "code" -> 11000, "errmsg" -> "E11000 duplicate key error"))
          else { c += doc; n += 1 }
        }
        Seq("n" -> n) ++
          (if (errs.nonEmpty) Seq("writeErrors" -> errs.toList) else Nil) :+ ("ok" -> 1.0)
      } else if (cmd.contains("createIndexes")) {
        val cname = cmd("createIndexes").asInstanceOf[String]
        val idx = cmd("indexes").asInstanceOf[List[Any]].head.asInstanceOf[Map[String, Any]]
        indexes += idx("name").asInstanceOf[String]
        if (idx.get("unique").contains(true))
          uniqueIdx(cname) = uniqueIdx.getOrElse(cname, Nil) :+
            idx("key").asInstanceOf[Map[String, Any]].keys.toSeq
        Seq("ok" -> 1.0)
      } else if (cmd.contains("delete")) {
        val c = coll("delete")
        val del = cmd("deletes").asInstanceOf[List[Any]].head.asInstanceOf[Map[String, Any]]
        val q = del("q").asInstanceOf[Map[String, Any]]
        val (gone, kept) = c.partition(doc => q.forall { case (k, v) => doc.get(k).contains(v) })
        c.clear(); c ++= kept
        Seq("n" -> gone.size, "ok" -> 1.0)
      } else if (cmd.contains("find")) {
        val filter = cmd("filter").asInstanceOf[Map[String, Any]]
        // equality match, plus the {$gte,$lte} operator-document subset
        // the journal's pushed-down time window sends
        def matches(doc: Map[String, Any], k: String, v: Any): Boolean = v match {
          case ops: Map[_, _] =>
            val o = ops.asInstanceOf[Map[String, Any]]
            def num(x: Any) = x.asInstanceOf[Number].longValue()
            doc.get(k).exists(dv => o.forall {
              case ("$gte", b) => num(dv) >= num(b)
              case ("$lte", b) => num(dv) <= num(b)
              case (op, _) => sys.error(s"FakeMongod: unsupported operator $op")
            })
          case _ => doc.get(k).contains(v)
        }
        val hits = coll("find").filter(doc =>
          filter.forall { case (k, v) => matches(doc, k, v) }).toList
        val (first, rest) = hits.splitAt(batchSize)
        docsReturned += first.size
        val id = if (rest.nonEmpty) { cursors(nextCursor) = rest; nextCursor += 1; nextCursor - 1 } else 0L
        Seq("cursor" -> Bson.Doc(Seq(
          "firstBatch" -> first.map(toBson),
          "id" -> id,
          "ns" -> "test")), "ok" -> 1.0)
      } else if (cmd.contains("getMore")) {
        val id = cmd("getMore").asInstanceOf[Long]
        val (batch, rest) = cursors(id).splitAt(batchSize)
        docsReturned += batch.size
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
      val (bk, _, _) = parsed.mongoBookkeeping.getOrElse(fail("factory must be declared"))()
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

  test("token lock over the wire: unique-index arbitration, stale-break, owner-predicated release") {
    val srv = new FakeMongod()
    val c = new MongoClient("127.0.0.1", srv.port)
    try {
      var now = 1000L
      def lock() = new TokenLockMongo(c, "graft", "sales_2024-04-01",
        staleMs = 60000L, nowMs = () => now)
      val a = lock()
      assert(srv.indexes.contains("graft_lock_token"), "the unique token index must be created")
      assert(a.tryAcquire(), "first insert wins the unique index")
      val b = lock()
      assert(!b.tryAcquire(), "duplicate-key 11000 reads as held, not error")
      // release is owner-predicated: B cannot free A's lock
      b.release()
      assert(!lock().tryAcquire(), "B's release must not free A's lock")
      // past staleMs: predicated delete + re-insert takes over
      now += 61000L
      assert(b.tryAcquire(), "a stale lock is broken and re-acquired")
      a.release() // old owner: must not touch B's fresh row
      assert(!lock().tryAcquire(), "A's stale release must not free B's lock")
      b.release()
      assert(lock().tryAcquire(), "the owner's release frees the token")
    } finally { c.close(); srv.close() }
  }

  test("token lock: stale-break deletes only the exact observed acquisition") {
    val srv = new FakeMongod()
    val c = new MongoClient("127.0.0.1", srv.port)
    try {
      var now = 1000L
      val a = new TokenLockMongo(c, "graft", "t_d", staleMs = 1000L, nowMs = () => now)
      assert(a.tryAcquire())
      now += 5000L // stale
      // C breaks first; B's predicated delete (observing the ORIGINAL
      // acquisition) must remove nothing and B must not acquire
      val observed = c.find("graft", "locks", Seq("token" -> "t_d")).head
      assert(new TokenLockMongo(c, "graft", "t_d", staleMs = 1000L,
        nowMs = () => now).tryAcquire(), "C breaks the stale lock")
      val n = c.delete("graft", "locks", Seq("token" -> "t_d",
        "owner" -> observed("owner"), "acquiredAtMs" -> observed("acquiredAtMs")))
      assert(n == 0, "the predicated delete must miss once the row changed")
      assert(!new TokenLockMongo(c, "graft", "t_d", staleMs = 60000L,
        nowMs = () => now).tryAcquire(), "C's fresh lock holds")
    } finally { c.close(); srv.close() }
  }

  test("journal over the wire: every event keeps a document, completion order across writers") {
    import graft.pipeline.TaskEvent
    val srv = new FakeMongod()
    val c = new MongoClient("127.0.0.1", srv.port)
    try {
      val a = new JournalMongo(c, "graft")
      val b = new JournalMongo(c, "graft")
      a.append(TaskEvent("p", "j1", "t", Some(d), "succeeded", 10L, "", 100L))
      b.append(TaskEvent("p", "j2", "t", Some(d), "failed", 0L, "boom \"q\" \\b", 200L))
      a.append(TaskEvent("p", "j1", "t", Some(d), "succeeded", 12L, "re-run", 300L))
      b.append(TaskEvent("p", "j3", "t", None, "skipped", 0L, "done", 250L))
      val all = new JournalMongo(c, "graft").all
      assert(all.map(_.job) == Seq("j1", "j2", "j3", "j1"), all.map(_.job).toString)
      assert(all.count(_.job == "j1") == 2, "re-runs must both stay visible")
      assert(all(2).infoDate.isEmpty)
      assert(all(1).detail == "boom \"q\" \\b", "BSON carries the bytes verbatim, no escaping layer")
    } finally { c.close(); srv.close() }
  }

  test("journal window: entries(from,to) pushes an atMs find filter - months never cross the wire") {
    import graft.pipeline.TaskEvent
    val srv = new FakeMongod()
    val c = new MongoClient("127.0.0.1", srv.port)
    try {
      val (a, b) = (new JournalMongo(c, "graft"), new JournalMongo(c, "graft"))
      // ADVICE r19: construction is index-free (a read-only user
      // without createIndex privileges must not fail here); the index
      // rides the first APPEND instead
      assert(!srv.indexes.contains("atMs_1"),
        "construction must not run createIndexes (read-only users)")
      a.append(TaskEvent("p", "warm", "t", None, "succeeded", 0L, "", 1L))
      assert(srv.indexes.contains("atMs_1"), "the window filter must have an index to ride")
      val day = 86400000L
      val base = 1700000000000L
      (0 until 200).foreach { i =>
        val w = if (i % 2 == 0) a else b
        w.append(TaskEvent("p", s"j$i", "t", None, "succeeded", i.toLong, "", base + i * (day / 2)))
      }
      val (fromMs, toMs) = (base + 40 * day, base + 41 * day)
      val before = srv.docsReturned
      val win = new JournalMongo(c, "graft").entries(fromMs, toMs)
      val wireDocs = srv.docsReturned - before
      val expect = (0 until 200).filter(i =>
        base + i * (day / 2) >= fromMs && base + i * (day / 2) <= toMs)
      assert(win.map(_.records) == expect.map(_.toLong), win.map(_.records).toString)
      assert(wireDocs == expect.size,
        s"window read must not reload history: $wireDocs docs for ${expect.size} events")
      assert(win == win.sortBy(_.atMs), "completion order")
      assert(new JournalMongo(c, "graft").entries(5, 1).isEmpty)
    } finally { c.close(); srv.close() }
  }

  test("token lock: 8-way same-token race admits exactly one winner; outage is an error") {
    val srv = new FakeMongod()
    val c = new MongoClient("127.0.0.1", srv.port)
    try {
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 8).map { _ =>
        new Thread(() => {
          if (new TokenLockMongo(c, "graft", "hot_2024-04-01",
              ensureIndex = false).tryAcquire())
            wins.incrementAndGet()
        })
      }
      // index first (the racers skip ensure — resolution does it once)
      c.createIndex("graft", "locks", Seq("token" -> 1), "graft_lock_token", unique = true)
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(wins.get == 1, s"exactly one of 8 racers must win, got ${wins.get}")
      // outage: a dead server surfaces as an exception, never as 'held'
      srv.close(); c.close()
      intercept[Exception] {
        new TokenLockMongo(c, "graft", "t2", ensureIndex = false).tryAcquire()
      }
    } finally { c.close(); srv.close() }
  }
}
