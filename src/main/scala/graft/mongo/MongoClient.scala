package graft.mongo

import java.time.LocalDate

import graft.pipeline.{BookkeeperStore, RunRecord}

/**
 * MongoDB wire-protocol client (reference: pramen/core
 * .../core/mongo/MongoDbConnection.scala + the mongo-scala-driver it
 * wraps): instead of the driver dependency, graft speaks the PUBLIC
 * wire protocol directly — `OP_MSG` (opcode 2013, the sole modern
 * message) framing one kind-0 BSON command section per request, per
 * the MongoDB specification. Commands used: `insert`, `find` +
 * `getMore` (cursor batches), `createIndexes`, `ping`.
 *
 * Scope: unauthenticated connections (SCRAM auth is a deploy-time
 * concern behind the same socket; the reference connection string
 * carries credentials the same way). The zero-egress environment
 * drives every frame against a scripted in-process server speaking
 * the same protocol — the M42 raw-socket SMTP discipline.
 */
final class MongoClient(host: String, port: Int, timeoutMs: Int = 30000) extends AutoCloseable {

  private val socket = new java.net.Socket()
  socket.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val in = new java.io.DataInputStream(
    new java.io.BufferedInputStream(socket.getInputStream))
  private val out = new java.io.BufferedOutputStream(socket.getOutputStream)
  private val reqId = new java.util.concurrent.atomic.AtomicInteger(1)

  override def close(): Unit = socket.close()

  /** One OP_MSG round trip: header(16) + flagBits(0) + section kind 0
    * + command BSON; the reply's section 0 document is returned.
    * A reply with `ok != 1` throws with the server's error message. */
  def runCommand(db: String, command: Seq[(String, Any)]): Map[String, Any] = synchronized {
    val body = Bson.encode(command :+ ("$db" -> db))
    val total = 16 + 4 + 1 + body.length
    val header = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      header.write(v & 0xFF); header.write((v >> 8) & 0xFF)
      header.write((v >> 16) & 0xFF); header.write((v >> 24) & 0xFF)
    }
    i32(total); i32(reqId.getAndIncrement()); i32(0); i32(2013) // OP_MSG
    i32(0) // flagBits
    out.write(header.toByteArray)
    out.write(0) // section kind 0
    out.write(body)
    out.flush()

    // reply: header(16) + flags(4) + kind(1) + doc
    val replyHeader = new Array[Byte](16 + 4 + 1)
    in.readFully(replyHeader)
    val msgLen = Bson.readInt32(replyHeader, 0)
    val opCode = Bson.readInt32(replyHeader, 12)
    require(opCode == 2013, s"MongoClient: unexpected reply opcode $opCode")
    val kind = replyHeader(20) & 0xFF
    require(kind == 0, s"MongoClient: unexpected reply section kind $kind")
    val docBytes = new Array[Byte](msgLen - 21)
    in.readFully(docBytes)
    val (doc, _) = Bson.decode(docBytes)
    doc.get("ok") match {
      case Some(d: Double) if d == 1.0 => doc
      case Some(i: Int) if i == 1 => doc
      case _ => throw new RuntimeException(
        s"MongoClient: command failed: ${doc.getOrElse("errmsg", doc)}")
    }
  }

  def ping(db: String): Unit = { runCommand(db, Seq("ping" -> 1)); () }

  def insert(db: String, collection: String, docs: Seq[Seq[(String, Any)]]): Unit = {
    val resp = runCommand(db, Seq(
      "insert" -> collection,
      "documents" -> docs.map(Bson.Doc).toList))
    // MongoDB reports per-document failures (validation, unique-index
    // clashes) in writeErrors ALONGSIDE ok:1 — swallowing them would
    // silently lose run records
    resp.get("writeErrors") match {
      case Some(errs: List[_]) if errs.nonEmpty =>
        throw new RuntimeException(s"MongoClient: insert failed: $errs")
      case _ => ()
    }
  }

  /** find + getMore until the cursor drains — a query never silently
    * truncates at the first batch. */
  def find(db: String, collection: String,
           filter: Seq[(String, Any)] = Nil): Seq[Map[String, Any]] = {
    val results = Seq.newBuilder[Map[String, Any]]
    var resp = runCommand(db, Seq(
      "find" -> collection,
      "filter" -> Bson.Doc(filter)))
    var cursor = resp("cursor").asInstanceOf[Map[String, Any]]
    results ++= cursor("firstBatch").asInstanceOf[List[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    var cursorId = cursor("id").asInstanceOf[Long]
    while (cursorId != 0L) {
      resp = runCommand(db, Seq("getMore" -> cursorId, "collection" -> collection))
      cursor = resp("cursor").asInstanceOf[Map[String, Any]]
      results ++= cursor("nextBatch").asInstanceOf[List[Any]]
        .map(_.asInstanceOf[Map[String, Any]])
      cursorId = cursor("id").asInstanceOf[Long]
    }
    results.result()
  }

  def createIndex(db: String, collection: String,
                  keys: Seq[(String, Int)], name: String,
                  unique: Boolean = false): Unit = {
    runCommand(db, Seq(
      "createIndexes" -> collection,
      "indexes" -> List(Bson.Doc(Seq(
        "key" -> Bson.Doc(keys.map { case (k, v) => k -> v }),
        "name" -> name) ++ (if (unique) Seq("unique" -> true) else Nil)))))
    ()
  }

  /** Insert one document; false when a unique index rejects it
    * (duplicate key, server code 11000) — the arbitration signal
    * [[TokenLockMongo]] relies on. Any OTHER write error still throws:
    * reporting an unreachable or misconfigured server as "lock held"
    * would silently skip every task in the fleet. */
  def tryInsert(db: String, collection: String, doc: Seq[(String, Any)]): Boolean = {
    val resp = runCommand(db, Seq(
      "insert" -> collection,
      "documents" -> List(Bson.Doc(doc))))
    resp.get("writeErrors") match {
      case Some(errs: List[_]) if errs.nonEmpty =>
        val dup = errs.forall {
          case m: Map[_, _] =>
            m.asInstanceOf[Map[String, Any]].get("code")
              .exists(c => c.isInstanceOf[Number] && c.asInstanceOf[Number].intValue == 11000)
          case _ => false
        }
        if (dup) false
        else throw new RuntimeException(s"MongoClient: insert failed: $errs")
      case _ => true
    }
  }

  /** Delete every document matching `filter`; returns the deleted
    * count (the server's `n`). */
  def delete(db: String, collection: String, filter: Seq[(String, Any)]): Int = {
    val resp = runCommand(db, Seq(
      "delete" -> collection,
      "deletes" -> List(Bson.Doc(Seq("q" -> Bson.Doc(filter), "limit" -> 0)))))
    resp.get("writeErrors") match {
      case Some(errs: List[_]) if errs.nonEmpty =>
        throw new RuntimeException(s"MongoClient: delete failed: $errs")
      case _ => ()
    }
    resp.get("n").collect { case n: Number => n.intValue }.getOrElse(0)
  }
}

/**
 * MongoDB-arbitrated run lock (reference: pramen/core
 * .../core/lock/TokenLockMongoDb.scala): a UNIQUE index on `token`
 * makes acquisition one insert — the database rejects the loser with
 * duplicate-key 11000, the same atomic-arbiter role the FS lock's
 * file-create and the JDBC lock's PRIMARY KEY INSERT play. Stale-break
 * deletes ONLY the exact observed (token, owner, acquiredAtMs) triple
 * before re-inserting (a holder that refreshed, or a third party that
 * broke-and-re-acquired between our read and delete, is never
 * touched); release is owner-predicated for the same reason —
 * byte-for-byte the `rdb.TokenLockJdbc` contract over the wire client.
 */
final class TokenLockMongo(client: MongoClient, db: String, token: String,
                           collection: String = "locks",
                           staleMs: Long = 4L * 3600 * 1000,
                           nowMs: () => Long = () => System.currentTimeMillis(),
                           ensureIndex: Boolean = true)
    extends graft.pipeline.RunLock {
  private val ownerId = java.util.UUID.randomUUID().toString
  if (ensureIndex)
    client.createIndex(db, collection, Seq("token" -> 1), "graft_lock_token", unique = true)

  private def insertFresh(): Boolean =
    client.tryInsert(db, collection,
      Seq("token" -> token, "owner" -> ownerId, "acquiredAtMs" -> nowMs()))

  override def tryAcquire(): Boolean =
    if (insertFresh()) true
    else {
      client.find(db, collection, Seq("token" -> token)).headOption match {
        case Some(doc) if nowMs() -
            doc("acquiredAtMs").asInstanceOf[Number].longValue > staleMs =>
          // predicated break: all three fields must still match the
          // acquisition we judged stale, then the unique index
          // arbitrates the re-insert race against other breakers
          val n = client.delete(db, collection, Seq(
            "token" -> token, "owner" -> doc("owner"),
            "acquiredAtMs" -> doc("acquiredAtMs")))
          n > 0 && insertFresh()
        case Some(_) => false
        case None =>
          // holder released between our failed insert and the probe —
          // one fresh attempt disambiguates (TokenLockJdbc retryOnVanish)
          insertFresh()
      }
    }

  override def release(): Unit = {
    // owner-predicated: never free a lock someone else re-acquired
    client.delete(db, collection, Seq("token" -> token, "owner" -> ownerId))
    ()
  }
}

/**
 * BookkeeperStore over MongoDB (reference: core/bookkeeper/
 * BookkeeperMongoDb.scala:45 — `bookkeeping` collection indexed on
 * (tableName, infoDate), every attempt inserted, newest wins on
 * read). Reads re-query per call for cross-driver visibility, filters
 * ride the indexed `tableName` key server-side, and the per-table
 * newest-per-date reduction happens on the bounded result.
 */
final class BookkeeperMongo(client: MongoClient, db: String,
                            collection: String = "bookkeeping") extends BookkeeperStore with graft.pipeline.SeqJournalSemantics {

  client.createIndex(db, collection,
    Seq("tableName" -> 1, "infoDate" -> 1), "graft_bk_idx")

  override def record(r: RunRecord): Unit =
    client.insert(db, collection, Seq(Seq(
      "tableName" -> r.table,
      "infoDate" -> r.infoDate.toString,
      "recordCount" -> r.recordCount,
      "status" -> r.status,
      "startedAtMs" -> r.startedAtMs,
      "finishedAtMs" -> r.finishedAtMs)))

  // numeric fields coerce via Number: a foreign writer (mongosh
  // NumberInt fix-ups, other tooling) may store int32 where graft
  // writes int64, and one such document must not poison every read
  private def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()

  private def toRecord(doc: Map[String, Any]): RunRecord = RunRecord(
    doc("tableName").asInstanceOf[String],
    LocalDate.parse(doc("infoDate").asInstanceOf[String]),
    asLong(doc("recordCount")),
    doc("status").asInstanceOf[String],
    asLong(doc("startedAtMs")),
    asLong(doc("finishedAtMs")))

  override protected def recordsFor(table: String,
                                    infoDate: Option[LocalDate]): Seq[RunRecord] = {
    // the date filter pushes into the (tableName, infoDate) index
    val filter = Seq("tableName" -> table) ++
      infoDate.map(d => "infoDate" -> d.toString)
    client.find(db, collection, filter).map(toRecord)
  }

  override protected def allRecords: Seq[RunRecord] =
    client.find(db, collection).map(toRecord)
}

/**
 * Append-only task journal in MongoDB (reference: pramen/core
 * .../core/journal/JournalMongoDb.scala — the journal lives in the
 * SAME store as bookkeeping, so a mongo-bookkeeping fleet never
 * splits its audit trail across backends). Same
 * [[graft.pipeline.TaskJournal]] contract as the FS and JDBC
 * variants: EVERY event keeps a document, completion order is
 * (atMs, writerId, seq) — the FS file-name tuple — re-established on
 * read by a client-side sort (the read loads the full history by
 * contract, exactly like the FS reload, so the sort adds nothing).
 *
 * Time-window reads (r19, the reference `getEntries(from, to)`) push
 * the window into the server as a `{atMs: {$gte, $lte}}` find filter
 * riding the atMs index — created lazily on the first APPEND (r20:
 * a constructor-side createIndexes broke read-only users without
 * index privileges), months of history never cross the wire for a
 * one-night report. An unindexed window read is still CORRECT (the
 * server filters collection-side), just unaccelerated until a writer
 * first appends.
 */
final class JournalMongo(client: MongoClient, db: String,
                         collection: String = "journal")
    extends graft.pipeline.TaskJournal {
  import graft.pipeline.TaskEvent
  private val writerId = java.util.UUID.randomUUID().toString.take(8)
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)
  private val indexed = new java.util.concurrent.atomic.AtomicBoolean(false)

  // the atMs index is created LAZILY on first append (ADVICE r19: as
  // a constructor side effect, a read-only user without createIndex
  // privileges failed at construction where r18 worked — readers
  // never need the privilege, and writers fail on their first append
  // exactly as they would on any other authorization problem). The
  // flag flips only after success, so a transient failure retries.
  private def ensureIndex(): Unit =
    if (!indexed.get()) {
      client.createIndex(db, collection, Seq("atMs" -> 1), "atMs_1")
      indexed.set(true)
    }

  override def append(e: TaskEvent): Unit = {
    ensureIndex()
    client.insert(db, collection, Seq(Seq(
      "pipeline" -> e.pipeline,
      "job" -> e.job,
      "tableName" -> e.table,
      "infoDate" -> e.infoDate.map(_.toString).getOrElse(""),
      "status" -> e.status,
      "records" -> e.records,
      "detail" -> e.detail,
      "atMs" -> e.atMs,
      "writerId" -> writerId,
      "seq" -> seq.getAndIncrement())))
  }

  private def toEvents(docs: Seq[Map[String, Any]]): Seq[TaskEvent] = {
    def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()
    docs
      .sortBy(d => (asLong(d("atMs")), d("writerId").asInstanceOf[String],
        asLong(d("seq"))))
      .map { d =>
        val date = Option(d("infoDate").asInstanceOf[String]).filter(_.nonEmpty)
        TaskEvent(d("pipeline").asInstanceOf[String], d("job").asInstanceOf[String],
          d("tableName").asInstanceOf[String], date.map(java.time.LocalDate.parse),
          d("status").asInstanceOf[String], asLong(d("records")),
          d("detail").asInstanceOf[String], asLong(d("atMs")))
      }
  }

  override def all: Seq[TaskEvent] = toEvents(client.find(db, collection))

  override def entries(fromMs: Long, toMs: Long): Seq[TaskEvent] =
    toEvents(client.find(db, collection,
      Seq("atMs" -> Bson.Doc(Seq("$gte" -> fromMs, "$lte" -> toMs)))))
}
