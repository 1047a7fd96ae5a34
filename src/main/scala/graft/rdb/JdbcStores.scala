package graft.rdb

import graft.offset.OffsetValue
import graft.pipeline.{BookkeeperStore, RunRecord}

import java.time.LocalDate

/**
 * RDBMS-backed bookkeeping (reference: pramen/core
 * .../core/bookkeeper/BookkeeperJdbc.scala:342): fleets of pipeline
 * drivers coordinate skip-if-done / catch-up state through a shared
 * database instead of a shared filesystem. Same [[BookkeeperStore]]
 * contract as the FS [[graft.pipeline.Bookkeeper]], so the
 * orchestrator is storage-agnostic.
 *
 * Every value position is a `?` bind parameter (the reference uses
 * parameterized Slick queries throughout) — table names and offsets
 * are data-derived strings and must never be spliced into SQL text.
 *
 * Writes are last-write-wins per (table, info_date) — DELETE + INSERT
 * in favor of engine-specific upsert syntax, since each statement
 * autocommits and a lost race between the two leaves the newer
 * record, which is the FS store's newest-file-wins semantics anyway.
 * Reads hit the database every time: cross-driver visibility is the
 * point of the JDBC variant, a warm cache would defeat it.
 */
final class BookkeeperJdbc(db: GraftDb) extends BookkeeperStore {
  private val t = db.table("bookkeeping")
  private def d(ident: String) = db.dialect.quote(ident)

  override def record(r: RunRecord): Unit = {
    def deleteInsert(): Unit = {
      db.executor.executeUpdate(
        s"DELETE FROM $t WHERE ${d("table_name")} = ? AND ${d("info_date")} = ?",
        Seq(r.table, r.infoDate.toString))
      db.executor.executeUpdate(
        s"INSERT INTO $t (${d("table_name")}, ${d("info_date")}, ${d("record_count")}, " +
          s"${d("status")}, ${d("started_at_ms")}, ${d("finished_at_ms")}) VALUES " +
          s"(?, ?, ?, ?, ?, ?)",
        Seq(r.table, r.infoDate.toString, r.recordCount, r.status, r.startedAtMs, r.finishedAtMs))
    }
    // two drivers recording the same slot can interleave (DELETE,
    // DELETE, INSERT, INSERT) — the loser's INSERT hits the primary
    // key. One retry re-runs the DELETE+INSERT and wins (last write),
    // instead of failing a task whose data write already succeeded.
    try deleteInsert()
    catch { case _: Exception => deleteInsert() }
  }

  override def get(table: String, infoDate: LocalDate): Option[RunRecord] =
    db.executor.query(
      s"SELECT * FROM $t WHERE ${d("table_name")} = ? AND ${d("info_date")} = ?",
      Seq(table, infoDate.toString))
      .headOption.map(fromRow)

  override def isAlreadyRan(table: String, infoDate: LocalDate): Boolean =
    get(table, infoDate).exists(r => r.status == "succeeded" || r.status == "skipped")

  override def latestSuccess(table: String): Option[LocalDate] =
    db.executor.query(
      s"SELECT MAX(${d("info_date")}) AS latest FROM $t " +
        s"WHERE ${d("table_name")} = ? AND ${d("status")} = ?",
      Seq(table, "succeeded"))
      .headOption.flatMap(r => Option(r.getOrElse("latest", null)))
      .map(LocalDate.parse)

  override def latestSuccessRecord(table: String, until: LocalDate): Option[RunRecord] =
    // ISO yyyy-MM-dd strings order lexicographically = chronologically,
    // so MAX/ORDER BY on the varchar column is correct in every
    // dialect. LIMIT 1 through the dialect: without it every
    // dependency evaluation would ship the table's whole success
    // history over JDBC to keep one row.
    db.executor.query(db.dialect.limitClause(
      s"SELECT * FROM $t WHERE ${d("table_name")} = ? " +
        s"AND ${d("status")} = ? " +
        s"AND ${d("info_date")} <= ? " +
        s"ORDER BY ${d("info_date")} DESC", 1),
      Seq(table, "succeeded", until.toString))
      .headOption.map(fromRow)

  override def all: Seq[RunRecord] = db.executor.query(s"SELECT * FROM $t").map(fromRow)

  private def fromRow(row: Map[String, String]): RunRecord = RunRecord(
    row("table_name"), LocalDate.parse(row("info_date")), row("record_count").toLong,
    row("status"), row("started_at_ms").toLong, row("finished_at_ms").toLong)
}

/**
 * RDBMS-backed committed-offset store (reference: pramen/core
 * .../core/bookkeeper/OffsetManagerJdbc.scala) — the relational twin
 * of [[graft.offset.OffsetManager]]'s per-table offset files, same
 * monotonic-commit contract: a commit below the stored offset is
 * ignored (concurrent drivers race benignly).
 */
final class OffsetStoreJdbc(db: GraftDb, nowMs: () => Long = () => System.currentTimeMillis())
  extends graft.offset.OffsetStore {
  private val t = db.table("offsets")
  private def d(ident: String) = db.dialect.quote(ident)

  def getLatestOffset(table: String): Option[OffsetValue] =
    db.executor.query(
      s"SELECT ${d("offset_type")}, ${d("offset_value")} FROM $t " +
        s"WHERE ${d("table_name")} = ?", Seq(table))
      .headOption.map(r => OffsetValue.fromString(r("offset_type"), r("offset_value")))

  def commit(table: String, offset: OffsetValue): Unit = {
    // optimistic CAS: a plain read-delete-insert would let two racing
    // drivers move the stored offset BACKWARDS (A reads 10, commits 20;
    // B read 10 too and commits 15 over it) — the monotonic contract
    // violation that double-processes rows. The DELETE is predicated on
    // the exact observed value, so a lost race deletes nothing and the
    // loser re-reads.
    var attempts = 0
    var emptyProbes = 0
    var done = false
    // the last offset actually SEEN in the slot across attempts: the
    // restore target when a persistent failure follows our own DELETE
    // (the failing attempt's own `observed` is already None by then)
    var lastSeen: Option[OffsetValue] = None
    while (!done) {
      attempts += 1
      val observed = getLatestOffset(table)
      if (observed.isDefined) lastSeen = observed
      // advance() owns the monotonic rule: scalar offsets replace when
      // strictly greater, per-partition kafka offsets merge (a batch
      // touches only some partitions; the rest keep their position)
      OffsetValue.advance(observed, offset) match {
        case None => done = true // monotonic: ignore
        case Some(stored) =>
          val cleared = observed match {
            case None => true // nothing to replace; PK arbitrates the insert race
            case Some(cur) =>
              db.executor.executeUpdate(
                s"DELETE FROM $t WHERE ${d("table_name")} = ? " +
                  s"AND ${d("offset_type")} = ? AND ${d("offset_value")} = ?",
                Seq(table, cur.typeName, cur.asString)) > 0
          }
          if (cleared) {
            try {
              db.executor.executeUpdate(
                s"INSERT INTO $t (${d("table_name")}, ${d("offset_type")}, ${d("offset_value")}, " +
                  s"${d("committed_at_ms")}) VALUES (?, ?, ?, ?)",
                Seq(table, stored.typeName, stored.asString, nowMs()))
              done = true
            } catch {
              case e: Exception =>
                // lost-the-insert-race vs database outage vs a
                // PERSISTENT insert failure: probe the slot.
                val probed =
                  try getLatestOffset(table)
                  catch {
                    case _: Exception => throw new IllegalStateException(
                      s"offset commit for '$table': database unreachable", e)
                  }
                if (probed.isEmpty) emptyProbes += 1 else emptyProbes = 0
                if (probed.isEmpty && emptyProbes >= 2) {
                  // TWO consecutive empty probes after failed INSERTs:
                  // a single empty probe can be a live CAS race (the
                  // winner's next commit DELETEd its own row between
                  // our failure and our probe — r17 meta-review), but
                  // contention re-populates the slot; a repeat empty
                  // means the failure is PERSISTENT (value too long,
                  // constraint, permissions). We may have DELETEd the
                  // previously committed row above; put it back
                  // best-effort so a persistent failure cannot
                  // silently LOSE the committed offset (re-ingesting
                  // the entire source on the next run), then report
                  // the REAL error instead of phantom contention.
                  val restored = lastSeen.exists { cur =>
                    try db.executor.executeUpdate(
                      s"INSERT INTO $t (${d("table_name")}, ${d("offset_type")}, " +
                        s"${d("offset_value")}, ${d("committed_at_ms")}) VALUES (?, ?, ?, ?)",
                      Seq(table, cur.typeName, cur.asString, nowMs())) > 0
                    catch { case _: Exception => false }
                  }
                  throw new IllegalStateException(
                    s"offset commit for '$table': INSERT failed with the slot empty " +
                      s"(persistent failure, not a lost race); previous offset " +
                      s"${if (lastSeen.isEmpty) "was absent"
                         else if (restored) "RESTORED" else "RESTORE FAILED — re-commit manually"}", e)
                }
                // probe found a row: another driver won the slot —
                // genuine lost race; the loop re-reads and re-advances
            }
          }
          if (!done && attempts >= 8)
            throw new IllegalStateException(
              s"offset commit for '$table' lost $attempts CAS races — pathological contention")
      }
    }
  }
}

/**
 * Partition metadata in the bookkeeping database (reference:
 * pramen/core .../core/metadata/MetadataManagerJdbc.scala:28) — the
 * relational twin of the metastore's `_graft/meta_kv/` files, same
 * [[graft.meta.MetadataStore]] surface. Last write wins per (table,
 * info_date, key), the FS layout's overwrite semantics.
 */
final class MetadataStoreJdbc(db: GraftDb) extends graft.meta.MetadataStore {
  private val t = db.table("metadata")
  private def d(ident: String) = db.dialect.quote(ident)

  override def set(table: String, infoDate: LocalDate, key: String, value: String): Unit = {
    def deleteInsert(): Unit = {
      db.executor.executeUpdate(
        s"DELETE FROM $t WHERE ${d("table_name")} = ? AND ${d("info_date")} = ? " +
          s"AND ${d("meta_key")} = ?",
        Seq(table, infoDate.toString, key))
      db.executor.executeUpdate(
        s"INSERT INTO $t (${d("table_name")}, ${d("info_date")}, ${d("meta_key")}, " +
          s"${d("meta_value")}) VALUES (?, ?, ?, ?)",
        Seq(table, infoDate.toString, key, value))
    }
    // same lost-race retry as the bookkeeper's DELETE+INSERT upsert
    try deleteInsert()
    catch { case _: Exception => deleteInsert() }
  }

  override def get(table: String, infoDate: LocalDate, key: String): Option[String] =
    db.executor.query(
      s"SELECT ${d("meta_value")} FROM $t WHERE ${d("table_name")} = ? " +
        s"AND ${d("info_date")} = ? AND ${d("meta_key")} = ?",
      Seq(table, infoDate.toString, key))
      .headOption.map(_("meta_value"))

  override def list(table: String, infoDate: LocalDate): Map[String, String] =
    db.executor.query(
      s"SELECT ${d("meta_key")}, ${d("meta_value")} FROM $t " +
        s"WHERE ${d("table_name")} = ? AND ${d("info_date")} = ?",
      Seq(table, infoDate.toString))
      .map(r => r("meta_key") -> r("meta_value")).toMap

  override def delete(table: String, infoDate: LocalDate, key: String): Unit =
    db.executor.executeUpdate(
      s"DELETE FROM $t WHERE ${d("table_name")} = ? AND ${d("info_date")} = ? " +
        s"AND ${d("meta_key")} = ?",
      Seq(table, infoDate.toString, key))

  override def deleteAll(table: String, infoDate: LocalDate): Unit =
    db.executor.executeUpdate(
      s"DELETE FROM $t WHERE ${d("table_name")} = ? AND ${d("info_date")} = ?",
      Seq(table, infoDate.toString))
}

/**
 * Append-only task journal in the bookkeeping database (reference:
 * pramen/core .../core/journal/JournalJdbc.scala + journal/model/
 * JournalTasks.scala — the reference keeps the journal in the SAME
 * store as bookkeeping, so a `bookkeeping.jdbc` fleet never splits
 * its audit trail across backends). Same [[graft.pipeline.TaskJournal]]
 * contract as the FS [[graft.pipeline.Journal]]: EVERY event keeps a
 * row (re-runs, failures, skips stay visible), completion order is
 * (at_ms, writer_id, seq) — the exact tuple the FS layout encodes in
 * its file names, so cross-writer interleavings reload identically.
 *
 * A same-millisecond (at_ms, writer, seq) collision is impossible
 * within one writer (seq increments) and pk-arbitrated across writers
 * sharing a truncated UUID prefix — the same odds the FS file-name
 * scheme accepts. Inserts are single autocommitted statements like
 * every other store here: an event is durable the moment the task
 * completes, and two drivers appending concurrently cannot interleave
 * partial rows.
 */
final class JournalJdbc(db: GraftDb) extends graft.pipeline.TaskJournal {
  import graft.pipeline.TaskEvent
  private val t = db.table("journal")
  private def d(ident: String) = db.dialect.quote(ident)
  private val writerId = java.util.UUID.randomUUID().toString.take(8)
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  override def append(e: TaskEvent): Unit =
    db.executor.executeUpdate(
      s"INSERT INTO $t (${d("pipeline")}, ${d("job_name")}, ${d("table_name")}, " +
        s"${d("info_date")}, ${d("status")}, ${d("record_count")}, ${d("detail")}, " +
        s"${d("at_ms")}, ${d("writer_id")}, ${d("seq")}) " +
        s"VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
      // info_date/detail travel as the FS journal's empty-string
      // spelling — the column is nullable only because Oracle folds ''
      // to NULL; reads treat the two identically
      Seq(e.pipeline, e.job, e.table, e.infoDate.map(_.toString).getOrElse(""),
        e.status, e.records, e.detail, e.atMs, writerId, seq.getAndIncrement()))

  override def all: Seq[TaskEvent] =
    rows(s"SELECT * FROM $t ORDER BY ${d("at_ms")}, ${d("writer_id")}, ${d("seq")}")

  /** Window pushdown: months of audit history never cross the wire
    * for a "what ran last night" question. */
  override def entries(fromMs: Long, toMs: Long): Seq[TaskEvent] =
    rows(s"SELECT * FROM $t WHERE ${d("at_ms")} >= ? AND ${d("at_ms")} <= ? " +
      s"ORDER BY ${d("at_ms")}, ${d("writer_id")}, ${d("seq")}", Seq(fromMs, toMs))

  private def rows(sql: String, params: Seq[Any] = Nil): Seq[TaskEvent] =
    db.executor.query(sql, params).map { row =>
      val date = Option(row.getOrElse("info_date", null)).filter(_.nonEmpty)
      TaskEvent(row("pipeline"), row("job_name"), row("table_name"),
        date.map(LocalDate.parse), row("status"), row("record_count").toLong,
        Option(row.getOrElse("detail", null)).getOrElse(""), row("at_ms").toLong)
    }
}

/**
 * Database-arbitrated run lock (reference: pramen/core
 * .../core/lock/TokenLockJdbc.scala): the PRIMARY KEY on `token`
 * makes acquisition one atomic INSERT — exactly the role the FS
 * lock's atomic file-create plays, with the same stale-break contract
 * (a lock older than `staleMs` is presumed dead and broken).
 */
final class TokenLockJdbc(db: GraftDb, token: String,
                          staleMs: Long = 4L * 3600 * 1000,
                          nowMs: () => Long = () => System.currentTimeMillis())
  extends graft.pipeline.RunLock {
  private val t = db.table("locks")
  private def d(ident: String) = db.dialect.quote(ident)
  private val ownerId = java.util.UUID.randomUUID().toString

  def tryAcquire(): Boolean = {
    // `retryOnVanish`: the holder can release between our failed
    // INSERT and the verification probe — the probe then finds no row
    // and the duplicate-key failure looks like an outage. One fresh
    // INSERT attempt disambiguates; only a second failure with an
    // empty probe is a real error.
    def insert(retryOnVanish: Boolean): Boolean =
      try {
        db.executor.executeUpdate(
          s"INSERT INTO $t (${d("token")}, ${d("owner")}, ${d("acquired_at_ms")}) " +
            s"VALUES (?, ?, ?)",
          Seq(token, ownerId, nowMs()))
        true
      } catch {
        case e: Exception =>
          // duplicate key vs database outage: SQLState classes differ
          // per driver, so probe — a visible row means someone holds
          // the lock (return false below); no row AND the probe itself
          // working means the insert failure was NOT a duplicate.
          // Rethrow then: reporting an unreachable database as "lock
          // held" would silently skip every task in the fleet.
          val held =
            try db.executor.query(
              s"SELECT ${d("owner")} FROM $t WHERE ${d("token")} = ?", Seq(token)).nonEmpty
            catch { case _: Exception => throw e }
          if (held) false
          else if (retryOnVanish) insert(retryOnVanish = false)
          else throw e
      }

    if (insert(retryOnVanish = true)) true
    else {
      // stale-break: delete only if still the SAME old acquisition
      // (predicated DELETE — if the holder refreshed or a third party
      // broke+re-acquired between our read and delete, we touch nothing)
      val held = db.executor.query(
        s"SELECT ${d("owner")}, ${d("acquired_at_ms")} FROM $t " +
          s"WHERE ${d("token")} = ?", Seq(token)).headOption
      held match {
        case Some(row) if nowMs() - row("acquired_at_ms").toLong > staleMs =>
          val n = db.executor.executeUpdate(
            s"DELETE FROM $t WHERE ${d("token")} = ? " +
              s"AND ${d("owner")} = ? AND ${d("acquired_at_ms")} = ?",
            Seq(token, row("owner"), row("acquired_at_ms").toLong))
          n > 0 && insert(retryOnVanish = false)
        case _ => false
      }
    }
  }

  def release(): Unit =
    // owner-predicated: releasing a lock someone else stale-broke and
    // re-acquired must not free THEIR lock
    db.executor.executeUpdate(
      s"DELETE FROM $t WHERE ${d("token")} = ? AND ${d("owner")} = ?",
      Seq(token, ownerId))
}
