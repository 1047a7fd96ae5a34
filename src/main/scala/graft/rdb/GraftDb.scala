package graft.rdb

import graft.sql.SqlDialect

/**
 * Minimal SQL execution abstraction the RDBMS-backed stores run on
 * (reference: pramen/core .../core/rdb/PramenDb.scala:37 — the
 * reference talks to its bookkeeping database through Slick; graft
 * keeps a two-method surface so the same DAOs run on a pooled
 * `java.sql.Connection` in production and on an in-memory fake in this
 * driverless environment).
 *
 * `query` returns rows as column-name → string-value maps — every
 * bookkeeping column is a string, long or date rendered as ISO text,
 * so typed getters would buy nothing and each RDBMS driver's type
 * quirks stay out of the DAO layer.
 */
trait SqlExecutor {
  /** DDL or DML with `?` placeholders bound from `params` in order;
    * returns the update count (0 for DDL). Must throw on constraint
    * violations — [[TokenLockJdbc]] relies on a duplicate-key INSERT
    * failing. Data-derived values (offsets are MAXes of source
    * columns) MUST travel through `params`, never spliced into the
    * SQL text — a backslash in a string offset would otherwise break
    * the statement (or inject) on backslash-escaping dialects. */
  def executeUpdate(sql: String, params: Seq[Any] = Nil): Int
  def query(sql: String, params: Seq[Any] = Nil): Seq[Map[String, String]]
}

/** Builds the [[SqlExecutor]] a config-declared bookkeeping database
  * runs on (`bookkeeping.jdbc.executor.factory = <FQCN>`). The
  * production default is a [[ConnectionExecutor]] over
  * `DriverManager`; a factory swaps in pooled connections or — in
  * driverless test environments — an in-memory executor. Receives
  * every `bookkeeping.jdbc.*` key (prefix stripped). */
trait SqlExecutorFactory {
  def apply(options: Map[String, String]): SqlExecutor
}

/** Production executor over a live JDBC connection (java.sql ships
  * with the JDK; an actual driver jar is deployment-provided). One
  * statement per call, autocommit — each bookkeeping write must be
  * durable the moment the task completes, exactly like the
  * atomic-rename filesystem stores. Parameterized calls go through
  * `PreparedStatement` bind values — the driver does the escaping. */
final class ConnectionExecutor(conn: java.sql.Connection) extends SqlExecutor {
  override def executeUpdate(sql: String, params: Seq[Any] = Nil): Int =
    if (params.isEmpty) {
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } else {
      val ps = conn.prepareStatement(sql)
      try { bind(ps, params); ps.executeUpdate() } finally ps.close()
    }

  override def query(sql: String, params: Seq[Any] = Nil): Seq[Map[String, String]] = {
    val st = conn.prepareStatement(sql)
    try {
      bind(st, params)
      val rs = st.executeQuery()
      val meta = rs.getMetaData
      val cols = (1 to meta.getColumnCount).map(i => meta.getColumnLabel(i).toLowerCase)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
      while (rs.next())
        buf += cols.map(c => c -> Option(rs.getString(c)).orNull).toMap
      buf.toSeq
    } finally st.close()
  }

  private def bind(ps: java.sql.PreparedStatement, params: Seq[Any]): Unit =
    params.zipWithIndex.foreach {
      case (v: String, i) => ps.setString(i + 1, v)
      case (v: Long, i)   => ps.setLong(i + 1, v)
      case (v: Int, i)    => ps.setInt(i + 1, v)
      case (v, i)         => ps.setObject(i + 1, v)
    }
}

/**
 * The bookkeeping database: owns the schema (DDL through the existing
 * [[graft.sql.SqlDialect]] layer, so identifier quoting matches the
 * target RDBMS) and a persisted schema version for forward migrations
 * (reference: PramenDb.initDatabase / initTable / addColumn —
 * version-stepped DDL, same contract re-expressed without Slick).
 *
 * Tables:
 *  - `bookkeeping`: latest run record per (table, info_date) — the
 *    relational twin of the FS Bookkeeper's newest-file-wins layout.
 *  - `offsets`: committed incremental offset per table.
 *  - `locks`: one row per held token; the PRIMARY KEY makes acquire a
 *    single atomic INSERT — the database is the arbiter, the way the
 *    FS lock uses atomic file create.
 *  - `metadata`: key-value annotations per (table, info_date)
 *    partition — the relational twin of the metastore's
 *    `_graft/meta_kv/` file layout.
 *  - `journal`: append-only task-completion events (one row per
 *    event, re-runs and failures kept) — the relational twin of the
 *    FS [[graft.pipeline.Journal]]'s one-file-per-event layout, so a
 *    `bookkeeping.jdbc` fleet keeps its audit log in the SAME store
 *    as its skip-if-done state (no split-brain persistence).
 *  - `schema_version`: single row, stepped by migrations.
 */
class GraftDb(val dialect: SqlDialect, val executor: SqlExecutor,
              tablePrefix: String = "") {
  import GraftDb.CurrentVersion

  private def q(ident: String): String = dialect.quote(tablePrefix + ident)
  private[rdb] def table(name: String): String = q(name)

  /** Create missing tables and apply version-stepped migrations.
    * Idempotent: `IF NOT EXISTS` guards creation, the persisted
    * version gates each migration step exactly once. A database at
    * stored version v replays `migrations(v-1 ...)`: `migrations(i)`
    * upgrades version i+1 → i+2, so v=1 replays from index 0. */
  def initialize(): Unit = {
    ddl().foreach(executor.executeUpdate(_))
    val v = schemaVersion()
    if (v < 0)
      executor.executeUpdate(
        s"INSERT INTO ${q("schema_version")} (version) VALUES ($currentVersion)")
    else if (v < currentVersion) {
      migrations.slice(v - 1, currentVersion - 1)
        .foreach { step => step.foreach(executor.executeUpdate(_)) }
      executor.executeUpdate(
        s"UPDATE ${q("schema_version")} SET version = $currentVersion")
    }
  }

  /** Overridable for migration tests; production = [[GraftDb.CurrentVersion]]. */
  protected def currentVersion: Int = CurrentVersion

  /** The full DDL for a fresh database, in creation order. */
  def ddl(): Seq[String] = Seq(
    s"""CREATE TABLE IF NOT EXISTS ${q("bookkeeping")} (
       |  ${dialect.quote("table_name")} VARCHAR(255) NOT NULL,
       |  ${dialect.quote("info_date")} VARCHAR(10) NOT NULL,
       |  ${dialect.quote("record_count")} BIGINT NOT NULL,
       |  ${dialect.quote("status")} VARCHAR(20) NOT NULL,
       |  ${dialect.quote("started_at_ms")} BIGINT NOT NULL,
       |  ${dialect.quote("finished_at_ms")} BIGINT NOT NULL,
       |  PRIMARY KEY (${dialect.quote("table_name")}, ${dialect.quote("info_date")})
       |)""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS ${q("offsets")} (
       |  ${dialect.quote("table_name")} VARCHAR(255) NOT NULL,
       |  ${dialect.quote("offset_type")} VARCHAR(20) NOT NULL,
       |  ${dialect.quote("offset_value")} ${dialect.longTextType} NOT NULL,
       |  ${dialect.quote("committed_at_ms")} BIGINT NOT NULL,
       |  PRIMARY KEY (${dialect.quote("table_name")})
       |)""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS ${q("locks")} (
       |  ${dialect.quote("token")} VARCHAR(255) NOT NULL,
       |  ${dialect.quote("owner")} VARCHAR(40) NOT NULL,
       |  ${dialect.quote("acquired_at_ms")} BIGINT NOT NULL,
       |  PRIMARY KEY (${dialect.quote("token")})
       |)""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS ${q("metadata")} (
       |  ${dialect.quote("table_name")} VARCHAR(255) NOT NULL,
       |  ${dialect.quote("info_date")} VARCHAR(10) NOT NULL,
       |  ${dialect.quote("meta_key")} VARCHAR(255) NOT NULL,
       |  ${dialect.quote("meta_value")} VARCHAR(4000) NOT NULL,
       |  PRIMARY KEY (${dialect.quote("table_name")}, ${dialect.quote("info_date")}, ${dialect.quote("meta_key")})
       |)""".stripMargin,
    // append-only task journal (reference: core/journal/JournalJdbc.scala,
    // journal/model/JournalTasks) — EVERY event keeps a row, so the key
    // is the completion identity (at_ms, writer, seq), the exact tuple
    // the FS journal encodes in its file names. New TABLES ride ddl()
    // (IF NOT EXISTS runs on every initialize(), so v2 databases pick
    // the table up without a version bump); only column CHANGES need a
    // migrations step.
    s"""CREATE TABLE IF NOT EXISTS ${q("journal")} (
       |  ${dialect.quote("pipeline")} VARCHAR(255) NOT NULL,
       |  ${dialect.quote("job_name")} VARCHAR(255) NOT NULL,
       |  ${dialect.quote("table_name")} VARCHAR(255) NOT NULL,
       |  ${dialect.quote("info_date")} VARCHAR(10),
       |  ${dialect.quote("status")} VARCHAR(20) NOT NULL,
       |  ${dialect.quote("record_count")} BIGINT NOT NULL,
       |  ${dialect.quote("detail")} ${dialect.longTextType},
       |  ${dialect.quote("at_ms")} BIGINT NOT NULL,
       |  ${dialect.quote("writer_id")} VARCHAR(8) NOT NULL,
       |  ${dialect.quote("seq")} BIGINT NOT NULL,
       |  PRIMARY KEY (${dialect.quote("at_ms")}, ${dialect.quote("writer_id")}, ${dialect.quote("seq")})
       |)""".stripMargin,
    s"""CREATE TABLE IF NOT EXISTS ${q("schema_version")} (
       |  ${dialect.quote("version")} INT NOT NULL
       |)""".stripMargin)

  /** Migration steps: `migrations(i)` upgrades schema version i+1 to
    * i+2 (append one entry per [[GraftDb.CurrentVersion]] bump),
    * mirroring PramenDb's stepped addColumn calls.
    * v1 → v2: widen offsets.offset_value from VARCHAR(255) — a Kafka
    * per-partition offset vector at ~18+ partitions exceeded it, so
    * Kafka-sourced commits either failed (strict dialects) or were
    * silently truncated into unparseable JSON (non-strict MySQL). */
  protected def migrations: Seq[Seq[String]] = Seq(
    Seq(dialect.alterColumnType(
      q("offsets"), dialect.quote("offset_value"), dialect.longTextType)))

  /** Stored schema version; -1 when uninitialized. */
  def schemaVersion(): Int =
    executor.query(s"SELECT version FROM ${q("schema_version")}")
      .headOption.flatMap(_.get("version")).map(_.toInt).getOrElse(-1)
}

object GraftDb {
  /** Bump together with an appended [[GraftDb.migrations]] step. */
  val CurrentVersion = 2
}
