package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.LocalDate
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/**
 * One completed (or failed) task run
 * (reference: pramen/core .../core/bookkeeper/model/DataChunk.scala,
 * core/journal/model/TaskCompleted.scala).
 */
final case class RunRecord(
    table: String,
    infoDate: LocalDate,
    recordCount: Long,
    status: String,        // "succeeded" | "failed" | "skipped"
    startedAtMs: Long,
    finishedAtMs: Long)

/**
 * Pipeline state journal enabling auto-healing: a (table, infoDate)
 * that already succeeded is skipped on re-run
 * (reference: pramen/core .../core/bookkeeper/Bookkeeper.scala — the
 * JDBC/Mongo/HadoopFS variants; graft persists JSONL on any local/
 * shared FS and keeps a hot in-memory index; the store is append-only
 * so concurrent pipelines on a shared FS only ever add lines).
 */
final class Bookkeeper(journalPath: Option[String] = None) {
  private val records = TrieMap.empty[(String, LocalDate), RunRecord]

  journalPath.foreach { p =>
    val path = Paths.get(p)
    if (Files.exists(path)) {
      Files.readAllLines(path).asScala.filter(_.nonEmpty).foreach { line =>
        parseLine(line).foreach(r => records.put((r.table, r.infoDate), r))
      }
    }
  }

  def record(r: RunRecord): Unit = {
    records.put((r.table, r.infoDate), r)
    journalPath.foreach { p =>
      val line = s"""{"table":"${r.table}","infoDate":"${r.infoDate}","recordCount":${r.recordCount},"status":"${r.status}","startedAtMs":${r.startedAtMs},"finishedAtMs":${r.finishedAtMs}}""" + "\n"
      Files.write(Paths.get(p), line.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  def get(table: String, infoDate: LocalDate): Option[RunRecord] = records.get((table, infoDate))

  def isAlreadyRan(table: String, infoDate: LocalDate): Boolean =
    records.get((table, infoDate)).exists(_.status == "succeeded")

  def latestSuccess(table: String): Option[LocalDate] =
    records.values.filter(r => r.table == table && r.status == "succeeded")
      .map(_.infoDate).maxByOption(_.toEpochDay)

  def all: Seq[RunRecord] = records.values.toSeq

  // minimal JSON field extraction for our own fixed-shape lines
  private def parseLine(line: String): Option[RunRecord] = {
    def str(k: String): Option[String] =
      s""""$k":"([^"]*)"""".r.findFirstMatchIn(line).map(_.group(1))
    def num(k: String): Option[Long] =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(line).map(_.group(1).toLong)
    for {
      t <- str("table"); d <- str("infoDate"); c <- num("recordCount")
      s <- str("status"); a <- num("startedAtMs"); f <- num("finishedAtMs")
    } yield RunRecord(t, LocalDate.parse(d), c, s, a, f)
  }
}
