package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Spark-storage bookkeeper backends behind [[BookkeeperStore]] — the
 * alternative persistence modes the reference ships for shops whose
 * ops tooling wants the run journal QUERYABLE as a table rather than
 * as per-record JSON files:
 *
 *  - [[BookkeeperText]] (reference: pramen/core
 *    .../core/bookkeeper/BookkeeperText.scala:43 — pipe-delimited CSV
 *    under `bk/records_csv/`, readable by `spark.read.csv` and by any
 *    shell tooling),
 *  - [[BookkeeperDelta]] (reference: .../bookkeeper/
 *    BookkeeperDeltaBase.scala:29 + BookkeeperDeltaPath.scala:38 —
 *    an append-only Delta table whose transaction log arbitrates
 *    concurrent drivers).
 *
 * Both re-expressions keep the reference's READ model — every lookup
 * re-reads storage, so concurrent drivers on a shared filesystem see
 * each other's completions without any coordination channel — but fix
 * its WRITE model where it doesn't survive object stores:
 *
 *  - The reference text backend appends lines to ONE shared csv file
 *    under a token lock ([[BookkeeperText.scala:105-117]]); appends
 *    are not atomic on S3-likes and the lock adds a liveness
 *    dependency. Graft writes ONE small file per record (temp name +
 *    rename, the proven FS-journal discipline from [[Bookkeeper]]) —
 *    lock-free, interleave-proof, and `spark.read.csv(dir)` still
 *    reads the directory as one table.
 *  - The Delta backend appends one-row commits exactly like the
 *    reference; the transaction log is what makes two drivers'
 *    concurrent `record` calls safe, which is the point of paying the
 *    Delta dependency. Gated on delta-spark being on the classpath
 *    (the S8 discipline — [[graft.meta.Metastore.deltaAvailable]]);
 *    the identical code path is exercisable with any other Spark
 *    batch format (the spec runs it on parquet, whose append mode has
 *    the same one-file-per-commit layout albeit without transactional
 *    conflict arbitration).
 *
 * Scale shape: records are one row per completed task — a year of a
 * thousand-table daily pipeline is ~365k rows of a few hundred bytes;
 * every read below filters by table (and usually date) BEFORE the
 * newest-per-key window, and `collect` returns the bounded survivor
 * set. Nothing here scans data tables.
 */
private[graft] object BookkeeperSpark {

  /** Storage schema shared by both backends (dates as ISO strings —
    * portable across csv/delta/parquet and human-greppable). */
  val schema: StructType = StructType(Seq(
    StructField("table", StringType, nullable = false),
    StructField("infoDate", StringType, nullable = false),
    StructField("recordCount", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("startedAtMs", LongType, nullable = false),
    StructField("finishedAtMs", LongType, nullable = false)))

  def toRow(r: RunRecord): Row =
    Row(r.table, r.infoDate.toString, r.recordCount, r.status, r.startedAtMs, r.finishedAtMs)

  def fromRow(row: Row): RunRecord = RunRecord(
    row.getString(0), LocalDate.parse(row.getString(1)), row.getLong(2),
    row.getString(3), row.getLong(4), row.getLong(5))

  /** Newest record per (table, infoDate) — the journal keeps every
    * attempt; decisions see only the latest. Ties on finishedAtMs
    * break on startedAtMs then status so the reduction is
    * deterministic. */
  def newestPerKey(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("table", "infoDate")
      .orderBy(col("finishedAtMs").desc, col("startedAtMs").desc, col("status"))
    df.withColumn("_rk", row_number().over(w)).where(col("_rk") === 1).drop("_rk")
  }

  def hadoopExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

/**
 * Shared skeleton: subclasses provide the raw journal read (already
 * schema-shaped) and the single-record append; all [[BookkeeperStore]]
 * semantics — newest-wins reduction, done = succeeded|skipped, latest
 * success scans — live here once.
 */
private[graft] abstract class BookkeeperSparkBase(spark: SparkSession)
    extends BookkeeperStore {
  import BookkeeperSpark._

  /** Full journal as a DataFrame in [[BookkeeperSpark.schema]] shape;
    * empty frame when nothing has been recorded yet. */
  protected def journalDf(): DataFrame

  protected def emptyDf: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  private def currentFor(table: String): DataFrame =
    newestPerKey(journalDf().where(col("table") === table))

  override def get(table: String, infoDate: LocalDate): Option[RunRecord] =
    currentFor(table).where(col("infoDate") === infoDate.toString)
      .collect().headOption.map(fromRow)

  override def isAlreadyRan(table: String, infoDate: LocalDate): Boolean =
    get(table, infoDate).exists(r => r.status == "succeeded" || r.status == "skipped")

  override def latestSuccess(table: String): Option[LocalDate] =
    currentFor(table).where(col("status") === "succeeded")
      .agg(max(col("infoDate"))).collect().headOption
      .flatMap(r => Option(r.getString(0))).map(LocalDate.parse)

  override def latestSuccessRecord(table: String, until: LocalDate): Option[RunRecord] =
    currentFor(table)
      .where(col("status") === "succeeded" && col("infoDate") <= until.toString)
      .orderBy(col("infoDate").desc).limit(1)
      .collect().headOption.map(fromRow)

  override def all: Seq[RunRecord] =
    newestPerKey(journalDf()).collect().toSeq.map(fromRow)
}

/**
 * Pipe-delimited text journal (reference: BookkeeperText.scala:43):
 * `<path>/records/` holds one single-line `.psv` file per recorded
 * run, named `<finishedAtMs>_<writerId>_<seq>.psv` so a directory
 * listing reads in completion order. `spark.read.option("sep","|")`
 * over the directory is the queryable surface; shell tooling can
 * `cat` it. Config key: `bookkeeping.text.path`.
 */
final class BookkeeperText(spark: SparkSession, path: String)
    extends BookkeeperSparkBase(spark) {
  import BookkeeperSpark._

  private val recordsDir = s"$path/records"
  private val writerId = java.util.UUID.randomUUID().toString.take(8)
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  override protected def journalDf(): DataFrame =
    if (!hadoopExists(spark, recordsDir)) emptyDf
    else spark.read.option("sep", "|").schema(schema).csv(recordsDir)

  override def record(r: RunRecord): Unit = {
    // '|' is the field separator and a newline would split the record
    // across lines, corrupting every later read of the journal
    def clean(v: String) = !v.exists(c => c == '|' || c == '\n' || c == '\r')
    require(clean(r.table) && clean(r.status),
      s"BookkeeperText: '|' and line breaks are illegal in table/status: $r")
    val line =
      s"${r.table}|${r.infoDate}|${r.recordCount}|${r.status}|${r.startedAtMs}|${r.finishedAtMs}\n"
    val dir = new org.apache.hadoop.fs.Path(recordsDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val name = f"${r.finishedAtMs}%013d_${writerId}_${seq.getAndIncrement()}%06d"
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(line.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, s"$name.psv")))
      throw new java.io.IOException(s"BookkeeperText: rename failed for $name under $recordsDir")
  }
}

/**
 * Spark-table journal (reference: BookkeeperDeltaBase.scala:29,
 * BookkeeperDeltaPath.scala:38): the run journal is an append-only
 * table at `path`; each `record` is a one-row append commit. With the
 * default `format = "delta"` the transaction log arbitrates
 * concurrent drivers (the reason this backend exists); requires
 * delta-spark on the classpath, failing with the same actionable
 * message as the metastore's Delta format (S8). Any other batch
 * format exercises the identical plumbing without the transactional
 * guarantee. Config key: `bookkeeping.delta.path`.
 */
final class BookkeeperDelta(spark: SparkSession, path: String,
                            format: String = "delta")
    extends BookkeeperSparkBase(spark) {
  import BookkeeperSpark._

  if (format == "delta" && !graft.meta.Metastore.deltaAvailable)
    throw new IllegalStateException(
      "BookkeeperDelta needs delta-spark on the classpath " +
        "(io.delta:delta-spark_2.13); it was not found. " +
        "Use bookkeeping.path (FS journal) or bookkeeping.text.path instead.")

  override protected def journalDf(): DataFrame = {
    // an ops-precreated EMPTY directory (permissioned storage) or
    // debris from a crashed first append is 'exists' but not yet a
    // readable table — that's the empty journal, not a bricked one
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData =
      fs.exists(p) && {
        if (format == "delta") fs.exists(new org.apache.hadoop.fs.Path(p, "_delta_log"))
        else fs.listStatus(p).exists { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
      }
    if (!hasData) emptyDf
    // no read-time .schema(): Delta owns its schema (specifying one at
    // read time is an error); a column select pins the expected shape
    else spark.read.format(format).load(path)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  override def record(r: RunRecord): Unit =
    spark.createDataFrame(
        java.util.Collections.singletonList(toRow(r)), schema)
      .write.format(format).mode("append").save(path)
}
