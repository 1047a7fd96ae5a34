package graft.meta

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.time.LocalDate

/**
 * Iceberg-format metastore persistence (reference: pramen/core
 * .../core/metastore/peristence/MetastorePersistenceIceberg.scala:32 and
 * MetastorePersistenceIcebergOps.scala; format parsing at
 * .../core/metastore/model/DataFormatParser.scala:63).
 *
 * Unlike the path-addressed formats, an Iceberg metastore table IS a
 * catalog table: saves go through the V2 `writeTo` API (create /
 * append / overwrite-by-filter all transactional in the table's
 * snapshot log), reads are `spark.table(...)`, and per-info-date
 * overwrite is `overwrite(infoDateCol === date)` — Iceberg rewrites
 * only the matching data files, the catalog equivalent of the dynamic
 * partition overwrite the parquet path uses.
 *
 * Partition-scheme mapping (reference IcebergOps.createIcebergTable):
 *  - ByDay         → identity partition on the info-date column
 *  - ByMonth       → hidden partition transforms `year(c), month(c)`
 *                    added by DDL after an empty create (Spark's
 *                    `partitionedBy` cannot express ADD PARTITION FIELD
 *                    on an existing table)
 *  - ByYear        → hidden transform `year(c)`
 *  - ByYearMonth   → unsupported (no Iceberg transform produces a
 *                    yyyy-MM string; the reference throws the same way)
 *  - NotPartitioned→ unpartitioned table
 *  - Overwrite     → unpartitioned, each save replaces the snapshot
 *
 * Hidden-transform partitioning is why the month/year schemes need no
 * generated columns here: Iceberg derives the partition values from the
 * info-date column itself, readers never see (or need dropped) derived
 * columns, and date-range filters prune via partition stats in the
 * manifests.
 *
 * Everything compiles against Spark's own V2 writer API; the Iceberg
 * runtime and a configured catalog are REQUIRED at run time, checked
 * up front so a missing dependency fails with instructions, not a
 * catalog-resolution stack trace (the same discipline as
 * [[Metastore.requireDelta]]).
 */
private[meta] object IcebergPersistence {

  /** True when an Iceberg Spark runtime is on the classpath. */
  def available: Boolean =
    try { Class.forName("org.apache.iceberg.spark.source.IcebergSource"); true }
    catch { case _: ClassNotFoundException => false }

  def require_(): Unit =
    if (!available)
      throw new IllegalStateException(
        "DataFormat.Iceberg needs the Iceberg Spark runtime on the classpath " +
          "(org.apache.iceberg:iceberg-spark-runtime-4.0_2.13) and an Iceberg " +
          "catalog configured via spark.sql.catalog.<name>; neither was found")

  /** `ALTER TABLE ... ADD PARTITION FIELD` statements for the derived
    * (hidden-transform) schemes — golden-checked; empty for schemes
    * `partitionedBy` expresses directly (reference:
    * MetastorePersistenceIceberg.getAddGeneratedPartitionColumnSql). */
  def partitionFieldDdl(fullName: String, infoDateColumn: String,
                        scheme: PartitionScheme): Seq[String] = scheme match {
    case PartitionScheme.ByMonth(_, _) => Seq(
      s"ALTER TABLE $fullName ADD PARTITION FIELD year($infoDateColumn)",
      s"ALTER TABLE $fullName ADD PARTITION FIELD month($infoDateColumn)")
    case PartitionScheme.ByYear(_) => Seq(
      s"ALTER TABLE $fullName ADD PARTITION FIELD year($infoDateColumn)")
    case PartitionScheme.ByYearMonth(_) =>
      throw new UnsupportedOperationException(
        s"Partition scheme ByYearMonth is not supported by Iceberg " +
          "(no hidden transform produces a year-month value)")
    case _ => Seq.empty
  }

  /** Save `df` (already stamped with the info-date and batch-id
    * columns) as the data for `infoDate`. Returns nothing; the caller
    * observes the row count on the frame it passed in. */
  def save(spark: SparkSession, t: MetaTable, ice: DataFormat.Iceberg,
           infoDate: LocalDate, df: DataFrame, mode: SaveMode): Unit = {
    require_()
    val full = ice.fullName
    def writer(d: DataFrame) = d.writeTo(full)
      .options(t.writeOptions)

    if (!spark.catalog.tableExists(full)) {
      // first save creates the table; derived schemes create EMPTY,
      // add their hidden partition transforms by DDL, then append the
      // batch (a create-with-data can only express partitionedBy)
      val derived = t.scheme match {
        case _: PartitionScheme.ByMonth | _: PartitionScheme.ByYear |
             _: PartitionScheme.ByYearMonth => true
        case _ => false
      }
      val ddl = partitionFieldDdl(full, t.infoDateColumn, t.scheme) // throws on ByYearMonth BEFORE the create
      val creator0 = (if (derived) df.where(lit(false)) else df)
        .writeTo(full)
        .using("iceberg")
        .tableProperty("format-version", "2")
        // schema evolution handled natively: accept-any-schema +
        // mergeSchema at write replaces the parquet path's recorded
        // history + mergeSchema-at-read
        .tableProperty("write.spark.accept-any-schema", "true")
        .option("mergeSchema", "true")
        .options(t.writeOptions)
      val creator1 = ice.location.foldLeft(creator0)((w, p) => w.tableProperty("location", p))
      val creator = ice.properties.foldLeft(creator1) { case (w, (k, v)) => w.tableProperty(k, v) }
      t.scheme match {
        case PartitionScheme.Overwrite      => creator.createOrReplace()
        case PartitionScheme.NotPartitioned => creator.create()
        case PartitionScheme.ByDay          => creator.partitionedBy(col(t.infoDateColumn)).create()
        case _ =>
          creator.create()
          ddl.foreach(spark.sql(_).collect())
          writer(df).option("mergeSchema", "true").append()
      }
    } else (t.scheme, mode) match {
      case (_, SaveMode.Append) =>
        writer(df).option("mergeSchema", "true").append()
      case (PartitionScheme.Overwrite, _) =>
        writer(df).option("mergeSchema", "true").overwrite(lit(true))
      case _ =>
        // idempotent rerun: replace exactly this info date's rows;
        // Iceberg rewrites only the data files the filter matches
        writer(df).option("mergeSchema", "true")
          .overwrite(col(t.infoDateColumn) === java.sql.Date.valueOf(infoDate))
    }
  }

  /** Whole-table read; info-date range filters applied by the caller
    * prune through Iceberg's manifest-level partition stats. */
  def load(spark: SparkSession, t: MetaTable, ice: DataFormat.Iceberg): DataFrame = {
    require_()
    spark.read.options(t.readOptions).table(ice.fullName)
  }

  /** Distinct info dates. ByDay tables answer from the `.partitions`
    * metadata table — manifest metadata, no data scan (the catalog
    * analog of the parquet path's partition-directory listing); other
    * schemes (hidden year/month transforms don't reconstruct a date)
    * pay a column-pruned distinct scan. */
  def listDates(spark: SparkSession, t: MetaTable, ice: DataFormat.Iceberg): Seq[LocalDate] = {
    require_()
    val viaScan = () =>
      load(spark, t, ice).select(col(t.infoDateColumn)).distinct().collect()
        .map(_.getDate(0).toLocalDate).toSeq.sortBy(_.toEpochDay)
    t.scheme match {
      case PartitionScheme.ByDay =>
        try
          spark.table(s"${ice.fullName}.partitions")
            .select(col(s"partition.${t.infoDateColumn}"))
            .distinct().collect()
            .map(_.getDate(0).toLocalDate).toSeq.sortBy(_.toEpochDay)
        catch { case scala.util.control.NonFatal(_) => viaScan() }
      case _ => viaScan()
    }
  }
}
