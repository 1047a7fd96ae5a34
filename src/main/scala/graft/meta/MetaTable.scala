package graft.meta

import java.time.LocalDate

/**
 * Partition layout of a metastore table
 * (reference: pramen/api .../api/PartitionScheme.scala:24 — day, month,
 * year-month, year, not-partitioned, overwrite).
 */
sealed trait PartitionScheme
object PartitionScheme {
  /** One physical partition per information date (the default). */
  case object ByDay extends PartitionScheme
  /** Partitioned by generated year + month columns. */
  final case class ByMonth(yearCol: String = "info_year", monthCol: String = "info_month") extends PartitionScheme
  /** Partitioned by a generated "yyyy-MM" column. */
  final case class ByYearMonth(yearMonthCol: String = "info_year_month") extends PartitionScheme
  /** Partitioned by a generated year column. */
  final case class ByYear(yearCol: String = "info_year") extends PartitionScheme
  /** info_date kept as a data column, no physical partitioning. */
  case object NotPartitioned extends PartitionScheme
  /** Each save replaces the whole table (snapshot semantics). */
  case object Overwrite extends PartitionScheme
}

/** How catalog-synced tables register new partitions after a save
  * (reference: pramen/core .../core/metastore/model/HiveConfig.scala —
  * the repair-table vs add-partition query templates). */
sealed trait CatalogRepair
object CatalogRepair {
  /** `MSCK REPAIR` / `recoverPartitions`: lists EVERY partition
    * directory — correct for any scheme, O(all partitions) per save. */
  case object Recover extends CatalogRepair
  /** `ALTER TABLE ... ADD PARTITION` of exactly the saved info date —
    * O(1) per save; ByDay tables only (falls back to Recover for
    * derived-column schemes). */
  case object AddPartition extends CatalogRepair

  def parse(s: String): CatalogRepair = s.trim.toLowerCase match {
    case "recover" | "msck" => Recover
    case "add_partition" | "addpartition" => AddPartition
    case other => throw new IllegalArgumentException(s"unknown catalog repair mode '$other'")
  }
}

/** Read-caching policy of a metastore table
  * (reference: pramen/api .../api/CachePolicy.scala). */
sealed trait CachePolicy { def name: String }
object CachePolicy {
  /** Every read re-plans from storage (the default). */
  case object NoCache extends CachePolicy { val name = "no_cache" }
  /** Reads cached with Spark's default storage level (deserialized
    * memory, spill to disk) for the session — for intermediate tables
    * several downstream jobs consume in one run. */
  case object Cache extends CachePolicy { val name = "cache" }
  /** Reads persisted to executor DISK only — caching for tables too
    * large for the memory fraction, still skipping source re-reads
    * and decode. */
  case object Persist extends CachePolicy { val name = "persist" }

  def parse(s: String): CachePolicy = s.trim.toLowerCase match {
    case "cache" => Cache
    case "persist" => Persist
    case "no_cache" | "nocache" | "none" => NoCache
    case other => throw new IllegalArgumentException(s"unknown cache policy '$other'")
  }
}

/** Storage format of a metastore table. */
sealed trait DataFormat { def name: String }
object DataFormat {
  case object Parquet extends DataFormat { val name = "parquet" }
  case object Orc extends DataFormat { val name = "orc" }
  case object Json extends DataFormat { val name = "json" }
  final case class Csv(options: Map[String, String] = Map("header" -> "true")) extends DataFormat { val name = "csv" }
  /** Raw (whole-file) storage: files copied per info-date directory. */
  case object Raw extends DataFormat { val name = "raw" }
  /** Delta Lake table (reference: pramen/core
    * .../core/metastore/peristence/MetastorePersistenceDelta.scala).
    * Requires delta-spark on the classpath; the metastore fails with a
    * clear message when it is absent. */
  case object Delta extends DataFormat { val name = "delta" }
  /** Apache Iceberg CATALOG table (reference: pramen/core
    * .../core/metastore/peristence/MetastorePersistenceIceberg.scala:32,
    * parsed at .../core/metastore/model/DataFormatParser.scala:63):
    * identified by a catalog table name, not a path. `location`
    * optionally pins the physical path as a table property at
    * creation; `properties` become Iceberg table properties. Requires
    * the Iceberg Spark runtime + a configured catalog; metastore ops
    * fail with a clear message otherwise ([[MetaTable.path]] is unused
    * for this format). */
  final case class Iceberg(catalogTable: String, location: Option[String] = None,
                           properties: Map[String, String] = Map.empty) extends DataFormat {
    val name = "iceberg"
    /** Iceberg allows only lowercase table names — the reference
      * lowercases at parse (DataFormatParser.scala:61); graft
      * normalizes wherever the name reaches a catalog. */
    def fullName: String = catalogTable.toLowerCase(java.util.Locale.ROOT)
  }
  /** Sink-only table (reference: pramen/core
    * .../core/metastore/peristence/MetastorePersistenceNull.scala):
    * saves are no-ops with zero stats, reads return an empty frame —
    * for pipelines whose output goes ONLY to a sink and whose
    * metastore entry exists purely to anchor the job in the DAG. */
  case object NullFormat extends DataFormat { val name = "null" }
  /** Session-scoped table that is never written to storage (reference:
    * pramen/core .../metastore/peristence/MetastorePersistenceTransientEager.scala
    * + TransientTableManager.scala): the save MATERIALIZES the data
    * eagerly (that is the "eager" — the scheduled job runs and pays
    * its cost at save time, unlike lazy/on-demand jobs) and keeps it
    * per (table, info date) under the given cache policy; reads union
    * the saved dates. Data dies with the session — intermediate
    * results consumed downstream in the same run. */
  final case class TransientEager(cachePolicy: CachePolicy = CachePolicy.Cache)
      extends DataFormat { val name = "transient_eager" }
}

/**
 * Definition of a table managed by the metastore
 * (reference: pramen/api .../api/MetaTableDef.scala).
 *
 * @param name           logical table name pipelines refer to
 * @param path           physical location (any Hadoop-compatible FS)
 * @param format         storage format
 * @param infoDateColumn name of the information-date column
 * @param scheme         physical partition layout
 * @param transientCache cache reads in executor memory for the life of
 *                       the session — for intermediate tables consumed
 *                       by several downstream jobs of one pipeline run
 *                       (reference: pramen/core
 *                       .../metastore/persistence/TransientTableManager.scala)
 * @param catalogSync    register the table in the Spark session catalog
 *                       on first save and recover partitions after each
 *                       save, so BI/SQL users read it as
 *                       `spark.table(catalogName)` with partition
 *                       pruning intact (reference: pramen/core
 *                       .../core/metastore/MetastoreImpl.scala Hive
 *                       paths, metastore/model/HiveConfig.scala)
 * @param catalogName    catalog identifier when it differs from `name`
 * @param cachePolicy    read-caching override (reference:
 *                       api/CachePolicy) — unset falls back to
 *                       `transientCache` (Cache when true)
 * @param catalogRepair  how catalog sync registers partitions after a
 *                       save: full recover (MSCK) or O(1) ADD
 *                       PARTITION of the saved date (ByDay only)
 * @param readOptions    datasource options applied to every read of
 *                       this table (reference: MetaTableDef
 *                       readOptions)
 * @param writeOptions   datasource options applied to every write
 *                       (reference: MetaTableDef writeOptions)
 */
final case class MetaTable(
    name: String,
    path: String,
    format: DataFormat = DataFormat.Parquet,
    infoDateColumn: String = "info_date",
    scheme: PartitionScheme = PartitionScheme.ByDay,
    transientCache: Boolean = false,
    catalogSync: Boolean = false,
    catalogName: Option[String] = None,
    cachePolicy: Option[CachePolicy] = None,
    catalogRepair: CatalogRepair = CatalogRepair.Recover,
    readOptions: Map[String, String] = Map.empty,
    writeOptions: Map[String, String] = Map.empty,
    /** Physical batch marker (reference: MetaTable.batchIdColumn,
      * `batchid.column` key, default name `pramen_batchid`): every
      * save stamps the run's batch id into this column, so a day
      * partition holding several APPENDED incremental batches stays
      * addressable per batch (`MetastoreReader.getBatch`) and a
      * replayed batch is identifiable for idempotent cleanup. Opt-in:
      * None leaves saves untouched. */
    batchIdColumn: Option[String] = None) {
  /** The policy actually applied to reads. */
  def effectiveCachePolicy: CachePolicy =
    cachePolicy.getOrElse(if (transientCache) CachePolicy.Cache else CachePolicy.NoCache)
}

/** Per-save statistics (reference: pramen/core .../metastore/MetaTableStats.scala). */
final case class TableStats(recordCount: Long, sizeBytes: Option[Long])

/** A (table, infoDate) partition reference. */
final case class PartitionRef(table: String, infoDate: LocalDate)

/** Bookkeeping facts about one (table, infoDate) run, surfaced to
  * transformers (reference: pramen/api .../api/MetaTableRunInfo). */
final case class TableRunInfo(table: String, infoDate: LocalDate,
                              recordCount: Long, status: String,
                              startedAtMs: Long, finishedAtMs: Long)
