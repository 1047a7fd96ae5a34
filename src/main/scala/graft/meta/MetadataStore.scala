package graft.meta

import java.time.LocalDate

/**
 * Storage contract for key-value metadata attached to a (table,
 * infoDate) partition (reference: pramen/api
 * .../api/MetadataManager.scala and its FS/JDBC twins
 * core/metadata/MetadataManagerPersistence*.scala — pipelines annotate
 * partitions with lineage/quality facts downstream jobs read).
 *
 * The default is the metastore's own per-table `_graft/meta_kv/` file
 * layout; [[graft.rdb.MetadataStoreJdbc]] moves the same surface into
 * the bookkeeping database so drivers without a shared mount see each
 * other's annotations.
 */
/** Undercover variant (see `pipeline.UndercoverBookkeeper`): reads
  * delegate, writes/deletes drop — an incident re-drive must not
  * overwrite the metadata the next real run reads. */
final class UndercoverMetadataStore(delegate: MetadataStore) extends MetadataStore {
  override def set(table: String, infoDate: LocalDate, key: String, value: String): Unit = ()
  override def get(table: String, infoDate: LocalDate, key: String): Option[String] =
    delegate.get(table, infoDate, key)
  override def list(table: String, infoDate: LocalDate): Map[String, String] =
    delegate.list(table, infoDate)
  override def delete(table: String, infoDate: LocalDate, key: String): Unit = ()
  override def deleteAll(table: String, infoDate: LocalDate): Unit = ()
}

trait MetadataStore {
  def set(table: String, infoDate: LocalDate, key: String, value: String): Unit
  def get(table: String, infoDate: LocalDate, key: String): Option[String]
  def list(table: String, infoDate: LocalDate): Map[String, String]
  /** Remove one annotation; absent keys are a no-op. */
  def delete(table: String, infoDate: LocalDate, key: String): Unit
  /** Remove every annotation of the partition. */
  def deleteAll(table: String, infoDate: LocalDate): Unit
}
