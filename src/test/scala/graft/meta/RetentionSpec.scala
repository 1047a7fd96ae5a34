package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** Partition retention: old slices deleted, surviving data intact,
  * catalog partitions dropped, metadata KV cleaned, format guards. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val days = Seq("2024-06-01", "2024-06-02", "2024-06-03", "2024-06-04")
    .map(LocalDate.parse)

  private def seed(ms: Metastore, name: String): Unit =
    days.zipWithIndex.foreach { case (d, i) =>
      ms.saveTable(name, d, Seq((i.toLong, s"day$i")).toDF("id", "tag"))
    }

  test("expirePartitions drops exactly the pre-cutoff dates; survivors read intact") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("ret_t", tmpDir("ret_") + "/t"))
    seed(ms, "ret_t")
    ms.setMetadata("ret_t", days.head, "note", "oldest")

    val dropped = ms.expirePartitions("ret_t", keepFrom = days(2))
    assert(dropped == days.take(2), dropped.toString)
    assert(ms.listAvailableDates("ret_t") == days.drop(2))
    // surviving partitions still read; expired reads are empty
    assert(ms.getTable("ret_t", Some(days(2)), Some(days(3))).count() == 2)
    assert(ms.getTable("ret_t", Some(days.head), Some(days(1))).count() == 0)
    // the dropped partition's metadata went with it
    assert(ms.getMetadata("ret_t", days.head, "note").isEmpty)
    // idempotent: nothing left to drop
    assert(ms.expirePartitions("ret_t", keepFrom = days(2)).isEmpty)
  }

  test("catalog-synced table: dropped partitions leave the catalog too") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("ret_cat", tmpDir("retc_") + "/t", catalogSync = true))
    seed(ms, "ret_cat")
    val before = spark.sql("SHOW PARTITIONS ret_cat").count()
    assert(before == 4)
    ms.expirePartitions("ret_cat", keepFrom = days(3))
    assert(spark.sql("SHOW PARTITIONS ret_cat").count() == 1)
    assert(spark.table("ret_cat").count() == 1, "catalog reads see only survivors")
  }

  test("guards: non-ByDay, Delta/Iceberg and path-less formats are refused") {
    val ms = new Metastore(spark)
    ms.register(MetaTable("ret_m", tmpDir("retm_") + "/t",
      scheme = PartitionScheme.ByMonth()))
    intercept[IllegalArgumentException] {
      ms.expirePartitions("ret_m", days.head) }
    ms.register(MetaTable("ret_null", "", format = DataFormat.NullFormat))
    intercept[IllegalArgumentException] {
      ms.expirePartitions("ret_null", days.head) }
  }
}
