package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-key ground truth, and the actual SKIPPING —
  * parquet row-group stats prune scans on every layout column, where a
  * linear sort prunes only its leading column. Measured through the
  * scan's numOutputRows metric (rows surviving row-group-level
  * pushdown), not just plan text. */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves rank bits, first column outermost") {
    // 2 cols, 2 bits: key = a1 b1 a0 b0 (msb..lsb)
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
      .select(DataSkipping.zorderKey(Seq(col("a"), col("b")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a=1,b=0 -> a0=1 at bit1 -> 2 ; a=0,b=1 -> b0=1 at bit0 -> 1
    // a=3,b=3 -> 1111 -> 15    ; a=2,b=1 -> a1 at bit3, b0 at bit0 -> 9
    assert(got == Seq(0L, 2L, 1L, 15L, 9L))
  }

  test("linearRank: edge clamping and null policy") {
    val r = Seq(Some(0.0), Some(99.9), Some(-5.0), Some(200.0), None)
      .toDF("v")
      .select(DataSkipping.linearRank(col("v"), 0.0, 100.0, 4).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(r(0) == 0L && r(1) == 15L, s"range endpoints: $r")
    assert(r(2) == 0L && r(3) == 15L, "out-of-range clamps to edge buckets")
    assert(r(4) == 0L, "null lands in the lowest bucket, never errors")
  }

  /** Rows read off disk after parquet row-group pruning for a scan of
    * `path` under `pred` (the scan's numOutputRows counts rows the
    * reader DELIVERED, i.e. rows in row groups whose min/max stats
    * overlapped the pushed filter — record-level parquet filtering is
    * off by default, so this is exactly the skipping signal). */
  private def rowsRead(path: String, pred: org.apache.spark.sql.Column): Long = {
    val q = spark.read.parquet(path).where(pred)
    q.collect()
    fileScans(q).map(_.metrics("numOutputRows").value).sum
  }

  test("z-order prunes row groups on BOTH columns; linear sort only on its leading column") {
    // 64k-point uniform 2D grid; written as 16 files (one row group each)
    val n = 256
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).cast("int").as("x"),
      (col("id") / n).cast("int").as("y"),
      col("id").as("payload"))
    val total = n.toLong * n

    val zDir = tmpDir("zorder_") + "/t"
    DataSkipping.zorderWrite(grid, Seq("x", "y"), zDir, files = 16, bits = 8)
    val linDir = tmpDir("linear_") + "/t"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(linDir)

    // a 1/16-wide slice on each dimension
    val xs = col("x") < n / 16
    val ys = col("y") < n / 16

    val zX = rowsRead(zDir, xs); val zY = rowsRead(zDir, ys)
    val lX = rowsRead(linDir, xs); val lY = rowsRead(linDir, ys)

    // linear-by-x: x-slice reads ~1 file; y-slice reads EVERYTHING
    assert(lX <= total / 8, s"linear layout must prune on x: $lX of $total")
    assert(lY == total, s"linear layout cannot prune on y: $lY of $total")
    // z-order: both slices skip most row groups (4 of 16 quadrant-cells)
    assert(zX <= total / 2, s"z-order must prune on x: $zX of $total")
    assert(zY <= total / 2, s"z-order must prune on y: $zY of $total")
    // and the answers are identical regardless of layout
    assert(spark.read.parquet(zDir).where(xs && ys).count() ==
      spark.read.parquet(linDir).where(xs && ys).count())
  }

  test("quantile ranks keep a SKEWED column discriminating where linear ranks collapse") {
    // zipf-ish x: 90% of rows in [0, 10), a thin tail to 1e6 — a
    // linear (min/max) rank puts the dense mass in bucket 0 and the
    // x-dimension stops pruning anything inside it
    val n = 65536
    val grid = spark.range(n.toLong).select(
      when(col("id") % 10 < 9, col("id") % 10)
        .otherwise((col("id") % 1000L) * 1000L).cast("double").as("x"),
      (col("id") % 256).cast("int").as("y"))

    // 64 files so the x dimension keeps 3 bits of discrimination at
    // file granularity (16 files would leave it only 2)
    val qDir = tmpDir("zq_") + "/t"
    DataSkipping.zorderWrite(grid, Seq("x", "y"), qDir, files = 64, bits = 8,
      quantileRanks = true)
    val lDir = tmpDir("zl_") + "/t"
    DataSkipping.zorderWrite(grid, Seq("x", "y"), lDir, files = 64, bits = 8)

    // a filter INSIDE the dense mass selecting ~2/9 of all rows
    val pred = col("x") < 2.0
    def read(path: String): Long = {
      val q = spark.read.parquet(path).where(pred)
      q.collect()
      fileScans(q).map(_.metrics("numOutputRows").value).sum
    }
    val lin = read(lDir); val quant = read(qDir)
    assert(lin >= (n * 0.85).toLong,
      s"linear ranks cannot prune inside the dense mass: $lin of $n")
    assert(quant <= n / 2,
      s"quantile ranks must keep pruning inside the dense mass: $quant of $n")
    // identical answers either way
    assert(spark.read.parquet(qDir).where(pred).count() ==
      spark.read.parquet(lDir).where(pred).count())
  }

  test("parquet Bloom filters prune point lookups on an unsorted high-cardinality column") {
    // ids shuffled so every row group's min/max covers ~the full range:
    // stats-based pruning is impossible by construction, only the
    // Bloom filter can skip groups
    val n = 200000L
    val df = spark.range(n).repartition(16).select(
      expr("xxhash64(id)").as("key"),            // high-cardinality, unordered
      col("id").as("payload"))
    val probe = df.where(col("payload") === 123456L).head().getLong(0)

    val bloomDir = tmpDir("bloom_") + "/t"
    DataSkipping.writeWithBloomFilters(df, Seq("key"), bloomDir,
      ndvPerGroup = 50000L, rowGroupBytes = 1L * 1024 * 1024)
    val plainDir = tmpDir("plain_") + "/t"
    df.write.option("parquet.block.size", (1L * 1024 * 1024).toString).parquet(plainDir)

    def rowsRead(path: String): Long = {
      val q = spark.read.parquet(path).where(col("key") === probe)
      assert(q.collect().length == 1, "the probed key exists exactly once")
      fileScans(q).map(_.metrics("numOutputRows").value).sum
    }
    val withBloom = rowsRead(bloomDir)
    val without = rowsRead(plainDir)
    assert(without == n, s"min/max stats cannot prune the shuffled column: $without")
    assert(withBloom < n / 4,
      s"bloom row-group skipping must prune the point lookup: $withBloom of $n")
  }
}
