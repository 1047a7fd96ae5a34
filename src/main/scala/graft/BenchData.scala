package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Locally-generated sf1 benchmark data: a deterministic 10× key-shifted
 * replication of the driver's read-only sf0.1 tables (TESTDATA.md ships
 * no generator, and /root/testdata is read-only). Each copy `i` shifts
 * every primary AND foreign key by `i * stride(dimension)`, where the
 * stride is `max(dimension key) + 1` — so copies never collide and
 * every join edge (lineitem→orders/part/supplier, orders→customer)
 * stays intact. region/nation are genuine dimensions and stay as-is,
 * exactly like TPC-H scaling.
 *
 * Why this matters: at sf0.1 the 0.5–1 s fixed overhead (session, scan
 * setup, codegen) dominates most queries, so plan differences are
 * invisible — sf1 is where a shuffle too many or a lost pushdown
 * actually shows up in the timings.
 *
 * Text/vector payloads are byte-identical across copies. Queries whose
 * semantics hinge on near-duplicate structure are therefore measuring
 * the MASS-DUPLICATION path at sf1, not organic scaling — and the
 * dedup-family queries (q_dedup_minhash, q_semdedup, q_curation_v2)
 * are deliberately kept in the set for exactly that reason: the
 * replicated corpus is the target pathology of their adaptive plans.
 * Note also the per-table replication strides differ (documents 5000,
 * embeddings 2000), so doc_id↔vec_id alignment is scrambled vs sf0.1:
 * timing-valid, row-correctness-invalid.
 */
object BenchData {
  val DefaultOut = "/root/repo/benchdata/sf1"
  val Marker = "_GRAFT_SCALED_OK"
  /** Marker for the unique-docs variant (see `uniqueDocs`). */
  val UniqueDocsMarker = "_GRAFT_UNIQUE_DOCS_OK"

  /** Generate if missing; returns true when generation ran.
    *
    * Documents replicate VERBATIM here (mass-duplication adaptive
    * plans + honest token statistics are the point of this corpus);
    * the near-dup shape probe reads [[ensureUniqueDocsDir]]'s
    * separate documents-only dir instead — per-copy token suffixes
    * there give zero cross-copy shingles (pairs stay linear in
    * scale) but inflate the token vocabulary ×copies, which the r16
    * probe measured distorting the frequency workloads (q_freq_items
    * 394 s on suffixed vocab), hence the two dirs. A dir left with a
    * unique-docs documents table by a pre-split run is repaired in
    * place (its `UniqueDocsMarker` betrays it). */
  def ensureScaled(spark: SparkSession, srcDir: String,
                   outDir: String = DefaultOut, copies: Int = 10): Boolean = {
    val marker = new java.io.File(outDir, Marker)
    val docsMarker = new java.io.File(outDir, UniqueDocsMarker)
    if (marker.exists() && !docsMarker.exists()) return false
    // events.parquet carries TIMESTAMP(NANOS): read nanos as longs
    // (SparkEntry.events handles either representation on read)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def read(name: String) = spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // strides come from the key's OWN dimension, so foreign keys shift
    // in lockstep with the primary keys they reference
    def strideOf(df: DataFrame, col0: String): Long =
      df.agg(max(col(col0))).head().getLong(0) + 1L

    val custStride = strideOf(read("customer"), "c_custkey")
    val suppStride = strideOf(read("supplier"), "s_suppkey")
    val partStride = strideOf(read("part"), "p_partkey")
    val orderStride = strideOf(read("orders"), "o_orderkey")

    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val copiesDf = spark.range(copies).toDF("_copy")
      shifts.foldLeft(df.crossJoin(copiesDf)) { case (acc, (c, stride)) =>
        acc.withColumn(c, col(c) + col("_copy") * lit(stride))
      }.drop("_copy")
    }

    val needBase = !marker.exists()
    if (needBase) {
      write(read("region"), "region")
      write(read("nation"), "nation")
      write(replicate(read("customer"), "c_custkey" -> custStride), "customer")
      write(replicate(read("supplier"), "s_suppkey" -> suppStride), "supplier")
      write(replicate(read("part"), "p_partkey" -> partStride), "part")
      write(replicate(read("orders"),
        "o_orderkey" -> orderStride, "o_custkey" -> custStride), "orders")
      write(replicate(read("lineitem"),
        "l_orderkey" -> orderStride, "l_partkey" -> partStride,
        "l_suppkey" -> suppStride), "lineitem")
      write(replicate(read("events"),
        "event_id" -> strideOf(read("events"), "event_id")), "events")
      write(replicate(read("embeddings"),
        "vec_id" -> strideOf(read("embeddings"), "vec_id")), "embeddings")
    }
    // documents: verbatim replicas — also repairs a dir whose
    // documents table was left in the unique-docs variant
    write(docsReplicated(spark, srcDir, copies, unique = false), "documents")
    java.nio.file.Files.deleteIfExists(docsMarker.toPath)
    if (needBase) java.nio.file.Files.createFile(marker.toPath)
    true
  }

  private def docsReplicated(spark: SparkSession, srcDir: String,
                             copies: Int, unique: Boolean): DataFrame = {
    val base = spark.read.parquet(s"$srcDir/documents.parquet")
    val stride = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val copiesDf = spark.range(copies).toDF("_copy")
    val rep = base.crossJoin(copiesDf)
      .withColumn("doc_id", col("doc_id") + col("_copy") * lit(stride))
    val out = if (!unique) rep
      else rep.withColumn("text", array_join(
        transform(split(col("text"), "\\s+"),
          t => concat(t, lit("x"), col("_copy").cast("string"))), " "))
    out.drop("_copy")
  }

  /** Documents-ONLY unique-docs corpus (the near-dup shape probe
    * reads nothing else); idempotent via its own marker. */
  def ensureUniqueDocsDir(spark: SparkSession, srcDir: String,
                          outDir: String, copies: Int): Boolean = {
    val marker = new java.io.File(outDir, UniqueDocsMarker)
    if (marker.exists()) return false
    docsReplicated(spark, srcDir, copies, unique = true)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    java.nio.file.Files.createFile(marker.toPath)
    true
  }
}
