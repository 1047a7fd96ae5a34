package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Keyed diff of two table snapshots (typically two info-dates of one
 * metastore table): which keys were ADDED, REMOVED, or CHANGED — the
 * daily change report that catches an upstream silently dropping or
 * rewriting rows between deliveries, and the input to incremental
 * downstream processing when the source has no reliable offset
 * column.
 *
 * Shape: each side reduces to (key, content hash) — one projection,
 * the full-row payload never shuffles — then ONE full outer join on
 * the key. Content hash is xxhash64 over the non-key columns in a
 * CANONICAL column order (sorted by name), so physically reordered
 * columns between snapshots don't read as changes; column-SET changes
 * do, by design. Duplicate keys hash as a multiset (sorted-hash
 * aggregate per key) so a key's copies changing count reads as
 * CHANGED, not silence.
 */
object SnapshotDiff {

  /** (key columns..., change: added|removed|changed). Unchanged keys
    * are omitted — at 100 TB the diff output is the interesting
    * minority, and downstream anti-joins want exactly this frame. */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "SnapshotDiff: at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted)
      || before.columns.intersect(after.columns).nonEmpty,
      "SnapshotDiff: snapshots share no columns")

    def hashed(df: DataFrame): DataFrame = {
      val payload = df.columns.filterNot(keyCols.contains).sorted
      // null-tagged per-column encoding: xxhash64 leaves its running
      // seed UNCHANGED for a null argument, so hash(null, "x") would
      // equal hash("x", null) — a value migrating between two payload
      // columns (one going null) must read as CHANGED. Tagging makes
      // every argument non-null: "v:<value>" for present, "\u0000" for
      // null ("v:"-prefixed strings can never collide with the marker).
      val rowHash =
        if (payload.isEmpty) lit(0L)
        else xxhash64(payload.map(c =>
          coalesce(concat(lit("v:"), col(c).cast("string")), lit("\u0000"))): _*)
      // multiset hash per key: the SUM of per-row hashes is order-free
      // and counts copies (two identical rows sum differently than
      // one). Summed as decimal(38,0) — a long sum of 64-bit hashes
      // overflows, which ANSI mode (the Spark 4 default) turns into a
      // runtime error rather than a wrap
      df.select(keyCols.map(col) :+ rowHash.as("_h"): _*)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col("_h").cast("decimal(38,0)")).as("_hsum"), count(lit(1)).as("_n"))
    }

    // explicit aliases: before/after often derive from the SAME frame
    // (two filters of one table), and unqualified refs in the join
    // condition would trip Spark's ambiguous-self-join detection
    val b = hashed(before).alias("_b")
    val a = hashed(after).alias("_a")
    def bc(c: String) = col(s"_b.$c")
    def ac(c: String) = col(s"_a.$c")
    val keyEq = keyCols.map(k => bc(k) <=> ac(k)).reduce(_ && _)
    b.join(a, keyEq, "full_outer")
      .select(
        keyCols.map(k => coalesce(ac(k), bc(k)).as(k)) :+
          when(bc("_hsum").isNull, "added")
            .when(ac("_hsum").isNull, "removed")
            .when(ac("_hsum") =!= bc("_hsum") || ac("_n") =!= bc("_n"), "changed")
            .otherwise("unchanged").as("change"): _*)
      .where(col("change") =!= "unchanged")
  }

  /** One-row summary (added/removed/changed counts) for notifications. */
  def summary(before: DataFrame, after: DataFrame, keyCols: Seq[String]): DataFrame =
    diff(before, after, keyCols)
      .groupBy()
      .agg(
        // coalesce: sum over an empty diff is NULL, and the healthiest
        // case (identical snapshots) would NPE every consumer reading
        // getLong (r17 review)
        coalesce(sum(when(col("change") === "added", 1L).otherwise(0L)), lit(0L)).as("added"),
        coalesce(sum(when(col("change") === "removed", 1L).otherwise(0L)), lit(0L)).as("removed"),
        coalesce(sum(when(col("change") === "changed", 1L).otherwise(0L)), lit(0L)).as("changed"))
}
