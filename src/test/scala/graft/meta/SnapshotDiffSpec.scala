package graft.meta

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Keyed snapshot diff: class assignment, column-order insensitivity,
  * duplicate-key multisets, null keys, summary counts. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("identical snapshots summarize to (0, 0, 0), not nulls (r17 review)") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val r = SnapshotDiff.summary(snap, snap, Seq("k")).head()
    assert(!r.isNullAt(0) && r.getLong(0) == 0L)
    assert(!r.isNullAt(1) && r.getLong(1) == 0L)
    assert(!r.isNullAt(2) && r.getLong(2) == 0L)
  }

  test("added/removed/changed/unchanged classified; unchanged omitted") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "amount")
    val after = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0))
      .toDF("k", "name", "amount")
    val d = SnapshotDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"), d.toString)
  }

  test("physically reordered columns are NOT a change; value moves are") {
    val before = Seq((1L, "x", 5.0)).toDF("k", "name", "amount")
    val after = before.select("amount", "k", "name")  // same data, new layout
    assert(SnapshotDiff.diff(before, after, Seq("k")).count() == 0,
      "canonical column order must make layout changes invisible")
    val swapped = Seq((1L, "5.0", 0.0)).toDF("k", "name", "amount")
    assert(SnapshotDiff.diff(before, swapped, Seq("k")).count() == 1,
      "values moving BETWEEN columns must read as changed")
  }

  test("a value migrating between columns (one going null) is a change") {
    // xxhash64 skips null arguments, so without null-tagging
    // (null, "x") and ("x", null) would hash identically
    val before = Seq((1L, Some("x"), Option.empty[String])).toDF("k", "a", "b")
    val after = Seq((1L, Option.empty[String], Some("x"))).toDF("k", "a", "b")
    val d = SnapshotDiff.diff(before, after, Seq("k")).collect()
    assert(d.length == 1 && d.head.getString(1) == "changed",
      s"null-position must participate in the row hash: ${d.toSeq}")
  }

  test("duplicate keys: copy-count changes are changes, not silence") {
    val before = Seq((1L, "a"), (1L, "a")).toDF("k", "v")
    val after = Seq((1L, "a")).toDF("k", "v")
    val d = SnapshotDiff.diff(before, after, Seq("k")).collect()
    assert(d.length == 1 && d.head.getString(1) == "changed", d.toSeq.toString)
  }

  test("null keys join to themselves; summary counts roll up") {
    val before = Seq((Some(1L), "a"), (None, "n1")).toDF("k", "v")
    val after = Seq((Some(1L), "a"), (None, "n2")).toDF("k", "v")
    val d = SnapshotDiff.diff(before, after, Seq("k")).collect()
    assert(d.length == 1 && d.head.isNullAt(0) && d.head.getString(1) == "changed",
      "the null key's value change must surface once, not as add+remove")
    val s = SnapshotDiff.summary(before, after, Seq("k")).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == ((0L, 0L, 1L)))
  }
}
