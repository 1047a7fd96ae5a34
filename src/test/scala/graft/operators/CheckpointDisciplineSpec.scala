package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The release half of the localCheckpoint discipline: the helper must
  * actually free blocks (a silent no-op would quietly reintroduce the
  * r14 cross-query memory squeeze), and the operators that checkpoint
  * decode-heavy intermediates must leave nothing EXTRA pinned behind
  * them beyond their own materialized output. */
class CheckpointDisciplineSpec extends SparkSpec {
  import spark.implicits._

  private def persistedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("freeLocalCheckpoint releases exactly the checkpoint's blocks") {
    val before = persistedRddIds
    val cp = (1L to 1000L).toDF("x").localCheckpoint(true)
    val added = persistedRddIds -- before
    assert(added.nonEmpty, "localCheckpoint must register a persistent RDD")
    CheckpointDiscipline.freeLocalCheckpoint(cp)
    assert((persistedRddIds -- before).isEmpty,
      "checkpoint blocks must be gone after freeLocalCheckpoint")
    // no-op on a plain (non-checkpointed) frame
    CheckpointDiscipline.freeLocalCheckpoint((1L to 10L).toDF("x"))
  }

  test("connectedComponents (distributed path) frees every superseded round") {
    val before = persistedRddIds
    // string ids force the distributed hook+compress path (the driver
    // fast path only takes integral ids)
    val pairs = (1 to 400).map(i => (s"n$i", s"n${i + 1}")).toDF("a", "b")
    val labels = DupGroups.connectedComponents(pairs, "a", "b")
    labels.count()
    val leaked = persistedRddIds -- before
    // only the FINAL labels frame may stay pinned (it is the return
    // value); every round intermediate and the edge list must be gone
    assert(leaked.size <= 1, s"superseded round checkpoints leaked: $leaked")
  }

  test("hammingCandidates leaves only its materialized pair output pinned") {
    val before = persistedRddIds
    val rows = (1L to 500L).map(i => (i, i * 0x9E3779B97F4A7C15L)).toDF("doc_id", "sh")
    val out = Dedup.hammingCandidates(rows, maxHamming = 4, maxBucket = 1000)
    out.count()
    val leaked = persistedRddIds -- before
    assert(leaked.size <= 1, s"input cache leaked past the eager output: $leaked")
  }
}
