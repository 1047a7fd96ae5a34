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

  test("truncate uses RELIABLE checkpoints when the session has a checkpoint dir") {
    // the production posture: a locally-checkpointed iterative round
    // is lost on executor failure; with sparkContext.setCheckpointDir
    // the rounds must go to durable storage instead — same results
    val dir = java.nio.file.Files.createTempDirectory("cc_reliable_").toString
    val pairs = (1 to 300).map(i => (s"n$i", s"n${i + 1}")).toDF("a", "b")
    val plain = DupGroups.connectedComponents(pairs, "a", "b")
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliable = DupGroups.connectedComponents(pairs, "a", "b")
        .orderBy("id").collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(reliable == plain, "durable rounds must not change the labels")
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(files > 0, s"no reliable checkpoint data written under $dir")
    } finally spark.sparkContext.setCheckpointDir(null)
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
