package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Release discipline for `localCheckpoint` intermediates.
 *
 * `Dataset.localCheckpoint` pins the materialized rows in the block
 * manager with NO public release API — unlike `persist`, there is no
 * `un-checkpoint`. Iterative operators that truncate lineage per round
 * (connected components) and multi-branch operators that materialize a
 * decode-heavy frame once (hamming banding over media hashes) used to
 * leave every round's blocks pinned for the session's lifetime; in the
 * r14 bench sweep those accumulated across 122 queries and squeezed
 * later queries' execution memory (measured: 12.3 s in-sweep vs 0.89 s
 * isolated on an untouched query). The fix is the same shape
 * everywhere: materialize the SMALL final output eagerly, then free
 * every superseded checkpoint through its underlying RDD.
 *
 * `freeLocalCheckpoint` finds the checkpointed RDDs under a frame's
 * analyzed plan (`LogicalRDD` leaves) and unpersists their blocks.
 * Only call it on frames whose consumers are all MATERIALIZED: a
 * local checkpoint truncates lineage, so a consumer forced to
 * recompute after the blocks are gone fails (the same executor-loss
 * caveat `localCheckpoint` itself documents).
 */
private[graft] object CheckpointDiscipline {

  /** Unpersist the checkpoint blocks backing `df` (no-op for frames
    * that are not local checkpoints). Non-blocking. */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Lineage truncation that honors the cluster's durability setting:
    * RELIABLE `checkpoint` when the session has a checkpoint dir
    * (`sparkContext.setCheckpointDir` — the production posture, since
    * a locally-checkpointed iterative result is LOST on executor
    * failure and cannot be recomputed), `localCheckpoint` otherwise
    * (single-JVM runs, tests, local mode). Always eager. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
