package graft.pipeline

import graft.meta.Metastore

import java.time.LocalDate
import scala.collection.concurrent.TrieMap

/**
 * On-demand ("lazy") job materialization (reference: pramen/core
 * .../core/metastore/peristence/TransientJobManager.scala:39 — jobs
 * whose outputs are never scheduled; reading their table runs them
 * for exactly the dates being read). The orchestrator registers every
 * `isLazy` job here and excludes it from scheduling; transformers'
 * readers call [[ensure]] through the metastore reader's lazy hook.
 *
 * Semantics, matching the reference:
 *  - materialize-once: a slot with data is served as-is (re-runs of
 *    the READER don't re-run the lazy producer);
 *  - single-flight per (table, date): two concurrent readers of the
 *    same slot run the producer once, the loser waits;
 *  - chained lazy jobs recurse (a lazy job reading another lazy
 *    table materializes it first); cycles fail with a clear error
 *    instead of a stack overflow;
 *  - no bookkeeping: lazy outputs are intermediate by design — the
 *    reference keeps them out of its journal for the same reason.
 */
final class LazyJobManager(metastore: Metastore) {
  private val jobs = TrieMap.empty[String, JobDef]
  private val slotLocks = TrieMap.empty[(String, LocalDate), Object]
  private val inProgress = new ThreadLocal[Set[(String, LocalDate)]] {
    override def initialValue(): Set[(String, LocalDate)] = Set.empty
  }

  def register(job: JobDef): Unit = {
    // last-wins would silently drop a producer; lazy materialization
    // is keyed by table, so one table needs exactly ONE lazy producer
    // (multiple-jobs-per-table mode covers scheduled jobs only)
    val prev = jobs.put(job.outputTable, job)
    require(prev.forall(_.name == job.name),
      s"two lazy jobs ('${prev.get.name}', '${job.name}') produce table '${job.outputTable}'")
  }
  def isEmpty: Boolean = jobs.isEmpty

  /** Ensure `table` has data for `infoDate`, running its lazy
    * producer on demand; a no-op for non-lazy tables. */
  def ensure(table: String, infoDate: LocalDate): Unit = jobs.get(table).foreach { job =>
    val key = (table, infoDate)
    val seen = inProgress.get()
    if (seen.contains(key))
      throw new IllegalStateException(
        s"lazy-job cycle: '$table' for $infoDate is already materializing " +
          s"(chain: ${seen.map(k => s"${k._1}@${k._2}").mkString(" -> ")})")
    val lock = slotLocks.getOrElseUpdate(key, new Object)
    lock.synchronized {
      if (!metastore.listAvailableDates(table).contains(infoDate)) {
        inProgress.set(seen + key)
        try {
          val reader = metastore.readerFor(
            if (job.inputTables.nonEmpty) Some(job.inputTables.toSet) else None,
            currentInfoDate = Some(infoDate),
            runReason = "OnDemand",
            lazyResolve = Some(ensure))
          val df = OutputTransform.shape(
            job.transformer.run(reader, infoDate, job.options), job, infoDate)
          metastore.saveTable(table, infoDate, df)
        } finally inProgress.set(seen)
      }
    }
  }
}
