package graft.pipeline

import graft.expr.DateExpr

import java.time.LocalDate

/** Why a task was selected to run
  * (reference: pramen/api .../api/status/TaskRunReason.scala). */
sealed trait RunReason
object RunReason {
  /** The regular scheduled slot for the run date. */
  case object New extends RunReason
  /** A missed slot being caught up (gap between the last processed
    * info date and the current one). */
  case object Late extends RunReason
  /** A user-forced re-run (rerun / force-run historical mode). */
  case object Rerun extends RunReason
  /** An input table received data AFTER this output ran — the
    * dependent must recompute (late-arriving source data). */
  case object Update extends RunReason
}

/** One (infoDate, reason) the strategy decided to run
  * (reference: pramen/core .../core/pipeline/TaskPreDef). */
final case class TaskPreDef(infoDate: LocalDate, reason: RunReason)

/** Historical-range behavior
  * (reference: pramen/api .../api/RunMode.scala). */
sealed trait RunMode
object RunMode {
  /** Run only (table, infoDate) pairs with no successful record —
    * fill the gaps, never touch completed days. */
  case object FillGaps extends RunMode
  /** Re-run every date in the range, completed or not. */
  case object ForceRun extends RunMode
}

/** How a pipeline invocation selects dates
  * (reference: pramen/core .../core/runner/splitter/ScheduleParams.scala). */
sealed trait RunParams
object RunParams {
  /** The daily-operations mode: today's slot plus automatic catch-up
    * of missed slots and re-runs of outputs whose inputs were updated
    * after they ran (late data, within each job's `trackDays`). */
  final case class Normal(runDate: LocalDate,
                          newOnly: Boolean = false,
                          lateOnly: Boolean = false) extends RunParams
  /** Force re-run of one run date regardless of bookkeeping. */
  final case class Rerun(runDate: LocalDate) extends RunParams
  /** A date-range (backfill) run: `--date-from/--date-to`. */
  final case class Historical(dateFrom: LocalDate, dateTo: LocalDate,
                              mode: RunMode = RunMode.FillGaps,
                              inverseDateOrder: Boolean = false) extends RunParams
}

/**
 * Computes WHICH info dates a job must run for — the reference
 * runner's daily-operations core re-expressed
 * (reference: pramen/core .../core/runner/splitter/ScheduleStrategyUtils.scala:97
 * `getLate`, :139 `getHistorical`, ScheduleStrategySourcing.scala:118).
 *
 * Pure date/bookkeeping logic — no Spark here. The orchestrator runs
 * the returned (infoDate, reason) list per job in topological order,
 * so a 5-day outage backfills exactly the missing (table, infoDate)
 * pairs and a late-landing source partition triggers exactly the
 * dependent re-computations.
 */
object ScheduleStrategy {

  /** Evaluate a job's info-date expression for one run date. */
  def evalInfoDate(runDate: LocalDate, expr: String): LocalDate =
    DateExpr("runDate" -> runDate, "date" -> runDate).evalDate(expr)

  /**
   * Distinct info dates produced by the schedule-enabled run dates in
   * `[dateFrom, dateTo]`, in run-date order
   * (reference: ScheduleStrategyUtils.scala `getInfoDateRange`).
   */
  def infoDateRange(dateFrom: LocalDate, dateTo: LocalDate,
                    infoDateExpr: String, schedule: Schedule): List[LocalDate] = {
    if (dateFrom.isAfter(dateTo)) Nil
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[LocalDate]
      var d = dateFrom
      while (!d.isAfter(dateTo)) {
        if (schedule.isEnabled(d)) seen += evalInfoDate(d, infoDateExpr)
        d = d.plusDays(1)
      }
      seen.toList
    }
  }

  /**
   * Missed-slot catch-up: info dates after the last processed one that
   * the schedule would have produced by now
   * (reference: ScheduleStrategyUtils.scala:97 `getLate`). With no
   * processing history, starts from the job's initial sourcing date
   * expression (first-deploy catch-up).
   */
  def lateDates(runDate: LocalDate, schedule: Schedule, infoDateExpr: String,
                initialDateExpr: String,
                lastProcessed: Option[LocalDate]): List[TaskPreDef] = {
    val yesterday = runDate.minusDays(1)
    lastProcessed match {
      case Some(lp) =>
        // walk run dates starting AT the last processed info date: info
        // dates trail run dates (e.g. "@runDate - 1"), so this covers
        // every run date that could produce a missed info date > lp
        infoDateRange(lp, yesterday, infoDateExpr, schedule)
          .filter(_.isAfter(lp))
          .map(TaskPreDef(_, RunReason.Late))
      case None =>
        val initial = evalInfoDate(runDate, initialDateExpr)
        infoDateRange(initial, yesterday, infoDateExpr, schedule)
          .filter(d => !d.isBefore(initial))
          .map(TaskPreDef(_, RunReason.Late))
    }
  }

  /**
   * Late-data detection: info dates in the `trackDays` window whose
   * output already succeeded but where some INPUT table has a
   * successful run that finished AFTER the output did — the upstream
   * partition landed late and the dependent must recompute
   * (reference: ScheduleStrategySourcing.scala:118 getBackFillDays +
   * MetastoreDependency trackDays semantics).
   */
  def updatedDates(runDate: LocalDate, trackDays: Int, schedule: Schedule,
                   infoDateExpr: String, outputTable: String,
                   inputTables: Seq[String],
                   bookkeeper: BookkeeperStore): List[TaskPreDef] = {
    if (trackDays <= 0 || inputTables.isEmpty) Nil
    else
      infoDateRange(runDate.minusDays(trackDays.toLong), runDate.minusDays(1),
        infoDateExpr, schedule)
        .filter { d =>
          bookkeeper.get(outputTable, d) match {
            case Some(out) if out.status == "succeeded" =>
              // compare against the input's LATEST successful record at
              // or before d — the slice the output's read consumed —
              // not an exact-date record: when the input job uses a
              // different infoDateExpr (or a sparser schedule) than the
              // output, no input record exists at exactly d and an
              // exact-match lookup would never detect the late data
              inputTables.exists(in => bookkeeper.latestSuccessRecord(in, d).exists(
                _.finishedAtMs > out.finishedAtMs))
            case _ => false // never ran -> lateDates' concern, not an update
          }
        }
        .map(TaskPreDef(_, RunReason.Update))
  }

  /**
   * The full decision: which (infoDate, reason) pairs one job runs for
   * under the given params
   * (reference: ScheduleStrategySourcing.scala `getDaysToRun`).
   */
  def daysToRun(job: JobDef, bookkeeper: BookkeeperStore, params: RunParams,
                minimumDate: Option[LocalDate] = None): List[TaskPreDef] = {
    val picked = params match {
      case RunParams.Normal(rawRunDate, newOnly, lateOnly) =>
        // expected.delay.days: the job's source lands N days late, so
        // the whole Normal decision runs as of N days ago — the slot
        // for a date is attempted only once its data can exist, and
        // not-yet-expected dates are never flagged as missed
        // (reference: ScheduleStrategySourcing getNew(runDate
        // .minusDays(delayDays), ...))
        val runDate = rawRunDate.minusDays(job.expectedDelayDays.toLong)
        val newDay =
          if (lateOnly || !job.schedule.isEnabled(runDate)) Nil
          else List(TaskPreDef(evalInfoDate(runDate, job.infoDateExpr), RunReason.New))
        val late =
          if (newOnly) Nil
          else lateDates(runDate, job.schedule, job.infoDateExpr,
            job.initialDateExpr, bookkeeper.latestSuccess(job.outputTable))
        val updated =
          if (newOnly) Nil
          else updatedDates(runDate, job.trackDays, job.schedule, job.infoDateExpr,
            job.outputTable,
            // triggerUpdates dependencies watch their tables for late
            // landings alongside the declared inputs; passive deps are
            // BY DEFINITION update-tracking-only, so they join the
            // watch without needing the flag spelled out
            (job.inputTables ++
              job.dependencies.filter(d => d.triggerUpdates || d.passive).flatMap(_.tables)).distinct,
            bookkeeper)
        // reasons earlier in the list win the per-date dedup (a date
        // that is both Update and Late keeps the forcing reason)
        (updated ++ late ++ newDay)
          .groupBy(_.infoDate).map(_._2.head).toList
          .sortBy(_.infoDate.toEpochDay)

      case RunParams.Rerun(runDate) =>
        if (!job.schedule.isEnabled(runDate)) Nil
        else List(TaskPreDef(evalInfoDate(runDate, job.infoDateExpr), RunReason.Rerun))

      case RunParams.Historical(from, to, mode, inverse) =>
        val range = infoDateRange(from, to, job.infoDateExpr, job.schedule)
        val tasks = mode match {
          case RunMode.FillGaps =>
            range.filterNot(bookkeeper.isAlreadyRan(job.outputTable, _))
              .map(TaskPreDef(_, RunReason.New))
          case RunMode.ForceRun =>
            range.map(d => TaskPreDef(d,
              if (bookkeeper.isAlreadyRan(job.outputTable, d)) RunReason.Rerun
              else RunReason.New))
        }
        val sorted = tasks.sortBy(_.infoDate.toEpochDay)
        if (inverse) sorted.reverse else sorted
    }
    minimumDate.fold(picked)(min => picked.filter(t => !t.infoDate.isBefore(min)))
  }
}
