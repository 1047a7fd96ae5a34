package graft.pipeline

import graft.expr.DateExpr
import graft.meta.Metastore

import java.time.LocalDate
import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

/**
 * A pipeline job: transformer + output table + declared inputs
 * (reference: pramen/core .../core/pipeline/Job.scala,
 * api/jobdef/TransformerDef).
 *
 * @param infoDateExpr    date-DSL expression deriving the information
 *                        date from `@runDate` (e.g. `"@runDate - 1"`).
 * @param retries         additional attempts after a failed run (the
 *                        reference runner's task retry policy).
 * @param trackDays       how many days back to watch inputs for
 *                        late-arriving data: an input success recorded
 *                        AFTER this job's output ran triggers a re-run
 *                        of the affected info date (reference:
 *                        api/status/MetastoreDependency trackDays).
 * @param initialDateExpr info date to start catch-up from when the job
 *                        has never run (reference: the runner's
 *                        initial.sourcing.date.expr).
 * @param sink            when set, the transformer's output goes to
 *                        this sink INSTEAD of a metastore table —
 *                        `outputTable` becomes a virtual name (the
 *                        reference's "table->sink" convention) used
 *                        for bookkeeping, locking and DAG edges only
 *                        (reference: pramen/core
 *                        .../core/pipeline/SinkJob.scala,
 *                        TransferJob.scala).
 * @param outputTransforms declarative column rewrites applied to the
 *                        job's output before it is saved/sent, in
 *                        order (later transforms see earlier ones);
 *                        empty/"drop" expression drops the column
 *                        (reference: api/jobdef/TransformExpression,
 *                        core/utils/SparkUtils.applyTransformations).
 * @param outputFilters   SQL predicates applied after the transforms;
 *                        `@infoDate` substitutes the task's info date
 *                        as a date literal (reference:
 *                        SparkUtils.applyFilters).
 * @param outputColumns   final projection after transforms + filters
 *                        (reference: OperationDef columns).
 * @param minimumRecords  fail the task when the output has fewer rows
 *                        (the partition IS saved — the failure marks
 *                        the run for re-delivery, it doesn't roll the
 *                        write back); 0 disables (reference: pramen's
 *                        minimum.records / fail.if.no.data options).
 * @param sparkConf       session conf overrides set for the duration
 *                        of this job's run and restored after —
 *                        per-operation tuning such as
 *                        spark.sql.shuffle.partitions for a small
 *                        dimension job (reference: OperationDef
 *                        extraOptions / spark.conf block).
 * @param optionalInputs  inputs whose producing job may fail without
 *                        skipping this job (the reference's optional
 *                        MetastoreDependency): the transformer then
 *                        decides via `validate` whether it can run
 *                        from what's available.
 */
final case class JobDef(
    name: String,
    outputTable: String,
    transformer: Transformer,
    inputTables: Seq[String] = Seq.empty,
    schedule: Schedule = Schedule.Daily(),
    infoDateExpr: String = "@runDate",
    options: Map[String, String] = Map.empty,
    retries: Int = 0,
    trackDays: Int = 0,
    initialDateExpr: String = "@runDate",
    sink: Option[SinkTarget] = None,
    outputTransforms: Seq[OutputTransform] = Seq.empty,
    outputFilters: Seq[String] = Seq.empty,
    outputColumns: Seq[String] = Seq.empty,
    minimumRecords: Long = 0L,
    sparkConf: Map[String, String] = Map.empty,
    optionalInputs: Set[String] = Set.empty)

/** One declarative output rewrite: `column <- expression`; a missing,
  * empty or literal-"drop" expression drops the column instead. */
final case class OutputTransform(column: String, expression: Option[String])

object OutputTransform {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.{col, expr}

  /** Shape a job's output: transforms (in order) → filters (with
    * `@infoDate` substituted) → column projection. Purely
    * declarative — every step stays inside the job's single Catalyst
    * plan, so filters still push down and unused transform columns
    * are pruned. */
  def shape(df: DataFrame, job: JobDef, infoDate: LocalDate): DataFrame = {
    val transformed = job.outputTransforms.foldLeft(df) { (acc, t) =>
      t.expression.map(_.trim).filter(e => e.nonEmpty && !e.equalsIgnoreCase("drop")) match {
        case Some(e) => acc.withColumn(t.column, expr(e))
        case None => acc.drop(t.column)
      }
    }
    val filtered = job.outputFilters.foldLeft(transformed)((acc, f) =>
      acc.filter(expr(f.replace("@infoDate", s"date'$infoDate'"))))
    if (job.outputColumns.nonEmpty) filtered.select(job.outputColumns.map(col): _*)
    else filtered
  }
}

/** A sink destination for a sink/transfer job: the sink plus the
  * logical table name handed to `GraftSink.send` (sinks key their
  * output layout by it). */
final case class SinkTarget(sink: graft.sinks.GraftSink, tableName: String)

sealed trait TaskResult { def job: String }
object TaskResult {
  final case class Succeeded(job: String, table: String, infoDate: LocalDate, records: Long) extends TaskResult
  final case class Skipped(job: String, reason: String) extends TaskResult
  final case class Failed(job: String, error: Throwable) extends TaskResult
  final case class NotReady(job: String, reason: String) extends TaskResult
}

/**
 * Dependency-resolving parallel pipeline runner
 * (reference: pramen/core .../core/runner/orchestrator/OrchestratorImpl.scala,
 * core/runner/jobrunner/ConcurrentJobRunnerImpl.scala).
 *
 * Topologically orders jobs by (outputTable -> inputTables) edges and
 * runs every job whose dependencies are satisfied concurrently (the
 * reference's parallel task runner). Already-succeeded (table,
 * infoDate) pairs are skipped via the bookkeeper — auto-healing
 * re-runs only what's missing. Job-level parallelism multiplies
 * cluster utilization when independent branches exist; within a job,
 * Spark's own parallelism does the heavy lifting.
 */
final class Orchestrator(
    metastore: Metastore,
    bookkeeper: Bookkeeper = new Bookkeeper(),
    parallelism: Int = 4,
    rerunSucceeded: Boolean = false,
    notifiers: Seq[PipelineNotificationTarget] = Seq.empty,
    lockDir: Option[String] = None,
    offsetManager: Option[graft.offset.OffsetManager] = None) {

  def run(jobs: Seq[JobDef], runDate: LocalDate): Seq[TaskResult] =
    runTree(jobs, job => Seq(runOne(job, runDate)), rs => notifiers.foreach(_.onPipelineCompleted(rs, runDate)))

  /**
   * Run under explicit run params — the daily-operations entry point
   * (reference: pramen/core .../core/runner/splitter):
   *
   *  - `RunParams.Normal`: today's slot + automatic catch-up of missed
   *    slots (`Late`) + re-runs of dates whose inputs landed after the
   *    output ran (`Update`, within each job's `trackDays`);
   *  - `RunParams.Rerun`: force one date;
   *  - `RunParams.Historical`: `--date-from/--date-to` backfill,
   *    fill-gaps or force-rerun.
   *
   * Dates are decided per job by [[ScheduleStrategy.daysToRun]] and
   * executed in date order; jobs still run in dependency (topological)
   * order with independent branches in parallel, so a multi-day
   * backfill completes table-by-table for each date with parents
   * before children.
   */
  /**
   * @param dateParallelism how many of one job's dates run
   *        concurrently. Default 1 (sequential, date order) — always
   *        correct, required for cumulative tables whose day N reads
   *        day N-1. Raise it for jobs whose dates are independent
   *        (ingestion, per-day transforms): a 4,000-partition
   *        historical backfill at 1 date a time starves a big
   *        cluster; at 8–16 the writes pipeline while Spark
   *        parallelizes within each date as usual. Different dates
   *        write different partitions, so concurrent saves don't
   *        conflict.
   */
  def runWith(jobs: Seq[JobDef], params: RunParams,
              minimumDate: Option[LocalDate] = None,
              dateParallelism: Int = 1): Seq[TaskResult] = {
    require(dateParallelism >= 1, s"dateParallelism must be >= 1: $dateParallelism")
    // incremental consumption is inherently sequential: two dates of
    // the same job running concurrently would BOTH read "past the
    // committed offset" before either commits, consuming the same
    // delta twice
    require(dateParallelism == 1 || offsetManager.isEmpty,
      "dateParallelism > 1 cannot be combined with an offset manager: " +
        "concurrent dates would consume the same incremental delta twice")
    val asOf = params match {
      case RunParams.Normal(d, _, _) => d
      case RunParams.Rerun(d) => d
      case RunParams.Historical(_, to, _, _) => to
    }
    def runTask(job: JobDef)(t: TaskPreDef): TaskResult = {
      val force = t.reason == RunReason.Rerun || t.reason == RunReason.Update
      val r =
        if (!force && !rerunSucceeded && bookkeeper.isAlreadyRan(job.outputTable, t.infoDate))
          TaskResult.Skipped(job.name, s"already succeeded for ${t.infoDate}")
        else executeTask(job, t.infoDate, reason = t.reason.toString)
      notifiers.foreach(_.onTaskCompleted(r, asOf))
      r
    }
    runTree(jobs, job => {
      val tasks = ScheduleStrategy.daysToRun(job, bookkeeper, params, minimumDate)
      if (tasks.isEmpty) Seq(TaskResult.Skipped(job.name, s"nothing to run for $params"))
      else if (dateParallelism == 1) tasks.map(runTask(job))
      else {
        val pool = Executors.newFixedThreadPool(dateParallelism)
        val ec = ExecutionContext.fromExecutor(pool)
        try Await.result(
          Future.sequence(tasks.map(t => Future(runTask(job)(t))(ec)))(
            implicitly, ec), Duration.Inf)
        finally pool.shutdown()
      }
    }, rs => notifiers.foreach(_.onPipelineCompleted(rs, asOf)))
  }

  /**
   * Dry run: the (job → dates+reasons) plan `runWith` would execute,
   * without executing anything — the operator's pre-flight check for
   * backfills ("which 4,000 partitions will this touch?") before
   * committing a cluster to them. Uses the same strategy code path,
   * so the plan IS what a real run would do given unchanged
   * bookkeeping. Update-cascade caveat: parents' re-runs happen
   * during a real run and can add child Update dates the dry run
   * cannot see yet.
   */
  def plan(jobs: Seq[JobDef], params: RunParams,
           minimumDate: Option[LocalDate] = None): Seq[(JobDef, Seq[TaskPreDef])] = {
    validateDag(jobs)
    jobs.map(j => j -> ScheduleStrategy.daysToRun(j, bookkeeper, params, minimumDate).toSeq)
  }

  /** Dependency-ordered parallel execution skeleton: each job's body
    * runs after all jobs producing its inputs; a failed dependency
    * task skips the dependent job. */
  private def runTree(jobs: Seq[JobDef], body: JobDef => Seq[TaskResult],
                      onDone: Seq[TaskResult] => Unit): Seq[TaskResult] = {
    validateDag(jobs)
    val byOutput = jobs.map(j => j.outputTable -> j).toMap
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = scala.collection.mutable.Map.empty[String, Future[Seq[TaskResult]]]

    def futureFor(job: JobDef): Future[Seq[TaskResult]] = futures.synchronized {
      futures.getOrElseUpdate(job.name, {
        val depJobs = job.inputTables.flatMap(byOutput.get).filterNot(_.name == job.name)
        val depsF = Future.sequence(depJobs.map(futureFor))
        depsF.map { deps =>
          // optional (passive) dependencies may fail without blocking
          // this job — the transformer's validate decides whether it
          // can run from what's available (reference: optional
          // MetastoreDependency)
          val required = depJobs.zip(deps).filterNot {
            case (d, _) => job.optionalInputs.contains(d.outputTable)
          }
          val failedDep = required.flatMap(_._2).collectFirst { case f: TaskResult.Failed => f }
          failedDep match {
            case Some(f) => Seq(TaskResult.Skipped(job.name, s"dependency '${f.job}' failed"))
            // conf overrides wrap ALL of the job's dates (so concurrent
            // dates of one job never race on restore). The overrides
            // mutate the SHARED session conf: every job running
            // concurrently with this one executes under these values
            // until the restore — not just jobs touching the same key.
            // Keep sparkConf-carrying jobs serial (parallelism = 1) or
            // give them a dedicated spark.newSession() when that
            // cross-talk matters.
            case None => withSparkConf(job.sparkConf)(body(job))
          }
        }
      })
    }

    val results = Try(Await.result(Future.sequence(jobs.map(futureFor)), Duration.Inf))
    pool.shutdown()
    results match {
      case Success(rs) =>
        val flat = rs.flatten
        onDone(flat)
        flat
      case Failure(e) => throw e
    }
  }

  private def runOne(job: JobDef, runDate: LocalDate): TaskResult = {
    val r = runOneInner(job, runDate)
    notifiers.foreach(_.onTaskCompleted(r, runDate))
    r
  }

  private def runOneInner(job: JobDef, runDate: LocalDate): TaskResult = {
    if (!job.schedule.isEnabled(runDate))
      return TaskResult.Skipped(job.name, s"not scheduled on $runDate")
    val infoDate = DateExpr("runDate" -> runDate, "date" -> runDate).evalDate(job.infoDateExpr)
    if (!rerunSucceeded && bookkeeper.isAlreadyRan(job.outputTable, infoDate))
      return TaskResult.Skipped(job.name, s"already succeeded for $infoDate")
    executeTask(job, infoDate)
  }

  /** Run one (job, infoDate) task: validate, lock, retry, record.
    * Schedule/bookkeeping decisions happen in the caller. */
  private def executeTask(job: JobDef, infoDate: LocalDate,
                          reason: String = "New"): TaskResult = {
    val incCtx = offsetManager.map(om =>
      new graft.meta.MetastoreReader.IncrementalContext(job.outputTable, om))
    val reader = metastore.readerFor(
      if (job.inputTables.nonEmpty) Some(job.inputTables.toSet) else None, incCtx,
      currentInfoDate = Some(infoDate),
      runReason = reason,
      runInfo = (t, d) => bookkeeper.get(t, d).map(r =>
        graft.meta.TableRunInfo(r.table, r.infoDate, r.recordCount, r.status,
          r.startedAtMs, r.finishedAtMs)))
    val t0 = System.currentTimeMillis()
    job.transformer.validate(reader, infoDate, job.options) match {
      case Reason.NotReady(msg) => TaskResult.NotReady(job.name, msg)
      case Reason.Skip(msg) => TaskResult.Skipped(job.name, msg)
      case _ =>
        // cross-pipeline exclusion: two drivers writing the same
        // (table, infoDate) through shared storage exclude each other
        val lock = lockDir.map(d => TokenLock.forPartition(d, job.outputTable, infoDate))
        lock.foreach { lk =>
          if (!lk.tryAcquire())
            return TaskResult.Skipped(job.name,
              s"(${job.outputTable}, $infoDate) is locked by another pipeline")
        }
        def attempt(): Try[graft.meta.TableStats] = Try {
          val df = OutputTransform.shape(
            job.transformer.run(reader, infoDate, job.options), job, infoDate)
          job.sink match {
            case Some(st) => // sink/transfer job: data leaves the metastore
              val r = st.sink.send(df, st.tableName, infoDate, job.options)
              graft.meta.TableStats(r.recordsSent, None)
            case None => metastore.saveTable(job.outputTable, infoDate, df)
          }
        }
        // retry policy: re-attempt transient failures up to job.retries
        def attemptWithRetries(left: Int): Try[graft.meta.TableStats] =
          attempt() match {
            case f: Failure[_] if left > 0 => attemptWithRetries(left - 1)
            case other => other
          }
        try attemptWithRetries(job.retries) match {
          case Success(stats) if stats.recordCount < job.minimumRecords =>
            // the write happened (no rollback) but the run is recorded
            // failed so skip-if-done re-delivers it once the source has
            // enough data (reference: pramen minimum.records semantics)
            bookkeeper.record(RunRecord(job.outputTable, infoDate, stats.recordCount,
              "failed", t0, System.currentTimeMillis()))
            TaskResult.Failed(job.name, new IllegalStateException(
              s"minimum.records not met: got ${stats.recordCount}, need ${job.minimumRecords}"))
          case Success(stats) =>
            incCtx.foreach(_.commitPending()) // advance offsets only on success
            bookkeeper.record(RunRecord(job.outputTable, infoDate, stats.recordCount,
              "succeeded", t0, System.currentTimeMillis()))
            TaskResult.Succeeded(job.name, job.outputTable, infoDate, stats.recordCount)
          case Failure(e) =>
            bookkeeper.record(RunRecord(job.outputTable, infoDate, 0L,
              "failed", t0, System.currentTimeMillis()))
            TaskResult.Failed(job.name, e)
        } finally lock.foreach(_.release())
    }
  }

  /** Set per-job session conf overrides for the duration of `body`,
    * restoring each key's previous value (or unsetting it) after —
    * jobs tune e.g. shuffle partitions without leaking the setting
    * into the rest of the pipeline. Runtime (SQL) confs only; static
    * confs throw, which surfaces as the task's failure. */
  private def withSparkConf[A](overrides: Map[String, String])(body: => A): A = {
    if (overrides.isEmpty) return body
    val conf = org.apache.spark.sql.SparkSession.active.conf
    val saved = overrides.keys.map(k => k -> conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** Rejects dependency cycles and duplicate output tables up front. */
  private def validateDag(jobs: Seq[JobDef]): Unit = {
    val dup = jobs.groupBy(_.outputTable).collect { case (t, js) if js.size > 1 => t }
    require(dup.isEmpty, s"Multiple jobs write the same table(s): ${dup.mkString(", ")}")
    val byOutput = jobs.map(j => j.outputTable -> j).toMap
    val visiting = scala.collection.mutable.Set.empty[String]
    val done = scala.collection.mutable.Set.empty[String]
    def visit(j: JobDef): Unit = {
      if (done.contains(j.name)) return
      require(visiting.add(j.name), s"Dependency cycle involving job '${j.name}'")
      j.inputTables.flatMap(byOutput.get).filterNot(_.name == j.name).foreach(visit)
      visiting.remove(j.name); done.add(j.name)
    }
    jobs.foreach(visit)
  }
}
