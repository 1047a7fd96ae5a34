package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/**
 * Plan-shape golden checks over the real SparkEntry queries at
 * sf0.001: the optimizations the engine is designed around (filter
 * pushdown, broadcast dims, partial aggregation, codegen) must be
 * visible in the physical plan, not assumed.
 */
class PlanShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): SparkPlan = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect() // execute so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan
  }

  /** Full traversal including AQE/query-stage/broadcast subtrees,
    * whose plans are fields rather than children. */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    p +: (p.children ++ extra).flatMap(nodes)
  }

  test("q_filter_project pushes both predicates into the parquet scan") {
    val scans = nodes(plan("q_filter_project")).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("LessThan(l_shipdate") && pushed.contains("LessThan(l_quantity"),
      s"filters not pushed: $pushed")
    // column pruning: only the 4 projected + 2 filter columns are read
    val readSchema = scans.head.metadata("ReadSchema")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice,l_discount"),
      s"scan reads too much: $readSchema")
  }

  test("q3_join_agg broadcasts the filtered dimension and pushes filters") {
    val ns = nodes(plan("q3_join_agg"))
    assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]), "no broadcast join in q3")
    val scans = ns.collect { case s: FileSourceScanExec => s }
    val custScan = scans.find(_.metadata("Location").contains("customer"))
    assert(custScan.exists(_.metadata("PushedFilters").contains("EqualTo(c_mktsegment,BUILDING)")),
      "customer filter not pushed to scan")
  }

  test("q1_agg plans partial (map-side) aggregation around one shuffle") {
    val ns = nodes(plan("q1_agg"))
    val aggs = ns.collect { case a: HashAggregateExec => a }
    assert(aggs.size >= 2, s"expected partial+final HashAggregate, got ${aggs.size}")
    val shuffles = ns.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 1, s"q1 should shuffle exactly once, got ${shuffles.size}")
    assert(ns.exists(_.isInstanceOf[WholeStageCodegenExec]), "aggregation not codegen'd")
  }

  test("q_topk plans a global top-k, not a full sort") {
    val ns = nodes(plan("q_topk"))
    assert(ns.exists(_.getClass.getSimpleName == "TakeOrderedAndProjectExec"),
      s"expected TakeOrderedAndProject, got:\n${ns.map(_.getClass.getSimpleName).distinct}")
  }

  test("q_broadcast_join joins both dims without any shuffle exchange") {
    val ns = nodes(plan("q_broadcast_join"))
    val bhj = ns.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size == 2, s"expected 2 broadcast joins, got ${bhj.size}")
  }

  /** The small-corpus starvation guard (SparkEntry.docs) inserts an
    * explicit round-robin repartition DIRECTLY OVER THE SCAN when the
    * scan has fewer splits than cores; it is absent at real scale and
    * is not part of the operator's plan. The golden checks exempt
    * exactly that shape — a round-robin exchange whose subtree is
    * shuffle-free scan work. A round-robin atop computed results (an
    * operator regressing into repartition) still fails. */
  private def operatorShuffles(ns: Seq[org.apache.spark.sql.execution.SparkPlan]) =
    ns.collect { case s: ShuffleExchangeExec => s }
      .filterNot { s =>
        s.outputPartitioning.getClass.getSimpleName.contains("RoundRobin") &&
          s.child.collect { case e: ShuffleExchangeExec => e }.isEmpty
      }

  test("q_chunk never shuffles: scan -> explode -> project only") {
    val ns = nodes(plan("q_chunk"))
    val shuffles = operatorShuffles(ns)
    assert(shuffles.isEmpty, s"chunking must be shuffle-free, got ${shuffles.size} exchange(s)")
    assert(ns.exists(_.getClass.getSimpleName == "GenerateExec"),
      "chunking should explode via a Generate node")
  }

  test("q_decontam shuffles only matched shingles, never the corpus rows") {
    val ns = nodes(plan("q_decontam"))
    // corpus-side joins are broadcast (bench shingles + contaminated ids)
    val bhj = ns.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2, s"expected broadcast semi + anti joins, got ${bhj.size}")
    assert(bhj.exists(_.joinType.toString == "LeftAnti") &&
      bhj.exists(_.joinType.toString == "LeftSemi"),
      s"join types: ${bhj.map(_.joinType)}")
    // the only operator shuffles aggregate matched (id, hash) pairs /
    // distinct bench hashes — never rows carrying document text
    val shuffled = operatorShuffles(ns).map(_.child.schema.fieldNames.toSeq)
    assert(shuffled.forall(cols => !cols.contains("text")),
      s"document text must never shuffle: $shuffled")
  }
}
