package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExecBase, WindowGroupLimitExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime scale guard: sweeps every EXECUTED plan on a session and records
  * a violation whenever
  *
  *   - a window operator with NO partition spec was fed more than
  *     `maxRows` input rows (everything funnels through one task — the
  *     single worst scale bug a panel engine can ship), or
  *   - a CartesianProduct ran with a side larger than `maxRows` (legit
  *     all-pairs compositions broadcast a tiny side and plan as
  *     BroadcastNestedLoopJoin, never CartesianProduct).
  *
  * Since round 9 every install site passes `maxRows = 0` for the window
  * rule: the engine plans NO unpartitioned WindowExec anywhere (bounded
  * global transforms run blocked evaluation, unbounded ones run
  * [[graft.functions.GlobalScan]]'s ordered fold, the global calendar
  * rank is a distributed range-partitioned rank), so an unpartitioned
  * window in an executed plan is a DEFECT at any row count — do not
  * reintroduce a tolerance here; fix the plan that trips it. The static
  * plan audit in [[Profile]] covers the plans it is pointed at; this
  * guard covers every query a session actually runs. `graft.Bench`
  * registers one and FAILS the benchmark on any violation (after its
  * artifacts are written).
  */
final class PlanGuard(maxRows: Long) extends QueryExecutionListener {
  private val found = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** Label attached to subsequent violations (e.g. the query name); set to
    * null to ignore executions (warmup).
    */
  @volatile var label: String = null

  // AQE wrappers and query stages hide their materialized subplans from
  // the children traversal; unwrap them explicitly
  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case _ => p.children
  }
  private[graft] def nodes(p: SparkPlan): Seq[SparkPlan] = p +: kids(p).flatMap(nodes)
  // window operators don't expose numOutputRows; each child BRANCH's
  // nearest exposing descendant carries the rows feeding it, and branches
  // are SUMMED — descending only the first-child chain would read one side
  // of a join/union and under-count the true input (false negatives).
  // Broadcast-exchange branches are the BUILD side of a broadcast join, not
  // part of the streamed input, so they count zero — summing them would
  // trip the guard false-positively near the threshold (r7 ADVICE).
  private[graft] def isBroadcastBranch(n: SparkPlan): Boolean = n match {
    case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike => true
    case _: org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec => true
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      isBroadcastBranch(r.child)
    case _ => false
  }
  private[graft] def inputRows(p: SparkPlan): Option[Long] = {
    def branch(n: SparkPlan): Option[Long] =
      if (isBroadcastBranch(n)) Some(0L)
      else n.metrics.get("numOutputRows").map(_.value).orElse {
        val bs = kids(n).flatMap(branch(_))
        if (bs.isEmpty) None else Some(bs.sum)
      }
    val bs = kids(p).flatMap(branch(_))
    if (bs.isEmpty) None else Some(bs.sum)
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    val q = label
    if (q != null) nodes(qe.executedPlan).foreach {
      case w: WindowExecBase if w.partitionSpec.isEmpty =>
        inputRows(w).filter(_ > maxRows).foreach { r =>
          found.add(s"$q: ${w.nodeName} with no partition spec over $r input rows (> $maxRows)")
        }
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        inputRows(w).filter(_ > maxRows).foreach { r =>
          found.add(s"$q: ${w.nodeName} with no partition spec over $r input rows (> $maxRows)")
        }
      case c: CartesianProductExec =>
        val rows = c.children.flatMap(ch =>
          if (ch.metrics.contains("numOutputRows")) Some(ch.metrics("numOutputRows").value)
          else inputRows(ch))
        if (rows.exists(_ > maxRows))
          found.add(s"$q: CartesianProduct with a ${rows.max}-row side (> $maxRows)")
      case _ => ()
    }
  }
  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = ()

  /** Distinct violations recorded so far; drain the session's listener bus
    * first (bridge.waitForListeners) so async callbacks have landed.
    */
  def violations: Seq[String] = {
    val it = found.iterator(); val b = Vector.newBuilder[String]
    while (it.hasNext) b += it.next(); b.result().distinct
  }
}

object PlanGuard {
  /** Register a guard on the session and return it. */
  def install(spark: SparkSession, maxRows: Long): PlanGuard = {
    val g = new PlanGuard(maxRows)
    spark.listenerManager.register(g)
    g
  }
}
