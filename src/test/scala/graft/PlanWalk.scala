package graft

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan traversal that descends through the AQE wrappers.
  *
  * Under adaptive execution `queryExecution.executedPlan` is an
  * `AdaptiveSparkPlanExec` — a LEAF node — so a plain `.collect` never
  * sees the inner operators, and after execution the materialized stages
  * hide behind `QueryStageExec`/`ReusedExchangeExec` wrappers that
  * children-traversal does not enter either (the DPP trap documented in
  * ScaleQueriesSpec). Every structural plan assertion in the test suite
  * must walk through them explicitly or it asserts on an empty forest.
  */
object PlanWalk {
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: (kids.flatMap(allNodes) ++ p.subqueries.flatMap(allNodes))
  }
}
