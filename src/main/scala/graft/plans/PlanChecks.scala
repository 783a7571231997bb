package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan-shape inspection for the "is this the plan you'd want at
  * 100 TB" loop — used by PlanAudit interactively and by
  * PlanQualitySpec as a regression gate (an edit that silently adds a
  * fact-scale shuffle fails the suite, not the next scale test).
  */
object PlanChecks {

  /** Execute the frame and return the FINAL physical plan string
    * (post-AQE: adaptive plans only settle on their real exchanges and
    * join strategies after execution).
    */
  def executedPlanString(df: DataFrame): String = {
    val qe = df.queryExecution
    qe.executedPlan.execute().foreach(_ => ()) // force all stages
    qe.executedPlan.toString
  }

  /** An executed adaptive plan prints BOTH its final and initial trees;
    * counts must only see the final one.
    */
  private def finalSection(plan: String): String =
    plan.indexOf("== Initial Plan ==") match {
      case -1 => plan
      case i  => plan.substring(0, i)
    }

  /** Count of shuffle exchanges (hash / range / round-robin / single) —
    * broadcast exchanges are deliberately excluded: they move dimension
    * bytes, not fact bytes.
    */
  def shuffleCount(plan: String): Int =
    raw"Exchange (hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)"
      .r.findAllIn(finalSection(plan)).length

  def broadcastCount(plan: String): Int =
    raw"BroadcastExchange".r.findAllIn(finalSection(plan)).length

  /** Convenience: execute and count shuffles in one call. */
  def shuffles(df: DataFrame): Int = shuffleCount(executedPlanString(df))
}
