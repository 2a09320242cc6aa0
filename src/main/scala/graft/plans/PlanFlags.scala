package graft.plans

/** The three physical-plan anti-pattern detections shared by the
  * full-surface audit (`graft.PlanAudit`) and the bench-board pin
  * (`HeavyPlanSpec`) — ONE copy, so the round-close audit and the gate
  * test can never silently check different contracts. */
object PlanFlags {
  def bnlj(plan: String): Boolean = plan.contains("BroadcastNestedLoopJoin")
  def cartesian(plan: String): Boolean = plan.contains("CartesianProduct")
  def singlePartition(plan: String): Boolean = plan.contains("SinglePartition")
}
