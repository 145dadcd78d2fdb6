package graft.tools

import org.apache.spark.SparkContext

/** Scoped job-group switching that restores the CALLER's full job-group
  * state — group id, description, AND `spark.job.interruptOnCancel` — on
  * exit. A bare `setJobGroup(callerGroup, callerDesc)` restore silently
  * resets interruptOnCancel to false, weakening cancellation semantics for
  * callers that set it (r7 ADVICE); this helper round-trips all three
  * local properties.
  */
object JobGroups {

  /** Run `body` under (groupId, description), then restore the caller's
    * job-group triple exactly as it was.
    */
  def withJobGroup[T](sc: SparkContext, groupId: String, description: String)
                     (body: => T): T = {
    val callerGroup = sc.getLocalProperty("spark.jobGroup.id")
    val callerDesc = sc.getLocalProperty("spark.job.description")
    val callerInterrupt =
      "true".equalsIgnoreCase(sc.getLocalProperty("spark.job.interruptOnCancel"))
    sc.setJobGroup(groupId, description)
    try body
    finally {
      if (callerGroup != null)
        sc.setJobGroup(callerGroup, callerDesc, callerInterrupt)
      else sc.clearJobGroup()
    }
  }
}
