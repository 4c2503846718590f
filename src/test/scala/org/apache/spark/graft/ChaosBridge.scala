package org.apache.spark.graft

import org.apache.spark.SparkEnv
import org.apache.spark.shuffle.FetchFailedException

/** Test-only bridge into `private[spark]` shuffle internals (the same
  * device as `org.apache.spark.sql.graft.ColumnBridge` on the main
  * side): lets the retry-chaos suite throw a GENUINE
  * [[FetchFailedException]] from inside a reduce task, which is the
  * failure the DAGScheduler answers by unregistering the named map
  * output and RESUBMITTING THE SHUFFLE-MAP STAGE — the retry mode a
  * large cluster sees most (executor loss, fetch timeouts), as opposed
  * to the plain task re-run the first-attempt-kill wrapper exercises.
  */
object ChaosBridge {

  /** Throw a fetch failure for map partition 0 of the most recently
    * registered shuffle, attributed to this executor's own
    * BlockManager. The constructor marks the failure on the running
    * TaskContext, so the scheduler sees a real fetch failure rather
    * than a user exception: map output (shuffle, mapIndex 0) is
    * unregistered, the map stage re-runs that partition, and the
    * reduce stage re-runs over the MIX of original and regenerated
    * map outputs. */
  def failFetch(): Nothing = {
    val env = SparkEnv.get
    val tracker = env.mapOutputTracker.asInstanceOf[org.apache.spark.MapOutputTrackerMaster]
    val shuffleId =
      if (tracker.shuffleStatuses.isEmpty) 0
      else tracker.shuffleStatuses.keys.max
    throw new FetchFailedException(env.blockManager.blockManagerId,
      shuffleId, 0L, 0, 0, "chaos: injected fetch failure", null)
  }
}
