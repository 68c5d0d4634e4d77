package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Dev-tool hook for plan evidence: operators that eagerly
  * `localCheckpoint` (lineage cut + cache release — see removeDupSpans)
  * return a `Scan ExistingRDD` plan downstream, which hides the real
  * computation DAG from explain dumps. When enabled (PlanDump only),
  * such operators record the PRE-checkpoint formatted plan here, keyed
  * by an operator label, so the dump can show the aggregation/join tree
  * that actually runs. Off by default: zero cost on the normal path.
  */
object PlanCapture {
  @volatile var enabled = false
  private val plans = new scala.collection.concurrent.TrieMap[String, String]

  def record(label: String, df: DataFrame): Unit =
    if (enabled)
      plans.put(label, df.queryExecution.explainString(FormattedMode))

  /** Take and clear everything recorded since the last drain. */
  def drain(): Map[String, String] = {
    val m = plans.toMap
    plans.clear()
    m
  }
}
