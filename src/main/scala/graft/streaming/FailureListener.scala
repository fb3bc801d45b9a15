package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** ST5: the reference's failure-alert callback (`on_failure_callback`,
  * reference `dags/dag.py:423-431` — logs dag/task/date/error) restated
  * as a QueryExecutionListener: every failed action is captured with its
  * action name and exception for alerting/metrics, without touching any
  * query code. Register with
  * `spark.listenerManager.register(listener)` (or the
  * `spark.sql.queryExecutionListeners` conf for cluster-wide install).
  * Task-level retries themselves are Spark's own `spark.task.maxFailures`.
  */
class FailureListener extends QueryExecutionListener {

  private val failureLog = new ConcurrentLinkedQueue[(String, String)]()

  /** (action name, exception message) per failed action, oldest first. */
  def failures: Seq[(String, String)] = failureLog.asScala.toSeq

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = ()

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = {
    failureLog.add(funcName -> String.valueOf(exception.getMessage))
    logWarning(s"[graft] action '$funcName' failed: ${exception.getMessage}")
  }

  private def logWarning(msg: String): Unit =
    System.err.println(msg)
}
