package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.jdk.CollectionConverters._

/** Pipeline observability (SURVEY.md §2.8 O1-O3): a QueryExecutionListener
  * recording per-action outcomes, feeding end-of-run [[Notifier]] hooks —
  * the engine-native replacement for the reference's rotating-file logs and
  * ad-hoc Slack calls: metrics are collected where Spark already knows
  * them (the query execution), notification is a driver-side sink.
  */
object Metrics {

  final case class ActionRecord(funcName: String, durationNs: Long,
                                rowsWritten: Option[Long], failed: Boolean)

  final class Recorder extends QueryExecutionListener {
    private val records = new ConcurrentLinkedQueue[ActionRecord]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val rows = Option(qe.executedPlan.metrics.get("numOutputRows")).flatten.map(_.value)
      records.add(ActionRecord(funcName, durationNs, rows, failed = false))
    }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      records.add(ActionRecord(funcName, 0L, None, failed = true))

    def snapshot: Seq[ActionRecord] = records.asScala.toSeq

    /** One-line run summary for the Slack-style notifier. */
    def summary: String = {
      val rs = snapshot
      val failed = rs.count(_.failed)
      f"actions=${rs.size} failed=$failed totalSec=${rs.map(_.durationNs).sum / 1e9}%.2f"
    }
  }

  /** Install a recorder on the session; returns it for later inspection /
    * notification at DAG end. */
  def install(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  /** End-of-pipeline hook: push the run summary through the notifier and
    * healthcheck (failure => false, mirroring mitx_etl exit semantics). */
  def finish(recorder: Recorder, notifier: Notifier): Boolean = {
    notifier.notify(s"pipeline finished: ${recorder.summary}")
    notifier.healthcheck()
  }
}
