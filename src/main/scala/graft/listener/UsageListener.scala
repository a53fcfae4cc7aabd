package graft.listener

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Self-hosting usage capture (SURVEY §4 optional addition): a
  * QueryExecutionListener that records, for every query this session
  * executes, the plan-derived (table, join-column, filter-column) references
  * plus duration — the Spark-native replacement for scraping Trino's
  * `system.runtime.queries` (reference trino_client.py:38-63). Feeding these
  * rows back through Usage/Scoring makes the advisor self-hosting: it
  * profiles the very workload it runs on.
  */
object UsageListener {

  final case class UsageEvent(
      kind: String, // table | join_col | where_col
      name: String,
      durationNs: Long)

  final class Recorder extends QueryExecutionListener {
    val events = new ConcurrentLinkedQueue[UsageEvent]()

    private def refs(plan: LogicalPlan): Seq[(String, String)] = {
      // table names: catalog tables directly; temp views surface as
      // SubqueryAlias wrappers in the analyzed plan
      val tables = (plan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation
            if r.catalogTable.isDefined =>
          r.catalogTable.get.identifier.table
      } ++ plan.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
          s.alias
      }).map("table" -> _)
      val joinCols = plan.collect { case j: Join =>
        j.condition.toSeq.flatMap(_.collect { case a: AttributeReference => a.name })
      }.flatten.map("join_col" -> _)
      val whereCols = plan.collect { case f: Filter =>
        f.condition.collect { case a: AttributeReference => a.name }
      }.flatten.map("where_col" -> _)
      tables ++ joinCols ++ whereCols
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      refs(qe.analyzed).foreach { case (k, n) =>
        events.add(UsageEvent(k, n, durationNs))
      }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()

    def snapshot: Seq[UsageEvent] = events.asScala.toSeq
  }

  /** Install a recorder on the session; returns it for snapshotting. */
  def install(spark: SparkSession): Recorder = {
    val r = new Recorder
    spark.listenerManager.register(r)
    r
  }

  /** Recorded events as a usage DataFrame compatible with
    * Usage/Scoring aggregation ((kind, name, weight=duration ms)). */
  def usageFrame(spark: SparkSession, r: Recorder) = {
    import spark.implicits._
    r.snapshot.map(e => (e.kind, e.name, e.durationNs / 1000000L))
      .toDF("kind", "name", "duration_ms")
  }
}
