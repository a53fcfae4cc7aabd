package graft.pipeline

import graft.catalog.TableRegistry
import graft.listener.UsageListener
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The self-hosting loop (SURVEY §4's optional addition, made whole): run a
  * workload through `spark.sql`, capture each executed query's plan-derived
  * table/join/filter references with the UsageListener, and feed those
  * observations back through the same usage aggregation the advisor scores
  * from — no external query-log system required. This replaces the
  * reference's dependency on Trino's `system.runtime.queries`
  * (trino_client.py:38-63) with the engine observing itself.
  */
object SelfHosting {

  /** Register the fixture tables as temp views named like the canned
    * workload expects. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    TableRegistry.tableNames.foreach { n =>
      TableRegistry.table(spark, sfDir, n).createOrReplaceTempView(n)
    }

  /** Run each SQL text (collecting results), capturing usage via the
    * listener; returns the observed usage DataFrame
    * (kind, name, weighted_frequency) where weight = times referenced. */
  def observeWorkload(spark: SparkSession, sfDir: String,
      workload: Seq[String]): DataFrame = {
    registerViews(spark, sfDir)
    val rec = UsageListener.install(spark)
    try {
      workload.foreach { sql =>
        try spark.sql(sql).collect()
        catch { case _: Exception => () } // malformed queries degrade to no usage
      }
      // listener callbacks are async
      val deadline = System.nanoTime() + 30e9.toLong
      while (rec.snapshot.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(200)
      import spark.implicits._
      rec.snapshot.map(e => (e.kind, e.name))
        .groupBy(identity).map { case ((k, n), v) => (k, n, v.size.toLong) }
        .toSeq.toDF("kind", "name", "weighted_frequency")
        .orderBy("kind", "name")
    } finally spark.listenerManager.unregister(rec)
  }
}
