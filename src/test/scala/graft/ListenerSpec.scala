package graft

import graft.catalog.TableRegistry
import graft.listener.UsageListener
import org.apache.spark.sql.functions._

/** §4 self-hosting usage capture: executed queries surface their
  * table/join/filter references through the listener. */
class ListenerSpec extends SparkSpec {

  test("listener records table, join and filter references of executed queries") {
    val rec = UsageListener.install(spark)
    try {
      TableRegistry.table(spark, sfDir, "orders")
        .join(TableRegistry.table(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .where(col("o_totalprice") > 100000)
        .count()
      // listener callbacks are async — poll until the events land
      val deadline = System.nanoTime() + 10000000000L
      while (rec.snapshot.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      val kinds = rec.snapshot.groupBy(_.kind).view.mapValues(_.map(_.name).toSet).toMap
      assert(kinds.getOrElse("join_col", Set.empty).contains("o_custkey"), kinds.toString)
      assert(kinds.getOrElse("join_col", Set.empty).contains("c_custkey"), kinds.toString)
      assert(kinds.getOrElse("where_col", Set.empty).contains("o_totalprice"), kinds.toString)
      val frame = UsageListener.usageFrame(spark, rec)
      assert(frame.where(col("kind") === "join_col").count() >= 2)
    } finally spark.listenerManager.unregister(rec)
  }
}
