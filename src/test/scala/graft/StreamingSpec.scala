package graft

import graft.catalog.TableRegistry
import graft.streaming.StreamingUsage
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** X5: streaming windowed usage counts must equal the batch twin on the same
  * slice (streaming has no reference ground truth — SURVEY §2.11). */
class StreamingSpec extends SparkSpec {

  test("streaming hourly window counts == batch twin on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = TableRegistry.table(spark, sfDir, "events")
      .select(col("ts"), col("event_type"))
      .as[(Long, String)].collect().toSeq

    val stream = MemoryStream[(Long, String)]
    stream.addData(events)
    val streamed = StreamingUsage.windowedCounts(
      stream.toDF().toDF("ts", "event_type"), withWatermarkCol = true)

    val qname = s"stream_usage_${System.nanoTime()}"
    val query = streamed.writeStream
      .format("memory").queryName(qname).outputMode("complete").start()
    try {
      query.processAllAvailable()
      val got = spark.table(qname)
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      val want = StreamingUsage.batchTwin(spark, TableRegistry.table(spark, sfDir, "events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == want)
      assert(want.nonEmpty)
    } finally query.stop()
  }
}
