package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X5: the advisor's "continuous re-analysis" as Structured Streaming —
  * usage counts over tumbling event-time windows with a watermark, plus the
  * batch twin used for verification (streaming semantics have no reference
  * ground truth — SURVEY §2.11).
  */
object StreamingUsage {

  /** Shared transformation: events (with an epoch-nanos `ts` long) →
    * 1-hour tumbling window counts per event_type. Works on both batch and
    * streaming inputs; the watermark is applied only when streaming. */
  def windowedCounts(events: DataFrame, withWatermarkCol: Boolean): DataFrame = {
    val withTime = events.withColumn("event_time",
      timestamp_micros((col("ts") / 1000).cast("long")))
    val src = if (withWatermarkCol) withTime.withWatermark("event_time", "10 minutes") else withTime
    src.groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("cnt"))
  }

  /** Batch twin (oracle-checkable). */
  def batchTwin(spark: SparkSession, events: DataFrame): DataFrame =
    windowedCounts(events, withWatermarkCol = false)
      .orderBy("window_start", "event_type")
}
