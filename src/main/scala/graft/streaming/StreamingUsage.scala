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

  /** Per-user running state carried across micro-batches. */
  final case class UserState(count: Long, lastValueSum: Double)

  /** Custom streaming state via mapGroupsWithState: running per-user event
    * count + value sum, state persisted in the state store between
    * micro-batches (the advisor's "evolving workload" counter as true
    * incremental state rather than a recomputed aggregate). Input columns:
    * (user_id long, value double). */
  def runningUserTotals(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, (Long, Long, Double)](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var c = prev.count
          var s = prev.lastValueSum
          rows.foreach { r => c += 1; s += r._2 }
          state.update(UserState(c, s))
          (uid, c, s)
      }
      .toDF("user_id", "event_count", "value_sum")
  }
}
