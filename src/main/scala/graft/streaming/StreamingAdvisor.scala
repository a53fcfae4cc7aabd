package graft.streaming

import graft.pipeline.AnalysisPipeline
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's "continuous re-analysis" ambition made real: a STREAMING
  * query log drives the advisor, re-scoring partition recommendations as the
  * observed workload grows. The reference could only poll Trino's
  * `system.runtime.queries` from a cron loop (trino_client.py:38-63 +
  * cli.py); here the loop is a Structured Streaming `foreachBatch`:
  *
  *   query-log stream → append to the accumulated-log sink →
  *   advisor over the FULL observed log → recommendation snapshot
  *
  * Scale posture: the accumulated log is an append-only parquet (at
  * production scale a table-format sink — same shape); each re-advise is a
  * bounded batch job over it whose cadence the streaming trigger throttles.
  * Snapshots are metadata-sized (one row per profiled view). State never
  * lives on the driver beyond the latest snapshot queue.
  */
object StreamingAdvisor {

  final case class Snapshot(batchId: Long, recs: Seq[(String, String)])

  /** Start the re-advising loop over `queryLogStream` (reference log schema;
    * see TableRegistry.queryLogFrom). Tables to advise on are discovered
    * from the session catalog per batch (`nameFilter` scopes them).
    * Each micro-batch appends to `logDir` and pushes one Snapshot with the
    * recommendations derived from everything observed so far. */
  def start(spark: SparkSession, queryLogStream: DataFrame,
      nameFilter: String => Boolean, logDir: String,
      snapshots: java.util.concurrent.ConcurrentLinkedQueue[Snapshot]): StreamingQuery =
    queryLogStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.mode("append").parquet(logDir)
        val observed = spark.read.parquet(logDir)
        val recs = AnalysisPipeline.runFromCatalog(spark, observed, nameFilter = nameFilter)
          .collect()
          .map(r => (r.getAs[String]("view"), r.getAs[String]("partition_spec")))
          .toSeq
        snapshots.add(Snapshot(batchId, recs))
        ()
      }
      .start()
}
