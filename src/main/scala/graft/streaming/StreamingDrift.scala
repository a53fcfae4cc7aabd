package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of the `drift_psi` key (X19): monitor a live candidate
  * corpus slice for distribution drift against a STATIC reference
  * histogram, emitting the population stability index after every
  * micro-batch.
  *
  * Scale design: the only state is the candidate bucket histogram — 13
  * longs, metadata-sized at any stream length — merged additively per
  * batch (each batch contributes one O(buckets) grouped count; the doc
  * stream itself is never retained). Additive merge means the monitor is
  * replay-idempotent per batch id if the caller checkpoints the histogram
  * beside its sink offsets (the StreamingAdvisor versioned-state pattern);
  * this in-process form keeps it on the driver because 13 longs IS the
  * checkpoint payload, and the batch-twin test proves the math, not the
  * durability story.
  *
  * PSI math is bucket-ordered and Laplace-smoothed exactly like the batch
  * key: buckets present in NEITHER slice are excluded from the bucket
  * count nb, +0.5 smoothing keeps one-sided-empty buckets finite, and the
  * ordered driver-side summation lands within float jitter of the batch
  * plan's aggregate (both round(6)-stable).
  */
object StreamingDrift {

  /** The drift_psi binning: width-50 char buckets capped at 12. */
  def bucketOf: Column = least(expr("n_chars div 50"), lit(12L)).cast("int")

  /** Batch helper: bucket histogram of a (…, n_chars) frame —
    * O(buckets) rows collect. */
  def histogram(docs: DataFrame): Map[Int, Long] =
    docs.select(bucketOf.as("bucket")).groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** Laplace-smoothed PSI between two histograms, bucket-ordered sum. */
  def psi(ref: Map[Int, Long], cand: Map[Int, Long]): Double = {
    val buckets = (ref.keySet ++ cand.keySet).toSeq.sorted
    val nb = buckets.size.toDouble
    val ta = ref.values.sum.toDouble
    val tb = cand.values.sum.toDouble
    buckets.map { b =>
      val p = (ref.getOrElse(b, 0L) + 0.5) / (ta + 0.5 * nb)
      val q = (cand.getOrElse(b, 0L) + 0.5) / (tb + 0.5 * nb)
      (p - q) * math.log(p / q)
    }.sum
  }

  /** Start the monitor over a streaming (…, n_chars) frame: per
    * micro-batch, merge the batch's bucket counts into the running
    * candidate histogram and invoke `onBatch(batchId, psiSoFar)`. */
  def monitor(docs: DataFrame, ref: Map[Int, Long], checkpoint: String)(
      onBatch: (Long, Double) => Unit): StreamingQuery = {
    val state = scala.collection.mutable.Map.empty[Int, Long]
    docs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: java.lang.Long) =>
        batch.select(bucketOf.as("bucket")).groupBy("bucket").count()
          .collect()
          .foreach(r => state.update(r.getInt(0),
            state.getOrElse(r.getInt(0), 0L) + r.getLong(1)))
        onBatch(id, psi(ref, state.toMap))
      }
      .start()
  }
}
