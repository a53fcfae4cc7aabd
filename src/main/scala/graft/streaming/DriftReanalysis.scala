package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, not}
import org.apache.spark.sql.streaming.StreamingQuery

/** Drift-triggered re-analysis — the reference's "evolving workloads …
  * refinement over time" motivation (README.md:15) closed into an actual
  * control loop instead of two disconnected streams: [[StreamingDrift]]
  * watches the live corpus/workload distribution, and the batch whose
  * merged PSI CROSSES the threshold triggers ONE fresh balance-vetted
  * recommendation set (by default
  * [[graft.pipeline.AnalysisPipeline.runVettedFromStats]] over a
  * [[StreamingAdvisor]] workload-state snapshot), published
  * replay-idempotently by batch id.
  *
  * EDGE-triggered, not level-triggered: re-analysis fires on the batch
  * whose PSI first reaches `threshold` from below (or from no prior state
  * at all), then stays silent while PSI remains above — "the distribution
  * drifted" is one event, not a per-batch alarm; if drift later subsides
  * below the threshold and builds again, the next crossing fires again.
  * The crossing decision derives ONLY from persisted drift state (the
  * merge-base version [[StreamingDrift.monitorWithPrev]] reads), never
  * from driver memory, so a batch REPLAYED after a lost commit reaches
  * the identical decision and its publication REPLACES by batchId (the
  * advisor's Snapshot discipline) — exactly once per crossing, under
  * replay and checkpointed restart alike.
  *
  * A failed re-analysis (dropped view, transient FS error) degrades to an
  * EMPTY recommendation set for that crossing rather than killing the
  * monitor query — the [[StreamingAdvisor]] NonFatal discipline; the
  * crossing itself is still recorded, so the operator sees "drift
  * detected, advice unavailable" instead of silence.
  */
object DriftReanalysis {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** One threshold crossing: the batch that crossed, its merged PSI, the
    * fresh vetted (view, partition_spec) set, and how many candidates the
    * balance vet demoted on the way. */
  case class Reanalysis(batchId: Long, psi: Double,
      recommendations: Seq[(String, String)], demotedCandidates: Long)

  /** Pure edge-trigger decision: fire iff the prior state was below the
    * threshold (or absent) and the merged state reached it. */
  private[graft] def crossed(prevPsi: Option[Double], psi: Double,
      threshold: Double): Boolean =
    prevPsi.forall(_ < threshold) && psi >= threshold

  /** Start the loop over a streaming (…, n_chars) frame. `reanalyze` is
    * invoked once per threshold crossing and must return the
    * (recommendations, evidence) pair of a vetted pipeline run — pass
    * `() => AnalysisPipeline.runVettedFromStats(spark, sfDir,
    * advisorStateSnapshot)` to close the loop through the streaming
    * advisor's maintained workload state. */
  def start(docs: DataFrame, ref: Map[Int, Long], checkpoint: String,
      threshold: Double, out: ConcurrentLinkedQueue[Reanalysis])(
      reanalyze: () => (DataFrame, DataFrame)): StreamingQuery =
    StreamingDrift.monitorWithPrev(docs, ref, checkpoint) { (id, prevPsi, p) =>
      if (crossed(prevPsi, p, threshold)) {
        val (recs, nDemoted) =
          try {
            val (recDf, evidence) = reanalyze()
            (recDf.collect().map(r => (r.getAs[String]("view"),
              r.getAs[String]("partition_spec"))).toSeq,
              evidence.where(not(col("accepted"))).count())
          } catch {
            case scala.util.control.NonFatal(e) =>
              log.warn(s"drift re-analysis at batch $id produced no advice: " +
                e.getMessage)
              (Seq.empty[(String, String)], 0L)
          }
        // replay-idempotent publication: replace, never append
        out.removeIf(_.batchId == id)
        out.add(Reanalysis(id, p, recs, nDemoted))
        ()
      }
    }
}
