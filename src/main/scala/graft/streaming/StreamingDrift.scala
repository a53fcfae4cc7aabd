package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * stream itself is never retained).
  *
  * Durability (r10 verdict #1): the histogram is persisted VERSIONED BY
  * BATCH ID beside the checkpoint — the StreamingAdvisor pattern
  * ([[StreamingAdvisor.start]]), shrunk to a 13-line text file because 13
  * longs never justify a Spark write job:
  *
  *   - RESTART-SURVIVABLE: a checkpointed restart resumes batch ids where
  *     they left off and the next batch merges against the last persisted
  *     version (< its own id), so pre-restart counts are never lost.
  *   - REPLAY-IDEMPOTENT: a batch replayed after a lost commit recomputes
  *     from versions STRICTLY BELOW its own id and OVERWRITES its version,
  *     so a crash between foreachBatch and the streaming commit cannot
  *     double-count. `onBatch` re-fires with the same (batchId, psi) pair —
  *     consumers keying on batchId see an identical replacement.
  *   - FRESH LINEAGE on batch 0: a restart WITHOUT a checkpoint renumbers
  *     batches from 0; the sweep deletes every surviving version so a dead
  *     lineage's counts can never re-enter the merge (same rationale as
  *     the advisor's batch-0 sweep).
  *
  * Steady state is two versions on disk (current + the one a replayed
  * batch would merge from). All file IO goes through the Hadoop FileSystem
  * of the state path itself, so the state lands wherever the checkpoint
  * does (local, HDFS, S3).
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
    * O(buckets) rows collect. Null n_chars rows are excluded (a null
    * bucket would NPE the collect, and a length-less doc carries no
    * length signal) — the textStatsOf null-guard discipline. */
  def histogram(docs: DataFrame): Map[Int, Long] =
    docs.where(col("n_chars").isNotNull)
      .select(bucketOf.as("bucket")).groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  /** How many persisted state versions to retain (the written version plus
    * retainVersions−1 prior merge-bases). Spark replays at most the one
    * uncommitted batch, but recovery tooling can reach deeper; see the
    * retention comment in [[monitorWithPrev]]. */
  val retainVersions: Int = 4

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

  /** One sorted "bucket count" line per bucket. Plain create(overwrite):
    * a half-written version can only exist for the batch that crashed
    * mid-write, and that batch's replay overwrites it before any later
    * batch could read it (versions only become merge bases once their
    * batch's streaming commit landed). */
  private def writeHist(fs: FileSystem, path: Path, h: Map[Int, Long]): Unit = {
    val out = fs.create(path, true)
    try out.write(h.toSeq.sorted.map { case (b, c) => s"$b $c" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readHist(fs: FileSystem, path: Path): Map[Int, Long] = {
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty)
      .map { l => val Array(b, c) = l.split(" ", 2); b.toInt -> c.toLong }
      .toMap
    finally in.close()
  }

  /** Start the monitor over a streaming (…, n_chars) frame: per
    * micro-batch, merge the batch's bucket counts into the persisted
    * candidate histogram (versioned at `<checkpoint>_state/v<batchId>`)
    * and invoke `onBatch(batchId, psiSoFar)`. */
  def monitor(docs: DataFrame, ref: Map[Int, Long], checkpoint: String)(
      onBatch: (Long, Double) => Unit): StreamingQuery =
    monitorWithPrev(docs, ref, checkpoint)((id, _, p) => onBatch(id, p))

  /** [[monitor]], with the callback ALSO receiving the PSI of the state
    * BEFORE this batch (None when no prior state exists — batch 0 or a
    * fresh lineage). The prior PSI derives from the persisted version the
    * batch merges from, NOT from driver memory, so a REPLAYED batch sees
    * the identical (prev, current) pair and reaches the identical
    * decision — the property [[DriftReanalysis]]'s edge-triggering needs
    * to stay exactly-once under replay. */
  def monitorWithPrev(docs: DataFrame, ref: Map[Int, Long], checkpoint: String)(
      onBatch: (Long, Option[Double], Double) => Unit): StreamingQuery = {
    val stateRoot = new Path(checkpoint.stripSuffix("/") + "_state")
    // resolve through the Hadoop FS of the state path itself — the same
    // resolver the checkpoint uses (driver-local java.io.File would
    // silently see nothing on a cluster whose default FS is remote)
    val fs = stateRoot.getFileSystem(
      docs.sparkSession.sessionState.newHadoopConf())
    docs.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: java.lang.Long) =>
        // fresh lineage: an un-checkpointed restart renumbers from 0 while
        // the previous run's versions survive — left in place they'd merge
        // a dead lineage's counts into this one
        if (id == 0L && fs.exists(stateRoot))
          fs.listStatus(stateRoot).filter(_.getPath.getName.startsWith("v"))
            .foreach(st => fs.delete(st.getPath, true))
        val versions =
          if (fs.exists(stateRoot))
            fs.listStatus(stateRoot).map(_.getPath)
              .filter(_.getName.startsWith("v"))
              .sortBy(_.getName.drop(1).toLong)
          else Array.empty[Path]
        // strictly below this id: a REPLAYED batch must not merge the
        // half-committed version its first attempt wrote
        val prev = versions.filter(_.getName.drop(1).toLong < id)
        val baseOpt = prev.lastOption.map(readHist(fs, _))
        val base = baseOpt.getOrElse(Map.empty[Int, Long])
        // null-guard matches histogram(): one null n_chars row would
        // otherwise produce a null bucket, NPE the collect, and kill the
        // monitor query PERMANENTLY — the failure mode the advisor's
        // NonFatal recovery exists to prevent
        val delta = batch.where(col("n_chars").isNotNull)
          .select(bucketOf.as("bucket")).groupBy("bucket")
          .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val merged = (base.keySet ++ delta.keySet).iterator
          .map(b => b -> (base.getOrElse(b, 0L) + delta.getOrElse(b, 0L)))
          .toMap
        writeHist(fs, new Path(stateRoot, s"v$id"), merged)
        // retain the last `retainVersions` merge-bases: Spark's contract
        // replays only the single uncommitted batch (needing one base), but
        // operational recovery (checkpoint restore, manual commit surgery)
        // can reach further back — rebuilding from a missing base would
        // SILENTLY drop the dropped versions' histogram mass. Each version
        // is O(buckets) bytes, so deeper retention is metadata-sized.
        prev.dropRight(retainVersions - 1).foreach(fs.delete(_, true))
        onBatch(id, baseOpt.map(psi(ref, _)), psi(ref, merged))
      }
      .start()
  }
}
