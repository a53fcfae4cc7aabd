package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken, SIGMOD
  * 2003) — the shared core of the `fingerprint_winnowing` key (X55) and
  * its randomized PropertySpec guarantee check. See Queries13.scala for
  * the operator-level contract and scale commentary.
  */
object Winnow {

  /** Distinct winnowed fingerprints per doc: one row (doc_id, source, fp)
    * per distinct window-minimum of the doc's `k`-token shingle polyhash
    * stream under a `w`-hash winnowing window. Docs shorter than w hashes
    * keep position 0's truncated window (min of all hashes), so every doc
    * carries ≥ 1 fingerprint. Guarantee: any shared token run of
    * ≥ w + k − 1 tokens yields a shared fp VALUE on both sides. */
  def fingerprintFrame(docs: DataFrame, k: Int = 4, w: Int = 4): DataFrame = {
    val h = docs
      .select(col("doc_id"), col("source"),
        Sketches.shingleHashes(col("text"), k).as("hl"))
      .select(col("doc_id"), col("source"),
        posexplode(col("hl")).as(Seq("pos", "h")))
    val byDoc = Window.partitionBy("doc_id")
    val winfrm = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    h.withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("wmin", min("h").over(winfrm))
      .where(col("pos") <= greatest(lit(0L), col("n") - w))
      .select(col("doc_id"), col("source"), col("wmin").as("fp"))
      .distinct()
  }

  /** [[fingerprintFrame]] materialized through DfMemo keyed by the corpus
    * dir: the index feeds BOTH `fingerprint_winnowing` (the audit rollup)
    * and `winnow_match_spans` (candidate pairs) — without the memo each
    * key re-runs the shingle+winnow pass over the full corpus (the
    * shared-frame discipline of Dedup.memoizedSignatures). */
  def fingerprintFrameMemo(spark: org.apache.spark.sql.SparkSession,
      dir: String, docs: DataFrame, k: Int = 4, w: Int = 4): DataFrame =
    DfMemo.cached(spark, Some(dir), s"winnow_fp:$k:$w") {
      fingerprintFrame(docs, k, w)
    }
}
