package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for the training-data pipeline: benchmark
  * decontamination and sequential-funnel analysis. Both are declarative
  * plans; the test-time helpers exist so hand-built corpora with known
  * answers can drive them (CurationSpec) while the declared query keys run
  * them over the fixtures with DuckDB oracle twins (Queries5).
  */
object Curation {

  /** Doc ids from `docs` matching `trainPred` that share at least one
    * w-token shingle with the `benchPred` (eval) subset.
    *
    * Scale shape: eval sets are tiny by construction, so the distinct
    * eval-shingle set broadcasts and contamination is a broadcast LEFT SEMI
    * against one scan of the training corpus — no shuffle grows with
    * training-set size (contrast dedup, where both sides are corpus-sized
    * and LSH banding is required). */
  def contaminatedDocIds(docs: DataFrame, benchPred: Column, trainPred: Column,
      w: Int): DataFrame = {
    val benchSh = docs.where(benchPred)
      .select(explode(Dedup.shingles(col("text"), w)).as("sh")).distinct()
    docs.where(trainPred)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), w)).as("sh"))
      .join(broadcast(benchSh), Seq("sh"), "left_semi")
      .select("doc_id").distinct()
  }

  /** Sequential conversion funnel: for each user, the first `stages(0)`
    * event, then the first `stages(1)` strictly after it, and so on.
    * Returns (stage: 1-based index, users: count surviving that stage).
    *
    * `ev` needs (user_id, event_type, ms). Each stage is a per-user MIN
    * joined to the previous stage's per-user row — the data-proportional
    * work is one filtered scan per stage; the joined state is user-sized. */
  def funnelStages(ev: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val perStage = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (tpe, _)) =>
        val cur = ev.where(col("event_type") === tpe)
          .select(col("user_id"), col("ms"))
        val gated = prev match {
          case None => cur
          case Some(p) =>
            cur.join(p.select(col("user_id"), col("t").as("t_prev")), "user_id")
              .where(col("ms") > col("t_prev"))
        }
        Some(gated.groupBy("user_id").agg(min("ms").as("t")))
    }.flatten
    perStage.zipWithIndex
      .map { case (df, i) => df.select(lit(i + 1).as("stage"), col("user_id")) }
      .reduce(_ unionAll _)
      .groupBy("stage").agg(count(lit(1)).as("users"))
      .orderBy("stage")
  }
}
