package graft.pipeline

import graft.catalog.{TableRegistry, ViewMeta}
import graft.profile.Profiler
import graft.recommend.Recommender
import graft.score.Scoring
import graft.usage.Usage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end advisor pipeline (reference cli.py:11-137 stages 3–8), fully
  * native: discover → profile → parse workload → score → recommend. Each
  * statistic is computed once and reused (the reference recomputed
  * cardinality/performance twice — cli.py:83-89 vs partitioning.py:334-335).
  */
object AnalysisPipeline {

  def views(spark: SparkSession, sfDir: String): Seq[ViewMeta] =
    TableRegistry.profiledTables.map { t =>
      val cols = TableRegistry.table(spark, sfDir, t).schema.fieldNames.toSeq
      // query_count defaults to 1 per view, as in the reference (cli.py:31).
      ViewMeta(t, cols, 1L, TableRegistry.viewDdl(t))
    }

  /** Full run → one recommendation row per profiled view:
    * (view, partition_spec, script). */
  def run(spark: SparkSession, sfDir: String, approxCardinality: Boolean = false,
      topN: Int = 3): DataFrame = {
    val vs = views(spark, sfDir)
    val queryLog = TableRegistry.queryLog(spark, sfDir).cache()

    val usage = Usage.weightedFrequency(spark, vs, queryLog)
    val (_, colWeights) = Scoring.performanceMetrics(spark, queryLog)

    // per-view avg interactive priority (README-intent score term)
    val types = Scoring.queryTypes(queryLog)
    val tblRefs = Scoring.parsedRefs(spark, queryLog).where(col("ref_column").isNull)
      .select(col("query"), col("ref_table"))
    val priorities = types.join(broadcast(tblRefs), Seq("query"))
      .groupBy(col("ref_table").as("table"))
      .agg(avg("partition_priority").as("avg_priority"))

    val profiles = Profiler.profileTables(spark,
      vs.map(v => v.view -> TableRegistry.table(spark, sfDir, v.view)), approxCardinality)

    val scores = Scoring.partitionScores(profiles, usage, colWeights, priorities)
    val ranked = Scoring.topNPerView(scores, topN)
    Recommender.scripts(spark, ranked, vs.map(_.view))
  }
}
