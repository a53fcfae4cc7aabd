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

  // Profiles are deterministic per (sfDir, approx) and profiling is the
  // pipeline's only heavy scan — memoize the collected per-column stats so
  // score_partition / emit_partition_scripts / entry don't re-profile the
  // same fixtures (compute-once, SURVEY §0's fix for the reference's double
  // stat computation).
  private val profileCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean), Seq[Profiler.ColumnProfile]]()

  private def profilesFor(spark: SparkSession, sfDir: String,
      approxCardinality: Boolean): Seq[Profiler.ColumnProfile] =
    profileCache.computeIfAbsent((sfDir, approxCardinality), { _ =>
      // serial job submission: concurrent profiling jobs oversubscribe a
      // small local executor (measured 3× slower on local[4]); on a real
      // cluster with spare slots, wrapping these in Futures is the lever.
      views(spark, sfDir).flatMap(v =>
        Profiler.profile(spark, v.view,
          TableRegistry.table(spark, sfDir, v.view), approxCardinality))
    })

  def views(spark: SparkSession, sfDir: String): Seq[ViewMeta] =
    TableRegistry.profiledTables.map { t =>
      val cols = TableRegistry.table(spark, sfDir, t).schema.fieldNames.toSeq
      // query_count defaults to 1 per view, as in the reference (cli.py:31).
      ViewMeta(t, cols, 1L, TableRegistry.viewDdl(t))
    }

  /** Composite partition scores for every (view, column) — all statistics
    * computed once (each is a DataFrame the caller can reuse). */
  def scores(spark: SparkSession, sfDir: String,
      approxCardinality: Boolean = false): DataFrame = {
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

    val profiles = {
      import spark.implicits._
      profilesFor(spark, sfDir, approxCardinality).toDF()
    }

    Scoring.partitionScores(profiles, usage, colWeights, priorities)
  }

  /** Full run → one recommendation row per profiled view:
    * (view, partition_spec, script). */
  def run(spark: SparkSession, sfDir: String, approxCardinality: Boolean = false,
      topN: Int = 3): DataFrame = {
    val ranked = Scoring.topNPerView(scores(spark, sfDir, approxCardinality), topN)
    Recommender.scripts(spark, ranked, TableRegistry.profiledTables)
  }
}
