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
      val vs = views(spark, sfDir)
      // Each per-table profile is two single-row aggregate jobs whose task
      // count is bounded by the table's partition count — far below a big
      // executor's slot count. With spare slots (≥16) submit the per-table
      // jobs concurrently so the scheduler interleaves them (the 1000-
      // executor posture: profiling N tables costs ~the largest table's
      // scan, not the sum). On small executors (local[4]) concurrent jobs
      // oversubscribe and measure ~3× slower — stay serial there.
      if (spark.sparkContext.defaultParallelism >= 16 && vs.size > 1) {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(vs.size)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try {
          val fs = vs.map(v => Future(Profiler.profile(spark, v.view,
            TableRegistry.table(spark, sfDir, v.view), approxCardinality)))
          Await.result(Future.sequence(fs), Duration.Inf).flatten
        } finally pool.shutdown()
      } else
        vs.flatMap(v => Profiler.profile(spark, v.view,
          TableRegistry.table(spark, sfDir, v.view), approxCardinality))
    })

  def views(spark: SparkSession, sfDir: String): Seq[ViewMeta] =
    TableRegistry.profiledTables.map { t =>
      val cols = TableRegistry.table(spark, sfDir, t).schema.fieldNames.toSeq
      // query_count defaults to 1 per view, as in the reference (cli.py:31).
      ViewMeta(t, cols, 1L, TableRegistry.viewDdl(t))
    }

  /** Workload-derived statistics (usage frequencies, per-column exec-time
    * weights, per-view priorities) are metadata-sized and deterministic per
    * sfDir — memoized as collected rows, like the profiles, so repeated
    * pipeline entry points don't rescan the query log. */
  private val workloadCache = new java.util.concurrent.ConcurrentHashMap[String,
    (Seq[(String, Long)], Seq[(String, String, Long)], Seq[(String, Double)])]()

  private def workloadFor(spark: SparkSession, sfDir: String)
      : (Seq[(String, Long)], Seq[(String, String, Long)], Seq[(String, Double)]) =
    workloadCache.computeIfAbsent(sfDir, { _ =>
      val vs = views(spark, sfDir)
      val queryLog = TableRegistry.queryLog(spark, sfDir).cache()
      // one driver-side parse of the distinct workload texts, shared by all
      // three derivations (usage / perf weights / priorities) — the reference
      // re-parsed the log per analysis stage
      val texts = queryLog.select("query").where(col("query").isNotNull)
        .distinct().collect().map(_.getString(0)).toSeq
      val parsed = graft.introspect.QueryIntrospector.parseAll(spark, texts)
      val refsDf = Scoring.parsedRefsFrom(spark, parsed).cache()
      val usage = Usage.weightedFrequency(spark, vs, queryLog, Some(parsed))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val (_, colWeights) = Scoring.performanceMetricsFrom(queryLog, refsDf)
      val weights = colWeights.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val types = Scoring.queryTypes(queryLog)
      val tblRefs = refsDf.where(col("ref_column").isNull)
        .select(col("query"), col("ref_table"))
      val priorities = types.join(broadcast(tblRefs), Seq("query"))
        .groupBy(col("ref_table").as("table"))
        .agg(avg("partition_priority").as("avg_priority"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      refsDf.unpersist()
      queryLog.unpersist()
      (usage, weights, priorities)
    })

  /** Composite partition scores for every (view, column) — all statistics
    * computed once (each memoized at metadata size). */
  def scores(spark: SparkSession, sfDir: String,
      approxCardinality: Boolean = false): DataFrame = {
    import spark.implicits._
    val (usageRows, weightRows, priorityRows) = workloadFor(spark, sfDir)
    val usage = usageRows.toDF("name", "weighted_frequency")
    val colWeights = weightRows.toDF("table", "column", "weight")
    val priorities = priorityRows.toDF("table", "avg_priority")
    val profiles = profilesFor(spark, sfDir, approxCardinality).toDF()
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
