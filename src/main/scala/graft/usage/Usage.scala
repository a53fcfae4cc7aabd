package graft.usage

import graft.catalog.ViewMeta
import graft.introspect.QueryIntrospector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weighted column-usage aggregation — the reference's
  * `aggregate_column_usage` (partitioning.py:68-100): one Counter over
  *   (a) every view column replicated ×query_count,
  *   (b) JOIN-condition columns parsed from each view's DDL,
  *   (c) table names parsed from each query-log text.
  * Names of columns and tables share one namespace, faithfully to the
  * reference.
  *
  * Scale posture: SQL texts are parsed once per *distinct* text on the
  * driver (workload-proportional, never data-proportional), then joined back
  * to the log as a broadcast map — the log itself is only scanned, grouped
  * and summed distributively.
  */
object Usage {

  /** (name, weight) contributions from view metadata — columns ×query_count
    * plus DDL join-column counts (partitioning.py:79-86). Driver-side: the
    * registry is metadata, O(views×columns). */
  def viewContributions(spark: SparkSession, views: Seq[ViewMeta]): Seq[(String, Long)] =
    views.flatMap { v =>
      val fromCols = v.columns.map(_ -> v.queryCount)
      val fromDdl = QueryIntrospector.parseDdl(spark, v.ddl).toSeq.flatMap { refs =>
        refs.joinColumns.toSeq.map { case (c, n) => c -> n.toLong }
      }
      fromCols ++ fromDdl
    }

  /** Map of distinct query text → referenced table names (with multiplicity),
    * parsed once on the driver (partitioning.py:87-97 parses per log row;
    * we parse per distinct text, capped at the most frequent
    * [[QueryIntrospector.maxWorkloadTexts]]). Unparseable texts contribute
    * nothing. */
  def tableRefsByQuery(spark: SparkSession, queryLog: DataFrame): Seq[(String, Seq[String])] =
    QueryIntrospector.parseAll(spark, QueryIntrospector.workloadTexts(queryLog))
      .map { case (t, refs) => t -> refs.map(_.tables).getOrElse(Seq.empty) }

  /** A1 weighted frequency: union of all three contribution sources →
    * groupBy(name) sum(weight) → sorted. Output schema:
    * (name string, weighted_frequency bigint).
    *
    * @param parsed optional pre-parsed (text → refs) map from
    *   QueryIntrospector.parseAll, so callers that also need performance /
    *   priority derivations parse the workload exactly once. */
  def weightedFrequency(
      spark: SparkSession,
      views: Seq[ViewMeta],
      queryLog: DataFrame,
      parsed: Option[Seq[(String, Option[QueryIntrospector.SqlRefs])]] = None): DataFrame = {
    import spark.implicits._
    val metaDf = viewContributions(spark, views).toDF("name", "weight")

    val byQuery = parsed match {
      case Some(p) => p.map { case (t, r) => t -> r.map(_.tables).getOrElse(Seq.empty) }
      case None    => tableRefsByQuery(spark, queryLog)
    }
    val refs = byQuery.flatMap { case (q, ts) => ts.map(q -> _) }
    val refsDf = refs.toDF("query", "ref_table")
    // join the (distinct-text → table) map back onto the full log so each log
    // row contributes one count per referenced table; broadcast: the distinct
    // workload texts are small by construction.
    val logDf = queryLog.join(broadcast(refsDf), Seq("query"))
      .select(col("ref_table").as("name"), lit(1L).as("weight"))

    metaDf.unionByName(logDf)
      .groupBy("name").agg(sum("weight").as("weighted_frequency"))
      .orderBy(desc("weighted_frequency"), asc("name"))
  }

  /** [[weightedFrequency]] over per-text aggregate state instead of the raw
    * log. `textStats` rows are (query, cnt, …) — see
    * [[graft.pipeline.AnalysisPipeline.textStatsOf]]. Each log row with text
    * q contributed 1 per referenced-table occurrence, so the total is
    * Σ_texts cnt(q)·multiplicity — linear in the per-text counts, hence
    * EXACTLY the raw-log result, which is what lets the streaming advisor
    * maintain only the per-text state between batches. */
  def weightedFrequencyFromStats(
      spark: SparkSession,
      views: Seq[ViewMeta],
      textStats: DataFrame,
      parsed: Seq[(String, Option[QueryIntrospector.SqlRefs])]): DataFrame = {
    import spark.implicits._
    val metaDf = viewContributions(spark, views).toDF("name", "weight")
    val refs = parsed.flatMap { case (q, r) =>
      r.map(_.tables).getOrElse(Seq.empty).map(q -> _)
    }
    val refsDf = refs.toDF("query", "ref_table")
    val logDf = textStats.join(broadcast(refsDf), Seq("query"))
      .select(col("ref_table").as("name"), col("cnt").as("weight"))
    metaDf.unionByName(logDf)
      .groupBy("name").agg(sum("weight").as("weighted_frequency"))
      .orderBy(desc("weighted_frequency"), asc("name"))
  }
}
