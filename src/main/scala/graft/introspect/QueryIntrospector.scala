package graft.introspect

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}

import scala.util.Try

/** SQL introspection via Catalyst's parser — the Spark-native replacement for
  * the reference's sqlglot AST walk (partitioning.py:22-66, 87-97): extract
  * referenced tables, JOIN-condition columns, WHERE-clause columns, and all
  * column references from a SQL text, without executing it.
  *
  * Parse failures degrade to None, mirroring the reference's warn-and-skip
  * (partitioning.py:36-37, 96-97).
  */
object QueryIntrospector {

  /** Multiplicity-preserving reference sets extracted from one SQL text. */
  final case class SqlRefs(
      tables: Seq[String],
      joinColumns: Map[String, Int],
      whereColumns: Map[String, Int],
      allColumns: Map[String, Int])

  /** `" AS "` DDL→SELECT extraction (reference partitioning.py:9-20).
    * Case-insensitive REGEX on the original string — an index computed on
    * `toUpperCase` can shift when Unicode uppercasing changes the string
    * length (e.g. ß → SS before the marker), slicing mid-keyword. */
  private val asMarker = java.util.regex.Pattern.compile(" AS ",
    java.util.regex.Pattern.CASE_INSENSITIVE)
  def extractSelect(ddl: String): Option[String] = {
    val m = asMarker.matcher(ddl)
    if (m.find()) Some(ddl.substring(m.end()).trim.stripSuffix(";").trim)
    else None
  }

  private def attrNames(e: Expression): Seq[String] =
    e.collect { case a: UnresolvedAttribute => a.nameParts.last }

  private def counted(names: Seq[String]): Map[String, Int] =
    names.groupBy(identity).map { case (k, v) => k -> v.size }

  /** Every plan node reachable from `p`, including CTE definitions
    * (innerChildren) and subquery-expression plans — sqlglot's find_all
    * walks those too, so the faithful traversal must as well. */
  private def allNodes(p: LogicalPlan): Seq[LogicalPlan] = {
    val direct = p.collect { case n => n }
    val inner = direct.flatMap(_.innerChildren.collect { case lp: LogicalPlan => lp })
      .flatMap(allNodes)
    val fromSubqueries = direct
      .flatMap(_.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s.plan
      }))
      .flatMap(allNodes)
    direct ++ inner ++ fromSubqueries
  }

  /** Parse one SQL text into its reference sets. None on parse failure. */
  def parse(spark: SparkSession, sql: String): Option[SqlRefs] =
    Try {
      val plan: LogicalPlan = spark.sessionState.sqlParser.parsePlan(sql)
      val nodes = allNodes(plan)
      val tables = nodes.collect { case r: UnresolvedRelation => r.multipartIdentifier.last }
      val joinCols = nodes.collect { case j: Join =>
        j.condition.toSeq.flatMap(attrNames)
      }.flatten
      val whereCols = nodes.collect { case f: Filter => attrNames(f.condition) }.flatten
      // all column references anywhere in the plan (select list, group by,
      // join, where …) — matches sqlglot find_all(exp.Column) used by the
      // reference's performance correlation (partitioning.py:186).
      val allCols = nodes.flatMap(_.expressions.flatMap(attrNames))
      SqlRefs(tables, counted(joinCols), counted(whereCols), counted(allCols))
    }.toOption

  /** Parse a view DDL (CREATE … AS SELECT …) like the reference's
    * parse_underlying_query (partitioning.py:22-66). */
  def parseDdl(spark: SparkSession, ddl: String): Option[SqlRefs] =
    extractSelect(ddl).flatMap(parse(spark, _))

  /** Cap on distinct workload texts collected driver-side per analysis —
    * keeps the driver's footprint metadata-sized against a warehouse-scale
    * query log (texts beyond the N most frequent are dropped with a
    * warning). One constant shared by every caller of [[workloadTexts]]. */
  val maxWorkloadTexts: Int = 10000

  /** The capped heavy-hitter collect of distinct workload texts — THE way
    * query texts reach the driver. On a warehouse-scale log distinct texts
    * are not metadata-sized, so the collect is bounded at the `cap` most
    * frequent texts (the advisor's statistics are frequency-weighted, so the
    * dropped tail moves them least). TakeOrdered(count desc) ships only the
    * top-N rows to the driver; anything dropped is logged, never silently
    * truncated. Returned most-frequent-first, ties broken by text. */
  def workloadTexts(queryLog: org.apache.spark.sql.DataFrame,
      cap: Int = maxWorkloadTexts): Seq[String] = {
    import org.apache.spark.sql.functions.col
    topTextsByCount(
      queryLog.select("query").where(col("query").isNotNull)
        .groupBy("query").count()
        .withColumnRenamed("count", "cnt"), cap)
  }

  /** Heavy-hitter selection core over a pre-counted (query, cnt) frame —
    * shared by the raw-log path above and the pipeline's per-text aggregate
    * state (AnalysisPipeline.textStatsOf), so the batch and incremental
    * paths select texts by ONE rule (count desc, text asc, warn-on-drop)
    * and can never drift. */
  def topTextsByCount(counts: org.apache.spark.sql.DataFrame,
      cap: Int = maxWorkloadTexts): Seq[String] = {
    import org.apache.spark.sql.functions.{asc, col, desc}
    val rows = counts.select(col("query"), col("cnt"))
      .orderBy(desc("cnt"), asc("query"))
      .limit(cap + 1)
      .collect()
    if (rows.length > cap)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"workload has more than $cap distinct query texts; " +
          "parsing only the most frequent ones (statistics cover the dominant workload)")
    rows.take(cap).map(_.getString(0)).toSeq
  }

  /** Parse each distinct text once. The workload's distinct-text set is
    * metadata-sized (never data-proportional), so this is the single
    * driver-side parse pass every downstream derivation (usage frequency,
    * performance weights, priorities) shares — the reference re-parsed the
    * log per analysis stage (partitioning.py:87-97, 186). */
  def parseAll(spark: SparkSession, texts: Seq[String]): Seq[(String, Option[SqlRefs])] =
    texts.map(t => t -> parse(spark, t))
}
