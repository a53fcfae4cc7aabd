package graft.profile

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass-per-table column profiler — the native replacement for the
  * reference's per-(view,column) Trino queries:
  *   - cardinality `approx_distinct` (partitioning.py:108-120)
  *   - distribution `approx_percentile + count(distinct) + count(*)`
  *     (partitioning.py:247-292) with skew/density derivation
  *   - `MIN/MAX` value range (partitioning.py:368-375)
  *   - two-level date granularity (partitioning.py:380-408)
  *
  * The reference issues one query per column statistic (O(columns) cluster
  * round trips); here all statistics for a table are computed in a single
  * aggregate pass over the data (one job, one scan), which is the 100 TB
  * posture: profiling cost is one table scan regardless of column count.
  */
object Profiler {

  /** Per-column statistics; -1/None-like sentinels avoided in favor of
    * nullable fields so downstream `when` logic stays honest. */
  final case class ColumnProfile(
      view: String,
      column: String,
      dataType: String,
      cardinality: Long,
      totalCount: Long,
      minValue: Option[Double],
      maxValue: Option[Double],
      valueRange: Option[Double],
      p10: Option[Double],
      p50: Option[Double],
      p90: Option[Double],
      skewRatio: Option[Double],
      density: Option[Double],
      dayCount: Option[Long],
      monthCount: Option[Long],
      yearCount: Option[Long],
      dateGranularity: Option[String])

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: IntegerType | _: LongType | _: DoubleType | _: FloatType | _: ShortType => true
    case _ => false
  }

  private def isDateLike(dt: DataType): Boolean = dt match {
    // parquet naive timestamps surface as TIMESTAMP_NTZ in Spark 4
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }

  /** Profile every column of `df` in one aggregate pass.
    *
    * @param approxCardinality use HLL `approx_count_distinct` (the engine /
    *   100 TB path, matching the reference's approx_distinct) instead of the
    *   exact distinct used by the deterministic verification path.
    * @param distributionCap   distribution stats (percentiles → skew/density)
    *   are computed for the first min(cap, n) *numeric* columns only,
    *   mirroring the reference's sampling cap (partitioning.py:250).
    */
  def profile(
      spark: SparkSession,
      view: String,
      df: DataFrame,
      approxCardinality: Boolean = false,
      distributionCap: Int = 5): Seq[ColumnProfile] = {
    val fields = df.schema.fields.toSeq
    // Reference caps distribution profiling at the first 5 columns
    // (numeric-only: Trino approx_percentile on varchar throws and is
    // skipped, partitioning.py:289-291).
    val distCols: Set[String] =
      fields.take(math.min(distributionCap, fields.length)).filter(f => isNumeric(f.dataType)).map(_.name).toSet

    def card(c: String): Column =
      if (approxCardinality) approx_count_distinct(col(c)) else countDistinct(col(c))

    // Two single-row passes over the table. Mixing multi-DISTINCT aggregates
    // (which plan as Expand ×(groups+1)) with imperative percentile buffers
    // in ONE aggregate makes every buffer update pay the expand factor —
    // measured 25× slower at sf0.1. Distinct counts go in one pass,
    // everything else in the other; exact percentiles keep the verification
    // path deterministic (the reference used approx_percentile — the approx
    // twin is exposed via percentile_approx in Queries.agg_percentile).
    val distinctAggs = scala.collection.mutable.ArrayBuffer[Column]()
    val plainAggs = scala.collection.mutable.ArrayBuffer[Column](count(lit(1)).as("_total"))
    fields.foreach { f =>
      val c = f.name
      distinctAggs += card(c).as(s"${c}__card")
      if (isNumeric(f.dataType)) {
        plainAggs += min(col(c)).cast("double").as(s"${c}__min")
        plainAggs += max(col(c)).cast("double").as(s"${c}__max")
        if (distCols(c)) {
          plainAggs += expr(s"percentile($c, array(0.1D, 0.5D, 0.9D))").as(s"${c}__pct")
        }
      }
      if (isDateLike(f.dataType)) {
        // two-level date-granularity aggregation (partitioning.py:380-408):
        // count(distinct day-of-month / month / year values). Folded into
        // the same distinct pass — a separate two-level job costs an extra
        // table scan per date column (measured slower than 3 Expand groups).
        distinctAggs += countDistinct(dayofmonth(col(c))).as(s"${c}__days")
        distinctAggs += countDistinct(month(col(c))).as(s"${c}__months")
        distinctAggs += countDistinct(year(col(c))).as(s"${c}__years")
      }
    }

    val row: Row = df.agg(plainAggs.head, plainAggs.tail.toSeq: _*)
      .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail.toSeq: _*))
      .collect()(0)
    def get[T](name: String): Option[T] = {
      val names = row.schema.fieldNames
      val i = names.indexOf(name)
      if (i < 0 || row.isNullAt(i)) None else Some(row.get(i).asInstanceOf[T])
    }
    val total = get[Long]("_total").getOrElse(0L)

    fields.map { f =>
      val c = f.name
      val cardV = get[Long](s"${c}__card").getOrElse(0L)
      val minV = get[Double](s"${c}__min")
      val maxV = get[Double](s"${c}__max")
      val pct = get[scala.collection.Seq[Double]](s"${c}__pct").map(_.toSeq)
      val (p10, p50, p90) = pct match {
        case Some(Seq(a, b, cc)) => (Some(a), Some(b), Some(cc))
        case _ => (None, None, None)
      }
      // skew: p90/p10 when p10 ∉ {p90, 0} else 1.0 (intended semantics of
      // partitioning.py:270-276); density: distinct/total (py:279).
      val skew = pct.map { _ =>
        (p10, p90) match {
          case (Some(lo), Some(hi)) if lo != hi && lo != 0.0 => hi / lo
          case _ => 1.0
        }
      }
      val density = pct.map(_ => if (total > 0) cardV.toDouble / total else 0.0)
      val (dCnt, mCnt, yCnt) =
        (get[Long](s"${c}__days"), get[Long](s"${c}__months"), get[Long](s"${c}__years"))
      // granularity thresholds per partitioning.py:399-406.
      val gran = (dCnt, mCnt, yCnt) match {
        case (Some(d), Some(m), Some(y)) =>
          Some(if (d > m * 20) "day" else if (m > y * 8) "month" else "year")
        case _ => None
      }
      ColumnProfile(
        view = view, column = c, dataType = f.dataType.simpleString,
        cardinality = cardV, totalCount = total,
        minValue = minV, maxValue = maxV,
        valueRange = for (a <- minV; b <- maxV) yield b - a,
        p10 = p10, p50 = p50, p90 = p90,
        skewRatio = skew, density = density,
        dayCount = dCnt, monthCount = mCnt, yearCount = yCnt,
        dateGranularity = gran)
    }
  }

  /** Profiles for a set of named tables as one DataFrame (long format —
    * SURVEY §1: joinable struct<view,column,…> rather than nested maps). */
  def profileTables(
      spark: SparkSession,
      tables: Seq[(String, DataFrame)],
      approxCardinality: Boolean = false): DataFrame = {
    import spark.implicits._
    tables.flatMap { case (n, df) => profile(spark, n, df, approxCardinality) }.toDF()
  }
}
