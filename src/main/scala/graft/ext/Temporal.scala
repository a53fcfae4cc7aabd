package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * interval (range) join. Both appear constantly in training-data and
  * event-log pipelines (attach the most recent profile snapshot to each
  * event; slice events into maintenance/experiment windows); the reference
  * engine has no counterpart (SURVEY §2.3 notes no theta/as-of joins), so
  * these extend the north-star operator family (SURVEY §2.13).
  *
  * Scale design:
  *  - asofJoin is ONE shuffle (hash partition by key) + ONE sort per
  *    partition — the union-then-window formulation. The naive alternatives
  *    (theta join `l.t >= r.t` = BroadcastNestedLoop O(|L|·|R|), or a lateral
  *    per-row top-1 subquery) are both unusable at 100 TB. Window state is
  *    O(1) per row (running `last`), so partitions stream through without
  *    materializing the full group.
  *  - rangeJoin buckets both sides on a fixed time grid, turning the range
  *    predicate into an equi-join on the bucket id plus a residual filter.
  *    Each interval expands to (span/bucketWidth + 1) bucket rows, so the
  *    shuffle carries O(|intervals| · avgSpan/width + |events|) rows instead
  *    of the O(|L|·|R|) nested-loop. Pick bucketWidth ≈ median interval
  *    span; AQE handles residual bucket skew (hot buckets split).
  */
object Temporal {

  /** As-of join: for every left row, attach `carryCols` from the latest
    * right row with the same `keyCols` and right.`tsCol` <= left.`tsCol`
    * (inclusive). Carried columns come back as `asof_<name>`, null when no
    * right row precedes the left row (left-outer semantics).
    *
    * Right rows sort before left rows at equal timestamps, so a tie is a
    * match — same as DuckDB `ASOF JOIN ... ON l.t >= r.t` (the oracle twin).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, carryCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    val rightSchema = right.schema
    // Common union schema: keys ++ ts ++ left payload (null on right rows)
    // ++ side tag ++ carried right columns (null on left rows).
    val lSide = left.select(
      (keyCols :+ tsCol).map(col) ++
        leftPayload.map(col) :+
        lit(1).as("_side") :++
        carryCols.map(c => lit(null).cast(rightSchema(c).dataType).as(s"asof_$c")): _*)
    val rSide = right.select(
      (keyCols :+ tsCol).map(col) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_side") :++
        carryCols.map(c => col(c).as(s"asof_$c")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(lSide.unionByName(rSide)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.where(col("_side") === 1).drop("_side")
  }

  /** Interval (range) join: rows of `fact` whose `tsCol` falls inside
    * [loCol, hiCol] of an `intervals` row, via grid bucketing. Returns the
    * joined rows (all fact columns + all interval columns); callers
    * aggregate. Inclusive on both bounds, matching a plain
    * `t BETWEEN lo AND hi` theta join (the oracle twin).
    */
  def rangeJoin(fact: DataFrame, intervals: DataFrame, tsCol: String,
      loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    // `div` (integer division), NOT `/`: epoch-nano longs exceed 2^53, so a
    // double-typed quotient would lose the low bits of the bucket id
    val bucketed = fact.withColumn("_bkt", expr(s"$tsCol div $bucketWidth"))
    val expanded = intervals.withColumn("_bkt",
      explode(sequence(expr(s"$loCol div $bucketWidth"), expr(s"$hiCol div $bucketWidth"))))
    bucketed.join(expanded, Seq("_bkt"))
      .where(col(tsCol) >= col(loCol) && col(tsCol) <= col(hiCol))
      .drop("_bkt")
  }
}
