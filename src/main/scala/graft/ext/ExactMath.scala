package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer-exact decimal rounding of integer ratios — the determinism
  * backbone for every oracle-compared ratio column.
  *
  * Why: `round(a/b, p)` on doubles is engine-ambiguous exactly when the
  * true rational a/b sits on the decimal half-boundary (…5 at place p+1):
  * Spark rounds the shortest decimal repr of the nearest double HALF_UP,
  * DuckDB multiplies by 10^p and rounds — and the two can disagree by one
  * final digit on the SAME input double (found live at sf0.1: a quality
  * score of exactly 0.2883125). Integer ratios hit such boundaries for
  * real data (any denominator with a 2^(p+1) factor); irrational values
  * (cosines, stddevs) effectively never do.
  *
  * Contract: a ≥ 0, b > 0 (callers guard empty groups themselves — SQL
  * aggregates yield NULL there, and so should the caller's expression).
  * Arithmetic runs in decimal(38,0), so `scale·a` has ~10^38 headroom —
  * far past any Long input — and the quotient (≤ 10^p after division)
  * casts back to long loss-free.
  */
object ExactMath {

  private def ldiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** round(a/b, places) with HALF_UP semantics computed in exact integer
    * arithmetic: (2·10^places·a + b) div (2·b), then one float division by
    * 10^places (an identical IEEE op on every engine — the only float in
    * the chain). */
  def ratioRounded(a: Column, b: Column, places: Int): Column = {
    require(places >= 0 && places <= 18, s"places out of range: $places")
    val scale = math.pow(10, places).toLong
    val d = "decimal(38,0)"
    val units = ldiv(
      lit(2L * scale).cast(d) * a.cast(d) + b.cast(d),
      lit(2L).cast(d) * b.cast(d))
    units.cast("double") / scale.toDouble
  }

  /** Truncating integer division lifted to decimal(38,0) — for quotients
    * whose intermediate products overflow Long (same contract as
    * [[ratioRounded]]: a ≥ 0, b > 0, so truncation = floor and the result
    * matches DuckDB `//` on every engine). Returns LongType. */
  def intDiv(a: Column, b: Column): Column = {
    val d = "decimal(38,0)"
    ldiv(a.cast(d), b.cast(d))
  }

  /** The DuckDB twin of [[ratioRounded]] as oracle-SQL text. HUGEINT keeps
    * the 2·10^places·a product exact for any BIGINT inputs. */
  def ratioRoundedSql(a: String, b: String, places: Int): String = {
    val scale = math.pow(10, places).toLong
    s"(CAST(((${2L * scale}::HUGEINT * ($a) + ($b)) // (2::HUGEINT * ($b))) AS DOUBLE) / $scale)"
  }
}
