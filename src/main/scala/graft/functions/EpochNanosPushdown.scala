package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule restoring parquet predicate pushdown through the
  * `TableRegistry.normalizeTs` boundary.
  *
  * normalizeTs presents a TIMESTAMP_NTZ parquet column to the engine as
  * `unix_micros(cast(ts as timestamp)) * 1000` (the epoch-nanos contract).
  * A comparison of that derived expression against a literal cannot reach
  * the parquet scan — the scan sees only `IsNotNull(ts)` and every
  * row group is read, which at 100 TB forfeits row-group/page pruning on
  * the one column event tables are always filtered by. The arithmetic is
  * exactly invertible over longs, so this rule rewrites
  *
  *   unix_micros(cast(ts as timestamp)) * 1000  ⋈  C        (C literal ns)
  *     ⇒  ts ⋈ Literal(C', TIMESTAMP_NTZ)                    (C' µs)
  *
  * with the ceil/floor division that makes each inequality exact on the
  * integer lattice (e.g. `u·1000 ≥ C ⟺ u ≥ ⌈C/1000⌉`). Equality rewrites
  * only when C is 1000-divisible — a non-divisible equality is NOT
  * replaced by `false` because that would turn a NULL result into FALSE
  * in non-filter contexts.
  *
  * VALIDITY: `unix_micros(cast(ntz as timestamp))` equals the NTZ column's
  * stored micros only when the session time zone is UTC (any other zone
  * makes the cast non-linear across DST transitions), so the rule is a
  * no-op unless `spark.sql.session.timeZone` is UTC/Etc/UTC — which every
  * graft entry point pins. Null semantics are preserved: a NULL `ts`
  * yields NULL before and after.
  */
object EpochNanosPushdownRule extends Rule[LogicalPlan] {

  /** Matches the normalizeTs shape and yields the underlying NTZ column. */
  private object NanosOfNtz {
    private def ntzMicros(e: Expression): Option[Expression] = e match {
      case UnixMicros(Cast(a, TimestampType, _, _))
          if a.dataType == TimestampNTZType => Some(a)
      case _ => None
    }
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(inner, Literal(1000L, LongType), _) => ntzMicros(inner)
      case Multiply(Literal(1000L, LongType), inner, _) => ntzMicros(inner)
      case _ => None
    }
  }

  private def utcSession: Boolean =
    java.time.ZoneId.of(conf.sessionLocalTimeZone).normalized() ==
      java.time.ZoneOffset.UTC

  // exact integer bounds: both are total on Long except within 1000 of the
  // extremes (epoch-ns there is year ±292 — reject and leave the plan alone)
  private def floorDiv1000(c: Long): Option[Long] = Some(Math.floorDiv(c, 1000L))
  private def ceilDiv1000(c: Long): Option[Long] =
    if (c > Long.MaxValue - 999L) None
    else Some(Math.floorDiv(c + 999L, 1000L))

  private def ntzLit(us: Long): Literal = Literal(us, TimestampNTZType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!utcSession) return plan
    plan.transformAllExpressions {
      // attr-on-left orientations
      case GreaterThanOrEqual(NanosOfNtz(a), Literal(c: Long, LongType)) if ceilDiv1000(c).isDefined =>
        GreaterThanOrEqual(a, ntzLit(ceilDiv1000(c).get))
      case GreaterThan(NanosOfNtz(a), Literal(c: Long, LongType)) =>
        GreaterThan(a, ntzLit(floorDiv1000(c).get))
      case LessThanOrEqual(NanosOfNtz(a), Literal(c: Long, LongType)) =>
        LessThanOrEqual(a, ntzLit(floorDiv1000(c).get))
      case LessThan(NanosOfNtz(a), Literal(c: Long, LongType)) if ceilDiv1000(c).isDefined =>
        LessThan(a, ntzLit(ceilDiv1000(c).get))
      case EqualTo(NanosOfNtz(a), Literal(c: Long, LongType)) if c % 1000L == 0L =>
        EqualTo(a, ntzLit(c / 1000L))
      // literal-on-left orientations (mirror: C ⋈ u·1000 ⟺ u·1000 ⋈⁻¹ C)
      case GreaterThanOrEqual(Literal(c: Long, LongType), NanosOfNtz(a)) =>
        LessThanOrEqual(a, ntzLit(floorDiv1000(c).get))
      case GreaterThan(Literal(c: Long, LongType), NanosOfNtz(a)) if ceilDiv1000(c).isDefined =>
        LessThan(a, ntzLit(ceilDiv1000(c).get))
      case LessThanOrEqual(Literal(c: Long, LongType), NanosOfNtz(a)) if ceilDiv1000(c).isDefined =>
        GreaterThanOrEqual(a, ntzLit(ceilDiv1000(c).get))
      case LessThan(Literal(c: Long, LongType), NanosOfNtz(a)) =>
        GreaterThan(a, ntzLit(floorDiv1000(c).get))
      case EqualTo(Literal(c: Long, LongType), NanosOfNtz(a)) if c % 1000L == 0L =>
        EqualTo(a, ntzLit(c / 1000L))
    }
  }
}
