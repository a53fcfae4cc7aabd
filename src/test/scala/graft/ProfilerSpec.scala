package graft

import graft.catalog.TableRegistry
import graft.profile.Profiler

/** A2-A7/C6 profiler invariants on the sf0.001 fixtures. */
class ProfilerSpec extends SparkSpec {

  private lazy val profiles =
    Profiler.profile(spark, "lineitem", TableRegistry.table(spark, sfDir, "lineitem"))

  private def p(c: String) = profiles.find(_.column == c).get

  test("profiles one row per column with total count") {
    assert(profiles.map(_.column).toSet == TableRegistry.profiledColumns("lineitem").toSet)
    assert(profiles.forall(_.totalCount == profiles.head.totalCount))
    assert(profiles.head.totalCount > 0)
  }

  test("low-cardinality string column profiled correctly") {
    val f = p("l_returnflag")
    assert(f.cardinality == 3)
    assert(f.minValue.isEmpty && f.p10.isEmpty) // non-numeric: no range/percentiles
  }

  test("date column gets granularity counts and a year/month/day decision") {
    val d = p("l_shipdate")
    assert(d.dayCount.contains(31L))
    assert(d.monthCount.contains(12L))
    assert(d.yearCount.exists(_ >= 2))
    // multi-year daily data: day_count(31) < month_count*20 and
    // month_count(12) < year_count*8 → 'year' per partitioning.py:399-406
    assert(d.dateGranularity.contains("year"))
  }

  test("distribution stats only for first-5 numeric columns (C6 cap)") {
    assert(p("l_quantity").skewRatio.isDefined)   // 5th column, numeric
    assert(p("l_extendedprice").skewRatio.isEmpty) // 6th column: capped out
    assert(p("l_orderkey").density.exists(d => d > 0 && d <= 1))
  }

  test("skew guard: p10 ∈ {0, p90} → ratio 1.0") {
    // l_linenumber ∈ [1,7]: p10=1, p90=6ish — plain ratio; synthetic check of
    // the guard uses l_discount-like low-distinct col if p10==p90.
    val ln = p("l_linenumber")
    assert(ln.skewRatio.exists(_ >= 1.0))
  }

  test("approx cardinality path stays within 10% of exact (HLL rsd=5% is 1σ)") {
    val approx = Profiler.profile(spark, "lineitem",
      TableRegistry.table(spark, sfDir, "lineitem"), approxCardinality = true)
    approx.foreach { ap =>
      val ex = p(ap.column).cardinality.toDouble
      assert(math.abs(ap.cardinality - ex) <= math.max(2.0, ex * 0.10),
        s"${ap.column}: approx ${ap.cardinality} vs exact $ex")
    }
  }
}
