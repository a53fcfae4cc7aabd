package graft

/** Canary over the exact surface the driver measures: every key in
  * [[SparkEntry.queries]] must EXECUTE (not just plan) at sf0.001, and
  * every oracle entry must name a declared key. A future key addition that
  * compiles but dies at runtime — or lands in `oracleSql` without a
  * matching query — would otherwise first surface in the round's
  * BENCH/CORRECTNESS artifacts, after the turn budget is spent (r4 verdict
  * "Next round" #5).
  */
class BenchSurfaceSpec extends SparkSpec {

  test("every declared query key executes end-to-end at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracle key names a declared query key") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }
}
