package graft

import graft.catalog.TableRegistry
import graft.ext.{Dedup, Sampling, Temporal}
import org.apache.spark.sql.functions._

/** Batch-3 extension operators: as-of join vs a naive per-row maximum,
  * bucketed range join vs the plain theta join, connected-components
  * clustering on a known graph, deterministic sampling properties. */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  test("asofJoin matches the naive greatest-t<=T lookup, including ties and misses") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"), (3L, 7L, "l4"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (1L, 25L, 250L), (2L, 9L, 900L))
      .toDF("k", "t", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .select("k", "t", "tag", "asof_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.get(3)))).toSet
    // l1: tie at t=10 matches; l2: t=15 row; l3: right t=9 > 5 → none; l4: no key
    assert(got == Set(
      (1L, 10L, "l1", Some(100L)),
      (1L, 20L, "l2", Some(150L)),
      (2L, 5L, "l3", None),
      (3L, 7L, "l4", None)))
  }

  test("asofJoin plans one shuffle (union+window), not a nested-loop join") {
    val ev = TableRegistry.table(spark, sfDir, "events")
    val l = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", expr("ts div 1000000").as("t"))
    val r = ev.where($"event_type" === "signup")
      .select($"user_id", expr("ts div 1000000").as("t"), $"value".as("v"))
    val plan = Temporal.asofJoin(l, r, Seq("user_id"), "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("rangeJoin equals the plain theta join on inclusive bounds") {
    val fact = Seq((1L, 0L), (2L, 100L), (3L, 250L), (4L, 400L), (5L, 999L))
      .toDF("id", "t")
    val ivals = Seq((10, 100L, 250L), (20, 240L, 260L), (30, 500L, 600L))
      .toDF("iid", "lo", "hi")
    val bucketed = Temporal.rangeJoin(fact, ivals, "t", "lo", "hi", bucketWidth = 64L)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val theta = fact.join(ivals, $"t" >= $"lo" && $"t" <= $"hi")
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(bucketed == theta)
    assert(bucketed == Set((2L, 10), (3L, 10), (3L, 20)))
  }

  test("rangeJoin equals the theta join on NEGATIVE (pre-1970) timestamps") {
    // `div` truncates toward zero while floor-div rounds down, so negative
    // bucket ids differ between the two conventions; coverage holds anyway
    // because trunc-div is monotone and the residual filter re-checks the
    // bounds — this pins that reasoning with data straddling zero
    val fact = Seq((1L, -999L), (2L, -128L), (3L, -64L), (4L, -1L), (5L, 0L),
        (6L, 63L), (7L, 130L)).toDF("id", "t")
    val ivals = Seq((10, -130L, -60L), (20, -63L, 64L), (30, -1000L, -990L))
      .toDF("iid", "lo", "hi")
    val bucketed = Temporal.rangeJoin(fact, ivals, "t", "lo", "hi", bucketWidth = 64L)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val theta = fact.join(ivals, $"t" >= $"lo" && $"t" <= $"hi")
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(bucketed == theta)
    assert(bucketed == Set((1L, 30), (2L, 10), (3L, 10), (4L, 20),
      (5L, 20), (6L, 20)))
  }

  test("asofJoin: NULL left timestamps carry nothing (l.t >= r.t is never true)") {
    val left = Seq((1L, Some(20L), "has_t"), (1L, None, "null_t"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L)).toDF("k", "t", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .select("tag", "asof_v").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(got == Set(("has_t", Some(100L)), ("null_t", None)))
  }

  test("asofJoin: NULL keys never match (SQL equality, not partitionBy grouping)") {
    // Window.partitionBy groups NULL keys together, but the DuckDB ASOF
    // twin's `l.k = r.k` is never true for NULLs — a NULL-keyed right row
    // must not be carried into a NULL-keyed left row.
    val left = Seq((Some(1L), 20L, "keyed"), (None, 20L, "null_key"))
      .toDF("k", "t", "tag")
    val right = Seq((Option.empty[Long], 10L, 666L), (Some(1L), 10L, 100L))
      .toDF("k", "t", "v")
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .select("tag", "asof_v").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(got == Set(("keyed", Some(100L)), ("null_key", None)))
  }

  test("rangeJoin refuses shared column names up front with an actionable message") {
    val fact = Seq((1L, 2L)).toDF("t", "value")
    val ivals = Seq((1L, 0L, 5L)).toDF("value", "lo", "hi") // "value" collides
    val e = intercept[IllegalArgumentException] {
      Temporal.rangeJoin(fact, ivals, "t", "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("value"), e.getMessage)
  }

  test("clusters assigns min reachable id and component size, singletons included") {
    // components: {1,2,3,7} via 1-2, 2-3, 3-7; {4,5}; singleton {6}
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (4L, 5L)).toDF("a_id", "b_id")
    val got = Dedup.clusters(spark, nodes, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (7L, 1L, 4L),
      (4L, 4L, 2L), (5L, 4L, 2L), (6L, 6L, 1L)))
  }

  test("stratified sample is a pure function of the data: stable under repartition") {
    val docs = TableRegistry.table(spark, sfDir, "documents")
    val quota = lit(200L)
    val a = Sampling.stratifiedSample(docs, "doc_id", quota)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(docs.repartition(13), "doc_id", quota)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("topKPerStratum returns exactly min(k, |stratum|) rows per stratum") {
    val docs = TableRegistry.table(spark, sfDir, "documents")
    val counts = Sampling.topKPerStratum(docs, "doc_id", "source", 3)
      .groupBy("source").count().collect().map(_.getLong(1))
    val strata = docs.select("source").distinct().count()
    assert(counts.length == strata)
    assert(counts.forall(_ <= 3))
  }

  test("topKPerStratum with ids unique only per stratum: still exactly k per stratum") {
    // ids shared ACROSS strata must not ride another stratum's pick — the
    // pick-set join is keyed on (stratum, id), so id 1 being picked in
    // stratum "a" cannot keep stratum "b"'s id-1 row unless b picked it too
    import spark.implicits._
    val df = (for (s <- Seq("a", "b", "c"); id <- 1L to 10L) yield (s, id))
      .toDF("stratum", "id")
    val out = Sampling.topKPerStratum(df, "id", "stratum", 3)
    val counts = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 3L, "b" -> 3L, "c" -> 3L),
      s"per-stratum counts drifted: $counts")
    // and the kept ID SET is identical across strata (same hash family,
    // same ids) — a same-id leak would instead inflate every stratum
    val perStratum = out.collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).toSet }
    assert(perStratum.values.toSet.size == 1)
  }

  test("topKPerStratum picks the SAME rows under any input partitioning") {
    // the deterministic-reservoir claim: the kept set is a pure function of
    // the data (hash order + id tiebreak), not of partition layout
    val docs = TableRegistry.table(spark, sfDir, "documents")
    val a = Sampling.topKPerStratum(docs, "doc_id", "source", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.topKPerStratum(docs.repartition(13), "doc_id", "source", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("asofJoin carries the WHOLE latest row: a legit NULL is not papered over by an older row") {
    // right = (t=1, v=5, w=1), (t=2, v=NULL, w=2); left event at t=3 must
    // see the t=2 snapshot: v=NULL, w=2 — the per-column last(ignoreNulls)
    // formulation returned the superseded v=5 (and could stitch v from one
    // row with w from another)
    import spark.implicits._
    val left = Seq((1L, 3L)).toDF("k", "t")
    val right = Seq((1L, 1L, Some(5L), 1L), (1L, 2L, None, 2L))
      .toDF("k", "t", "v", "w")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v", "w"))
      .select("asof_v", "asof_w").collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(0), s"stale v carried: ${out(0)}")
    assert(out(0).getLong(1) == 2L)
  }

  test("asofJoin ignores NULL-timestamp right rows instead of carrying them everywhere") {
    // the as-of predicate l.t >= r.t is never true for a NULL r.t, but
    // ascending sort puts NULLs first — un-filtered they'd be carried into
    // every left row before the first real right row
    import spark.implicits._
    val left = Seq((1L, 50L), (1L, 150L)).toDF("k", "t")
    val right = Seq((1L, Option.empty[Long], 9L), (1L, Some(100L), 1L))
      .toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .orderBy("t").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("asof_v")),
      s"null-ts right row leaked into t=50: ${out(0)}")
    assert(out(1).getLong(out(1).fieldIndex("asof_v")) == 1L)
  }

  test("asofJoin is deterministic on tied right timestamps (max carried struct wins)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1L), (1L, 10L, 2L)).toDF("k", "t", "v")
    val a = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .select("asof_v").collect()(0).getLong(0)
    val b = Temporal.asofJoin(left, right.repartition(7), Seq("k"), "t", Seq("v"))
      .select("asof_v").collect()(0).getLong(0)
    assert(a == 2L, s"tie must resolve to the max carried struct, got $a")
    assert(b == 2L, s"tie nondeterministic under repartition: $b")
  }

  test("idHash never overflows: snowflake-scale and negative ids hash into [0, P)") {
    // the raw id·2654435761 form wrapped negative past id ≈ 3.47e9, making
    // `% 1000 < quota` keep whole id ranges unconditionally
    import spark.implicits._
    val ids = Seq(0L, 5000000000L, Long.MaxValue, -17L).toDF("id")
    val hs = ids.select(Sampling.idHash(col("id")).as("h")).collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0L && h < 1000003L), hs.toSeq.toString)
    // in-range ids keep their historical hash (oracle twins unchanged)
    val small = Seq(42L).toDF("id")
      .select(Sampling.idHash(col("id")).as("h")).collect()(0).getLong(0)
    assert(small == (42L * 2654435761L + 12345L) % 1000003L)
  }

  test("guards: in-place compact refused, zero-width rangeJoin refused, reserved names refused") {
    val docs = TableRegistry.table(spark, sfDir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft_guard").toString
    docs.limit(10).write.mode("overwrite").parquet(s"$tmp/t")
    intercept[IllegalArgumentException] {
      graft.ext.Layout.compact(spark, s"$tmp/t", s"$tmp/t", 1000000L)
    }
    intercept[IllegalArgumentException] {
      graft.ext.Layout.compact(spark, s"$tmp/t", s"$tmp/out", 0L)
    }
    intercept[IllegalArgumentException] {
      Temporal.rangeJoin(docs, docs, "doc_id", "doc_id", "doc_id", 0L)
    }
    import spark.implicits._
    val clash = Seq((1L, 2L)).toDF("k", "__salt")
    intercept[IllegalArgumentException] {
      graft.ext.Skew.saltedJoin(clash, clash.select("k"), "k", col("k"), 4)
    }
  }
}
