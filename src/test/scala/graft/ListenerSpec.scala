package graft

import graft.catalog.TableRegistry
import graft.listener.UsageListener
import org.apache.spark.sql.functions._

/** §4 self-hosting usage capture: executed queries surface their
  * table/join/filter references through the listener. */
class ListenerSpec extends SparkSpec {

  test("listener records table, join and filter references of executed queries") {
    val rec = UsageListener.install(spark)
    try {
      TableRegistry.table(spark, sfDir, "orders")
        .join(TableRegistry.table(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .where(col("o_totalprice") > 100000)
        .count()
      // listener callbacks are async — poll until the events land
      val deadline = System.nanoTime() + 10000000000L
      while (rec.snapshot.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      val kinds = rec.snapshot.groupBy(_.kind).view.mapValues(_.map(_.name).toSet).toMap
      assert(kinds.getOrElse("join_col", Set.empty).contains("o_custkey"), kinds.toString)
      assert(kinds.getOrElse("join_col", Set.empty).contains("c_custkey"), kinds.toString)
      assert(kinds.getOrElse("where_col", Set.empty).contains("o_totalprice"), kinds.toString)
      val frame = UsageListener.usageFrame(spark, rec)
      assert(frame.where(col("kind") === "join_col").count() >= 2)
    } finally spark.listenerManager.unregister(rec)
  }

  test("self-hosting loop: canned workload observed through spark.sql") {
    val usage = graft.pipeline.SelfHosting.observeWorkload(spark, sfDir,
      graft.catalog.TableRegistry.cannedQueries)
    val rows = usage.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val tables = rows.filter(_._1 == "table").map(t => t._2 -> t._3).toMap
    // the canned workload references lineitem twice (q0, q1) and orders twice
    assert(tables.getOrElse("lineitem", 0L) >= 2, tables.toString)
    assert(tables.getOrElse("orders", 0L) >= 2, tables.toString)
    val joins = rows.filter(_._1 == "join_col").map(_._2).toSet
    assert(joins.contains("o_orderkey") && joins.contains("l_orderkey"), joins.toString)
    val wheres = rows.filter(_._1 == "where_col").map(_._2).toSet
    assert(wheres.contains("o_totalprice"), wheres.toString)
  }

  test("table aliases and derived-table aliases are NOT phantom table references") {
    graft.pipeline.SelfHosting.registerViews(spark, sfDir)
    val rec = UsageListener.install(spark)
    try {
      spark.sql("SELECT l.l_quantity FROM lineitem l WHERE l.l_quantity > 0").count()
      spark.sql("SELECT d.q FROM (SELECT l_quantity AS q FROM lineitem) d").count()
      val deadline = System.nanoTime() + 10000000000L
      while (rec.completedQueries < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      val tables = rec.snapshot.filter(_.kind == "table").map(_.name).toSet
      assert(tables.contains("lineitem"), tables.toString)
      // the alias `l`, the derived-table alias `d` and the CTE-free
      // subquery must not fabricate table rows (they burned stateCap
      // slots and polluted the advisor's usage stats)
      assert(!tables.contains("l") && !tables.contains("d"), tables.toString)
    } finally spark.listenerManager.unregister(rec)
  }

  test("observeWorkload waits for ALL callbacks and returns fast on an empty workload") {
    // The wait itself, unit-level (wall-clock assertions on the whole
    // observeWorkload call proved flaky under suite/host contention):
    // nothing launched → no wait at all; already-delivered callbacks →
    // no wait; a pending callback waits only until it lands.
    val rec = new UsageListener.Recorder()
    assert(graft.pipeline.SelfHosting.awaitCallbacks(rec, 0) < 1e9.toLong)
    rec.record("table", "x", 1L) // recorder usable, but no callbacks yet
    assert(graft.pipeline.SelfHosting.awaitCallbacks(rec, 0) < 1e9.toLong)
    // a short deadline bounds a genuinely-pending wait
    val waited = graft.pipeline.SelfHosting.awaitCallbacks(rec, 1,
      deadlineNanos = 200000000L)
    assert(waited >= 200000000L && waited < 5e9.toLong, waited.toString)
    // end-to-end: the empty workload still yields an empty frame
    val empty = graft.pipeline.SelfHosting.observeWorkload(spark, sfDir, Seq.empty)
    assert(empty.count() == 0)
    // multi-query workload: every query's refs are present (the old
    // first-callback-plus-200ms wait dropped late callbacks)
    val usage = graft.pipeline.SelfHosting.observeWorkload(spark, sfDir, Seq(
      "SELECT count(*) FROM lineitem",
      "SELECT count(*) FROM orders",
      "SELECT count(*) FROM customer",
      "SELECT count(*) FROM supplier"))
    val tables = usage.where(col("kind") === "table")
      .collect().map(_.getString(1)).toSet
    assert(Set("lineitem", "orders", "customer", "supplier").subsetOf(tables), tables.toString)
  }

  test("recorder state is bounded by stateCap; overflow counted, existing keys still aggregate") {
    val rec = new UsageListener.Recorder(stateCap = 8)
    (0 until 1000).foreach(i => rec.record("where_col", s"c$i", 1000L))
    assert(rec.snapshot.size == 8, s"size ${rec.snapshot.size}")
    assert(rec.droppedRefs == 992L, s"dropped ${rec.droppedRefs}")
    // keys admitted before saturation keep aggregating in place
    rec.record("where_col", "c0", 500L)
    val c0 = rec.snapshot.find(_.name == "c0").get
    assert(c0.count == 2L && c0.totalDurationNs == 1500L, c0.toString)
    assert(rec.droppedRefs == 992L) // aggregation of a live key is not a drop
  }

  test("grep gate: no data-proportional driver collect in src/main") {
    // Every .collect() in src/main must be in this audited allowlist, where
    // each site is metadata-bounded (catalog listings, scalar aggregates,
    // k centroids, capped workload texts, bounded advisor state). A new
    // file appearing here means a new collect site needs auditing; notably
    // SelfHosting must stay collect-free (r7 verdict: workload results are
    // arbitrary user SQL and must never materialize on the driver).
    val audited = Set(
      "Probe.scala", "Profiler.scala", "StreamingAdvisor.scala",
      "SimSearch.scala", "Multimodal.scala", "TableRegistry.scala",
      "QueryIntrospector.scala", "Main.scala", "AnalysisPipeline.scala",
      // contaminatedDocIds collects the distinct SHORT-doc token lengths of
      // the EVAL set only — the same tiny-by-contract side that broadcasts;
      // bounded by w-1 integers regardless of corpus size
      "Curation.scala",
      // Balance.evidence collects ONE stats row per what-if job (the
      // grouped counts collapse to a single aggregate before collect);
      // candidate lists are topN × views — catalog-bounded, never data
      "Balance.scala",
      // StreamingDrift collects per-batch BUCKET histograms only — 13
      // (bucket, count) rows per micro-batch regardless of stream length;
      // the doc stream itself is never retained (X29 scale note)
      "StreamingDrift.scala",
      // DriftReanalysis collects the vetted recommendation set at a
      // threshold crossing — one (view, partition_spec) row per advised
      // view, catalog-bounded like the advisor snapshots it mirrors
      "DriftReanalysis.scala",
      // Bpe collects ONE argmax row + one total scalar per merge round —
      // the merge decision is driver state by definition (the k-means
      // centroid discipline); the vocabulary frame itself never leaves
      // the executors
      "Bpe.scala",
      // StreamingAdmission collects per-batch PER-SOURCE counter rows only
      // — O(sources) rows of six longs per micro-batch, further bounded by
      // the lex-first sourceCap fold; the doc stream itself is never
      // retained (the StreamingDrift histogram discipline)
      "StreamingAdmission.scala",
      // StreamingIndex collects per-batch INDEX-sized deltas only: a
      // 3-scalar rollup per month partition plus the distinct (month, bit)
      // frame — bounded by partitions × mBits (2 KiB/partition at
      // m=16384) regardless of batch or stream size; the order stream
      // itself is never retained (X78 scale note)
      "StreamingIndex.scala")
    val root = new java.io.File("src/main/scala")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    assume(root.isDirectory, "run from repo root")
    // regex, not a literal: .collect (), collectAsList, toLocalIterator are
    // the same driver-materialization hazard spelled differently (r8 review
    // finding). head(n)/take(n) are excluded — they are bounded by their
    // argument and used legitimately for probes.
    val mat = java.util.regex.Pattern.compile(
      """\.\s*(collect|collectAsList|toLocalIterator)\s*\(""")
    val offenders = walk(root).filter { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      mat.matcher(src).find()
    }.map(_.getName).toSet
    assert((offenders -- audited).isEmpty,
      s"unaudited driver-materialization sites: ${offenders -- audited}")
  }

  test("grep gate: every Window.partitionBy file is in the audited window inventory") {
    // The r12 hot-key audit made every window partition bounded
    // (COVERAGE.md "Window inventory"): doc-bounded frames, per-entity
    // ordered histories, metadata-sized groups, sub-bucketed two-level
    // prefixes, or micro-batch-bounded state. This gate makes the audit
    // STANDING — a file gaining a partitionBy window must be added here
    // with its boundedness class, or converted (max_by / TopKRows /
    // groupBy+join-back / two-level) like the thirteen r12 sites.
    val audited = Set(
      "Winnow.scala", // doc_id frames + (pair, diagonal) islands — doc-bounded
      "Queries.scala", // window_running_sum — declared-cut input (≤ 300 keys)
      "Queries3.scala", // window_lag_lead — per-entity ordered history
      "Queries4.scala", // locf (status × days spine), tfidf rank (per doc),
      //                   ntile in-bucket numbering (two-level)
      "Queries5.scala", // length_bucket_batches in-sub numbering (two-level)
      "Queries6.scala", // vocab_growth two-level bucket prefix
      "Queries7.scala", // chunk_cdc (per doc), cluster_keep_policy (~256-doc clusters)
      "Queries8.scala", // q17 per-part avg window (opt-r15) — per-entity
      //                   (l_partkey) frames, bounded by part fan-out; the
      //                   window replaced a second fact scan + fact-sized
      //                   join-back (one exchange serves avg + predicate)
      "Queries9.scala", // cohort_retention — user over DISTINCT weeks (≤ #weeks rows)
      "Queries11.scala", // scd2 (entity history, declared-capped),
      //                    sample_weight two-level, curriculum 50-row head
      "Queries16.scala", // knn_classify vote rank — ≤ nQueries(64) partitions
      //                    of ≤ #labels rows (the post-TopKRows vote rollup);
      //                    range_partition_bounds group-offset window — the
      //                    only global window runs over the coarse-group
      //                    subtotal frame (distinctKeys/groupWidth rows)
      "Scoring.scala", // top-N per view — table-count-sized
      "StreamingUsage.scala", // sessionize twin (entity) + LSH flags (micro-batch)
      "Temporal.scala", // as-of running-last — per-key ordered history
      "TextAnalysis.scala") // packSequences two-level shard prefix
    val root = new java.io.File("src/main/scala")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    assume(root.isDirectory, "run from repo root")
    val offenders = walk(root).filter { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      // strip line comments so prose explaining WHY a window was removed
      // does not count as a site
      src.linesIterator
        .map(l => l.indexOf("//") match { case -1 => l; case i => l.substring(0, i) })
        .exists(_.contains("Window.partitionBy"))
    }.map(_.getName).toSet
    assert((offenders -- audited).isEmpty,
      s"unaudited Window.partitionBy sites: ${offenders -- audited}")
    // the allowlist must not go stale either — a converted file comes OFF it
    assert((audited -- offenders).isEmpty,
      s"stale window-audit entries: ${audited -- offenders}")
  }

  test("self-hosted advisor: session serves the workload, then advises on it") {
    val recs = graft.pipeline.SelfHosting.adviseFromObservedWorkload(
      spark, sfDir, graft.catalog.TableRegistry.cannedQueries)
      .collect().map(r => r.getAs[String]("view") -> r.getAs[String]("partition_spec")).toMap
    // one row per profiled table, discovered from the session catalog
    assert(recs.keySet == graft.catalog.TableRegistry.profiledTables.toSet, recs.keySet.toString)
    // the workload's hottest table must get a real spec derived from its
    // own observed queries (q0 filters l_shipdate, q1 joins l_orderkey)
    val li = recs("lineitem")
    assert(li != null && li.nonEmpty, "no spec for lineitem")
  }
}
