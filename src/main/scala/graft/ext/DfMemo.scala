package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted-intermediate memo shared by the sketch-building operators
  * (MinHash/SimHash signatures, LSH bucket projections, IVF cluster
  * assignment): repeated invocations of the same index build (same session +
  * cache key + params) reuse ONE persisted DataFrame instead of stacking a
  * new `.persist()` per call — r3's `simsearch_ivf` regression was exactly
  * that leak (persist with no unpersist, re-built every bench invocation).
  *
  * Entries are metadata-bounded (one DataFrame handle per distinct fixture
  * dir × operator × param set); the cached *data* lives in block storage
  * with MEMORY_AND_DISK eviction, so memory pressure evicts blocks, never
  * correctness. Callers without a stable key get the plain un-persisted
  * plan — correct, just not cross-call cached.
  *
  * At 100 TB this is the "materialize the sketch pass once" discipline:
  * a near-dup pipeline computes signatures in one pass and every downstream
  * consumer (banding, verification, clustering) reads the materialized
  * sketch instead of re-deriving it from document bodies.
  *
  * CONTRACT: the cache key must uniquely identify the INPUT DATA (plus any
  * parameters not already in the operator's tag) — the memo never inspects
  * the built plan, so two different inputs under one key would silently
  * return the first input's result. Fixture call sites key by the corpus
  * directory. Entries are bounded by distinct (dir × operator × params)
  * combinations and live until [[clear]]; blocks themselves are evictable
  * (MEMORY_AND_DISK).
  */
object DfMemo {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Unpersist and drop every entry owned by `spark` — for long-lived
    * sessions that iterate over many corpora/param sets and want the block
    * storage back. Driver-side memos keyed by session live elsewhere too:
    * call [[graft.ext.SimSearch.clear]] (which delegates here) to also drop
    * the collected centroid matrices. */
  def clear(spark: SparkSession): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        e.getValue.unpersist()
        it.remove()
      }
    }
  }

  /** @param persistUnkeyed when true, a key-less call still persists the
    *   built DataFrame (for sketches consumed by several branches of ONE
    *   query, where inlining would recompute them per branch — Spark's
    *   CacheManager dedups identical plans, so repeated key-less calls
    *   share storage rather than stacking it)
    *
    * RE-ENTRANCY: `build` may itself call [[cached]] (memoized operators
    * compose — e.g. the ANN pair memo builds on the memoized bucket
    * projection). That rules out `computeIfAbsent`, whose mapping function
    * must not touch the map — a nested call whose key lands in the same
    * hash bin dies with `IllegalStateException("Recursive update")`, and
    * since bins depend on the session's identity hash the failure is
    * intermittent across JVMs (observed on `graph_pagerank`). Instead:
    * get, build OUTSIDE the map, `putIfAbsent`. A concurrent duplicate
    * build is benign — `persist()` is lazy (no data is computed), and the
    * putIfAbsent loser simply adopts the winner's frame (see below for why
    * it must not unpersist). */
  /** Lazy eviction: entries whose session's SparkContext has stopped can
    * never serve a read again (their cached blocks died with the context)
    * but would otherwise pin the session object — and everything reachable
    * from it — in this static map for the JVM lifetime. Swept on every
    * [[cached]] call; the map is metadata-bounded so the sweep is cheap.
    * Live sessions a server retires WITHOUT stopping the context (e.g.
    * per-tenant `newSession()` instances) still need an explicit
    * [[clear]] — that case is invisible from here. */
  private def sweepStopped(): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1.sparkContext.isStopped) it.remove()
    }
  }

  def cached(spark: SparkSession, cacheKey: Option[String], tag: String,
      persistUnkeyed: Boolean = false)
      (build: => DataFrame): DataFrame = { sweepStopped(); cacheKey match {
    case Some(k) =>
      val key = (spark, s"$tag:$k")
      val existing = memo.get(key)
      if (existing != null) existing
      else {
        val built = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val prev = memo.putIfAbsent(key, built)
        // the putIfAbsent loser must NOT unpersist: CacheManager keys cache
        // entries by LOGICAL PLAN, and the loser's plan is identical to the
        // winner's — unpersisting would evict the winner's entry too and
        // leave the memo serving a permanently-uncached frame (every
        // downstream use then re-runs the full sketch build). The loser's
        // persist() was a no-op on the already-cached plan; nothing leaks.
        if (prev != null) prev else built
      }
    case None if persistUnkeyed =>
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    case None => build
  } }
}
