package graft

import graft.catalog.TableRegistry
import graft.ext.{Dedup, Multimodal, SimSearch}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-16 — post-r15 surface growth: perceptual image dedup (X68), the
  * image-tier sibling of the text near-dup family (MinHash/SimHash) the
  * multimodal tier lacked — features/resize/frames measured rasters but
  * nothing deduplicated them, and image dedup is a first-class stage of a
  * multimodal training pipeline; plus the data-skipping / adaptive-layout
  * tier — X71 Bloom index, X73 zone map, X74 range bounds, X75 salt plan,
  * X76 z-order layout, X77 index FPR measurement, X79 layout staleness
  * (X78, the streaming maintenance face, lives in
  * [[graft.streaming.StreamingIndex]]) — and benchmark decontamination
  * (X72), the eval-overlap screen between the dedup tier and corpus
  * shipment.
  */
object Queries16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableRegistry.table(s, dir, name)

  /** Partition-level Bloom data-skipping index (X71): per month-partition
    * of `orders`, the k-hash Bloom bit set over the join key plus a probe
    * report (would the index admit `probeKey`? is it actually there?) —
    * the index a lakehouse skipping layer maintains next to each
    * partition so point/semi-join scans prune partitions before touching
    * data. Hash family is the minhash affine family over the key VALUE
    * (h_i = ((i·2654435761 mod P)·key + (i·40503+17 mod P)) mod P mod m,
    * P = 1e9+7) — pure integer arithmetic, so DuckDB and python replay
    * the exact bit positions; products stay < 2^63 for any BIGINT key in
    * the fixture domain. Scale shape: one scan → (month, key) distinct
    * (map-side combined), bit explode is ×k on the DISTINCT keys only,
    * per-partition state is ≤ m bits, and the index is MERGEABLE (bitwise
    * OR) so 1000 executors build shard blooms independently. */
  private[graft] def bloomPartitionIndex(orders: DataFrame, mBits: Long,
      kHashes: Int, probeKey: Long): DataFrame = {
    val P = 1000000007L
    def bitOf(i: Column, key: Column) =
      ((((i * lit(2654435761L)) % P) * key + (i * lit(40503L) + 17L) % P) % P) % mBits
    val probeBits = (1 to kHashes).map { i =>
      ((((i * 2654435761L) % P) * probeKey + (i * 40503L + 17L) % P) % P) % mBits
    }.distinct
    // ONE scan, one (month, key) shuffle, one month rollup: the ×k bit
    // explode rides the already-distinct key rows, so every per-month stat
    // (rows via Σnr/k — each key row appears k times — distinct keys,
    // distinct bits, probe bits, ground truth) folds in a single grouped
    // aggregation; no join, no second scan of the fact table.
    val keys = orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"), col("o_custkey"))
      .groupBy("month", "o_custkey").agg(count(lit(1)).as("nr"))
    keys
      .select(col("month"), col("o_custkey"), col("nr"),
        explode(sequence(lit(1), lit(kHashes))).as("i"))
      .select(col("month"), col("o_custkey"), col("nr"),
        bitOf(col("i"), col("o_custkey")).as("bit"))
      .groupBy("month").agg(
        expr(s"sum(nr) div $kHashes").as("n_rows"),
        countDistinct("o_custkey").as("n_keys"),
        countDistinct("bit").as("n_set_bits"),
        countDistinct(when(col("bit").isin(probeBits: _*), col("bit")))
          .as("probe_hits"),
        max(when(col("o_custkey") === probeKey, 1).otherwise(0)).as("probe_actual"))
      .select(col("month"), col("n_rows"), col("n_keys"), col("n_set_bits"),
        graft.ext.ExactMath.ratioRounded(col("n_set_bits"), lit(mBits), 6).as("fill"),
        (col("probe_hits") === probeBits.size).cast("int").as("probe_maybe"),
        col("probe_actual").cast("int").as("probe_actual"))
      .orderBy("month")
  }

  /** Per-doc decontamination manifest (X72): per TRAIN document, how much
    * of its distinct 3-word-shingle set also appears anywhere in the EVAL
    * split — the removal DECISION artifact a cleaning anti-join consumes
    * (GPT-3 appendix C / Dolma §5 n-gram decontamination; shingle family
    * shared verbatim with the dedup tier via [[Dedup.shingles]]). The
    * per-SOURCE any-hit rollup already exists as `decontaminate_ngram`
    * (Queries5, the observability dial) and its semantic complement as
    * `decontaminate_embedding`; this key scores PARTIAL overlap — a doc
    * quoting one benchmark line is not condemned with a full clone — and
    * names the docs, closing the loop the way X64 closed SemDeDup's.
    * Scale shape: the eval side of the join is benchmark-sized BY NATURE
    * (eval sets don't grow with the crawl), so its distinct-shingle set is
    * broadcast and the train side streams through one scan → explode →
    * broadcast-hash probe → per-doc fold; nothing shuffles proportional to
    * the corpus except the per-doc groupBy, which is map-side combined.
    * Contamination ratio is half-up-rounded via the exact-integer
    * [[graft.ext.ExactMath.ratioRounded]] contract and the flag compares
    * ON THE ROUNDED VALUE, so all three engines agree on boundary docs. */
  private[graft] def decontaminateEval(docs: DataFrame, evalMod: Long,
      flagAt: Double): DataFrame = {
    // opt-r15: the #1 sf1 key (12.6 s at 10× data). Root cause was never
    // the probe side but per-shingle STRING construction: the HOF
    // shingles() form ran an interpreted per-window lambda allocating
    // every window string (an earlier xxhash64-variant that still BUILT
    // the strings before hashing measured SLOWER, 1.32 → 1.59 s at
    // sf0.1/32c — hashing on top of construction only added work). The
    // DistinctShingleHashes kernel deletes construction itself: one
    // codegen pass over the text bytes dedups window VIEWS and emits
    // 64-bit hashes, so only (doc_id, gh:long) rows flow through the
    // explode → broadcast probe → map-side-combined per-doc fold. Engine
    // joins on the 64-bit shingle hash, the oracle on shingle identity —
    // the span_dup_fraction / source_overlap_matrix collision convention
    // (same shingle space, w=3, already accepted there; counts identical
    // short of a 64-bit birthday collision, re-verified on the oracle at
    // sf0.001/0.01/0.1 + skew + sf1). Plan shape unchanged: one train
    // scan, eval subtree benchmark-sized, no corpus-sized shuffle.
    val sh = docs.select(col("doc_id"),
      explode(Dedup.distinctShingleHashes(col("text"), 3)).as("gh"))
    val evalSet = sh.where(col("doc_id") % 10 === evalMod)
      .select("gh").distinct().withColumn("hit", lit(1L))
    sh.where(col("doc_id") % 10 =!= evalMod)
      .join(broadcast(evalSet), Seq("gh"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        coalesce(sum("hit"), lit(0L)).as("n_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        graft.ext.ExactMath.ratioRounded(col("n_hits"), col("n_shingles"), 6)
          .as("contamination"))
      .withColumn("flagged", (col("contamination") >= flagAt).cast("int"))
      .orderBy("doc_id")
  }

  /** Partition zone-map (min/max) skipping index (X73): the OTHER index a
    * lakehouse skipping layer maintains beside X71's Bloom — per
    * month-partition of `orders`, the [min, max] envelope of a measure
    * column plus a range-probe report: would the zone map admit the scan
    * (`probe_maybe` = envelope overlaps [lo, hi]) and does the partition
    * actually hold a qualifying row (`probe_actual`)? The gap between the
    * two IS the zone map's false-positive behavior, surfaced honestly.
    * One scan, one map-side-combined month rollup, ≤ one row of state per
    * partition, mergeable (min/max fold), no join, no second scan. */
  private[graft] def zonemapPartitionIndex(orders: DataFrame, valueCol: String,
      lo: Double, hi: Double): DataFrame =
    orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col(valueCol).as("v"))
      .groupBy("month").agg(
        count(lit(1)).as("n_rows"),
        min("v").as("min_val"),
        max("v").as("max_val"),
        max(when(col("v").between(lo, hi), 1).otherwise(0)).as("probe_actual"))
      .select(col("month"), col("n_rows"), col("min_val"), col("max_val"),
        (!(col("max_val") < lo || col("min_val") > hi)).cast("int")
          .as("probe_maybe"),
        col("probe_actual").cast("int"))
      .orderBy("month")

  /** Adaptive range-partition boundaries (X74): the balanced range layout
    * the reference's whole advisory loop exists to recommend — given a
    * target of `nBuckets` range partitions over a join/sort key, emit per
    * bucket its key interval [lo_key, hi_key], distinct-key count, and row
    * count, where a key's bucket is `floor(startOffset · B / N)` over the
    * key-ordered cumulative row count (exact integer arithmetic; a hot key
    * spanning several bucket widths lands whole in the bucket its offset
    * starts in, so buckets absorb skew instead of splitting a key).
    *
    * Scale shape — the global weighted cumsum is decomposed two-level so
    * NO single-partition window ever sees the key domain: keys group by a
    * coarse prefix (`key div groupWidth`); per-group subtotals (a frame
    * `distinctKeys/groupWidth` small) take the only global window; the
    * per-key cumsum runs partitionBy(group) — each window partition is ≤
    * groupWidth keys — and the group offsets broadcast back. The DuckDB
    * oracle computes the SAME boundaries with one naive global cumsum,
    * certifying the decomposition exact. */
  /** The X74 bounds arithmetic over an ALREADY-materialized (k, nr)
    * histogram (callers pass a [[Dedup.truncate]]d frame so the offsets
    * branch, the per-key cumsum, and the total all ride one computation).
    * Factored out (opt-r15) so [[partitionBalanceReport]] can feed the
    * base-epoch histogram from its single dual-count fact scan instead of
    * scanning the fact table a second time. */
  private[graft] def boundsFromHistogram(histKNr: DataFrame, nBuckets: Int,
      groupWidth: Long): DataFrame = {
    val perKey = histKNr
      .withColumn("grp", graft.ext.ExactMath.intDiv(col("k"), lit(groupWidth)))
    val grpOffsets = perKey.groupBy("grp").agg(sum("nr").as("gnr"))
      .withColumn("goff", coalesce(sum("gnr").over(
        Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // opt-r15: the total rides a broadcast scalar column instead of a
    // driver .first() — one fewer action (and driver round-trip) per
    // invocation; same exact-integer bucket arithmetic.
    val total = perKey.agg(sum("nr").as("tot"))
    perKey
      .withColumn("woff", coalesce(sum("nr").over(
        Window.partitionBy("grp").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(grpOffsets.select("grp", "goff")), Seq("grp"))
      .crossJoin(broadcast(total))
      .withColumn("bucket", graft.ext.ExactMath.intDiv(
        (col("goff") + col("woff")) * nBuckets, col("tot")))
      .groupBy("bucket").agg(
        min("k").as("lo_key"), max("k").as("hi_key"),
        count(lit(1)).as("n_keys"), sum("nr").as("n_rows"))
      .orderBy("bucket")
  }

  private[graft] def rangePartitionBounds(orders: DataFrame, keyCol: String,
      nBuckets: Int, groupWidth: Long): DataFrame =
    // The distinct-key histogram is materialized ONCE ([[Dedup.truncate]]:
    // localCheckpoint on local[n], reliable checkpoint under a checkpoint
    // dir) — the offsets branch, the per-key cumsum, and the total all ride
    // it, so the fact table is scanned exactly once however large it is.
    boundsFromHistogram(
      Dedup.truncate(orders.groupBy(col(keyCol).as("k"))
        .agg(count(lit(1)).as("nr"))),
      nBuckets, groupWidth)

  /** Skew salting plan (X75): the per-key salt-factor head a skew-aware
    * join planner consumes — the `nBuckets`-relative weight of the top
    * `topN` heaviest keys (count desc, key asc ties), salt_factor =
    * ceil(n_rows · nBuckets / total) clamped to ≥ 1: replicate-broadcast
    * the other side by this factor (or split the key across this many
    * salted sub-keys) and the hot key's partition work falls back under
    * the uniform-bucket envelope. One map-side-combined groupBy, a top-N
    * head (TakeOrdered-sized driver result), and a broadcast scalar total;
    * nothing else leaves the executors. */
  private[graft] def saltPlanTopK(events: DataFrame, nBuckets: Int,
      topN: Int): DataFrame = {
    // opt-r15: the former `events.count()` was a SECOND full fact scan
    // (plus a driver action) run at query-construction time; Σ of the
    // per-key counts IS the row total (count(lit(1)) counts every row,
    // null keys included), so derive it from the histogram instead and
    // ride it in as a broadcast scalar column. The histogram is
    // checkpointed ([[Dedup.truncate]], the X74 discipline) because BOTH
    // the top-N head and the total read it — one fact scan total, same
    // exact integer arithmetic.
    val perKey = Dedup.truncate(
      events.groupBy(col("user_id")).agg(count(lit(1)).as("n_rows")))
    val total = perKey.agg(sum("n_rows").as("tot"))
    perKey
      .orderBy(col("n_rows").desc, col("user_id").asc)
      .limit(topN)
      .crossJoin(broadcast(total))
      .select(col("user_id"), col("n_rows"),
        graft.ext.ExactMath.ratioRounded(col("n_rows"), col("tot"), 6)
          .as("share"),
        greatest(lit(1L), graft.ext.ExactMath.intDiv(
          col("n_rows") * nBuckets + col("tot") - 1L, col("tot")))
          .as("salt_factor"))
      .orderBy(col("n_rows").desc, col("user_id").asc)
  }

  /** Z-order clustering layout report (X76): the multi-dimensional
    * data-skipping layout the single-column tier (X71/X73/X74) can't
    * reach — interleave the bits of two bucketed dimensions (customer key
    * scaled to 8 bits against its max; order-month ordinal scaled to 8
    * bits against `nMonths`) into a 16-bit Morton code, cut the code
    * space into `nBlocks` equal ranges (value-based, so NO global sort is
    * needed to assign blocks), and emit each block's [lo,hi] envelope in
    * BOTH dimensions beside the same report for the naive date-sorted
    * layout. Read the two side by side: the z-order blocks are tight in
    * both dimensions (a predicate on EITHER column skips blocks) while
    * the linear layout is tight only in the sort dimension — the measured
    * argument for OPTIMIZE ZORDER over single-column clustering. All
    * arithmetic is integer (bit shifts + exact scaled division), so
    * DuckDB and python replay every code and envelope bit-exactly; the
    * only non-grouped action is the max-key scalar (metadata-sized). */
  private[graft] def zorderLayoutStats(orders: DataFrame, baseYear: Int,
      nMonths: Int, nBlocks: Int): DataFrame = {
    // opt-r15: the max-key scalar rides a broadcast column instead of a
    // driver .first() — one fewer action per invocation; the broadcast
    // subtree is the same column-pruned max aggregation.
    val maxKey1 = orders.agg((max("o_custkey") + 1L).as("mk1"))
    val dord = (year(col("o_orderdate")) - baseYear) * 12 +
      month(col("o_orderdate")) - 1
    val dims = orders.crossJoin(broadcast(maxKey1)).select(
      graft.ext.ExactMath.intDiv(col("o_custkey") * 256L, col("mk1"))
        .as("cx"),
      graft.ext.ExactMath.intDiv(dord.cast("long") * 256L, lit(nMonths.toLong))
        .as("dx"))
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(col("cx"), i) bitwiseAND 1L, 2 * i + 1) +
        shiftleft(shiftright(col("dx"), i) bitwiseAND 1L, 2 * i)
    }.reduce(_ + _)
    // opt-r15: ONE scan + ONE fact-sized aggregation for both layout
    // reports. The former unionAll of two groupBys referenced `dims`
    // twice, so the fact scan (and the dimension-scaling arithmetic) ran
    // once per layout. Count/min/max compose associatively, so aggregate
    // the fact ONCE to the (zorder block, linear block) CELL grid — ≤
    // nBlocks² rows, map-side combined — and fold each layout's report
    // from the cells (two metadata-sized aggregations). Row-identical
    // output, fact scans 2 → 1, and the per-row work is one grouped
    // aggregation instead of two (plans/r15/zorder_layout_before/
    // _after.txt). At 100 TB the second full fact pass disappears.
    // The 2-element layout explode rides the CELL frame (≤ nBlocks² rows
    // — free), not the fact, so the fact-sized aggregation subtree is
    // referenced exactly once: no persist, no checkpoint, no double pass.
    // (Two rejected variants, both measured: explode-on-the-fact doubled
    // the rows through the aggregation, +0.15 s; an eager cell checkpoint
    // cost a materialization job that outweighed the saved 2.7 MB fixture
    // scan, +0.25 s.)
    val cells = dims
      .groupBy(
        graft.ext.ExactMath.intDiv(z, lit(65536L / nBlocks)).as("zb"),
        graft.ext.ExactMath.intDiv(col("dx") * nBlocks, lit(256L)).as("lb"))
      .agg(count(lit(1)).as("c"),
        min("cx").as("cxl"), max("cx").as("cxh"),
        min("dx").as("dxl"), max("dx").as("dxh"))
    cells
      .select(explode(array(
          struct(lit("zorder").as("layout"), col("zb").as("block")),
          struct(lit("linear").as("layout"), col("lb").as("block")))).as("t"),
        col("c"), col("cxl"), col("cxh"), col("dxl"), col("dxh"))
      .groupBy(col("t.layout").as("layout"), col("t.block").as("block"))
      .agg(
        sum("c").as("n_rows"),
        min("cxl").as("cx_lo"), max("cxh").as("cx_hi"),
        min("dxl").as("dx_lo"), max("dxh").as("dx_hi"))
      .select(col("layout"), col("block"), col("n_rows"),
        col("cx_lo"), col("cx_hi"), col("dx_lo"), col("dx_hi"),
        ((col("cx_hi") - col("cx_lo") + 1L) * (col("dx_hi") - col("dx_lo") + 1L))
          .as("envelope_area"))
      .orderBy("layout", "block")
  }

  /** Bloom-index false-positive-rate measurement (X77): the quality dial
    * an operator watches AFTER deploying X71's index — probe every month
    * partition with 100 keys KNOWN to the corpus (the 100 smallest
    * distinct custkeys) and 100 keys known ABSENT (maxKey+1..maxKey+100),
    * count pairs the index admits vs pairs that actually hold the key,
    * and report the observed FPR per probe class (false admissions over
    * negative pairs). The absent class measures pure hash-collision FPR
    * at the index's realized fill; the present class shows admissions
    * dominated by true hits plus cross-month collisions. Scale shape:
    * ONE scan of the fact feeds a checkpointed distinct (month, key)
    * frame; everything downstream (bit frames, probe cross, hit counts)
    * is months × 200 probes — metadata-sized however large the fact is;
    * probes broadcast into every join. */
  private[graft] def bloomIndexFpr(orders: DataFrame, mBits: Long,
      kHashes: Int, nProbes: Int): DataFrame = {
    val P = 1000000007L
    def bitOf(i: Column, key: Column) =
      ((((i * lit(2654435761L)) % P) * key + (i * lit(40503L) + 17L) % P) % P) % mBits
    val mk = Dedup.truncate(orders.select(
      date_format(col("o_orderdate"), "yyyy-MM").as("month"),
      col("o_custkey").as("k")).distinct())
    val maxKey = mk.agg(max("k")).first().getLong(0)
    val present = mk.select("k").distinct().orderBy("k").limit(nProbes)
      .withColumn("probe_class", lit("present"))
    val absent = mk.sparkSession.range(1, nProbes + 1)
      .select((lit(maxKey) + col("id")).as("k"),
        lit("absent").as("probe_class"))
    val probes = present.unionAll(absent)
    val probeBits = probes
      .select(col("k"), col("probe_class"),
        explode(sequence(lit(1), lit(kHashes))).as("i"))
      .select(col("k"), col("probe_class"), bitOf(col("i"), col("k")).as("bit"))
      .distinct()
    val probeN = probeBits.groupBy("k", "probe_class")
      .agg(count(lit(1)).as("nb"))
    // opt-r15: NO distinct before the probe join. The former
    // `.distinct()` shuffled the full keys×k bit explode just to dedup
    // (month, bit) pairs, but the only consumer is `hits`, whose
    // countDistinct("bit") dedups anyway — so the broadcast probe join
    // (≤ nProbes·k bit values, ~2% selectivity at m=16384) filters the
    // explode FIRST and the distinct work happens on the survivors. At
    // 100 TB this deletes the largest exchange of the plan (fact-keys×k
    // rows); row-identical output by countDistinct idempotence.
    val monthBits = mk
      .select(col("month"), explode(sequence(lit(1), lit(kHashes))).as("i"),
        col("k"))
      .select(col("month"), bitOf(col("i"), col("k")).as("bit"))
    val hits = monthBits.join(broadcast(probeBits), Seq("bit"))
      .groupBy("month", "k").agg(countDistinct("bit").as("nh"))
    val pairs = mk.select("month").distinct()
      .crossJoin(broadcast(probeN))
    pairs
      .join(hits, Seq("month", "k"), "left")
      .join(mk.withColumn("act", lit(1)), Seq("month", "k"), "left")
      .select(col("probe_class"),
        (coalesce(col("nh"), lit(0L)) === col("nb")).cast("int").as("adm"),
        coalesce(col("act"), lit(0)).as("act"))
      .groupBy("probe_class").agg(
        count(lit(1)).as("n_pairs"),
        sum("adm").as("n_admitted"),
        sum("act").cast("long").as("n_actual"),
        sum(when(col("adm") === 1 && col("act") === 0, 1L).otherwise(0L))
          .as("n_false_pos"))
      .select(col("probe_class"), col("n_pairs"), col("n_admitted"),
        col("n_actual"), col("n_false_pos"),
        graft.ext.ExactMath.ratioRounded(col("n_false_pos"),
          col("n_pairs") - col("n_actual"), 6).as("fpr"))
      .orderBy("probe_class")
  }

  /** Range-layout balance / staleness report (X79): the ADAPTIVE half of
    * adaptive partitioning — X74 computes balanced bounds from the data a
    * layout was built on; this report re-evaluates those FROZEN bounds
    * against the data as it stands now and says whether the layout went
    * stale. Bounds come from the base epoch (orders before `baseCutoff`,
    * through [[rangePartitionBounds]] unchanged); every current key is
    * assigned by the step function "greatest lo_key ≤ key" (keys below
    * the first bound fall to bucket 0); per bucket the report emits
    * key/row counts, corpus share, load_ratio = share·B (1.0 = perfectly
    * balanced) and the rebalance flag at rounded load_ratio ≥ 1.5 — the
    * signal an adaptive layout manager acts on by re-running X74. Scale
    * shape: the bounds frame is ≤ B rows and BROADCASTS into the
    * assignment join; the current-key histogram is checkpointed once (the
    * X74 discipline) and feeds both the assignment and the total; nothing
    * data-proportional crosses the driver. */
  private[graft] def partitionBalanceReport(orders: DataFrame,
      baseCutoff: String, keyCol: String, nBuckets: Int,
      groupWidth: Long): DataFrame = {
    // opt-r15: ONE fact scan + ONE checkpoint serve BOTH histograms. The
    // former shape ran rangePartitionBounds on the filtered fact (scan +
    // checkpoint #1) and built the current-epoch histogram from a second
    // full scan (+ checkpoint #2); the base-epoch per-key counts are just
    // a conditional count in the same grouped aggregation, and keys absent
    // before the cutoff drop out via nr_base > 0 — row-identical to the
    // filtered groupBy (plan evidence: plans/r15/partition_balance_report
    // _before/_after.txt, 2 fact scans → 1).
    val hist = Dedup.truncate(orders.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("nr"),
        count(when(col("o_orderdate") < lit(baseCutoff).cast("timestamp"), 1))
          .as("nr_base")))
    val bounds = boundsFromHistogram(
      hist.where(col("nr_base") > 0).select(col("k"), col("nr_base").as("nr")),
      nBuckets, groupWidth).select("bucket", "lo_key")
    val perKey = hist.select("k", "nr")
    // opt-r15: total as a broadcast scalar column (one fewer driver
    // action; the agg reads the checkpoint, not the fact)
    val total = perKey.agg(sum("nr").as("tot"))
    perKey
      .join(broadcast(bounds), col("k") >= col("lo_key"), "left")
      .groupBy("k", "nr").agg(coalesce(max("bucket"), lit(0L)).as("bucket"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_keys"), sum("nr").as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_keys"), col("n_rows"),
        graft.ext.ExactMath.ratioRounded(col("n_rows"), col("tot"), 6)
          .as("share"),
        graft.ext.ExactMath.ratioRounded(col("n_rows") * nBuckets, col("tot"), 6)
          .as("load_ratio"))
      .withColumn("rebalance", (col("load_ratio") >= 1.5).cast("int"))
      .orderBy("bucket")
  }

  /** Workload pruning simulation (X80): the reference's whole advisory
    * loop asks "would this partition layout help THIS workload?" — this
    * key answers it measurably. Every logged query (the §1 query-log
    * derivation) is screened against the month layout + X73 zone maps:
    * a recognized `o_orderdate >= DATE 'd'` predicate prunes months below
    * d's month (partition pruning); a recognized `o_totalprice > p`
    * predicate prunes months whose zone-map max ≤ p; queries not touching
    * `orders` or carrying no recognized predicate are reported
    * `supported = 0` with zero pruning — the simulator is honest about
    * its predicate coverage, never optimistic. Output per distinct
    * workload query: run count, support flag, partition/pruned counts,
    * prune_frac (ratioRounded). Scale shape: the workload rollup is
    * O(distinct queries), the partition stats are one fact scan →
    * month rollup (≤ one row per partition), and the simulation is a
    * broadcast cross of two metadata-sized frames — nothing
    * data-proportional moves for ANY log or fact size. */
  private[graft] def workloadPruningSim(qlog: DataFrame,
      orders: DataFrame): DataFrame = {
    val datePat = "o_orderdate >= DATE '([0-9-]+)'"
    val pricePat = "o_totalprice > ([0-9.]+)"
    val wl = qlog.groupBy("query").agg(count(lit(1)).as("n_runs"))
      .withColumn("date_lit", regexp_extract(col("query"), datePat, 1))
      .withColumn("price_lit", regexp_extract(col("query"), pricePat, 1))
      .withColumn("on_orders", col("query").contains("FROM orders"))
      .withColumn("supported", (col("on_orders") &&
        (col("date_lit") =!= "" || col("price_lit") =!= "")).cast("int"))
    val parts = orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_totalprice"))
      .groupBy("month").agg(max("o_totalprice").as("max_price"))
    parts.crossJoin(broadcast(wl))
      .withColumn("pruned", when(col("supported") === 1 &&
        ((col("date_lit") =!= "" &&
          col("month") < substring(col("date_lit"), 1, 7)) ||
         (col("price_lit") =!= "" &&
          col("max_price") <= col("price_lit").cast("double"))), 1L)
        .otherwise(0L))
      .groupBy("query", "n_runs", "supported").agg(
        count(lit(1)).as("n_partitions"),
        sum("pruned").as("n_pruned"))
      .select(col("query"), col("n_runs"), col("supported"),
        col("n_partitions"), col("n_pruned"),
        graft.ext.ExactMath.ratioRounded(col("n_pruned"), col("n_partitions"), 6)
          .as("prune_frac"))
      .orderBy("query")
  }

  def specs: Seq[QSpec] = Seq(

    QSpec("dedup_image_phash",
      // X68 — dHash over the DECODED raster corpus (real PNG decode +
      // 9×8 nearest-neighbor resample, the multimodal_resize kernel), four
      // 16-bit LSH bands, Hamming ≤ 10 verification over DISTINCT hashes,
      // keep-first manifest. The oracle replays pixel values from the
      // PngFixtures generator parameters (the multimodal_features
      // discipline — a wrong decode/resample breaks the hash compare) and
      // the band-share candidate condition as an OR-join.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val fx = Multimodal.PngFixtures.ensure(docs, dir)
        Multimodal.dHashKeepManifest(
          Multimodal.mediaFromBinaryFiles(s, fx, "*.png"), maxHamming = 10)
      },
      Some(
        """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id*3) % 24 AS h FROM documents),
          |p AS (SELECT doc_id, list_transform(range(72), k ->
          |    (31*doc_id + 7*(((k % 9) * w) // 9) + 13*(((k // 9) * h) // 8)) % 256) AS pix FROM d),
          |bits AS (SELECT doc_id, list_transform(range(64), k ->
          |    CASE WHEN pix[(k // 8) * 9 + (k % 8) + 2] > pix[(k // 8) * 9 + (k % 8) + 1]
          |      THEN 1 ELSE 0 END) AS bt FROM p),
          |hs AS (SELECT doc_id,
          |    CAST(list_sum(list_transform(range(16), i -> bt[i+1]  * (1 << i))) AS INT) AS b0,
          |    CAST(list_sum(list_transform(range(16), i -> bt[i+17] * (1 << i))) AS INT) AS b1,
          |    CAST(list_sum(list_transform(range(16), i -> bt[i+33] * (1 << i))) AS INT) AS b2,
          |    CAST(list_sum(list_transform(range(16), i -> bt[i+49] * (1 << i))) AS INT) AS b3
          |  FROM bits),
          |hd AS (SELECT b0, b1, b2, b3, MIN(doc_id) AS min_doc FROM hs GROUP BY 1, 2, 3, 4),
          |cand AS (SELECT a.b0, a.b1, a.b2, a.b3, MIN(b.min_doc) AS neigh_min
          |  FROM hd a JOIN hd b
          |    ON (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
          |   AND (a.b0 <> b.b0 OR a.b1 <> b.b1 OR a.b2 <> b.b2 OR a.b3 <> b.b3)
          |  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          |      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 10
          |  GROUP BY 1, 2, 3, 4)
          |SELECT hs.doc_id,
          |  printf('%04X%04X%04X%04X', hs.b0, hs.b1, hs.b2, hs.b3) AS hash_hex,
          |  CAST(CASE WHEN hs.doc_id = hd.min_doc
          |      AND (c.neigh_min IS NULL OR c.neigh_min > hs.doc_id)
          |    THEN 1 ELSE 0 END AS INT) AS kept
          |FROM hs JOIN hd USING (b0, b1, b2, b3)
          |LEFT JOIN cand c USING (b0, b1, b2, b3)
          |ORDER BY doc_id""".stripMargin)),

    QSpec("dedup_minhash_incremental",
      // X69 — cross-run incremental MinHash dedup, the text-tier sibling
      // of dedup_semantic_incremental: the NEW batch (doc_id%10 >= 7, the
      // dedup_incremental fixture policy) is screened against the KEPT
      // docs of the already-deduped BASE corpus (doc_id%10 < 7) under the
      // exact dedup_minhash family; the base manifest never changes. The
      // oracle replays the whole chain per-doc — signatures, base banding
      // + keep-first drop set, cross banding against keepers, rounded
      // Jaccard ≥ 0.7 — with no group collapse, certifying the engine's
      // rep-level derivation is a pure optimization.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.minhashIncrementalKeepers(s,
          docs.where(expr("doc_id % 10 >= 7")),
          docs.where(expr("doc_id % 10 < 7")),
          cacheKey = Some(dir))
      },
      Some(
        """WITH sh0 AS (
          |  SELECT doc_id, list_distinct(CASE WHEN len(sp) < 3 THEN [text]
          |    ELSE list_transform(range(1, len(sp)-1), i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2]) END) AS sh
          |  FROM (SELECT doc_id, text, string_split(text, ' ') AS sp FROM documents) d
          |), hs AS (
          |  SELECT doc_id, sh, list_transform(sh, g ->
          |    list_reduce(list_prepend(CAST(7 AS BIGINT),
          |      list_transform(range(1, length(g)+1), i -> CAST(unicode(g[i]) AS BIGINT))),
          |      (acc, c) -> (acc * 131 + c) % 1000000007)) AS hs
          |  FROM sh0
          |), sig AS (
          |  SELECT doc_id, sh, list_transform(range(20), i ->
          |    list_min(list_transform(hs, h ->
          |      (((i+1) * 2654435761 % 1000000007) * h + ((i+1) * 40503 + 17) % 1000000007) % 1000000007))) AS sig
          |  FROM hs
          |), bsig AS (SELECT * FROM sig WHERE doc_id % 10 < 7),
          |nsig AS (SELECT * FROM sig WHERE doc_id % 10 >= 7),
          |bb AS (SELECT doc_id, b, sig[b*4+1 : b*4+4] AS key FROM bsig, range(5) t(b)),
          |bc AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          |  FROM bb a JOIN bb b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
          |bdrop AS (SELECT DISTINCT c.b_id FROM bc c
          |  JOIN bsig x ON x.doc_id = c.a_id JOIN bsig y ON y.doc_id = c.b_id
          |  WHERE ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
          |    (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6) >= 0.7),
          |kept AS (SELECT * FROM bsig WHERE doc_id NOT IN (SELECT b_id FROM bdrop)),
          |nb AS (SELECT doc_id, b, sig[b*4+1 : b*4+4] AS key FROM nsig, range(5) t(b)),
          |kb AS (SELECT doc_id, b, sig[b*4+1 : b*4+4] AS key FROM kept, range(5) t(b)),
          |xc AS (SELECT DISTINCT n.doc_id AS n_id, k.doc_id AS k_id
          |  FROM nb n JOIN kb k ON n.b = k.b AND n.key = k.key),
          |hit AS (SELECT DISTINCT c.n_id FROM xc c
          |  JOIN nsig x ON x.doc_id = c.n_id JOIN kept y ON y.doc_id = c.k_id
          |  WHERE ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
          |    (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6) >= 0.7)
          |SELECT n.doc_id,
          |  CAST(CASE WHEN h.n_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
          |FROM nsig n LEFT JOIN hit h ON n.doc_id = h.n_id
          |ORDER BY doc_id""".stripMargin)),

    QSpec("knn_classify",
      // X70 — kNN majority-vote classification over the embedding column,
      // the evaluation face the retrieval tier lacked (knn_join emits
      // neighbors; this turns them into predictions + a confusion matrix):
      // 64 probe vectors classified by the majority label of their 5
      // nearest (rounded-cosine, vec_id-asc ties) among the disjoint rest;
      // vote ties break to the smallest label. Rides the knn_join kernel
      // unchanged (broadcast probes, codegen dot, bounded-heap top-k — no
      // shuffle proportional to the corpus), so the scale story is the
      // retrieval tier's: brute-force per partition at fixture scale, IVF
      // bucketing as the 100 TB path. Surface is the O(labels²) confusion
      // rollup a model-eval job actually reads.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val lab = emb.select(col("vec_id"), col("label"))
        val pred = SimSearch.knnJoin(s, emb, nQueries = 64, k = 5)
          .join(lab, Seq("vec_id"))
          .groupBy("q_id", "label").agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("q_id").orderBy(col("n").desc, col("label").asc)))
          .where(col("rk") === 1)
          .select(col("q_id"), col("label").as("pred_label"))
        pred
          .join(lab.select(col("vec_id").as("q_id"), col("label").as("true_label")),
            Seq("q_id"))
          .groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
          .orderBy("true_label", "pred_label")
      },
      Some(
        """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
          |n AS (SELECT vec_id, label, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
          |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv, nrm AS qn FROM n WHERE vec_id < 64),
          |c AS (SELECT vec_id, label, v, nrm FROM n WHERE vec_id >= 64),
          |p AS (SELECT q_id, c.vec_id, c.label,
          |    ROUND(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*qv[i])) / (nrm*qn), 6) AS cos
          |  FROM c, q),
          |r AS (SELECT q_id, label, ROW_NUMBER() OVER (
          |    PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank FROM p),
          |v AS (SELECT q_id, label, COUNT(*) AS nv FROM r WHERE rank <= 5 GROUP BY 1, 2),
          |pr AS (SELECT q_id, label AS pred_label FROM (
          |    SELECT q_id, label, nv, ROW_NUMBER() OVER (
          |      PARTITION BY q_id ORDER BY nv DESC, label ASC) AS rk FROM v) z
          |  WHERE rk = 1)
          |SELECT q.true_label, pr.pred_label, CAST(COUNT(*) AS BIGINT) AS n
          |FROM pr JOIN q USING (q_id)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    QSpec("bloom_partition_index",
      // X71 — partition-level Bloom data-skipping index + probe-pruning
      // report (the index emission a lakehouse skipping layer maintains;
      // bloom_prefilter is the JOIN-side consumer, this is the per-
      // partition INDEX artifact): m=16384 bits / k=3 affine hashes over
      // o_custkey per order month, fill ratio, and for probe key 777 both
      // the index verdict (all 3 bits set) and ground truth. The oracle
      // replays the exact bit arithmetic.
      (s, dir) => bloomPartitionIndex(t(s, dir, "orders"),
        mBits = 16384L, kHashes = 3, probeKey = 777L),
      Some(
        """WITH k AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, o_custkey,
          |    COUNT(*) AS nr
          |  FROM orders GROUP BY 1, 2),
          |b AS (SELECT DISTINCT month,
          |    ((((i * 2654435761) % 1000000007) * o_custkey
          |      + (i * 40503 + 17) % 1000000007) % 1000000007) % 16384 AS bit
          |  FROM k, range(1, 4) t(i)),
          |pb AS (SELECT DISTINCT
          |    ((((i * 2654435761) % 1000000007) * 777
          |      + (i * 40503 + 17) % 1000000007) % 1000000007) % 16384 AS bit
          |  FROM range(1, 4) t(i)),
          |pm AS (SELECT month, SUM(nr) AS n_rows, COUNT(*) AS n_keys,
          |    MAX(CASE WHEN o_custkey = 777 THEN 1 ELSE 0 END) AS probe_actual
          |  FROM k GROUP BY 1),
          |sb AS (SELECT month, COUNT(*) AS n_set_bits,
          |    COUNT(*) FILTER (WHERE bit IN (SELECT bit FROM pb)) AS probe_hits
          |  FROM b GROUP BY 1)
          |SELECT pm.month, CAST(n_rows AS BIGINT) AS n_rows,
          |  CAST(n_keys AS BIGINT) AS n_keys,
          |  CAST(n_set_bits AS BIGINT) AS n_set_bits,
          |  CAST((2000000 * n_set_bits + 16384) // 32768 AS DOUBLE) / 1000000 AS fill,
          |  CAST(CASE WHEN probe_hits = (SELECT COUNT(*) FROM pb)
          |    THEN 1 ELSE 0 END AS INT) AS probe_maybe,
          |  CAST(probe_actual AS INT) AS probe_actual
          |FROM pm JOIN sb USING (month) ORDER BY month""".stripMargin)),

    QSpec("decontaminate_eval",
      // X72 — per-doc decontamination manifest (the decision-artifact face
      // of decontaminate_ngram's per-source rollup): per train doc
      // (doc_id%10 != 3),
      // the fraction of its distinct 3-shingles that appear anywhere in
      // the eval split (doc_id%10 == 3); flag at rounded fraction >= 0.5.
      // The eval shingle set is broadcast (benchmark-sized by nature).
      (s, dir) => decontaminateEval(t(s, dir, "documents"),
        evalMod = 3L, flagAt = 0.5),
      Some(
        s"""WITH sh0 AS (SELECT doc_id, list_distinct(CASE WHEN len(sp) < 3 THEN [text]
          |    ELSE list_transform(range(1, len(sp)-1), i -> sp[i] || ' ' || sp[i+1] || ' ' || sp[i+2]) END) AS sh
          |  FROM (SELECT doc_id, text, string_split(text, ' ') AS sp FROM documents) d),
          |ex AS (SELECT doc_id, unnest(sh) AS g FROM sh0),
          |ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 10 = 3),
          |a AS (SELECT doc_id, COUNT(*) AS n_shingles,
          |    COUNT(*) FILTER (WHERE g IN (SELECT g FROM ev)) AS n_hits
          |  FROM ex WHERE doc_id % 10 <> 3 GROUP BY 1)
          |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
          |  CAST(n_hits AS BIGINT) AS n_hits,
          |  ${graft.ext.ExactMath.ratioRoundedSql("n_hits", "n_shingles", 6)} AS contamination,
          |  CAST(CASE WHEN ${graft.ext.ExactMath.ratioRoundedSql("n_hits", "n_shingles", 6)} >= 0.5
          |    THEN 1 ELSE 0 END AS INT) AS flagged
          |FROM a ORDER BY doc_id""".stripMargin)),

    QSpec("zonemap_partition_index",
      // X73 — per-month min/max zone map over o_totalprice + a NARROW
      // interior range probe [249000, 249250]: the envelope admits nearly
      // every partition (probe_maybe=1) while ground truth is sparse —
      // the zone map's false-positive behavior on an uncorrelated column,
      // surfaced honestly (and exactly why X71's Bloom exists for point
      // probes). min/max/actual compare exactly: all three engines read
      // the same stored doubles and fold them without arithmetic.
      (s, dir) => zonemapPartitionIndex(t(s, dir, "orders"),
        valueCol = "o_totalprice", lo = 249000.0, hi = 249250.0),
      Some(
        """SELECT strftime(o_orderdate, '%Y-%m') AS month,
          |  COUNT(*) AS n_rows, MIN(o_totalprice) AS min_val,
          |  MAX(o_totalprice) AS max_val,
          |  CAST(CASE WHEN MAX(o_totalprice) < 249000.0
          |      OR MIN(o_totalprice) > 249250.0 THEN 0 ELSE 1 END AS INT)
          |    AS probe_maybe,
          |  CAST(MAX(CASE WHEN o_totalprice BETWEEN 249000.0 AND 249250.0
          |    THEN 1 ELSE 0 END) AS INT) AS probe_actual
          |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    QSpec("range_partition_bounds",
      // X74 — adaptive balanced range-partition boundaries over o_custkey
      // at B=16: bucket = floor(startOffset·16/N) over the key-ordered
      // cumulative row count. The oracle computes the same boundaries with
      // ONE naive global cumsum, certifying the engine's two-level
      // (group-offset + within-group) decomposition exact.
      (s, dir) => rangePartitionBounds(t(s, dir, "orders"),
        keyCol = "o_custkey", nBuckets = 16, groupWidth = 1024L),
      Some(
        """WITH k AS (SELECT o_custkey AS k, COUNT(*) AS nr FROM orders GROUP BY 1),
          |c AS (SELECT k, nr, COALESCE(SUM(nr) OVER (ORDER BY k
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s FROM k),
          |t AS (SELECT SUM(nr) AS n FROM k)
          |SELECT CAST((s * 16) // n AS BIGINT) AS bucket,
          |  MIN(k) AS lo_key, MAX(k) AS hi_key,
          |  CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(nr) AS BIGINT) AS n_rows
          |FROM c, t GROUP BY 1 ORDER BY 1""".stripMargin)),

    QSpec("salt_plan_topk",
      // X75 — skew salting plan head: the 10 heaviest event user_ids
      // (count desc, key asc) with their corpus share and salt_factor =
      // ceil(n_rows·32/total) — the replication factor a skew-aware join
      // planner applies to the build side of each hot key.
      (s, dir) => saltPlanTopK(t(s, dir, "events"), nBuckets = 32, topN = 10),
      Some(
        s"""WITH k AS (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1),
          |t AS (SELECT SUM(n_rows) AS n FROM k),
          |r AS (SELECT user_id, n_rows, ROW_NUMBER() OVER (
          |    ORDER BY n_rows DESC, user_id ASC) AS rk FROM k)
          |SELECT user_id, CAST(n_rows AS BIGINT) AS n_rows,
          |  ${graft.ext.ExactMath.ratioRoundedSql("n_rows", "n", 6)} AS share,
          |  CAST(GREATEST(1, (n_rows * 32 + n - 1) // n) AS BIGINT) AS salt_factor
          |FROM r, t WHERE rk <= 10
          |ORDER BY n_rows DESC, user_id ASC""".stripMargin)),

    QSpec("zorder_layout",
      // X76 — z-order vs linear clustering layout report: 16 equal Morton-
      // code blocks over (custkey-scaled-to-8-bits, month-ordinal-scaled-
      // to-8-bits) beside 16 date-sorted blocks, each with both dimension
      // envelopes + area. The oracle replays the bit interleave term by
      // term.
      (s, dir) => zorderLayoutStats(t(s, dir, "orders"),
        baseYear = 1995, nMonths = 84, nBlocks = 16),
      Some {
        val zSql = (0 until 8).map(i =>
          s"((((cx >> $i) & 1) << ${2 * i + 1}) + (((dx >> $i) & 1) << ${2 * i}))")
          .mkString(" + ")
        s"""WITH d AS (SELECT
          |    ((o_custkey * 256) // (SELECT MAX(o_custkey) + 1 FROM orders)) AS cx,
          |    ((((EXTRACT(year FROM o_orderdate) - 1995) * 12
          |       + EXTRACT(month FROM o_orderdate) - 1) * 256) // 84) AS dx
          |  FROM orders),
          |r AS (
          |  SELECT 'zorder' AS layout, ($zSql) // 4096 AS block,
          |    COUNT(*) AS n_rows, MIN(cx) AS cx_lo, MAX(cx) AS cx_hi,
          |    MIN(dx) AS dx_lo, MAX(dx) AS dx_hi
          |  FROM d GROUP BY 2
          |  UNION ALL
          |  SELECT 'linear', (dx * 16) // 256, COUNT(*), MIN(cx), MAX(cx),
          |    MIN(dx), MAX(dx)
          |  FROM d GROUP BY 2)
          |SELECT layout, CAST(block AS BIGINT) AS block,
          |  CAST(n_rows AS BIGINT) AS n_rows, cx_lo, cx_hi, dx_lo, dx_hi,
          |  CAST((cx_hi - cx_lo + 1) * (dx_hi - dx_lo + 1) AS BIGINT)
          |    AS envelope_area
          |FROM r ORDER BY layout, block""".stripMargin
      }),

    QSpec("bloom_index_fpr",
      // X77 — observed false-positive rate of X71's partition Bloom
      // index: 100 known-present + 100 known-absent probe keys against
      // every month partition; the absent class reads the pure
      // hash-collision FPR at the realized fill, integer-exact on all
      // three engines.
      (s, dir) => bloomIndexFpr(t(s, dir, "orders"),
        mBits = 16384L, kHashes = 3, nProbes = 100),
      Some {
        def bit(k: String) = s"((((i * 2654435761) % 1000000007) * ($k)" +
          s" + (i * 40503 + 17) % 1000000007) % 1000000007) % 16384"
        s"""WITH mk AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month,
          |    o_custkey AS k FROM orders),
          |mx AS (SELECT MAX(k) AS maxk FROM mk),
          |pk AS (SELECT k, 'present' AS probe_class
          |    FROM (SELECT DISTINCT k FROM mk ORDER BY k LIMIT 100)
          |  UNION ALL SELECT maxk + i, 'absent' FROM mx, range(1, 101) t(i)),
          |pb AS (SELECT DISTINCT k, probe_class, ${bit("k")} AS bit
          |  FROM pk, range(1, 4) t(i)),
          |pn AS (SELECT k, probe_class, COUNT(*) AS nb FROM pb GROUP BY 1, 2),
          |mb AS (SELECT DISTINCT month, ${bit("k")} AS bit
          |  FROM mk, range(1, 4) t(i)),
          |hit AS (SELECT mb.month, pb.k, COUNT(DISTINCT mb.bit) AS nh
          |  FROM mb JOIN pb ON mb.bit = pb.bit GROUP BY 1, 2),
          |pair AS (SELECT mo.month, pn.k, pn.probe_class, pn.nb
          |  FROM (SELECT DISTINCT month FROM mk) mo, pn),
          |j AS (SELECT pair.probe_class,
          |    CASE WHEN COALESCE(hit.nh, 0) = pair.nb THEN 1 ELSE 0 END AS adm,
          |    CASE WHEN mk2.k IS NOT NULL THEN 1 ELSE 0 END AS act
          |  FROM pair
          |  LEFT JOIN hit ON hit.month = pair.month AND hit.k = pair.k
          |  LEFT JOIN mk mk2 ON mk2.month = pair.month AND mk2.k = pair.k)
          |SELECT probe_class, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          |  CAST(SUM(adm) AS BIGINT) AS n_admitted,
          |  CAST(SUM(act) AS BIGINT) AS n_actual,
          |  CAST(SUM(CASE WHEN adm = 1 AND act = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_false_pos,
          |  ${graft.ext.ExactMath.ratioRoundedSql(
            "SUM(CASE WHEN adm = 1 AND act = 0 THEN 1 ELSE 0 END)",
            "COUNT(*) - SUM(act)", 6)} AS fpr
          |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    QSpec("partition_balance_report",
      // X79 — staleness check of a FROZEN range layout: bounds computed
      // on orders before 1994-01-01 (the X74 arithmetic verbatim),
      // re-evaluated on the full corpus via greatest-lo_key-≤-key step
      // assignment; per bucket share, load_ratio (1.0 = balanced) and the
      // rebalance flag at rounded load_ratio ≥ 1.5. The oracle replays
      // bounds + step assignment with one naive global cumsum.
      (s, dir) => partitionBalanceReport(t(s, dir, "orders"),
        baseCutoff = "1998-01-01", keyCol = "o_custkey", nBuckets = 16,
        groupWidth = 1024L),
      Some(
        s"""WITH bk AS (SELECT o_custkey AS k, COUNT(*) AS nr FROM orders
          |  WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
          |c AS (SELECT k, nr, COALESCE(SUM(nr) OVER (ORDER BY k
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s FROM bk),
          |tb AS (SELECT SUM(nr) AS n FROM bk),
          |bounds AS (SELECT (s * 16) // n AS bucket, MIN(k) AS lo_key
          |  FROM c, tb GROUP BY 1),
          |ck AS (SELECT o_custkey AS k, COUNT(*) AS nr FROM orders GROUP BY 1),
          |t2 AS (SELECT SUM(nr) AS n FROM ck),
          |asg AS (SELECT k, nr, COALESCE((SELECT MAX(bucket) FROM bounds b
          |    WHERE b.lo_key <= ck.k), 0) AS bucket FROM ck),
          |g AS (SELECT bucket, COUNT(*) AS n_keys, SUM(nr) AS n_rows
          |  FROM asg GROUP BY 1)
          |SELECT CAST(bucket AS BIGINT) AS bucket,
          |  CAST(n_keys AS BIGINT) AS n_keys, CAST(n_rows AS BIGINT) AS n_rows,
          |  ${graft.ext.ExactMath.ratioRoundedSql("n_rows", "n", 6)} AS share,
          |  ${graft.ext.ExactMath.ratioRoundedSql("n_rows * 16", "n", 6)}
          |    AS load_ratio,
          |  CAST(CASE WHEN ${graft.ext.ExactMath.ratioRoundedSql(
            "n_rows * 16", "n", 6)} >= 1.5
          |    THEN 1 ELSE 0 END AS INT) AS rebalance
          |FROM g, t2 ORDER BY bucket""".stripMargin)),

    QSpec("workload_pruning_sim",
      // X80 — workload-driven pruning simulation: every logged query
      // screened against the month layout + zone maps; recognized
      // o_orderdate >= DATE / o_totalprice > predicates prune, everything
      // else reports supported = 0 honestly. The oracle replays the qlog
      // CTE + the same regex recognizers.
      (s, dir) => workloadPruningSim(
        TableRegistry.queryLog(s, dir), t(s, dir, "orders")),
      Some(
        s"""WITH qlog AS (
          |${TableRegistry.queryLogOracleCte}
          |),
          |wl AS (SELECT query, COUNT(*) AS n_runs,
          |    regexp_extract(query, 'o_orderdate >= DATE ''([0-9-]+)''', 1)
          |      AS date_lit,
          |    regexp_extract(query, 'o_totalprice > ([0-9.]+)', 1) AS price_lit,
          |    (query LIKE '%FROM orders%') AS on_orders
          |  FROM qlog GROUP BY 1),
          |w2 AS (SELECT *, CASE WHEN on_orders AND (date_lit <> '' OR price_lit <> '')
          |    THEN 1 ELSE 0 END AS supported FROM wl),
          |p AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
          |    MAX(o_totalprice) AS max_price FROM orders GROUP BY 1),
          |j AS (SELECT query, n_runs, supported,
          |    CASE WHEN supported = 1 AND ((date_lit <> '' AND month < substr(date_lit, 1, 7))
          |      OR (price_lit <> '' AND max_price <= CAST(price_lit AS DOUBLE)))
          |    THEN 1 ELSE 0 END AS pruned FROM p, w2)
          |SELECT query, CAST(n_runs AS BIGINT) AS n_runs,
          |  CAST(supported AS INT) AS supported,
          |  CAST(COUNT(*) AS BIGINT) AS n_partitions,
          |  CAST(SUM(pruned) AS BIGINT) AS n_pruned,
          |  ${graft.ext.ExactMath.ratioRoundedSql("SUM(pruned)", "COUNT(*)", 6)}
          |    AS prune_frac
          |FROM j GROUP BY 1, 2, 3 ORDER BY query""".stripMargin)))
}
