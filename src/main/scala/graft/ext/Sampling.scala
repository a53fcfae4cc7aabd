package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines (north-star
  * family, SURVEY §2.13). Spark's `df.sample` is seed-deterministic only per
  * partitioning — repartition the input and the sample changes — which makes
  * it useless for reproducible corpus construction. These operators derive
  * the keep/drop decision from the row's own key, so the sample is a pure
  * function of the data: stable across partitionings, re-runs, engines (the
  * DuckDB oracles reproduce it bit-for-bit), and incremental appends (new
  * rows don't flip old decisions — the property that matters when a 100 TB
  * corpus is sampled in daily increments).
  *
  * Scale design: rate-based sampling is a pure filter — map-only, no
  * shuffle, runs at scan speed with the predicate pushed into the scan
  * stage. Exact-k-per-stratum costs one shuffle on the stratum key (the
  * rank window); at 100 TB prefer the rate form unless exact counts are
  * contractual.
  */
object Sampling {

  /** Mixing hash for a bigint id: multiplicative hashing into a prime
    * field. Chosen over xxhash64/murmur3 deliberately: the arithmetic is
    * reproducible in any SQL engine (the DuckDB oracle twin), which is what
    * makes cross-engine corpus reproducibility auditable. Knuth multiplier
    * 2654435761 (golden-ratio scaling of 2^32); modulus 1000003 (prime).
    *
    * The id is reduced into the field BEFORE the multiply (pmod also
    * normalizes negative ids): (id mod P)·2654435761 < 2.7e15 stays far
    * inside long range for EVERY bigint id — the raw `id · 2654435761`
    * form overflows past id ≈ 3.47e9 (snowflake/epoch-derived ids), which
    * under default Spark wraps negative and makes `% 1000` quotas keep
    * whole id ranges unconditionally, and under ANSI/DuckDB throws.
    * Identical values to the raw form wherever that form doesn't overflow,
    * so the DuckDB twins (same pre-reduced expression) are unchanged on
    * any in-range corpus. */
  def idHash(id: Column): Column =
    (pmod(id, lit(1000003L)) * lit(2654435761L) + lit(12345L)) % lit(1000003L)

  /** Per-stratum rate sampling: keep a row iff hash(id) mod 1000 falls
    * under the stratum's per-mille quota. `quotaPerMille` is any Column
    * expression (per-stratum constant, data-derived, etc.). */
  def stratifiedSample(df: DataFrame, idCol: String, quotaPerMille: Column): DataFrame =
    df.where(idHash(col(idCol)) % lit(1000L) < quotaPerMille)

  /** Exact-k-per-stratum sampling: the k rows with the smallest id-hash in
    * each stratum (deterministic "reservoir"); hash ties broken by id.
    * `idCol` must be integral, unique WITHIN each stratum, and (TopKRows
    * stores ranking fields as Double) its values must stay within 2^53 —
    * ids above that lose precision in the heap and can flip hash/id
    * tie-breaks. The pick set comes from the bounded-heap TopKRows
    * aggregate over (id-hash, id) — ≤ k ids per stratum per MAP partition
    * ride the shuffle, and the full rows (which may carry text bodies the
    * heap can't hold) come back via a broadcast semi-join against the
    * O(strata × k) pick set, keyed on (stratum, id) so an id reused in
    * ANOTHER stratum can't ride a pick it didn't earn. A row_number window
    * here would sort every row of a stratum on one task (strata are few —
    * the unsplittable-partition trap, r12 hot-key window audit). */
  def topKPerStratum(df: DataFrame, idCol: String, stratumCol: String, k: Int): DataFrame = {
    import graft.functions.TopKRows.topKRows
    // heap order is (first field DESC, rest ASC): negate the hash for
    // smallest-first; id breaks hash ties ascending
    val picked = df
      .select(col(stratumCol), col(idCol))
      .groupBy(stratumCol)
      .agg(topKRows(struct((-idHash(col(idCol))).as("neg"), col(idCol)), k).as("top"))
      .select(col(stratumCol).as("_graft_pick_stratum"),
        explode(col("top")).as("r"))
      .select(col("_graft_pick_stratum"), col(s"r.$idCol").as("_graft_pick"))
    df.join(broadcast(picked),
      col(idCol) === col("_graft_pick") &&
        col(stratumCol) === col("_graft_pick_stratum"), "left_semi")
  }
}
