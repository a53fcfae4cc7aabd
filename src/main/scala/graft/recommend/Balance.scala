package graft.recommend

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-balance vetting — the advisor's recommendations fed back into
  * their own WHAT-IF evidence (the `partition_size_report` shape), closing
  * the loop the reference leaves implicit in its "balanced partitions"
  * intent (README.md:162): a candidate partition transform that would
  * produce grossly unbalanced partitions is DEMOTED before it ever reaches
  * an emitted `REPLACE PARTITION SPEC` script.
  *
  * Evidence per candidate fragment: the partition-value cardinality, row
  * total, largest partition, and the max/mean skew ratio — one grouped
  * count per candidate (map-side combine, shuffle on the candidate's own
  * key) collapsed to a single stats row. At 100 TB only partition-value
  * CARDINALITY rows ever reach the driver, never data; candidates are
  * topN-per-view, so the number of what-if jobs is catalog-bounded, not
  * data-bounded.
  */
object Balance {

  /** Balance evidence for one candidate partition fragment over its table.
    * `skew` = max partition rows / mean partition rows (≥ 1; 1 = perfectly
    * balanced). An empty table vacuously accepts (skew 1). */
  final case class Evidence(
      nPartitions: Long, nRows: Long, maxRows: Long, skew: Double)

  /** Evaluate one fragment (`month(c)`, `bucket(8, c)`, `truncate(c, w)`,
    * bare `c`) against its table. Single-fragment convenience over
    * [[evidenceAll]]. */
  def evidence(df: DataFrame, fragment: String): Evidence =
    evidenceAll(df, Seq(fragment))(fragment)

  /** Grouping-set columns carry a long grouping_id; stay WELL below any
    * engine bit-width concern and keep the Expand factor bounded. */
  private val maxSetsPerPass = 30

  /** Balance evidence for ALL of a table's candidate fragments in ONE pass
    * (r9 verdict #3: the per-candidate serial jobs added up on a wide
    * catalog). The fragments become one GROUPING SETS aggregation — a single
    * scan, Expand ×|fragments|, one shuffle keyed by (grouping_id, value) —
    * then a second tiny aggregate collapses each set to its stats row;
    * |fragments| rows reach the driver, never data. Per-set stats are
    * identical to an independent groupBy on that fragment: within one
    * grouping_id only that fragment's column is grouped (a null VALUE is its
    * own group, disambiguated from the other sets' null placeholders by the
    * id), so n_partitions/n_rows/max_rows match the one-at-a-time plan
    * row-for-row. */
  def evidenceAll(df: DataFrame, fragments: Seq[String]): Map[String, Evidence] = {
    val distinct = fragments.distinct
    if (distinct.isEmpty) return Map.empty
    if (distinct.size > maxSetsPerPass)
      return distinct.grouped(maxSetsPerPass).map(evidenceAll(df, _)).reduce(_ ++ _)
    val k = distinct.size
    val pvCols = distinct.zipWithIndex.map { case (f, i) =>
      SpecParser.toColumn(f, df)._2.as(s"pv$i")
    }
    val named = distinct.indices.map(i => col(s"pv$i"))
    val stats = df.select(pvCols: _*)
      .groupingSets(distinct.indices.map(i => Seq(col(s"pv$i"))), named: _*)
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .groupBy("gid")
      .agg(count(lit(1)).as("n_partitions"), sum("n").as("n_rows"),
        max("n").as("max_rows"))
      .collect() // ≤ |fragments| stats rows — metadata, never data
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // grouping_id bit semantics: leftmost grouping column = most significant
    // bit, bit set ⇔ column AGGREGATED (not in the set) — so the set {pv_i}
    // has every bit set except (k-1-i)
    distinct.zipWithIndex.map { case (f, i) =>
      val gid = ((1L << k) - 1L) & ~(1L << (k - 1 - i))
      f -> (stats.get(gid) match {
        case None => Evidence(0L, 0L, 0L, 1.0) // empty table: no groups at all
        case Some((nPart, nRows, maxRows)) =>
          Evidence(nPart, nRows, maxRows,
            if (nRows == 0L) 1.0 else maxRows.toDouble * nPart / nRows)
      })
    }.toMap
  }

  /** One vetted candidate: the ranked row's identity plus its evidence and
    * the accept/demote decision. */
  final case class VettedCandidate(
      view: String, column: String, rank: Long, fragment: String,
      nPartitions: Long, nRows: Long, maxRows: Long, skew: Double,
      accepted: Boolean, reason: String)

  /** Vet ranked candidates (the `(view, column, rank, spec)` rows the
    * Recommender assembles scripts from) against their own balance
    * evidence. A candidate is DEMOTED when its max/mean skew exceeds
    * `maxSkew` OR it would produce a single partition (no pruning value) —
    * both are the "not actually balanced partitions" outcomes the what-if
    * check exists to catch before any data is rewritten.
    *
    * `tableFor` resolves a view name to its data (fixture registry or
    * session catalog — same contract as the profiling path). Candidate
    * count is topN × views (metadata-sized), so the driver-side loop is
    * catalog-bounded like profiling, never data-proportional — and all of
    * one view's fragments share a single [[evidenceAll]] pass, so the job
    * count is one per VIEW, not one per candidate. */
  def vet(candidates: Seq[(String, String, Long, String)],
      tableFor: String => DataFrame, maxSkew: Double): Seq[VettedCandidate] = {
    require(maxSkew >= 1.0, s"maxSkew is a max/mean ratio, must be >= 1, got $maxSkew")
    val byView: Map[String, Map[String, Evidence]] =
      candidates.groupBy(_._1).map { case (view, cs) =>
        view -> evidenceAll(tableFor(view), cs.map(_._4))
      }
    candidates.map { case (view, column, rank, fragment) =>
      val ev = byView(view)(fragment)
      val (ok, reason) =
        if (ev.nPartitions <= 1L && ev.nRows > 0L)
          (false, s"single partition (no pruning value)")
        else if (ev.skew > maxSkew)
          (false, f"skew ${ev.skew}%.2f exceeds $maxSkew%.2f")
        else (true, "balanced")
      VettedCandidate(view, column, rank, fragment,
        ev.nPartitions, ev.nRows, ev.maxRows, ev.skew, ok, reason)
    }
  }
}
