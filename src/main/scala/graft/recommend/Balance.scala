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
    * bare `c`) against its table: grouped count on the partition value,
    * collapsed to a single stats row — the only thing collected. */
  def evidence(df: DataFrame, fragment: String): Evidence = {
    val (_, pv) = SpecParser.toColumn(fragment, df)
    val row = df.groupBy(pv.as("pv")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_partitions"), sum("n").as("n_rows"),
        max("n").as("max_rows"))
      .collect()(0) // single stats row — metadata, never data
    if (row.getLong(0) == 0L) Evidence(0L, 0L, 0L, 1.0)
    else {
      val (nPart, nRows, maxRows) = (row.getLong(0), row.getLong(1), row.getLong(2))
      Evidence(nPart, nRows, maxRows,
        if (nRows == 0L) 1.0 else maxRows.toDouble * nPart / nRows)
    }
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
    * catalog-bounded like profiling, never data-proportional. */
  def vet(candidates: Seq[(String, String, Long, String)],
      tableFor: String => DataFrame, maxSkew: Double): Seq[VettedCandidate] = {
    require(maxSkew >= 1.0, s"maxSkew is a max/mean ratio, must be >= 1, got $maxSkew")
    candidates.map { case (view, column, rank, fragment) =>
      val ev = evidence(tableFor(view), fragment)
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
