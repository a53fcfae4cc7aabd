package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier screening (median + MAD) in its production
  * form. This is an EXTENSION beyond the reference's artifact set: the
  * reference's dashboards (ui/app.py) render resource scores and bar
  * charts but carry no outlier/median/MAD logic, and `anomaly_metrics` is
  * an eighth artifact ReportExporter adds on top of the reference's
  * save_analysis_results set. The screen itself is a reusable three-pass
  * plan over any (group, value) frame — the observability layer a
  * workload advisor pointed at a real query log wants.
  */
object Anomaly {

  /** Per-group robust outlier screen — median + MAD (median absolute
    * deviation), flagging |x − med| > 3·1.4826·MAD — in the form that is
    * THE DEFAULT at scale (r10 verdict #6): both medians come from
    * `approx_percentile` (Greenwald–Khanna sketch), whose agg buffer is
    * FIXED-SIZE per group, where exact `percentile` accumulates a
    * distinct-value map per group and is therefore distinct-values-bound
    * at 100 TB. GK at the default accuracy (1e-4 rank error) measures
    * ≲0.1% off exact on the fixtures — the `anomaly_mad_approx` oracle
    * key asserts those bands (med within 1%, MAD within 2%, outliers
    * within max(5%, ±2)) at every gated SF.
    *
    * Plan shape (shared with the oracle keys): per-group stats are TINY
    * (one row per group), each pass re-joins them back by BROADCAST — the
    * input is scanned three times but never shuffled by value, and rows
    * are never replicated through a per-group window.
    *
    * The EXACT-percentile twin lives only in the `anomaly_mad` oracle key
    * (Queries9.scala), where the DuckDB comparison must be bit-exact;
    * pipelines and reports use this form.
    *
    * Returns one row per group: (groupCol, med, mad, n_outliers). */
  def madScreenApprox(df: DataFrame, groupCol: String, valueCol: String,
      accuracy: Int = 10000): DataFrame = {
    // collision-proof internal frame (r11 self-review): "any (group, value)
    // frame" includes frames that already carry a med/mad column — joining
    // the stat rows back onto the raw df would then hit
    // AMBIGUOUS_REFERENCE. Project to reserved internal names first; only
    // the output exposes the contract columns.
    val base = df.select(col(groupCol).as("__graft_g"), col(valueCol).as("__graft_v"))
    val med = base.groupBy("__graft_g")
      .agg(expr(s"approx_percentile(__graft_v, 0.5D, $accuracy)").as("__graft_med"))
    val stats = base.join(broadcast(med), "__graft_g")
      .groupBy("__graft_g")
      .agg(max(col("__graft_med")).as("__graft_med"),
        expr(s"approx_percentile(abs(__graft_v - __graft_med), 0.5D, $accuracy)")
          .as("__graft_mad"))
    base.join(broadcast(stats), "__graft_g")
      .groupBy("__graft_g")
      .agg(max(col("__graft_med")).as("med"), max(col("__graft_mad")).as("mad"),
        sum(when(abs(col("__graft_v") - col("__graft_med")) >
          lit(3) * lit(1.4826) * col("__graft_mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("__graft_g").as(groupCol), col("med"), col("mad"), col("n_outliers"))
  }
}
