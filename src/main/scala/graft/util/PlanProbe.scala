package graft.util

import org.apache.spark.sql.DataFrame

/** Plan-audit hook (r18): `.localCheckpoint` truncates an operator's
  * visible plan at a `Scan ExistingRDD` stub, so before/after Exchange
  * counts dumped from the RETURNED frame silently under-report for scoped
  * operators (the r17 verdict's q_simhash_pairs "30 → 2" was a truncation
  * artifact, not evidence). Operators call [[record]] on the inner frame
  * right before checkpointing; when a sink is installed (BenchOne's
  * plan-dump phase) the inner frame's formatted plan is captured under its
  * label. With no sink installed — the normal case, and every timed run —
  * the call is one volatile read and a no-op. */
object PlanProbe {
  @volatile private var sink: Option[(String, String) => Unit] = None

  /** Install a capture sink (label, formatted plan) — plan-dump tooling
    * only; remember to [[uninstall]] before timing anything (capturing
    * re-plans the inner frame). */
  def install(s: (String, String) => Unit): Unit = sink = Some(s)
  def uninstall(): Unit = sink = None

  /** Capture `df`'s formatted plan under `label` when a sink is active. */
  def record(label: String, df: DataFrame): Unit =
    sink.foreach(_(label, df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)))
}
