package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, Row}
import org.apache.spark.sql.functions._

/** OBS-1 — in-flight pipeline QA metrics via `Dataset.observe`
  * (SURVEY.md §2.17).
  *
  * The reference's QA step re-reads its outputs to count classes and
  * errors (`/root/reference/src/azanium/runcommand.py:62-71` re-runs a
  * validation pass). At 100 TB a second scan to count violations doubles
  * the job. `observe` attaches accumulator-backed aggregates to the SAME
  * pass that writes the data: metrics materialize as a side effect of the
  * action, costing one comparison per row, zero extra jobs and zero extra
  * scans. The gate decision (abort / alert on bad rows) then happens on
  * the driver against a handful of scalars.
  */
object QualityGate {

  /** Attach standard data-quality metrics to `df` without changing its
    * rows: total count, null violations in `requiredCols`, and range
    * violations (value outside [lo, hi]) in `boundedCols`. Read the
    * metrics from the returned [[Observation]] AFTER an action runs. */
  def observed(df: DataFrame, requiredCols: Seq[String],
               boundedCols: Map[String, (Double, Double)])
      : (DataFrame, Observation) = {
    val obs = Observation()
    val nullChecks = requiredCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    val rangeChecks = boundedCols.toSeq.map { case (c, (lo, hi)) =>
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
        .as(s"oob_$c")
    }
    val metrics = count(lit(1)).as("n_rows") +: (nullChecks ++ rangeChecks)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Gate verdict from observed metrics: Right(metrics) if every
    * violation counter is zero, Left(offending metric names) otherwise. */
  def verdict(metrics: Row): Either[Seq[String], Row] = {
    val bad = metrics.schema.fieldNames.filter(n =>
      n != "n_rows" && metrics.getAs[Long](n) > 0L)
    if (bad.isEmpty) Right(metrics) else Left(bad.toSeq)
  }
}
