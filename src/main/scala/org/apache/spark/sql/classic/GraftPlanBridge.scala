package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows` (private[sql]) so graft can surface a
  * custom [[graft.plans.TopKPerGroupPlan]] logical node as a DataFrame —
  * the standard extension-library pattern (a one-method file inside
  * Spark's package namespace; no Spark internals are modified). */
object GraftPlanBridge {
  def ofRows(s: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(s.asInstanceOf[SparkSession], plan)

  /** Spark 4 moved `Column.expr` behind the ColumnNode converter. */
  def toExpression(c: org.apache.spark.sql.Column)
  : org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)

  /** r21: `Dataset.localCheckpoint` under AQE loses the child's output
    * partitioning — the checkpoint scans back as UnknownPartitioning(0),
    * so a frame deliberately stored hash-partitioned by its consumers'
    * group key re-pays an Exchange at EVERY consumer. This re-wraps a
    * just-checkpointed frame's LogicalRDD with the partitioning its rows
    * physically have. The CALLER owns the claim's truth: the checkpointed
    * plan must end in `repartition(n, keys…)` with the same n and keys —
    * an explicit-N repartition, which AQE never coalesces, lays rows out
    * exactly as HashPartitioning(keys, n) and localCheckpoint persists
    * partitions as-is. Any other provenance risks a silently wrong claim
    * (a skipped exchange over mis-laid rows = wrong results), which is
    * why this lives behind one audited entry point
    * ([[graft.StageMemo.partitionedFrame]] / graft.PartitionedCheckpoint). */
  def withHashPartitioning(df: org.apache.spark.sql.DataFrame,
                           keys: Seq[String],
                           n: Int): org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"withHashPartitioning: no column '$k' in ${lr.output.map(_.name)}")))
        // A fresh LogicalRDD over the SAME checkpointed rdd. originStats/
        // originConstraints reset to None (the case class hides them in
        // its second parameter list): the node then reports the
        // conservative default size, which can only SUPPRESS accidental
        // auto-broadcasts of these deliberately-big frames — their small
        // join partners are all explicitly hinted. No row or layout
        // changes: output, rdd, ordering and streaming flag carry over.
        ofRows(df.sparkSession,
          org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd,
            org.apache.spark.sql.catalyst.plans.physical
              .HashPartitioning(attrs, n),
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            df.sparkSession.asInstanceOf[SparkSession], None, None))
      case _ => df // not a bare checkpoint scan: no claim to make
    }
}
