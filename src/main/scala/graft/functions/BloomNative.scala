package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** JOIN-12b — Spark's OWN bloom-filter expressions, surfaced.
  *
  * Spark ships a native distributed bloom build
  * ([[BloomFilterAggregate]]: TypedImperativeAggregate over
  * org.apache.spark.util.sketch.BloomFilter, bit-array OR merge) and a
  * codegen'd probe ([[BloomFilterMightContain]]) — but only the runtime
  * row-level-filtering rewrite can use them; neither is in the public
  * function registry. Injecting them closes the gap join12 documents:
  * its driver-side `stat.bloomFilter` + probe UDF becomes a fully
  * in-plan pipeline — the sketch is built executor-side as aggregate
  * state and lands in the probe as a scalar-subquery literal, the probe
  * participates in whole-stage codegen, and the driver never touches
  * sketch bytes through a stats API.
  *
  * Contract notes: the probe's bloom argument must be a CONSTANT or
  * scalar subquery (checkInputDataTypes enforces it — the sketch must be
  * fixed before the scan starts, which is what makes the prune plan-
  * safe); the aggregate's input must be LongType, so both sides hash
  * through xxhash64 (deterministic, seed 42) — exactness is unaffected
  * because the real join still runs behind the prune.
  */
object BloomNativeExtensions {
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(xxhash64_col[, estimatedNumItems, numBits])")
      }))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(
        "bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children(0), children(1))))
  }
}
