package graft

import org.apache.spark.sql.functions._

/** RULE-1 interaction with column pruning: the heap node must not force
  * the scan to read columns the query never uses — at 100 TB the
  * difference between a 3-column and a full-width parquet read. */
class TopKPruneSpec extends SparkSpec {

  test("TopKPerGroupPlan lets column pruning reach the scan") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_orderkey").orderBy(col("l_extendedprice"),
      col("l_linenumber"))
    val q = Tables.lineitem(spark, Sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("l_orderkey", "l_extendedprice")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), s"rewrite must fire:\n$p")
    val readSchema =
      "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_extendedprice") &&
      readSchema.contains("l_linenumber"),
      s"needed columns must be read:\n$readSchema")
    assert(!readSchema.contains("l_comment") &&
      !readSchema.contains("l_shipdate"),
      s"unused wide columns must be pruned from the scan:\n$readSchema")
  }
}
