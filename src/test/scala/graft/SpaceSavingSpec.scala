package graft

import org.apache.spark.sql.functions._

/** AGG-25 — SpaceSaving invariants checked against exact counts on the
  * real table, through the full distributed path (partial buffers on 32
  * partitions, floor-absorbing merge, final trim). PropertySpec carries
  * the pure-merge laws; this pins the end-to-end Spark aggregate.
  */
class SpaceSavingSpec extends SparkSpec {

  import spark.implicits._

  // k=64 < ~200 distinct parts at sf0.001 → eviction and floors actually
  // engage (k=512 at gate scale keeps the top clean; here we stress it)
  private def summary(k: Int) =
    Tables.lineitem(spark, Sf0001)
      .agg(call_function("space_saving_agg", col("l_partkey"), lit(k))
        .as("top"))
      .select(explode(col("top")).as("e"))
      .select($"e.key".as("key"), $"e.est".as("est"), $"e.err".as("err"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private lazy val exact: Map[Long, Long] =
    Tables.lineitem(spark, Sf0001)
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("agg25: est >= true >= est - err for every reported key") {
    for ((key, est, err) <- summary(64)) {
      val t = exact.getOrElse(key, 0L)
      assert(est >= t, s"key $key: est $est underestimates true $t")
      assert(est - err <= t, s"key $key: est-err ${est - err} exceeds true $t")
    }
  }

  test("agg25: every key with true count > 2N/k is present") {
    val n = exact.values.sum
    val k = 64
    val keys = summary(k).map(_._1).toSet
    val missing = exact.filter { case (_, c) => c > 2 * n / k }
      .keySet.diff(keys)
    assert(missing.isEmpty, s"heavy keys missing from the summary: $missing")
  }

  test("agg25: at gate k the declared query's top-20 matches the exact " +
      "top counts with err = 0") {
    val rows = SparkEntry.queries("agg25_topk_sketch")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 20)
    for ((key, est, err) <- rows) {
      assert(err === 0L, s"key $key: top counters must be exact at k=512")
      assert(est === exact(key), s"key $key: est $est != exact ${exact(key)}")
    }
  }
}
