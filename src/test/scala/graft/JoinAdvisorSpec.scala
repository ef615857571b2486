package graft

import org.apache.spark.sql.functions._

import graft.plans.JoinAdvisor
import graft.plans.JoinAdvisor.Thresholds

/** PLAN-2 contract: the advisor's verdicts on engineered fixtures —
  * small dim → broadcast (either side), balanced large → shuffle, one
  * dominant key → salt, diffuse-hot key → aqe_skew — plus exactness of
  * the predicted join cardinality and the ≤-inclusive broadcast edge. */
class JoinAdvisorSpec extends SparkSpec {

  // small thresholds so fixtures stay tiny: broadcast at ≤ 100 rows,
  // skew at ≥ 8× fair share, salt at ≥ 20% on one key (the defaults'
  // shape, scaled down)
  private val T = Thresholds(broadcastRows = 100L,
    skewXPpm = 8000000L, saltSharePpm = 200000L)

  private def strategyOf(df: org.apache.spark.sql.DataFrame): String =
    df.select("strategy").collect().head.getString(0)

  private def uniform(n: Long, keys: Long) =
    spark.range(n).select((col("id") % keys).as("k"))

  test("small dim broadcasts — and the smaller side wins each way") {
    val big = uniform(10000, 1000)
    val dim = uniform(50, 50)
    assert(strategyOf(JoinAdvisor.advise("a", big, col("k"),
      dim, col("k"), T)) === "broadcast_right")
    assert(strategyOf(JoinAdvisor.advise("b", dim, col("k"),
      big, col("k"), T)) === "broadcast_left")
  }

  test("broadcast threshold is inclusive (rows == cap still broadcasts)") {
    val big = uniform(10000, 1000)
    val atCap = uniform(100, 100)
    assert(strategyOf(JoinAdvisor.advise("edge", big, col("k"),
      atCap, col("k"), T)) === "broadcast_right")
    val justOver = uniform(101, 101)
    assert(strategyOf(JoinAdvisor.advise("over", big, col("k"),
      justOver, col("k"), T)) === "shuffle")
  }

  test("balanced large sides → shuffle") {
    assert(strategyOf(JoinAdvisor.advise("s", uniform(10000, 500), col("k"),
      uniform(5000, 500), col("k"), T)) === "shuffle")
  }

  test("one dominant key (50% share, 100 keys) → salt") {
    // half the rows on key 0, the rest spread over 99 keys:
    // share_ppm = 500000 ≥ 200000, skew_x = 500000 × 100 ≥ 8M
    val hot = spark.range(10000)
      .select(when(col("id") % 2 === 0, lit(0L))
        .otherwise(col("id") % 99 + 1).as("k"))
    assert(strategyOf(JoinAdvisor.advise("h", hot, col("k"),
      uniform(5000, 100), col("k"), T)) === "salt")
  }

  test("diffuse hot key (5% share, ~1000 keys) → aqe_skew") {
    // 5% of rows on key 0: share_ppm ≈ 50000 < 200000 (no salt), but
    // skew_x ≈ 50000 × 1000 = 50M ≥ 8M (skewed) → AQE handles it
    val hot = spark.range(100000)
      .select(when(col("id") % 20 === 0, lit(0L))
        .otherwise(col("id") % 997 + 1).as("k"))
    assert(strategyOf(JoinAdvisor.advise("m", hot, col("k"),
      uniform(5000, 997), col("k"), T)) === "aqe_skew")
  }

  test("skew on the RIGHT side alone also triggers the skew verdicts") {
    val hot = spark.range(10000)
      .select(when(col("id") % 2 === 0, lit(0L))
        .otherwise(col("id") % 99 + 1).as("k"))
    assert(strategyOf(JoinAdvisor.advise("r", uniform(5000, 100), col("k"),
      hot, col("k"), T)) === "salt")
  }

  test("est_join_rows is EXACT: equals the materialized join count") {
    val l = spark.range(3000).select((col("id") % 7).as("k"))
    val r = spark.range(2000).select((col("id") % 11).as("k"))
    val predicted = JoinAdvisor.evidence("x", l, col("k"), r, col("k"))
      .select("est_join_rows").collect().head.getLong(0)
    val actual = l.join(r, "k").count()
    assert(predicted === actual)
    // disjoint key spaces predict zero, not null
    val disjoint = JoinAdvisor.evidence("y",
      l, col("k") + 100, r, col("k"))
      .select("est_join_rows").collect().head.getLong(0)
    assert(disjoint === 0L)
  }

  test("evidence never executes the candidate join (no join of the raw " +
      "sides in the plan — only the |keys|-sized count-table join)") {
    val l = uniform(10000, 5)  // join would be 10000*2000/5 = 4M rows
    val r = uniform(10000, 5)
    val ev = JoinAdvisor.evidence("z", l, col("k"), r, col("k"))
    val est = ev.select("est_join_rows").collect().head.getLong(0)
    assert(est === 5L * 2000L * 2000L)
    // both raw sides collapse through HashAggregate BEFORE any join:
    // every join input in the plan is an aggregate output, so the
    // 4M-row product never materializes
    val p = ev.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), s"expected count collapses:\n$p")
  }
}
