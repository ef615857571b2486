package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PLAN-2 — join-strategy advisor: the planner-flavored observability a
  * 100 TB operator actually uses before committing a shuffle.
  *
  * The measurement pieces shipped separately across rounds — prof2's
  * exact join cardinality (Σ cA(k)·cB(k) from the two per-key count
  * tables, never running the join it predicts), prof2b's CMS estimate of
  * the same from KB state, prof3's integer-ppm skew profile, OBS-2's
  * measured shuffle bytes. This composes them into one answer: for a
  * candidate (left, right, key) equi-join, which execution strategy —
  * `broadcast_left`/`broadcast_right`, plain co-partitioned `shuffle`,
  * manual `salt` (join13's recipe), or `aqe_skew` (join15's recipe) —
  * with the evidence attached as columns.
  *
  * The decision rule is DETERMINISTIC and integer-exact (ppm arithmetic,
  * the prof3 protocol) precisely so it is oracle-checkable: the declared
  * query's DuckDB twin replays the same counts and the same CASE and must
  * hash-match. Rules, in order (first match wins — cheapest fix first):
  *
  *  1. a side at or under `broadcastRows` → broadcast it (smaller side on
  *     ties). Row-count proxy for the planner's byte threshold: the
  *     advisor's contract is explainable advice from exact counts, and a
  *     deploy maps rows → bytes with the table's avg row width.
  *  2. else, a side is SKEWED when its hottest key exceeds `skewXPpm`
  *     (default 8×) times its fair share — skew_x_ppm = share_ppm(max
  *     key) × n_keys, the prof3 statistic. Skewed and the hot key holds ≥
  *     `saltSharePpm` of the side → `salt`: one KEY dominates, and AQE
  *     splits oversized partitions at mapper boundaries but cannot split
  *     one giant key's hash bucket when the build side needs co-location
  *     (join13's rationale) — replicate-the-dim salting is the fix.
  *  3. skewed with the hot key under that share → `aqe_skew`: the skew
  *     shows up as oversized PARTITIONS, exactly what AQE's
  *     OptimizeSkewedJoin splits at runtime with zero query rewrite
  *     (join15's rationale).
  *  4. otherwise → `shuffle`: both sides large and balanced; the
  *     co-partitioned exchange is the right plan (bucket it if the join
  *     repeats — join11).
  *
  * Scale posture: evidence costs one map-side-combined groupBy per side
  * (~|keys| rows shuffled, vs the join's |result| ≫ |input|) plus a
  * |keys|-sized count-table join for the exact cardinality; the ppm
  * arithmetic divides BEFORE multiplying by n_keys so nothing overflows
  * long at any realistic scale (max·10⁶ ≤ 10¹⁸ for max ≤ 10¹² rows on
  * one key). `est_join_rows` (Σ c·c′, which 10¹²-row hot keys CAN push
  * past long) is computed in decimal(38,0) — unbounded for any physical
  * corpus; the advisory thresholds never touch it.
  */
object JoinAdvisor {

  /** Integer-exact decision thresholds (see object doc for semantics). */
  final case class Thresholds(
      broadcastRows: Long = 10000L,
      skewXPpm: Long = 8000000L,
      saltSharePpm: Long = 200000L)

  /** One evidence row for a candidate equi-join: per-side rows / distinct
    * keys / hottest-key rows, and the exact join output cardinality.
    * Never executes the candidate join — two per-key count collapses and
    * one |keys|-sized join of the count tables. */
  def evidence(name: String, left: DataFrame, leftKey: Column,
               right: DataFrame, rightKey: Column): DataFrame = {
    val lc = left.select(leftKey.as("k")).groupBy("k")
      .agg(count(lit(1)).as("c"))
    val rc = right.select(rightKey.as("k")).groupBy("k")
      .agg(count(lit(1)).as("c"))
    val ls = lc.agg(sum("c").as("l_rows"), count(lit(1)).as("l_keys"),
      max("c").as("l_max_key_rows"))
    val rs = rc.agg(sum("c").as("r_rows"), count(lit(1)).as("r_keys"),
      max("c").as("r_max_key_rows"))
    val ej = lc.join(rc.withColumnRenamed("c", "c2"), "k")
      .agg(estJoinRowsAgg)
    ls.crossJoin(rs).crossJoin(ej)
      .select(lit(name).as("join_name"), col("l_rows"), col("l_keys"),
        col("l_max_key_rows"), col("r_rows"), col("r_keys"),
        col("r_max_key_rows"), col("est_join_rows"))
  }

  /** Σ c·c′ over the matched count tables, in decimal(38,0) — exact past
    * long for adversarial hot keys (two 10¹²-row keys multiply to 10²⁴);
    * JoinAdvisorSpec pins the overflow fixture. */
  private[graft] def estJoinRowsAgg: Column =
    coalesce(sum(col("c").cast("decimal(38,0)") * col("c2")),
      lit(0L).cast("decimal(38,0)")).as("est_join_rows")

  /** Attach the skew statistics and the recommended strategy to evidence
    * rows (one or many — union candidates first). Pure column arithmetic
    * over the evidence: runs distributed, replays in plain SQL. */
  def recommend(ev: DataFrame,
                t: Thresholds = Thresholds()): DataFrame = {
    val scored = ev
      .withColumn("l_share_ppm",
        expr("l_max_key_rows * 1000000 DIV l_rows"))
      .withColumn("r_share_ppm",
        expr("r_max_key_rows * 1000000 DIV r_rows"))
      .withColumn("l_skew_x_ppm", expr("l_share_ppm * l_keys"))
      .withColumn("r_skew_x_ppm", expr("r_share_ppm * r_keys"))
    val lSkewed = col("l_skew_x_ppm") >= t.skewXPpm
    val rSkewed = col("r_skew_x_ppm") >= t.skewXPpm
    val hotShare = greatest(
      when(lSkewed, col("l_share_ppm")).otherwise(lit(0L)),
      when(rSkewed, col("r_share_ppm")).otherwise(lit(0L)))
    scored.withColumn("strategy",
      // (if r ≤ cap but r > l, then l < r ≤ cap and the left clause fires
      // — a bare "r ≤ cap" third clause would be unreachable)
      when(col("r_rows") <= t.broadcastRows &&
          col("r_rows") <= col("l_rows"), lit("broadcast_right"))
        .when(col("l_rows") <= t.broadcastRows, lit("broadcast_left"))
        .when((lSkewed || rSkewed) && hotShare >= t.saltSharePpm, lit("salt"))
        .when(lSkewed || rSkewed, lit("aqe_skew"))
        .otherwise(lit("shuffle")))
  }

  /** [[evidence]] + [[recommend]] for a single candidate join. */
  def advise(name: String, left: DataFrame, leftKey: Column,
             right: DataFrame, rightKey: Column,
             t: Thresholds = Thresholds()): DataFrame =
    recommend(evidence(name, left, leftKey, right, rightKey), t)
}
