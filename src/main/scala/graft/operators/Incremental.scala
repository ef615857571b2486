package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** IVM-1 — incremental view maintenance (SURVEY.md §2.17).
  *
  * The reference recomputes its QA report from scratch every run
  * (`/root/reference/src/azanium/runcommand.py:62-71`). At 100 TB a
  * maintained aggregate must NOT rescan the base table when the base
  * changes: apply the change feed to the previous aggregate instead.
  * For distributive aggregates (count, sum) the algebra is exact:
  *
  *   newAgg = oldAgg  ⊎  Σ(+post, +insert)  ⊖  Σ(−pre, −delete)
  *
  * Cost model: the delta aggregation touches only the CHANGED rows and
  * the merge join touches only the CHANGED GROUPS — data proportional to
  * the churn, not the table. Sums ride DECIMAL end-to-end so subtraction
  * is exact (a double-based incremental sum drifts; decimal does not) and
  * the maintained result is bit-identical to a full recompute — which is
  * exactly what the oracle and IncrementalSpec certify.
  */
object Incremental extends QueryModule {

  /** Apply a [[VersionedStore.changeFeed]] to a (count, decimal-sum)
    * aggregate. `oldAgg` schema: groupCols ++ (n: long, sum_dec:
    * decimal(18,2)). Returns the same schema; groups whose count reaches
    * zero disappear (as they would in a recompute). */
  def maintainSumCount(oldAgg: DataFrame, feed: DataFrame,
                       groupCols: Seq[String], valueCol: String): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = feed
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(sign).as("dn"),
        sum(col(valueCol).cast("decimal(18,2)") * sign).as("dsum"))
    oldAgg.join(delta, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("sum_dec"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("dsum"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("sum_dec")): _*)
      .filter(col("n") > 0)
  }

  /** The v1 → v2 store evolution shared by the query and the spec:
    * v1 drops keys ≡0 (mod 3); v2 instead drops ≡0 (mod 5) and doubles
    * the price on ≡0 (mod 7) — inserts, deletes, and updates all occur. */
  def buildStore(s: SparkSession, d: String, root: String): Unit = {
    VersionedStore.destroy(root)
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    VersionedStore.commit(o.filter(col("o_orderkey") % 3 =!= 0), root)
    VersionedStore.commit(
      o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice"))), root)
    ()
  }

  /** Per-priority aggregate of one store version, in maintainable form. */
  def aggOf(s: SparkSession, root: String, version: Long): DataFrame =
    VersionedStore.read(s, root, version)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_dec"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IVM-1: the v2 aggregate produced WITHOUT reading v2's base table —
    // v1's aggregate plus the v1→v2 change feed. The oracle recomputes
    // v2's aggregate directly from the source expression; exact-decimal
    // maintenance makes the two bit-identical.
    "ivm1_incremental_agg" -> ((s, d) => {
      // the two-version store is deterministic setup, not the measured
      // operation — build it once per (session, sf-dir) (StageMemo); the
      // query itself is the change-feed read + algebraic maintenance
      val root = graft.StageMemo.value(s, s"ivm1.store.$d") {
        val r = s"${Scans.SinkDir}/ivm1_store"
        buildStore(s, d, r)
        r
      }
      val feed = VersionedStore.changeFeed(s, root, 1L, 2L, Seq("o_orderkey"))
      maintainSumCount(aggOf(s, root, 1L), feed,
        Seq("o_orderpriority"), "o_totalprice")
        .select(col("o_orderpriority"), col("n"),
          col("sum_dec").cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    })
  )

  def oracle: Map[String, String] = Map(
    "ivm1_incremental_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
        |                     ELSE o_totalprice END AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderkey % 5 <> 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
