package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** IVM-2 — maintain a materialized JOIN view V = orders ⋈ customer under
    * change feeds on BOTH sides, never re-running the full join. Delta rule
    * (keys: ΔO by o_orderkey, ΔC by c_custkey; post = insert ∪
    * update_postimage):
    *
    *   V_new = V_old ∖ (ΔO-keys ∪ ΔC-keys)          — untouched rows
    *         ∪ ΔO_post ⋈ C_new                       — changed orders
    *         ∪ (O_old ∖ ΔO-keys) ⋉ΔC ⋈ ΔC_post      — customer-side churn
    *
    * The three terms are DISJOINT by construction (partitioned on whether
    * each row's order / customer key changed), so the union needs no dedup.
    * C_new is reconstructed view-side as (C_old ∖ ΔC-keys) ∪ ΔC_post — the
    * maintained version's base tables are never read. The third term must
    * draw from O_old, not V_old: an INNER-join view has no row for an
    * order whose customer didn't exist yet, so a customer INSERT has to
    * re-probe the base fact — V_old alone cannot resurrect those rows
    * (the subtle bug in the "pure view + deltas" formulation).
    *
    * Cost at 100 TB: ΔO/ΔC terms are churn-proportional; the anti-joins
    * broadcast only CHANGED KEYS against the view/fact, and with the view
    * and fact hash-partitioned by the join key the semi/anti probes prune
    * to affected partitions. Every term's small side is an explicit
    * broadcast — zero shuffles in the whole maintenance plan. */
  def maintainJoinView(vOld: DataFrame, oOld: DataFrame,
                       ordersFeed0: DataFrame, custFeed0: DataFrame,
                       custOld: DataFrame): DataFrame = {
    // each feed feeds 2-3 terms below; materialize ONCE (churn-sized) so a
    // lazily-derived feed (changeFeed's full-outer diff, or a CDC log
    // scan) isn't recomputed per referencing term
    val ordersFeed = ordersFeed0.localCheckpoint()
    val custFeed = custFeed0.localCheckpoint()
    val post = col("_change_type").isin("insert", "update_postimage")
    val oKeys = ordersFeed.select("o_orderkey").distinct()
    val cKeys = custFeed.select("c_custkey").distinct()
    val oPost = ordersFeed.filter(post)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cPost = custFeed.filter(post).select("c_custkey", "c_mktsegment")
    val cNew = custOld.select("c_custkey", "c_mktsegment")
      .join(broadcast(cKeys), Seq("c_custkey"), "left_anti")
      .unionByName(cPost)
    val untouched = vOld
      .join(broadcast(oKeys), Seq("o_orderkey"), "left_anti")
      .join(broadcast(cKeys), col("o_custkey") === col("c_custkey"),
        "left_anti")
    val fromChangedOrders = oPost
      .join(broadcast(cNew), col("o_custkey") === col("c_custkey"))
      .drop("c_custkey")
    val fromChangedCust = oOld
      .join(broadcast(oKeys), Seq("o_orderkey"), "left_anti")
      .join(broadcast(cPost), col("o_custkey") === col("c_custkey"))
      .drop("c_custkey")
    untouched.unionByName(fromChangedOrders).unionByName(fromChangedCust)
  }

  /** IVM-5 support — the v1→v2 change feed OF THE JOIN VIEW ITSELF,
    * derived from the two base feeds without re-running the full join:
    * 'delete' rows are V_old ⋉ changed-keys (either side), 'insert' rows
    * are the two churn terms of [[maintainJoinView]]. The identity this
    * buys (IncrementalSpec pins it):
    *
    *   aggregate ∘ maintainJoinView  ≡  maintainSumCount ∘ joinViewDelta
    *
    * i.e. a JOIN→AGG view composes: the join's delta feed drives the
    * aggregate's maintenance, so the materialized state can be the TINY
    * aggregate (O(groups)) instead of the full join view — the standard
    * delta-rule chaining of Griffin/Libkin-style IVM. A same-value update
    * appears as a delete+insert pair and cancels inside the sum algebra;
    * a segment-changing update moves its mass between groups because the
    * delete carries the OLD segment and the insert the new one. All terms
    * stay churn-proportional; every probe broadcasts only changed keys. */
  def joinViewDelta(vOld: DataFrame, oOld: DataFrame,
                    ordersFeed0: DataFrame, custFeed0: DataFrame,
                    custOld: DataFrame): DataFrame = {
    val ordersFeed = ordersFeed0.localCheckpoint()
    val custFeed = custFeed0.localCheckpoint()
    val post = col("_change_type").isin("insert", "update_postimage")
    val oKeys = ordersFeed.select("o_orderkey").distinct()
    val cKeys = custFeed.select("c_custkey").distinct()
    val oPost = ordersFeed.filter(post)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cPost = custFeed.filter(post).select("c_custkey", "c_mktsegment")
    val cNew = custOld.select("c_custkey", "c_mktsegment")
      .join(broadcast(cKeys), Seq("c_custkey"), "left_anti")
      .unionByName(cPost)
    val removed = vOld
      .join(broadcast(oKeys), Seq("o_orderkey"), "left_semi")
      .unionByName(vOld
        .join(broadcast(oKeys), Seq("o_orderkey"), "left_anti")
        .join(broadcast(cKeys), col("o_custkey") === col("c_custkey"),
          "left_semi"))
    val added = oPost
      .join(broadcast(cNew), col("o_custkey") === col("c_custkey"))
      .drop("c_custkey")
      .unionByName(oOld
        .join(broadcast(oKeys), Seq("o_orderkey"), "left_anti")
        .join(broadcast(cPost), col("o_custkey") === col("c_custkey"))
        .drop("c_custkey"))
    removed.withColumn("_change_type", lit("delete"))
      .unionByName(added.withColumn("_change_type", lit("insert")))
  }

  /** Two-sided store evolution for IVM-2: orders evolve as in ivm1 (keeping
    * o_custkey this time); customer v1 drops ≡0 (mod 4), v2 instead drops
    * ≡0 (mod 6) and rewrites the segment on ≡0 (mod 9) — so the dim sees
    * inserts, deletes, AND updates, including customers that EXIST only
    * from v2 on (the case that forces the O_old re-probe). */
  def buildJoinStores(s: SparkSession, d: String,
                      oRoot: String, cRoot: String): Unit = {
    VersionedStore.destroy(oRoot)
    VersionedStore.destroy(cRoot)
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    VersionedStore.commit(o.filter(col("o_orderkey") % 3 =!= 0), oRoot)
    VersionedStore.commit(
      o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice"))), oRoot)
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    VersionedStore.commit(c.filter(col("c_custkey") % 4 =!= 0), cRoot)
    VersionedStore.commit(
      c.filter(col("c_custkey") % 6 =!= 0)
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 9 === 0,
            concat(lit("X-"), col("c_mktsegment")))
            .otherwise(col("c_mktsegment"))), cRoot)
    ()
  }

  /** IVM-3 — maintain per-group COUNT(DISTINCT value) under a change feed.
    *
    * DISTINCT is not distributive, so the maintained state is the classic
    * SUPPORT table (group, value) → multiplicity: a feed row adjusts the
    * pair's multiplicity ±1, and the distinct count changes only on ZERO
    * CROSSINGS — a pair born (0→n) adds one, a pair dying (n→0) removes
    * one. Both state tables update with churn-proportional work: the delta
    * agg touches changed rows, the support merge touches changed PAIRS,
    * the count merge touches changed GROUPS (an update that keeps the
    * value cancels to dn=0 and is dropped before any join). With the
    * support table hash-partitioned by (group, value) the merge is
    * co-located at 100 TB; the feed side is churn-sized. Returns
    * (newSupport, newCounts) — both exact, bit-identical to a recompute.
    */
  def maintainDistinctCount(oldSupport: DataFrame, oldCnt: DataFrame,
                            feed: DataFrame, groupCol: String,
                            valueCol: String): (DataFrame, DataFrame) = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = feed.groupBy(col(groupCol), col(valueCol))
      .agg(sum(sign).as("dn")).filter(col("dn") =!= 0)
      .localCheckpoint() // churn-sized; feeds both merges below
    val merged = oldSupport
      .join(delta, Seq(groupCol, valueCol), "full_outer")
      .select(col(groupCol), col(valueCol),
        coalesce(col("n"), lit(0L)).as("n_old"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_new"))
      .localCheckpoint() // support + crossings both read it
    val newSupport = merged.filter(col("n_new") > 0)
      .select(col(groupCol), col(valueCol), col("n_new").as("n"))
    val crossings = merged
      // born (0 → n) XOR died (n → 0); pairs stable on either side drop out
      .filter((col("n_old") === 0) =!= (col("n_new") <= 0))
      .groupBy(col(groupCol))
      .agg(sum(when(col("n_old") === 0, 1L).otherwise(-1L)).as("dcnt"))
    val newCnt = oldCnt.join(crossings, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L)))
          .as("cnt"))
      .filter(col("cnt") > 0)
    (newSupport, newCnt)
  }

  /** IVM-4 — maintain a per-group TOP-K view under a change feed.
    *
    * Top-k is NOT self-maintainable: a delete inside the top-k needs the
    * (k+1)-th member, which the view no longer has. The maintained state
    * is therefore the full per-(group, member) score SUPPORT table (the
    * ivm3 lesson applied to ranking), kept exact by the ivm1 decimal
    * algebra; the VIEW re-derives only for groups the delta touched:
    *
    *   V_new = V_old ∖ changedGroups  ∪  topK(support_new ⋉ changedGroups)
    *
    * Cost: delta agg touches changed rows, support merge changed pairs
    * (co-located when the support table is hash-partitioned by (group,
    * member)), and the re-rank window runs ONLY over changed groups'
    * support rows — churn-proportional everywhere; untouched groups'
    * view rows are carried bytes, not recomputed. changedGroups is
    * churn-sized → both the anti-join and the semi-join broadcast.
    * A cancelling update (dn=0 AND dsum=0) drops before the group is
    * marked changed, so no-op churn re-ranks nothing. */
  def maintainTopK(vOld: DataFrame, oldSupport: DataFrame, feed: DataFrame,
                   groupCol: String, memberCol: String, valueCol: String,
                   k: Int): DataFrame =
    maintainTopKState(vOld, oldSupport, feed, groupCol, memberCol,
      valueCol, k)._2

  /** [[maintainTopK]] returning BOTH state tables (newSupport, newView) —
    * the streaming form (STRM-21) must persist the support alongside the
    * view, because the next batch's in-top-k death can only promote a
    * successor the support table knows. */
  def maintainTopKState(vOld: DataFrame, oldSupport: DataFrame,
                        feed: DataFrame, groupCol: String, memberCol: String,
                        valueCol: String, k: Int)
  : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = feed.groupBy(col(groupCol), col(memberCol))
      .agg(sum(sign).as("dn"),
        sum(col(valueCol).cast("decimal(18,2)") * sign).as("dsum"))
      .filter(col("dn") =!= 0 ||
        col("dsum") =!= lit(0).cast("decimal(18,2)"))
      .localCheckpoint() // churn-sized; feeds the merge AND changedGroups
    val newSupport = oldSupport
      .join(delta, Seq(groupCol, memberCol), "full_outer")
      .select(col(groupCol), col(memberCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n"),
        (coalesce(col("sum_dec"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("dsum"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("sum_dec"))
      .filter(col("n") > 0)
    val changed = delta.select(groupCol).distinct()
    val untouched = vOld.join(broadcast(changed), Seq(groupCol), "left_anti")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("sum_dec").desc, col(memberCol))
    val rebuilt = newSupport.join(broadcast(changed), Seq(groupCol))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("rnk"), col(memberCol), col("sum_dec"))
    (newSupport, untouched.unionByName(rebuilt))
  }

  /** IVM-6 — maintain a per-group DDSketch-bucket histogram (the
    * sketch's RELATIONAL state form: one (group, bucket, count) row per
    * occupied log bucket) from a change feed. Sketch bucket counts are
    * plain counters, so unlike an opaque serialized sketch the
    * relational form maintains EXACTLY under deletes and updates:
    * insert/update_postimage rows add 1 to their value's bucket,
    * delete/update_preimage rows subtract 1, and zeroed buckets drop
    * (the ivm3 zero-crossing discipline applied per bucket). Any
    * quantile then reads off the maintained histogram by cumulative
    * bucket mass over O(buckets) rows — v2's base is never rescanned.
    * Cost: one churn-sized delta agg + a support merge keyed
    * (group, bucket); at 100 TB the support table is O(groups × ~1k
    * occupied buckets), KBs per group, co-located when hash-partitioned
    * by group. */
  def maintainBucketHistogram(oldSupport: DataFrame, feed: DataFrame,
                              groupCol: String, bucketOf: Column): DataFrame = {
    val delta = feed
      .select(col(groupCol), bucketOf.as("i"),
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L).as("d"))
      .groupBy(groupCol, "i").agg(sum("d").as("d"))
      .filter(col("d") =!= 0) // cancelling churn touches nothing
    oldSupport.join(delta, Seq(groupCol, "i"), "full_outer")
      .select(col(groupCol), col("i"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("d"), lit(0L))).as("c"))
      .filter(col("c") =!= 0)
  }

  /** Per-(group, member) support + its top-k view of one store version. */
  def topkStateOf(s: SparkSession, root: String, version: Long,
                  k: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val sup = VersionedStore.read(s, root, version)
      .groupBy("o_orderpriority", "o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_dec"))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("sum_dec").desc, col("o_custkey"))
    val view = sup.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("o_orderpriority"), col("rnk"), col("o_custkey"),
        col("sum_dec"))
    (sup, view)
  }

  /** Store evolution for IVM-4: v2 drops ≡0 (mod 5), doubles the price on
    * ≡0 (mod 7) (score churn), and REASSIGNS the customer on ≡0 (mod 11)
    * (member churn) — deletes, score updates, and member moves all hit
    * the ranking. */
  def buildTopkStore(s: SparkSession, d: String, root: String): Unit = {
    VersionedStore.destroy(root)
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_custkey", "o_totalprice")
    VersionedStore.commit(o.filter(col("o_orderkey") % 3 =!= 0), root)
    VersionedStore.commit(
      o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
        .withColumn("o_custkey",
          when(col("o_orderkey") % 11 === 0, col("o_custkey") + 1)
            .otherwise(col("o_custkey"))), root)
    ()
  }

  /** Store evolution for IVM-3: like ivm1's but keeping o_custkey, and v2
    * additionally REASSIGNS the customer on ≡0 (mod 7) — so the distinct
    * customer set per priority sees births, deaths, and no-op updates
    * (price-only churn cancels in the support delta). */
  def buildDistinctStore(s: SparkSession, d: String, root: String): Unit = {
    VersionedStore.destroy(root)
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_custkey")
    VersionedStore.commit(o.filter(col("o_orderkey") % 3 =!= 0), root)
    VersionedStore.commit(
      o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_custkey",
          when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1)
            .otherwise(col("o_custkey"))), root)
    ()
  }

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
        // dir-tagged like ivm2/ivm3 (ADVICE r10): one JVM touching two
        // lakes must not rebuild the same store path under a second memo
        val r = s"${Scans.SinkDir}/ivm1_store_${Scans.dirTag(d)}"
        buildStore(s, d, r)
        r
      }
      val feed = VersionedStore.changeFeed(s, root, 1L, 2L, Seq("o_orderkey"))
      maintainSumCount(aggOf(s, root, 1L), feed,
        Seq("o_orderpriority"), "o_totalprice")
        .select(col("o_orderpriority"), col("n"),
          col("sum_dec").cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // IVM-2: the v2 join view produced from V_old + the two change feeds +
    // v1 base reads only — the oracle recomputes O_v2 ⋈ C_v2 directly and
    // must hash-match bit-for-bit (no aggregation, so row identity is the
    // whole test).
    "ivm2_incremental_join" -> ((s, d) => {
      // path tagged by the data dir (join11 precedent): one JVM touching
      // two lakes (e.g. the empty-lake sweep + sf0.001 specs) must not
      // rebuild THE SAME store path under a different-dir memo key
      val (oRoot, cRoot) =
        graft.StageMemo.value(s, s"ivm2.stores.$d") {
          val tag = Scans.dirTag(d) // md5-based: hashCode collisions would
          // alias two lakes onto one store path (ADVICE r10)
          val o = s"${Scans.SinkDir}/ivm2_orders_$tag"
          val c = s"${Scans.SinkDir}/ivm2_cust_$tag"
          buildJoinStores(s, d, o, c)
          (o, c)
        }
      val oOld = VersionedStore.read(s, oRoot, 1L)
      val cOld = VersionedStore.read(s, cRoot, 1L)
      val vOld = oOld.join(cOld,
        oOld("o_custkey") === cOld("c_custkey")).drop("c_custkey")
      val oFeed = VersionedStore.changeFeed(s, oRoot, 1L, 2L,
        Seq("o_orderkey"))
      val cFeed = VersionedStore.changeFeed(s, cRoot, 1L, 2L,
        Seq("c_custkey"))
      maintainJoinView(vOld, oOld, oFeed, cFeed, cOld)
        .orderBy("o_orderkey")
    }),

    // IVM-3: the v2 distinct-customer count per priority produced from
    // v1's support table + the change feed — v2's base is never read. The
    // oracle recomputes COUNT(DISTINCT) from the source expression; the
    // zero-crossing algebra makes the maintained counts identical.
    "ivm3_incremental_distinct" -> ((s, d) => {
      val root = graft.StageMemo.value(s, s"ivm3.store.$d") {
        val r = s"${Scans.SinkDir}/ivm3_store_${Scans.dirTag(d)}"
        buildDistinctStore(s, d, r)
        r
      }
      val feed = VersionedStore.changeFeed(s, root, 1L, 2L, Seq("o_orderkey"))
      val sup1 = VersionedStore.read(s, root, 1L)
        .groupBy("o_orderpriority", "o_custkey").agg(count(lit(1)).as("n"))
      val cnt1 = sup1.groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val (_, cnt2) = maintainDistinctCount(sup1, cnt1, feed,
        "o_orderpriority", "o_custkey")
      cnt2.select(col("o_orderpriority"), col("cnt").as("n_distinct_cust"))
        .orderBy("o_orderpriority")
    }),

    // IVM-6: maintain the per-priority price-quantile SKETCH (DDSketch
    // bucket histogram, α=0.01) under CDC — the approximate-analytics
    // face of IVM: the maintained state is the O(groups × buckets)
    // relational bucket table, maintained EXACTLY (counters add/subtract
    // per feed image; zeroed buckets drop), and p50/p95 read off the
    // maintained histogram by cumulative mass. v2's base is never read.
    // Shares ivm4's two-version store (same memo key: price churn ×2 on
    // mod-7, deletes on mod-5, inserts on mod-3-restored). The oracle
    // recomputes v2's buckets directly from the source expression — the
    // maintained histogram must land on the identical integer counts,
    // and the quantile estimates on the identical one-pow doubles.
    "ivm6_incremental_quantile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val root = graft.StageMemo.value(s, s"ivm4.store.$d") {
        val r = s"${Scans.SinkDir}/ivm4_store_${Scans.dirTag(d)}"
        buildTopkStore(s, d, r)
        r
      }
      val gamma = (1 + 0.01) / (1 - 0.01)
      def bucket(c: org.apache.spark.sql.Column) =
        ceil(log(c) / log(lit(gamma))).cast("long")
      val sup1 = VersionedStore.read(s, root, 1L)
        .select(col("o_orderpriority"),
          bucket(col("o_totalprice")).as("i"))
        .groupBy("o_orderpriority", "i").agg(count(lit(1)).as("c"))
      val feed = VersionedStore.changeFeed(s, root, 1L, 2L, Seq("o_orderkey"))
      val sup2 = maintainBucketHistogram(sup1, feed,
        "o_orderpriority", bucket(col("o_totalprice")))
      val cumW = Window.partitionBy("o_orderpriority").orderBy("i")
      val totW = Window.partitionBy("o_orderpriority")
      sup2
        .withColumn("cum", sum("c").over(cumW))
        .withColumn("n", sum("c").over(totW))
        .groupBy("o_orderpriority")
        .agg(max("n").as("n_items"),
          min(when(col("cum") >= floor(lit(0.5) * (col("n") - 1)) + 1,
            col("i"))).as("p50_bucket"),
          min(when(col("cum") >= floor(lit(0.95) * (col("n") - 1)) + 1,
            col("i"))).as("p95_bucket"))
        .select(col("o_orderpriority"), col("n_items"), col("p50_bucket"),
          round(lit(2.0) * pow(lit(gamma), col("p50_bucket")) /
            (lit(gamma) + 1), 2).as("p50_est"),
          col("p95_bucket"),
          round(lit(2.0) * pow(lit(gamma), col("p95_bucket")) /
            (lit(gamma) + 1), 2).as("p95_est"))
        .orderBy("o_orderpriority")
    }),

    // IVM-4: the v2 top-3 spenders per priority produced from v1's view +
    // support table + the change feed — v2's base is never read, and only
    // groups the churn touched re-rank. The oracle recomputes the v2
    // ranking from the source expression; exact-decimal scores make the
    // maintained view bit-identical.
    "ivm4_incremental_topk" -> ((s, d) => {
      val root = graft.StageMemo.value(s, s"ivm4.store.$d") {
        val r = s"${Scans.SinkDir}/ivm4_store_${Scans.dirTag(d)}"
        buildTopkStore(s, d, r)
        r
      }
      val feed = VersionedStore.changeFeed(s, root, 1L, 2L, Seq("o_orderkey"))
      val (sup1, v1) = topkStateOf(s, root, 1L, k = 3)
      maintainTopK(v1, sup1, feed,
        "o_orderpriority", "o_custkey", "o_totalprice", k = 3)
        .select(col("o_orderpriority"), col("rnk"), col("o_custkey"),
          col("sum_dec").cast("double").as("spend"))
        .orderBy("o_orderpriority", "rnk")
    }),

    // PROF-5: table-diff report — the data-reconciliation summary between
    // two versions of a table (the reference's QA report compares two
    // whole DATABASES the same way: per-class object deltas,
    // runcommand.py:38-60): row churn by kind plus, for updates, WHICH
    // columns actually changed and how often. Everything derives from the
    // keyed change feed (churn-sized — never a full-table compare): the
    // pre/post join is per updated key, and each report row is one count
    // over it. The oracle recomputes the expected churn from the store's
    // source expressions.
    // IVM-5: maintain a JOIN→AGG view (revenue + order count per market
    // segment over orders ⋈ customer) under CDC on BOTH bases — the
    // composite every real materialized view is. The maintained state is
    // the O(segments) aggregate, not the join view: the join's delta feed
    // ([[joinViewDelta]]) drives [[maintainSumCount]], so v2's bases are
    // never re-joined and never re-aggregated. The oracle recomputes the
    // v2 join+agg from the source expressions; exact-decimal maintenance
    // makes the two bit-identical.
    "ivm5_incremental_join_agg" -> ((s, d) => {
      val (oRoot, cRoot) =
        graft.StageMemo.value(s, s"ivm2.stores.$d") {
          val tag = Scans.dirTag(d)
          val o = s"${Scans.SinkDir}/ivm2_orders_$tag"
          val c = s"${Scans.SinkDir}/ivm2_cust_$tag"
          buildJoinStores(s, d, o, c)
          (o, c)
        }
      val oOld = VersionedStore.read(s, oRoot, 1L)
      val cOld = VersionedStore.read(s, cRoot, 1L)
      val vOld = oOld.join(cOld,
        oOld("o_custkey") === cOld("c_custkey")).drop("c_custkey")
      val aggOld = vOld.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_dec"))
      val oFeed = VersionedStore.changeFeed(s, oRoot, 1L, 2L,
        Seq("o_orderkey"))
      val cFeed = VersionedStore.changeFeed(s, cRoot, 1L, 2L,
        Seq("c_custkey"))
      maintainSumCount(aggOld,
        joinViewDelta(vOld, oOld, oFeed, cFeed, cOld),
        Seq("c_mktsegment"), "o_totalprice")
        .select(col("c_mktsegment"), col("n"),
          col("sum_dec").cast("double").as("sum_price"))
        .orderBy("c_mktsegment")
    }),

    "prof5_table_diff" -> ((s, d) => {
      val root = graft.StageMemo.value(s, s"ivm1.store.$d") {
        val r = s"${Scans.SinkDir}/ivm1_store_${Scans.dirTag(d)}"
        buildStore(s, d, r)
        r
      }
      val feed = VersionedStore.changeFeed(s, root, 1L, 2L,
        Seq("o_orderkey")).localCheckpoint()
      def kind(ct: String, label: String) =
        feed.filter(col("_change_type") === ct)
          .agg(count(lit(1)).as("n"))
          .select(lit(label).as("column_name"), col("n"))
      val pre = feed.filter(col("_change_type") === "update_preimage")
        .select(col("o_orderkey"), col("o_orderpriority").as("p1"),
          col("o_totalprice").as("v1"))
      val post = feed.filter(col("_change_type") === "update_postimage")
        .select(col("o_orderkey"), col("o_orderpriority").as("p2"),
          col("o_totalprice").as("v2"))
      val upd = pre.join(post, "o_orderkey")
      kind("delete", "_deleted")
        .unionByName(kind("insert", "_inserted"))
        .unionByName(upd.agg(count(when(col("p1") =!= col("p2"), 1)).as("n"))
          .select(lit("o_orderpriority").as("column_name"), col("n")))
        .unionByName(upd.agg(count(when(col("v1") =!= col("v2"), 1)).as("n"))
          .select(lit("o_totalprice").as("column_name"), col("n")))
        .orderBy("column_name")
    })
  )

  def oracle: Map[String, String] = Map(
    // v2's buckets recomputed directly from the source expression — the
    // maintained histogram must land on identical integer counts (the
    // agg23 bucket protocol over the ivm4 store's v2 definition)
    "ivm6_incremental_quantile" -> {
      val g = s"CAST(${(1 + 0.01) / (1 - 0.01)} AS DOUBLE)"
      s"""WITH v2 AS (
         |  SELECT o_orderpriority,
         |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
         |         ELSE o_totalprice END AS p
         |  FROM orders WHERE o_orderkey % 5 <> 0),
         |b AS (
         |  SELECT o_orderpriority,
         |    CAST(CEIL(LN(p) / LN($g)) AS BIGINT) AS i, COUNT(*) AS c
         |  FROM v2 GROUP BY 1, 2),
         |cum AS (
         |  SELECT o_orderpriority, i,
         |    SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY i) AS cum,
         |    SUM(c) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM b),
         |q AS (
         |  SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_items,
         |    MIN(CASE WHEN cum >= FLOOR(0.5 * (n - 1)) + 1 THEN i END)
         |      AS p50_bucket,
         |    MIN(CASE WHEN cum >= FLOOR(0.95 * (n - 1)) + 1 THEN i END)
         |      AS p95_bucket
         |  FROM cum GROUP BY 1)
         |SELECT o_orderpriority, n_items,
         |  p50_bucket,
         |  ROUND(2 * POWER($g, p50_bucket) / ($g + 1), 2) AS p50_est,
         |  p95_bucket,
         |  ROUND(2 * POWER($g, p95_bucket) / ($g + 1), 2) AS p95_est
         |FROM q ORDER BY o_orderpriority""".stripMargin
    },

    "ivm1_incremental_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
        |                     ELSE o_totalprice END AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderkey % 5 <> 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the v2 join recomputed from the source expressions (double*2 is
    // exponent-exact, so the maintained doubles hash-match)
    "ivm2_incremental_join" ->
      """SELECT o.o_orderkey, o.o_custkey,
        |  CASE WHEN o.o_orderkey % 7 = 0 THEN o.o_totalprice * 2
        |       ELSE o.o_totalprice END AS o_totalprice,
        |  CASE WHEN c.c_custkey % 9 = 0 THEN 'X-' || c.c_mktsegment
        |       ELSE c.c_mktsegment END AS c_mktsegment
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey % 5 <> 0 AND c.c_custkey % 6 <> 0
        |ORDER BY o.o_orderkey""".stripMargin,

    // the v2 join+agg recomputed from the source expressions (segment
    // rewrite moves mass between groups; the feed's delete/insert pairs
    // must land it in the right one)
    "ivm5_incremental_join_agg" ->
      """SELECT CASE WHEN c.c_custkey % 9 = 0 THEN 'X-' || c.c_mktsegment
        |            ELSE c.c_mktsegment END AS c_mktsegment,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(CASE WHEN o.o_orderkey % 7 = 0
        |                     THEN o.o_totalprice * 2
        |                     ELSE o.o_totalprice END AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderkey % 5 <> 0 AND c.c_custkey % 6 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ivm3_incremental_distinct" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 7 = 0
        |                           THEN o_custkey + 1
        |                           ELSE o_custkey END) AS BIGINT)
        |    AS n_distinct_cust
        |FROM orders WHERE o_orderkey % 5 <> 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "ivm4_incremental_topk" ->
      """WITH base AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN o_orderkey % 11 = 0 THEN o_custkey + 1
        |         ELSE o_custkey END AS o_custkey,
        |    CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
        |              ELSE o_totalprice END AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |sup AS (
        |  SELECT o_orderpriority, o_custkey, SUM(p) AS s
        |  FROM base GROUP BY 1, 2),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                               ORDER BY s DESC, o_custkey) AS rnk
        |  FROM sup)
        |SELECT o_orderpriority, rnk, o_custkey, CAST(s AS DOUBLE) AS spend
        |FROM r WHERE rnk <= 3
        |ORDER BY o_orderpriority, rnk""".stripMargin,

    // expected churn from the ivm1 store rules: v1 = %3≠0, v2 = %5≠0 with
    // price doubled on %7=0; priority never changes, and the feed emits
    // update pairs only for keys in BOTH versions whose row changed
    "prof5_table_diff" ->
      """SELECT '_deleted' AS column_name,
        |  CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 <> 0
        |                          AND o_orderkey % 5 = 0) AS BIGINT) AS n
        |FROM orders
        |UNION ALL
        |SELECT '_inserted',
        |  CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 0
        |                          AND o_orderkey % 5 <> 0) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(0 AS BIGINT)
        |UNION ALL
        |SELECT 'o_totalprice',
        |  CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 <> 0
        |                          AND o_orderkey % 5 <> 0
        |                          AND o_orderkey % 7 = 0) AS BIGINT)
        |FROM orders
        |ORDER BY column_name""".stripMargin
  )
}
