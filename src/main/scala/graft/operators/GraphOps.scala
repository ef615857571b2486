package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** GRAPH-1 — weighted PageRank, expressed relationally (SURVEY.md §2.19).
  *
  * Web-corpus pipelines score domain authority with centrality over the
  * link graph (the quality signal CommonCrawl-derived corpora filter on);
  * next to llm12's connected components this gives the engine the second
  * standard iterative-graph primitive. Same execution recipe as llm12:
  * O(iters) rounds, each ONE join + ONE aggregate over edges partitioned
  * by src — GraphX's Pregel would shuffle the same data; there is no
  * asymptotically better distributed plan.
  *
  * Scale posture (100 TB): the normalized edge table is checkpointed once
  * and reused every round (lineage stays O(1), no re-read); per-vertex
  * rank contributions cross the shuffle as (dst, 8-byte double); the
  * rank-mass sum rides DECIMAL so partial-agg order cannot perturb ranks
  * (bit-deterministic across partitionings — GraphSpec asserts it); the
  * only driver-side scalar is the vertex count (one metadata-cheap count,
  * the llm5 pattern).
  */
object GraphOps extends QueryModule {

  /** Weighted PageRank over a directed edge list (src, dst, w). Every
    * vertex must have at least one out-edge (feed a bidirected graph, as
    * the declared query does, or pre-drop danglings); teleport handles the
    * rest of the ergodicity story. Returns (v, pr) after `iters` rounds of
    *   pr(v) = (1-d)/N + d · Σ_{u→v} pr(u) · w(u,v)/outw(u).
    */
  def pagerank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85)
  : DataFrame = {
    val norm = edges
      .join(edges.groupBy("src").agg(sum("w").as("outw")), "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("outw")).as("p"))
      .localCheckpoint()
    val verts = norm.select(col("src").as("v"))
      .union(norm.select(col("dst"))).distinct().localCheckpoint()
    val n = verts.count()
    var pr = verts.withColumn("pr", lit(1.0 / n))
    for (i <- 1 to iters) {
      pr = norm.join(pr, norm("src") === pr("v"))
        .select(col("dst").as("v"), (col("pr") * col("p")).as("contrib"))
        .groupBy("v")
        .agg((lit((1 - damping) / n) + lit(damping) *
          sum(col("contrib").cast("decimal(28,12)")).cast("double")).as("pr"))
      // Unlike llm12's convergence loop there is NO per-round driver
      // decision, so rounds stay LAZY — one job executes the whole
      // iteration tree instead of one eager materialization per round.
      // Checkpoint only often enough to bound plan depth on long runs.
      if (i % 8 == 0) pr = pr.localCheckpoint()
    }
    pr
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // GRAPH-1 ⚠: supplier/customer authority over the purchase graph —
    // PageRank on the bidirected customer↔supplier edge list (edge weight =
    // items traded), 5 rounds, d=0.85. Bidirection means no dangling
    // vertices (every vertex that appears has an out-edge), so rank mass
    // is conserved — GraphSpec pins Σpr = 1, a hand-computed golden graph,
    // and run-to-run determinism. Rows-only in the driver gate.
    "graph1_pagerank" -> ((s, d) => {
      val ol = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint() // both edge directions reuse the aggregated pairs
      val edges = ol.select(
          concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"), col("w"))
        .unionByName(ol.select(
          concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("c"), col("o_custkey")).as("dst"), col("w")))
      pagerank(edges)
        .select(col("v"), round(col("pr") * lit(1e6)) .as("pr_ppm"))
        .orderBy(col("pr_ppm").desc, col("v"))
        .limit(20)
    })
  )

  def oracle: Map[String, String] = Map.empty
}
