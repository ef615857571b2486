package graft

import org.apache.spark.sql.functions._
import graft.llm.LlmOps

/** Connected-components label propagation (llm12's engine): exact cluster
  * labels on hand-built graphs whose shapes stress the iteration — a path
  * graph (min label must travel the full diameter, one hop per round), a
  * separate 2-cycle, and nodes absent from the edge list entirely. */
class DedupClusterSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    LlmOps.connectedComponents(sym)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph: min label propagates across the full diameter") {
    // 5-4-3-2-1 chain declared worst-edge-first; needs 4 propagation rounds
    val labels = cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two components stay separate; a cycle terminates") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("llm12 query: clusters are closed under the pair relation") {
    // every jaccard>=0.8 pair must land in one cluster, and every
    // non-canonical doc's cluster_id must be a real canonical doc
    val out = SparkEntry.queries("llm12_dup_clusters")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = LlmOps.ngramJaccardPairs(
        Tables.documents(spark, Sf0001), threshold = 0.8)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture corpus should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(out(a) === out(b), s"pair ($a,$b) split across clusters")
    }
    out.foreach { case (doc, cl) =>
      assert(out(cl) === cl, s"cluster id $cl of doc $doc is not canonical")
      assert(cl <= doc, "canonical doc must be the min id of its cluster")
    }
  }
}
