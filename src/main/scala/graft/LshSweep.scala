package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sign-LSH recall sweep — the [[graft.llm.LlmOps.scaledLshBits]]
  * counterpart of [[AnnSweep]] (r20): the density rule keeps the bucket
  * self-join linear, and THIS measures what that costs in recall and
  * what the `tables` dial buys back, at any SF. For each (tables, k) it
  * builds a fresh index and reports, over the first NQ query vectors:
  * union-of-buckets candidate-set size (the cost driver — candidates ∝
  * tables × occupancy) and recall@20 of the llm3b serve shape
  * (candidates → exact cosine re-rank) against the exact cosine top-20.
  *
  *   sbt "runMain graft.LshSweep target/sf1"
  */
object LshSweep {
  private val NQ = 16

  private def cosine(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    graft.llm.LlmOps.cosine(a, b)

  private def exactTop20(e: DataFrame, q: Long): Set[Long] = {
    val qe = e.filter(col("vec_id") === q)
      .select(col("embedding").as("q_emb"))
    e.filter(col("vec_id") =!= q).crossJoin(broadcast(qe))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 6).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(20)
      .collect().map(_.getLong(0)).toSet
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s: SparkSession = Graft.session("graft-lsh-sweep")
    val e = Tables.embeddings(s, d).localCheckpoint()
    val n = e.count()
    val scaledK = graft.llm.LlmOps.scaledLshBits(n)
    val exact = (0L until NQ.toLong).map(q => q -> exactTop20(e, q)).toMap
    println(f"n=$n scaledLshBits=$scaledK")
    println(f"${"tables"}%6s ${"k"}%3s ${"mean|cand|"}%10s " +
      f"${"recall@20(q0)"}%14s ${"mean recall@20"}%15s")
    for (tables <- Seq(8, 16, 32);
         k <- Seq(3, scaledK).distinct) {
      val sig = graft.llm.LlmOps.lshIndex(e, tables = tables, k = k)
        .localCheckpoint()
      val stats = (0L until NQ.toLong).map { q =>
        val qIdx = sig.filter(col("vec_id") === q).select("table", "bucket")
        val cand = sig.filter(col("vec_id") =!= q)
          .join(broadcast(qIdx), Seq("table", "bucket"), "left_semi")
          .select("vec_id").distinct().localCheckpoint()
        val nc = cand.count()
        val got = e.join(cand, "vec_id")
          .crossJoin(broadcast(e.filter(col("vec_id") === q)
            .select(col("embedding").as("q_emb"))))
          .select(col("vec_id"),
            round(cosine(col("embedding"), col("q_emb")), 6).as("c"))
          .orderBy(col("c").desc, col("vec_id")).limit(20)
          .collect().map(_.getLong(0)).toSet
        RoundCheckpointer.release(cand)
        (nc, got.intersect(exact(q)).size / 20.0)
      }
      println(f"$tables%6d $k%3d ${stats.map(_._1).sum / NQ}%10d " +
        f"${stats.head._2}%14.2f ${stats.map(_._2).sum / NQ}%15.3f")
      // release only this grid point's index — e's checkpoint must survive
      RoundCheckpointer.release(sig)
    }
    s.stop()
  }
}
