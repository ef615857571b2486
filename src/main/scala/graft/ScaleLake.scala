package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale-probe lake generator (VERDICT r18 item 4). The driver lake
  * tops out at sf0.1; the 100×-scale complexity claims in SURVEY §2 need at
  * least one measured DECADE of growth (wall time + OBS-2 shuffle bytes) to
  * stand on. /root/testdata is read-only, so this main synthesizes an
  * sfK-equivalent lake under the repo's target dir by unioning K shifted
  * replicas of sf0.1 — the TPC-H "dataset = union of shifted copies" trick:
  *
  *  - fixed-cardinality dims (region, nation) copy unchanged, like TPC-H's
  *    sf-independent tables;
  *  - every growing table's keys shift by replica·(max_key+1), so key
  *    uniqueness AND referential integrity (orders→customer,
  *    lineitem→orders/part/supplier) hold within each replica;
  *  - `documents.text` gets a token-level deterministic rewrite for
  *    replicas r>0 (every token t with xxhash64(t,r)%3==0 becomes t_r<r>):
  *    two near-dup docs inside one replica share tokens, so the SAME
  *    rewrite hits both and their mutual similarity is PRESERVED, while
  *    cross-replica shingle overlap collapses below every dedup threshold —
  *    the dup-pair population grows ~K× (a real corpus's shape), not K²×
  *    (what naive exact copies would force on the pair-enumeration ops);
  *  - `embeddings.embedding` rotates coordinates by r positions — a
  *    permutation isometry, so within-replica distances (and thus ANN/IVF
  *    cluster structure) are exactly preserved while cross-replica vectors
  *    decorrelate instead of colliding as exact duplicates;
  *  - `events` shifts ids/users and keeps ts, so the temporal profile and
  *    per-user event counts match sf0.1 with K× the users.
  *
  * Distributions, skew, dup rates, and join fan-outs therefore match sf0.1
  * per replica, which is exactly what a growth measurement needs.
  *
  * Usage: `runMain graft.ScaleLake <srcDir> <outDir> [replicas=10]`.
  */
object ScaleLake {

  private def replicate(s: SparkSession, df: DataFrame, k: Int)
                       (shift: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(r => shift(df, r)).reduce(_ unionByName _)

  /** max+1 of a key column — the per-replica shift stride. */
  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Graft.session("graft-scalelake")

    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    // fixed-cardinality dims: sf-independent, copy as-is
    write("region", t("region"), 1)
    write("nation", t("nation"), 1)

    val custK = stride(t("customer"), "c_custkey")
    val suppK = stride(t("supplier"), "s_suppkey")
    val partK = stride(t("part"), "p_partkey")
    val ordK  = stride(t("orders"), "o_orderkey")

    write("customer", replicate(spark, t("customer"), k) { (d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * custK)) }, 8)
    write("supplier", replicate(spark, t("supplier"), k) { (d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * suppK)) }, 2)
    write("part", replicate(spark, t("part"), k) { (d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * partK)) }, 8)
    write("orders", replicate(spark, t("orders"), k) { (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * ordK))
        .withColumn("o_custkey", col("o_custkey") + lit(r * custK)) }, 16)
    write("lineitem", replicate(spark, t("lineitem"), k) { (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * ordK))
        .withColumn("l_partkey", col("l_partkey") + lit(r * partK))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * suppK)) }, 32)

    val evK = stride(t("events"), "event_id")
    val usrK = stride(t("events"), "user_id")
    write("events", replicate(spark, t("events"), k) { (d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * evK))
        .withColumn("user_id", col("user_id") + lit(r * usrK)) }, 16)

    val docK = stride(t("documents"), "doc_id")
    write("documents", replicate(spark, t("documents"), k) { (d, r) =>
      val shifted = d.withColumn("doc_id", col("doc_id") + lit(r * docK))
      if (r == 0) shifted
      else shifted
        .withColumn("text", array_join(transform(split(col("text"), " "),
          tok => when(pmod(xxhash64(tok, lit(r)), lit(3)) === 0,
            concat(tok, lit(s"_r$r"))).otherwise(tok)), " "))
        .withColumn("n_chars", length(col("text")))
    }, 8)

    val vecK = stride(t("embeddings"), "vec_id")
    write("embeddings", replicate(spark, t("embeddings"), k) { (d, r) =>
      val shifted = d.withColumn("vec_id", col("vec_id") + lit(r * vecK))
      if (r == 0) shifted
      else {
        // rotate coordinates by r: slice(v, r+1, n-r) ++ slice(v, 1, r)
        val n = size(col("embedding"))
        shifted.withColumn("embedding",
          concat(slice(col("embedding"), lit(r + 1), n - lit(r)),
            slice(col("embedding"), lit(1), lit(r))))
      }
    }, 4)

    System.err.println(s"[scalelake] wrote ${k}x replica lake to $out")
    spark.stop()
  }
}
