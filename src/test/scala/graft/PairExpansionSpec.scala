package graft

import org.apache.spark.sql.functions._

/** r22 posting-list pair-expansion rewrites (the verified llm2b pattern
  * applied to the basket-pair family): agg20's collect_set + local a<b
  * expansion must emit EXACTLY the pair multiset of the former
  * distinct + self-join plan, and the graph family's co-purchase edge
  * memo (same rewrite) the same edge set — pinned here against the naive
  * form so later churn can't silently change what the queries compute. */
class PairExpansionSpec extends SparkSpec {

  test("agg20: collect_set pair expansion == naive distinct self-join") {
    val naive = {
      val op = Tables.lineitem(spark, Sf0001)
        .select("l_orderkey", "l_partkey").distinct()
      val a = op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      val b = op.select(col("l_orderkey"), col("l_partkey").as("part_b"))
      a.join(b, Seq("l_orderkey"))
        .filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_orders"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // the declared query top-20 is a subset; compare the FULL pair table
    // by re-deriving it the declared query's way
    val rewritten = Tables.lineitem(spark, Sf0001)
      .groupBy("l_orderkey").agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("part_a"), col("ps"))
      .select(col("part_a"), explode(col("ps")).as("part_b"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty, "fixture must produce co-purchase pairs")
    assert(rewritten === naive)
  }

  test("graph edge memo: collect_set expansion == naive basket self-join") {
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey").as("o"), col("l_partkey").cast("long").as("p"))
      .distinct()
    val naive = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("x"), col("b.p").as("y"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rewritten = Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey").cast("long")).as("ps"))
      .select(explode(col("ps")).as("x"), col("ps"))
      .select(col("x"), explode(col("ps")).as("y"))
      .filter(col("x") < col("y"))
      .select("x", "y").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture must produce co-purchase edges")
    assert(rewritten === naive)
  }
}
