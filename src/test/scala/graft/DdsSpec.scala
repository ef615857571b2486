package graft

import org.apache.spark.sql.functions._

/** AGG-23 — DDSketch quantile sketch contracts (DdSketch.scala):
  * the α relative-error guarantee on quantile VALUES, and the lossless /
  * canonical merge story (sketch(A⊎B) is BYTE-identical to merging part
  * sketches — the property that makes per-slice persisted sketches safe
  * to roll up in any order at 100 TB).
  */
class DdsSpec extends SparkSpec {

  import spark.implicits._

  private val alpha = 0.01

  test("agg23b: cdf tracks the exact share and inverts the quantile") {
    val sk = Tables.lineitem(spark, Sf0001)
      .agg(expr("dds_sketch_agg(l_extendedprice, 0.01)").as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val vals = Tables.lineitem(spark, Sf0001)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    val n = vals.length.toDouble
    // cdf vs the exact share: off by at most the mass of x's own bucket
    // (values within one 2% band of x) plus nothing else
    for (x <- Seq(10000.0, 30000.0, 55000.0)) {
      val est = graft.functions.DdSketch.cdf(sk, x)
      val exact = vals.count(_ <= x) / n
      assert(math.abs(est - exact) <= 0.02,
        s"cdf($x)=$est vs exact share $exact")
    }
    // inverse relation: the cdf at the q-quantile estimate recovers q up
    // to rank discretization + one bucket's mass
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val v = graft.functions.DdSketch.quantileValue(sk, q)
      val c = graft.functions.DdSketch.cdf(sk, v)
      assert(c >= q - 1e-9 && c - q <= 0.05, s"cdf(quantile($q))=$c")
    }
    // monotone in x
    val cs = Seq(1.0, 100.0, 10000.0, 1e6).map(graft.functions.DdSketch.cdf(sk, _))
    assert(cs == cs.sorted, s"cdf must be monotone: $cs")
  }

  test("agg23: sketch p50/p95 within alpha relative error of exact") {
    val exact = Tables.lineitem(spark, Sf0001)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val est = SparkEntry.queries("agg23_ddsketch_quantile")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(3), r.getDouble(5)))
      .toMap
    assert(exact.keySet === est.keySet)
    for ((k, ps) <- exact; (e, x) <- est(k).zip(ps)) {
      // α value-error guarantee + a hair for rank discretization (the
      // sketch's ⌊q·(n−1)⌋+1 rank vs percentile()'s interpolation) and
      // the 2 dp output rounding
      assert(math.abs(e - x) / x <= alpha + 0.005,
        s"group $k: dds $e vs exact $x")
    }
  }

  test("agg23: merge of part sketches is byte-identical to the whole") {
    val vals = (1 to 4000).map(i => (i % 7, math.exp(i % 97 / 10.0)))
      .toDF("part", "x")
    val whole = vals
      .agg(call_function("dds_sketch_agg", col("x"), lit(alpha)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    // per-part sketches persisted, then rolled up sketch-only — the agg21
    // rolling-HLL shape for quantiles; merge must be lossless AND
    // canonical (serialization sorted by bucket → byte equality, not just
    // estimate equality)
    val merged = vals
      .groupBy("part")
      .agg(call_function("dds_sketch_agg", col("x"), lit(alpha)).as("sk"))
      .agg(call_function("dds_merge_agg", col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, merged),
      "merged part sketches differ from the whole-data sketch")
  }

  test("agg23: sketch bytes are partitioning-invariant (canonical form)") {
    val vals = (1 to 2000).map(i => ((i * 37 % 1000) + 0.5)).toDF("x")
    def sketch(parts: Int): Array[Byte] = vals.repartition(parts)
      .agg(call_function("dds_sketch_agg", col("x"), lit(alpha)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sketch(1), sketch(8)),
      "sketch bytes depend on partitioning — canonical serialization broken")
  }

  test("agg23: zero/negative values rank below every positive bucket") {
    val vals = Seq(-3.0, 0.0, 1.0, 10.0, 100.0).toDF("x")
      .agg(call_function("dds_sketch_agg", col("x"), lit(alpha)).as("sk"))
      .select(
        call_function("dds_quantile_bucket", col("sk"), lit(0.0)).as("b0"),
        call_function("dds_quantile", col("sk"), lit(0.0)).as("v0"),
        call_function("dds_quantile", col("sk"), lit(1.0)).as("v1"))
      .collect()(0)
    assert(vals.getLong(0) === Long.MinValue) // zero bucket sentinel
    assert(vals.getDouble(1) === 0.0)
    assert(math.abs(vals.getDouble(2) - 100.0) / 100.0 <= alpha)
  }

  test("agg23: an all-NULL group yields NULL, not a crash (ADVICE r10)") {
    // DdsAgg skips NULLs but still emits a sketch for the group — the
    // scalar probes must return SQL NULL for that empty state instead of
    // failing the whole query
    val row = Seq[(Int, Option[Double])]((1, None), (1, None))
      .toDF("g", "x")
      .groupBy("g")
      .agg(call_function("dds_sketch_agg", col("x"), lit(alpha)).as("sk"))
      .select(
        call_function("dds_quantile_bucket", col("sk"), lit(0.5)).as("b"),
        call_function("dds_quantile", col("sk"), lit(0.5)).as("v"),
        call_function("dds_cdf", col("sk"), lit(10.0)).as("c"))
      .collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2),
      s"empty-sketch probes must be NULL, got $row")
  }

  test("agg23: alpha below the wire-format floor fails loudly") {
    // indices are Int on the wire; alpha < 1e-6 could overflow them —
    // the aggregate must reject it at construction, not wrap silently
    val ex = intercept[Exception] {
      Seq(1.0).toDF("x")
        .agg(call_function("dds_sketch_agg", col("x"), lit(1e-9)).as("sk"))
        .collect()
    }
    assert(ex.getMessage.contains("alpha"), s"unexpected: ${ex.getMessage}")
  }

  test("agg23: quantile estimates are monotone in q") {
    val sk = Tables.lineitem(spark, Sf0001)
      .agg(call_function("dds_sketch_agg", col("l_extendedprice"), lit(alpha))
        .as("sk"))
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val row = sk.select(qs.map(q =>
        call_function("dds_quantile", col("sk"), lit(q)).as(s"q$q")): _*)
      .collect()(0)
    val ests = qs.indices.map(row.getDouble)
    assert(ests === ests.sorted, s"non-monotone quantiles: $ests")
  }
}
