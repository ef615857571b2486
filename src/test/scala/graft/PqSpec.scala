package graft

import org.apache.spark.sql.functions._

import graft.llm.LlmOps

/** LLM-28 product quantization: the no-oracle checks (rows-only in the
  * driver gate) — determinism, code-range sanity, Lloyd-step improvement,
  * and distortion strictly better than the k=1 (global mean) baseline. */
class PqSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, Sf0001)

  private def distortion(k: Int, rounds: Int = 1): Double = {
    val cb = LlmOps.pqTrain(emb, k = k, rounds = rounds)
    LlmOps.pqEncode(emb, cb)
      .agg(sum("recon_err")).collect()(0).getDouble(0)
  }

  test("codes are m=4 ints in [0,16) and errors are non-negative") {
    val enc = LlmOps.pqEncode(emb, LlmOps.pqTrain(emb)).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val parts = r.getAs[String]("codes").split(",")
      assert(parts.length == 4, s"expected 4 codes: ${r}")
      parts.foreach { c =>
        assert(c.toInt >= 0 && c.toInt < 16, s"code out of range: $c") }
      assert(r.getAs[Double]("recon_err") >= 0.0)
    }
  }

  test("encoding is bit-deterministic across independent runs") {
    def run() = LlmOps.pqEncode(emb, LlmOps.pqTrain(emb))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(run() == run())
  }

  test("one Lloyd round does not worsen total distortion") {
    assert(distortion(k = 16, rounds = 1) <= distortion(k = 16, rounds = 0))
  }

  test("k=16 codebook beats the k=1 global-mean baseline") {
    assert(distortion(k = 16) < distortion(k = 1))
  }

  test("ivfCentroids: starved cells carry forward — exactly k centroids " +
      "survive every round") {
    val s = spark
    import s.implicits._
    // pathological corpus: every vector identical, so each Lloyd round
    // ties on cosine and the tie-break routes ALL mass to one cell — the
    // other k−1 cells get no assignments. The per-round groupBy only
    // emits winning cells, so without the left-join carry-forward the
    // quantizer silently shrank to 1 centroid after round 1.
    val e = (0L until 16L)
      .map(i => (i, Array.fill(8)(1f)))
      .toDF("vec_id", "embedding")
    for (rounds <- Seq(1, 3)) {
      val cents = LlmOps.ivfCentroids(e, k = 4, rounds = rounds).collect()
      assert(cents.length === 4,
        s"rounds=$rounds: expected 4 centroids, got ${cents.length} — " +
          "starved cells must survive the round")
      assert(cents.map(_.getLong(0)).distinct.length === 4,
        s"rounds=$rounds: cent_ids must stay distinct")
      cents.foreach(r => assert(r.getSeq[Float](1).length === 8,
        "carried centroids keep their vector payload"))
    }
  }

  test("ADC top-20 recall vs exact L2 top-20") {
    val adc = SparkEntry.queries("llm28b_pq_adc")(spark, Sf0001)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val e = emb
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val exact = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("q_emb"), (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(20)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = adc.intersect(exact).size / 20.0
    info(s"ADC recall@20 = $recall")
    // measured 0.85 on this corpus (m=8, shortlist 100); floor = measured
    // − 0.1 margin (VERDICT r11 #3)
    assert(recall >= 0.75, s"ADC shortlist+rerank recall too low: $recall")
  }

  test("IVF-PQ top-20 recall vs exact L2 top-20") {
    val got = SparkEntry.queries("llm28c_ivfpq")(spark, Sf0001)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val e = emb
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val exact = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("q_emb"), (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(20)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = got.intersect(exact).size / 20.0
    info(s"IVF-PQ recall@20 = $recall")
    // measured 0.70 here (r15: 4 Lloyd rounds + nprobe=8/shortlist=200,
    // the AnnSweep knee — up from 0.55 at the old 1-round/4/100 settings);
    // below llm28b's 0.85 because the cell restriction still prunes
    // candidates (the IVF speed/recall dial); floor = measured − 0.1
    // margin (VERDICT r11 #3, production-credible per VERDICT r14 #3)
    assert(recall >= 0.6, s"IVF-PQ recall too low: $recall")
  }

  private def exactTop20: Set[Long] = {
    val e = emb
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("q_emb"), (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(20)
      .collect().map(_.getAs[Long]("vec_id")).toSet
  }

  test("llm28d: persisted cell-partitioned index returns llm28c's answer") {
    val inQuery = SparkEntry.queries("llm28c_ivfpq")(spark, Sf0001)
      .collect().map(_.toString).toSeq
    val persisted = SparkEntry.queries("llm28d_ivfpq_pruned")(spark, Sf0001)
      .collect().map(_.toString).toSeq
    // same training recipe, different storage — answers must be identical
    assert(persisted == inQuery)
  }

  test("llm28d: probe reads only the nprobe probed cell partitions") {
    val df = SparkEntry.queries("llm28d_ivfpq_pruned")(spark, Sf0001)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(finalPlan.toString.contains("PartitionFilters: [cell"),
      s"codes scan must carry a literal cell partition filter:\n$finalPlan")
    // AQE wraps materialized stages in QueryStageExec leaves; descend into them
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.flatMap {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/codes")) =>
        Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case _ => Nil
    }
    val codeScans = scans(finalPlan)
    assert(codeScans.nonEmpty, "probe must read the persisted codes store")
    // the "number of partitions read" driver metric, populated at execution
    val partsRead = codeScans.map(_.metrics("numPartitions").value).sum
    assert(partsRead > 0 && partsRead <= 8,
      s"nprobe=8 probe read $partsRead cell partitions")
  }

  test("llm28f: batch probe matches N sequential single probes") {
    val e = Tables.embeddings(spark, Sf0001)
    val batch = SparkEntry.queries("llm28f_ivfpq_batch")(spark, Sf0001)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("l2_dist")))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    assert(batch.keySet === (0L until 5L).toSet,
      s"expected 5 query groups, got ${batch.keySet}")
    // the memoized store llm28f probed (building it if this test runs first)
    val store = graft.llm.LlmOps.memoIvfpqStore(spark, Sf0001)
    for (q <- 0L until 5L) {
      val single = graft.llm.LlmOps.ivfpqProbe(
          e.filter(col("vec_id") === q), e.filter(col("vec_id") =!= 0), store)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("l2_dist")))
        .toSeq
      assert(batch(q) === single, s"query $q: batch diverges from single")
    }
    // self-retrieval sanity: index-member queries find themselves at 0
    for (q <- 1L until 5L)
      assert(batch(q).head === ((q, 0.0)), s"query $q must retrieve itself")
  }

  test("llm28f: one batch scan reads at most N*nprobe cell partitions") {
    val df = SparkEntry.queries("llm28f_ivfpq_batch")(spark, Sf0001)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(finalPlan.toString.contains("PartitionFilters: [cell"),
      s"codes scan must carry a literal cell partition filter:\n$finalPlan")
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.flatMap {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("/codes")) =>
        Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case _ => Nil
    }
    val codeScans = scans(finalPlan)
    assert(codeScans.length === 1,
      s"batch retrieval must read the codes store EXACTLY once, " +
        s"got ${codeScans.length} scans")
    val partsRead = codeScans.map(_.metrics("numPartitions").value).sum
    assert(partsRead > 0 && partsRead <= 5 * 8,
      s"5 queries at nprobe=8 read $partsRead cell partitions")
  }

  test("llm28e: residual encoding does not lose recall at equal nprobe") {
    val exact = exactTop20
    val base = SparkEntry.queries("llm28c_ivfpq")(spark, Sf0001)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val res = SparkEntry.queries("llm28e_ivfpq_residual")(spark, Sf0001)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val rBase = base.intersect(exact).size / 20.0
    val rRes = res.intersect(exact).size / 20.0
    info(s"recall@20: raw-encoded $rBase, residual-encoded $rRes")
    assert(rRes >= rBase,
      s"residual encoding lost recall: $rRes < $rBase")
    // absolute floor for the residual serve path: measured 0.75 at r15's
    // nprobe=8/shortlist=200 knee; floor = measured − 0.1 margin
    assert(rRes >= 0.65, s"residual IVF-PQ recall too low: $rRes")
  }
}
