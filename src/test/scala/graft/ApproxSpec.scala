package graft

import graft.llm.LlmOps
import org.apache.spark.sql.functions._

/** Bounded-error checks for the approximate operators that can't hash-match
  * a SQL oracle (VERDICT r02: agg6 / llm2c / llm3b / llm3d). */
class ApproxSpec extends SparkSpec {

  test("agg6: approx_count_distinct within 5% of exact") {
    val exact = Tables.orders(spark, Sf0001)
      .groupBy("o_orderstatus").agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("agg6_approx_count_distinct")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    for ((k, n) <- exact) {
      val a = approx(k).toDouble
      assert(math.abs(a - n) / n.max(1L) <= 0.05,
        s"status $k: approx $a vs exact $n")
    }
  }

  test("llm51 winnowing: HOF pipeline == scalar reference on random docs; " +
      "planted shared runs of ≥ k+w−1 words always share a fingerprint") {
    val s = spark
    import s.implicits._
    // scalar reference: the SIGMOD'03 selection computed independently
    // (MessageDigest md5, first 4 bytes unsigned == Spark's
    // conv(substring(hex,1,8),16,10))
    def refFps(text: String): Set[Long] = {
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 6) Set.empty
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hs = (0 to t.length - 3).map { i =>
          val dig = md.digest(t.slice(i, i + 3).mkString(" ")
            .getBytes("UTF-8"))
          ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
            ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        }
        (0 to hs.length - 4).map(j => hs.slice(j, j + 4).min).toSet
      }
    }
    val rnd = new scala.util.Random(4242)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    def randDoc(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // 20 random docs + 10 pairs with a planted shared run (length 6..15
    // — the guarantee threshold and above) at random offsets
    val base = (0 until 20).map(i => (i.toLong, randDoc(6 + rnd.nextInt(35))))
    val planted = (0 until 10).flatMap { p =>
      val run = randDoc(6 + rnd.nextInt(10))
      val ida = 100L + 2 * p; val idb = ida + 1
      Seq((ida, s"${randDoc(rnd.nextInt(8))} $run ${randDoc(rnd.nextInt(8))}"
            .trim),
          (idb, s"${randDoc(rnd.nextInt(8))} $run ${randDoc(rnd.nextInt(8))}"
            .trim))
    }
    val docs = (base ++ planted).toDF("doc_id", "text")
    val got = LlmOps.winnowFingerprints(docs)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // full equivalence vs the scalar reference, every doc
    for ((id, text) <- base ++ planted)
      assert(got.getOrElse(id, Set.empty) === refFps(text),
        s"doc $id fingerprints diverge from the scalar reference")
    // the winnowing guarantee: each planted pair shares ≥ 1 fingerprint
    for (p <- 0 until 10) {
      val (a, b) = (100L + 2 * p, 101L + 2 * p)
      assert(got(a).intersect(got(b)).nonEmpty,
        s"planted pair ($a,$b) must share a fingerprint")
    }
  }

  test("llm51 df cap: SIGMOD'03 guarantee survives under-cap runs — no " +
      "fingerprint in the gate corpus reaches the df_docs <= 1000 cap") {
    // llm51_winnowing drops fingerprints shared by > 1000 docs before the
    // pair join (the llm2e scale guard). The detection guarantee — any
    // shared run of ≥ k+w−1 words yields a shared fingerprint — is only
    // weakened for runs whose EVERY window minimum is boilerplate-hot;
    // this pins that the cap never binds on the gate corpus, so the
    // capped query is bit-identical to the uncapped SIGMOD'03 semantics
    // there (and the DuckDB oracle replays the cap verbatim regardless).
    val maxDf = LlmOps.winnowFingerprints(
        Tables.documents(spark, Sf0001))
      .groupBy("fp").agg(count(lit(1)).as("df_docs"))
      .agg(max("df_docs")).collect()(0).getLong(0)
    assert(maxDf <= 1000L,
      s"df cap binds at gate SF (max fingerprint df $maxDf > 1000): " +
        "the capped llm51 is no longer equivalent to uncapped winnowing " +
        "on this corpus — re-examine the cap or the corpus")
  }

  test("llm49 temperature mix: T=2 compresses shares toward uniform and " +
      "budgets never exceed the token pool") {
    val rows = SparkEntry.queries("llm49_temperature_mix")(
      spark, Sf0001).collect()
    val share = rows.map(_.getLong(2)); val temp = rows.map(_.getLong(3))
    // compression: the head source loses share, the tail gains
    assert(temp.max <= share.max && temp.min >= share.min,
      s"T=2 must compress: raw [${share.min},${share.max}] " +
        s"temp [${temp.min},${temp.max}]")
    // integer-floor normalization can undershoot but never overshoot
    val budgets = rows.map(_.getLong(4)).sum
    assert(budgets <= 100000L && budgets >= 100000L - rows.length,
      s"budgets sum $budgets out of [100000-n, 100000]")
  }

  test("agg15: approx percentile within 1% relative error of exact") {
    val exact = Tables.lineitem(spark, Sf0001)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = SparkEntry.queries("agg15_approx_percentile")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet === approx.keySet)
    for ((k, ps) <- exact; (e, a) <- ps.zip(approx(k)))
      assert(math.abs(a - e) / e <= 0.01, s"flag $k: approx $a vs exact $e")
  }

  test("agg16: HLL sketch estimates and their union track exact distincts") {
    val exactPer = Tables.customer(spark, Sf0001)
      .groupBy("c_nationkey").agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exactGlobal = Tables.customer(spark, Sf0001)
      .select("c_custkey").distinct().count()
    val rows = SparkEntry.queries("agg16_hll_sketch_union")(spark, Sf0001).collect()
    assert(rows.map(_.getInt(0)).toSet === exactPer.keySet)
    for (r <- rows) {
      val (k, est) = (r.getInt(0), r.getLong(1).toDouble)
      val n = exactPer(k).toDouble
      assert(math.abs(est - n) / n <= 0.05, s"nation $k: HLL $est vs exact $n")
      // the union of per-nation sketches must estimate the GLOBAL distinct
      // count without rescanning — the mergeability contract
      assert(math.abs(r.getLong(2) - exactGlobal).toDouble / exactGlobal <= 0.05,
        s"union estimate ${r.getLong(2)} vs exact $exactGlobal")
    }
  }

  test("llm2c: simhash hamming distance separates near-dups from background") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDup = base.replace("today", "tonight")
    val unrelated = "completely different words about spark clusters and parquet files everywhere"
    val (hb, hn, hu) = (LlmOps.simhashOf(base), LlmOps.simhashOf(nearDup),
      LlmOps.simhashOf(unrelated))
    assert(hamming(hb, hn) < hamming(hb, hu),
      s"near-dup distance ${hamming(hb, hn)} must be < unrelated ${hamming(hb, hu)}")
    assert(hamming(hb, hn) <= 16, "one-word edit should flip few bits")
    assert(LlmOps.simhashOf(base) === hb, "deterministic")
  }

  test("llm2c: native simhash64 kernel ≡ HOF formulation ≡ scalar " +
    "reference, on real documents") {
    // the declared query serves the NATIVE kernel (r20); the retained HOF
    // column and the scalar are the two independent references it must
    // match bit-for-bit
    val got = SparkEntry.queries("llm2c_simhash")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty && got.size === docs.length)
    docs.foreach { case (id, text) =>
      assert(got(id) === LlmOps.simhashOf(text),
        s"doc $id: native ${got(id)} vs scalar ${LlmOps.simhashOf(text)}")
    }
    val hof = Tables.documents(spark, Sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr(LlmOps.simhashCol).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hof === got, "HOF formulation drifted from the native kernel")
  }

  test("llm2c: native simhash64 ≡ scalar on adversarial strings " +
    "(unicode, multi-space, emoji, huge token)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val nasty = Seq(
      "", " ", "   ", "a", "a b", " a  b ", "中文 テキスト 테스트",
      "🙂 👍🏽 👨‍👩‍👧‍👦", "é é", "x" * 100000,
      ("tok " * 500).trim, "\t notsplit\ttab", "a,b;c a,b;c")
    val rows = nasty.toDF("text")
      .select(col("text"), expr("simhash64(text)").as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === LlmOps.simhashOf(r.getString(0)),
        s"native drifted on ${r.getString(0).take(40)}")
    }
    // NULL edge (ADVICE r20): the COLUMN contract is NULL in → NULL out
    // (null-intolerant expression, same as the HOF form); the scalar spec
    // simhashOf(null) returns 0L — documented divergence, pinned here.
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(expr("simhash64(text)").as("h")).collect()
    assert(nullRow(0).isNullAt(0), "simhash64(NULL) must be NULL")
    assert(LlmOps.simhashOf(null) === 0L,
      "scalar spec maps null to the empty fingerprint")
  }

  test("llm2d: lossless banding — band join equals brute-force pairs") {
    import org.apache.spark.sql.functions.{col, expr}
    val banded = SparkEntry.queries("llm2d_simhash_neardup")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sh = SparkEntry.queries("llm2c_simhash")(spark, Sf0001)
    val a = sh.select(col("doc_id").as("a_id"), col("simhash").as("a_sh"))
    val b = sh.select(col("doc_id").as("b_id"), col("simhash").as("b_sh"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("cast(bit_count(a_sh ^ b_sh) as int)").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // pigeonhole: 4 bands × 16 bits, threshold 3 → zero misses possible
    assert(banded === brute,
      s"banding must be lossless at k=3: missed ${brute -- banded}, " +
        s"extra ${banded -- brute}")
    assert(brute.nonEmpty, "corpus must contain hamming<=3 near-dups")
  }

  test("llm3b: ANN recall vs exact cosine top-20") {
    val exact = SparkEntry.queries("llm3_cosine_topk")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSet
    val ann = SparkEntry.queries("llm3b_ann_lsh")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // single-probe sign-LSH on 8 planes: modest recall expected, and the
    // result must be a strict subset of the candidate semantics (same
    // scoring) — every returned id that IS in the exact set must have the
    // same rank-order source
    assert(ann.nonEmpty, "ANN must return candidates")
    // measured 0.75 at sf0.001, 0.95 at sf0.01; floor leaves headroom for
    // regenerated testdata
    assert(recall >= 0.5, s"recall $recall below floor")
  }

  test("llm3d: bucketed pairwise LSH finds the dominant near-dup pairs") {
    val exact = SparkEntry.queries("llm3c_embed_pairs_topk")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("llm3d_embed_pairs_lsh")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    // measured 0.9 at sf0.001; floor leaves headroom
    assert(recall >= 0.6, s"pairwise recall $recall below floor")
  }

  test("llm21b: LSH near-dup drops a high-recall SUBSET of exact drops") {
    def drops(name: String) = SparkEntry.queries(name)(spark, Sf0001)
      .filter(!col("is_kept")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val exact = drops("llm21_embed_neardup")
    val lsh = drops("llm21b_embed_neardup_lsh")
    // precision is exactly 1 by construction: every LSH candidate pair is
    // re-verified with the same exact rounded cosine, so llm21b can only
    // drop ids llm21 also drops — never a false drop
    assert(lsh.subsetOf(exact), s"false drops: ${lsh -- exact}")
    assert(exact.nonEmpty, "fixture corpus must contain near-dups at τ=0.45")
    val recall = (exact & lsh).size.toDouble / exact.size
    // measured 1.0 at sf0.001 (8 tables × 3 planes, p≈0.92/pair); floor
    // leaves headroom for regenerated testdata
    assert(recall >= 0.5, s"drop recall $recall below floor")
  }

  test("llm44: SemDeDup cell-bucketed drops — sound subset, recall floor, " +
    "survivors pairwise below τ") {
    // measured at sf0.01, NOT the usual sf0.001: the smaller corpus has
    // only 7 τ=0.45 pairs and they are weak-similarity outliers (4 of 7
    // straddle even top-2 cosine cells — measured 0.43, a sampling
    // artifact, not the operator); at sf0.01 with the r17 fixed-16
    // quantizer all 14 exact pairs shared a posted cell (recall 1.0).
    // r18's √n-scaled shared quantizer (23 cells here) re-measured
    // 11/14 = 0.786 — the 3 lost pairs are weak-similarity boundary
    // pairs that no longer share a top-2 cell, the granularity trade
    // SemDeDup accepts by design (precision stays exactly 1 and the
    // survivors-pairwise-below-τ invariant below still pins soundness)
    val SfHere = "/root/testdata/sf0.01"
    def drops(name: String) = SparkEntry.queries(name)(spark, SfHere)
      .filter(!col("is_kept")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val exact = drops("llm21_embed_neardup")
    val sem = drops("llm44_semdedup")
    // precision is exactly 1 by construction: a within-cell pair at
    // cosine ≥ τ is a genuine near-dup pair, so llm44 can only drop ids
    // llm21 also drops
    assert(sem.subsetOf(exact), s"false drops: ${sem -- exact}")
    assert(exact.nonEmpty, "fixture corpus must contain near-dups at τ=0.45")
    val recall = (exact & sem).size.toDouble / exact.size
    info(s"SemDeDup drop recall = $recall")
    // floor = measured − margin: 0.786 measured under the √n-scaled
    // quantizer (r18), floored at 0.65 to keep the ~0.13 headroom the
    // convention gives regenerated testdata (the r18 0.7 floor had
    // thinned it to 0.086)
    assert(recall >= 0.65, s"drop recall $recall below floor")
    // the leader rule's invariant: two SURVIVING cell-mates are never at
    // cosine ≥ τ (the higher id would have been dropped) — pins the join
    // key and the keep/drop orientation, not just the recall
    val e = Tables.embeddings(spark, SfHere)
    val kept = SparkEntry.queries("llm44_semdedup")(spark, SfHere)
      .filter(col("is_kept")).select("vec_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("sim").desc, col("cent_id"))
    val cells = e.crossJoin(broadcast(
        LlmOps.ivfCentroids(e)))
      .withColumn("sim", call_function("cosine_sim",
        col("embedding"), col("cent")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2) // the query's top-2 cosine multi-assignment
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
      .join(kept, "vec_id")
    val survivorPairs = cells.select(col("cell"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"))
      .join(cells.select(col("cell"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb")), Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(round(call_function("cosine_sim",
        col("a_emb"), col("b_emb")), 6) >= 0.45)
      .count()
    assert(survivorPairs === 0L,
      s"$survivorPairs surviving within-cell pairs at cosine ≥ τ")
  }

  test("llm3e: IVF ANN recall vs exact cosine top-20") {
    val exact = SparkEntry.queries("llm3_cosine_topk")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSet
    val ivf = SparkEntry.queries("llm3e_ann_ivf")(spark, Sf0001)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@20 = $recall")
    assert(ivf.nonEmpty, "IVF must return candidates")
    // measured 0.75 at sf0.001 with r15's 4-Lloyd-round centroids and
    // nprobe=8 (was 0.6 at 1 round / nprobe=4); floor = measured − 0.1
    // margin (VERDICT r11 #3 — a slack floor lets a regression coast)
    assert(recall >= 0.65, s"IVF recall $recall below floor (nprobe=8 of 16)")
  }

  test("llm2b: hot-shingle df-cap is lossless here and actually prunes") {
    val docs = Tables.documents(spark, Sf0001)
    def pairs(cap: Int): Set[(Long, Long)] =
      LlmOps.ngramJaccardPairs(docs, threshold = 0.8, dfCap = cap)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(1000)            // the declared-query default
    val uncapped = pairs(Int.MaxValue)  // cap disabled
    assert(capped === uncapped,
      "default df-cap must not change the output on this corpus")
    assert(capped.nonEmpty, "corpus must contain near-dup pairs")
    // the cap must be wired into the plan, not decorative: with dfCap=1 only
    // doc-unique shingles survive, so no pair can share a shingle
    assert(pairs(1) === Set.empty[(Long, Long)],
      "dfCap=1 must prune every candidate pair")
    val plan = LlmOps.ngramJaccardPairs(docs, 0.8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("df_docs"), s"df filter missing from plan:\n$plan")
  }

  test("llm2b: df == dfCap boundary is inclusive (r21 pin)") {
    // Three identical docs share every shingle at document frequency
    // exactly 3: the posting-list expansion must KEEP a shingle at
    // df == dfCap (the filter is <=, and the collected posting array is
    // exactly dfCap long — the boundary r22 churn must not regress) and
    // prune it one below.
    import spark.implicits._
    val docs = Seq((0L, "w1 w2 w3 w4"), (1L, "w1 w2 w3 w4"),
        (2L, "w1 w2 w3 w4"))
      .toDF("doc_id", "text")
    def pairs(cap: Int): Set[(Long, Long)] =
      LlmOps.ngramJaccardPairs(docs, threshold = 0.9, dfCap = cap)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(3) === Set((0L, 1L), (0L, 2L), (1L, 2L)),
      "df == dfCap shingles must survive (inclusive cap)")
    assert(pairs(2) === Set.empty[(Long, Long)],
      "df == dfCap + 1 shingles must be pruned")
  }

  test("llm31: merged source signatures track exact source-level Jaccard") {
    import graft.llm.LlmOps
    val sh = Tables.documents(spark, Sf0001)
      .select(col("source"), explode(LlmOps.shingles3(col("text"))).as("g"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = sh.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._2).toSet }
    val est = SparkEntry.queries("llm31_source_overlap")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(est.nonEmpty)
    est.foreach { case (a, b, e) =>
      val (sa, sb) = (bySrc(a), bySrc(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      // k=128 lanes: σ = sqrt(J(1-J)/k) ≤ 0.045, allow ~3σ
      assert(math.abs(e - exact) <= 0.14,
        s"($a,$b): merged-sig estimate $e vs exact $exact")
    }
  }

  test("agg21: daily-sketch rolling union tracks exact 7-day distincts") {
    val rows = Tables.events(spark, Sf0001)
      .select(date_format(col("event_ts"), "yyyy-MM-dd").as("day"),
        col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val days = rows.map(_._1).distinct.sorted
    val exact = days.map { d =>
      val win = days.filter(x => x <= d).takeRight(7).toSet
      d -> rows.filter(r => win.contains(r._1)).map(_._2).distinct.length
    }.toMap
    val est = SparkEntry.queries("agg21_rolling_hll")(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    for ((d, n) <- exact)
      assert(math.abs(est(d) - n).toDouble / n <= 0.05,
        s"day $d: sketch ${est(d)} vs exact $n")
  }

  test("agg19: HLL inclusion–exclusion tracks the exact era overlap") {
    val o = Tables.orders(spark, Sf0001)
    val cut = to_timestamp(lit("1998-01-01"))
    val early = o.filter(col("o_orderdate") < cut).select("o_custkey").distinct()
    val late = o.filter(col("o_orderdate") >= cut).select("o_custkey").distinct()
    val exactOverlap = early.join(late, "o_custkey").count().toDouble
    val r = SparkEntry.queries("agg19_hll_intersection")(spark, Sf0001)
      .collect()(0)
    val est = r.getAs[Long]("est_overlap").toDouble
    // error compounds through |A|+|B|−|A∪B|: allow 3× the 5% base bound
    assert(math.abs(est - exactOverlap) / exactOverlap <= 0.15,
      s"overlap estimate $est vs exact $exactOverlap")
  }

  test("agg22: theta intersection beats inclusion–exclusion — ≤5% error") {
    val o = Tables.orders(spark, Sf0001)
    val cut = to_timestamp(lit("1998-01-01"))
    val early = o.filter(col("o_orderdate") < cut).select("o_custkey").distinct()
    val late = o.filter(col("o_orderdate") >= cut).select("o_custkey").distinct()
    val exactOverlap = early.join(late, "o_custkey").count().toDouble
    val r = SparkEntry.queries("agg22_theta_intersection")(spark, Sf0001)
      .collect()(0)
    assert(math.abs(r.getAs[Long]("est_early") - early.count()).toDouble /
      early.count() <= 0.05, "early-era estimate off")
    assert(math.abs(r.getAs[Long]("est_late") - late.count()).toDouble /
      late.count() <= 0.05, "late-era estimate off")
    val est = r.getAs[Long]("est_overlap").toDouble
    // direct sample intersection: 3× tighter than agg19's 15% incl-excl
    assert(math.abs(est - exactOverlap) / exactOverlap <= 0.05,
      s"overlap estimate $est vs exact $exactOverlap")
  }

  test("agg17b: CMS estimates bound the exact heavy-hitter counts") {
    val exact = SparkEntry.queries("agg17_heavy_hitters")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = SparkEntry.queries("agg17b_heavy_hitters_cms")(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "sf0.001 must contain >=45-frequency part keys")
    assert(est.keySet === exact.keySet)
    val n = Tables.lineitem(spark, Sf0001).count()
    for ((k, e) <- exact) {
      // CMS never underestimates; overestimate bounded by eps*N (w.h.p.)
      assert(est(k) >= e, s"key $k: CMS ${est(k)} under exact $e")
      assert(est(k) <= e + (0.001 * n).ceil.toLong,
        s"key $k: CMS ${est(k)} above exact $e + eps*N")
    }
  }

  test("prof2b: CMS inner product brackets the exact join cardinality") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, Sf0001)
    val a = li.filter(col("l_returnflag") === "R").select("l_partkey")
    val b = li.filter(col("l_returnflag") === "A").select("l_partkey")
    val exact = a.join(b, "l_partkey").count()
    val est = SparkEntry.queries("prof2b_join_cardinality_cms")(spark, Sf0001)
      .collect()(0).getLong(0)
    // lower bound is deterministic: colliding keys only ADD cross terms
    assert(est >= exact, s"CMS inner product $est under exact $exact")
    // upper bound holds with prob 1-e^-d; seed-fixed hashes make it a
    // deterministic outcome for this dataset
    val slack = (math.E / 2048 * a.count() * b.count()).ceil.toLong
    assert(est <= exact + slack, s"$est above $exact + $slack")
  }

  test("llm2: LSH near-dup output equals the exact all-pairs baseline") {
    // with b=32,r=4 and the corpus's bimodal jaccard the miss probability is
    // ~5e-8 — the LSH path must reproduce the exact result on sf0.001
    val lsh = SparkEntry.queries("llm2_minhash_lsh")(spark, Sf0001)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("llm2b_ngram_jaccard")(spark, Sf0001)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }

  test("agg28: bitmap distinct is partitioning-invariant and exact; " +
      "set algebra and domain guard behave") {
    val s = spark
    import s.implicits._
    val keys = Seq(1L, 5L, 5L, 64L, 65L, 100L, 1L, 200L)
    def card(df: org.apache.spark.sql.DataFrame): Long =
      df.selectExpr("bitmap_cardinality(bitmap_agg(k, 1024)) AS n")
        .head.getLong(0)
    val one = card(keys.toDF("k").coalesce(1))
    val many = card(keys.toDF("k").repartition(7))
    assert(one === keys.distinct.size.toLong && one === many,
      s"merge across partitions must equal single-pass: $one vs $many")
    // exact intersection on hand sets: {1,2,3} ∩ {2,3,4} = {2,3}
    val r = Seq((1L, "a"), (2L, "a"), (3L, "a"), (2L, "b"), (3L, "b"),
      (4L, "b")).toDF("k", "side")
      .selectExpr(
        "bitmap_agg(CASE WHEN side = 'a' THEN k END, 1024) AS ba",
        "bitmap_agg(CASE WHEN side = 'b' THEN k END, 1024) AS bb")
      .selectExpr("bitmap_and_cardinality(ba, bb) AS n").head.getLong(0)
    assert(r === 2L)
    // out-of-domain keys fail loudly, never silently drop
    val ex = intercept[Exception] {
      Seq(5000L).toDF("k")
        .selectExpr("bitmap_cardinality(bitmap_agg(k, 1024))").head
    }
    assert(ex.getMessage != null)
  }
}
