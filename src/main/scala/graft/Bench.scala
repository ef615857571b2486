package graft
/** Benchmark entrypoint: times every declared query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line for the driver (BENCH_rN.json).
  *
  * The driver parses that line out of a 2000-char stdout tail (BENCH_r03
  * recorded `parsed: null` because a full 114-query map overflowed the
  * window and was truncated mid-line). So the line is kept compact: totals,
  * a fixed headline-query map, and the 5 slowest; the complete per-query
  * timing map goes to target/bench_full.json and stderr instead.
  *
  * Uses Graft.session (single session factory — nanosAsLong/UTC/AQE apply).
  * Failures are recorded per-query as -1 and reported loudly on stderr; they
  * are excluded from the headline total so a half-broken run can't look fast
  * (VERDICT r02 item 6).
  */
object Bench {

  /** One representative query per operator family — stable across rounds so
    * BENCH_rN lines are comparable; everything else is in bench_full.json. */
  private val headline = Seq(
    "scan1_parquet", "sink3_partitioned", "filt2_range", "join3_left",
    "join11_bucketed", "agg1_count", "agg11_salted_skew", "win6_top1_per_group",
    "sort1_global_by_ts", "set1_union_distinct", "func_vector",
    "strm3_session", "llm1_exact_dedup", "llm2_minhash_lsh",
    "llm3_cosine_topk", "llm5_tfidf", "mig2_latest_wins", "mig4_qa_report",
    "mm1_media_catalog",
    // round-6 families (keys ADD to the line; earlier keys are unchanged
    // so cross-round diffs stay valid)
    "llm12_dup_clusters", "llm16_decontaminate", "strm12_neardup_ingest",
    // round-8 families
    "sql1_pricing_summary", "sql4_local_supplier", "agg14_grouping_sets",
    "llm20_boilerplate", "llm21b_embed_neardup_lsh", "prof1_table_stats",
    // round-8 analytics/retrieval/graph families
    "win9_sessionize", "dim2_pit_join", "llm27_bm25", "llm28b_pq_adc",
    "graph1_pagerank", "join14_dpp")

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("graft-bench")
    TmpStores.sweep() // leftover scratch stores from crashed JVMs
    // optional arg: comma-separated query names — bench only that subset
    // (iteration aid; the driver always runs the full set)
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names.contains(n) })
    // Per-query block hygiene (see BlockHygiene): drop each query's dead
    // localCheckpoint blocks so late-alphabet queries don't time under the
    // eviction+GC pressure of ~170 predecessors. Each query is an
    // independent measurement; the mig stage memo is pinned and survives.
    // median-of-3: this box swings ±25% on totals run-to-run (VERDICT r8
    // #2) — three runs and the median separates real plan regressions
    // from JIT/GC noise better than best-of-2's min. The first run still
    // pays codegen/JIT; the median discards it unless all runs agree.
    // The max−min SPREAD of the three rides along per query (r15 #7):
    // a cross-round mover whose spread swallows the delta is
    // environment, not plan — regressions become attributable without
    // re-timing.
    def measure(name: String,
                fn: (org.apache.spark.sql.SparkSession, String) =>
                  org.apache.spark.sql.DataFrame): (Double, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
        finally BlockHygiene.dropUnpinned(spark)
      }
      val r1 = once()
      val r2 = if (r1 < 0) -1.0 else once()
      val r3 = if (r2 < 0) -1.0 else once()
      val runs = Seq(r1, r2, r3)
      val sec = if (runs.exists(_ < 0)) -1.0 else runs.sorted.apply(1)
      // RAW max−min spread (the median does not sit at the midpoint of
      // the three runs, so a ± form would under-read drift)
      val spread = if (sec < 0) -1.0 else runs.max - runs.min
      (sec, spread)
    }
    val firstPass = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, spread) = measure(name, fn)
      System.err.println(f"[bench] $name%-28s ${if (sec >= 0) f"$sec%8.2f s (spread $spread%.2f)" else "FAILED"}")
      (name, sec, spread)
    }
    // Canary gate (r18, VERDICT r17 #7): the r15-r17 spread column
    // DIAGNOSED host noise after the fact; this acts on it before the
    // artifact is written. If the scan1_parquet canary (a pure parquet
    // count whose cost never changes round-to-round; idle-host floor
    // ~0.10 s at sf0.1, BENCH_NOTES) exceeds 2× its floor, or the
    // session's median relative spread exceeds 0.3, every spiked query
    // (rel-spread > 0.5) is re-measured with a fresh median-of-3 and the
    // CLEANER attempt — the one with the smaller spread, NOT the faster
    // one — replaces it. Picking by spread keeps the gate unbiased: a
    // genuinely slow plan re-times slow with a tight spread and stays.
    def medianRelSpread(rs: Seq[(String, Double, Double)]): Double = {
      val rel = rs.collect { case (_, v, sp) if v >= 0.05 => sp / v }.sorted
      if (rel.isEmpty) 0.0 else rel(rel.size / 2)
    }
    val canary = firstPass.collectFirst {
      case ("scan1_parquet", v, _) if v >= 0 => v }
    // the 0.20 s floor is 2× scan1's idle-host median at the driver's
    // bench SF (sf0.1, BENCH_NOTES); at any other SF the canary arm is
    // uncalibrated (never trips at tiny SFs, always trips at huge ones)
    // so only the noise arm gates there
    // exact final-segment match, not a suffix match: a lake named
    // /data/mysf0.1 must not activate the sf0.1-calibrated arm
    val canaryFloor =
      if (sfDir.stripSuffix("/").split('/').last == "sf0.1") Some(0.20)
      else None
    val gateTripped = canaryFloor.exists(f => canary.exists(_ > f)) ||
      medianRelSpread(firstPass) > 0.3
    val results = if (!gateTripped) firstPass else {
      System.err.println(
        "[bench] canary gate TRIPPED (" +
          canary.map(v => f"scan1 $v%.3f s").getOrElse("scan1 not in set") +
          f", noise ${medianRelSpread(firstPass)}%.3f) — re-measuring spiked queries")
      firstPass.map {
        case r @ (name, sec, spread) if sec >= 0.05 && spread / sec > 0.5 =>
          val (sec2, spread2) = measure(name, selected(name))
          val keep = if (sec2 >= 0 && spread2 < spread) (name, sec2, spread2)
                     else r
          System.err.println(f"[bench] $name%-28s re-measured " +
            f"${keep._2}%8.2f s (spread ${keep._3}%.2f; was $sec%.2f/$spread%.2f)")
          keep
        case r => r
      }
    }
    val nFail = results.count(_._2 < 0)
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    // one environment-drift scalar for the driver line: median relative
    // spread over queries big enough for the ratio to mean anything —
    // compare across rounds before reading anything into per-query deltas
    val relSpreads = results
      .collect { case (_, v, sp) if v >= 0.05 => sp / v }.sorted
    val noise =
      if (relSpreads.isEmpty) 0.0 else relSpreads(relSpreads.size / 2)
    def qmap(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")

    // Memo builds run inside some query's FIRST run and median-of-3
    // discards that run, so their cost is invisible to the per-query
    // medians (VERDICT r21 #5). Report each build and the total so
    // layout/memoization claims are falsifiable from the artifacts.
    // Keys ADD to the JSON lines; existing keys unchanged.
    val memoBuilds = StageMemo.buildSeconds(spark).sortBy(-_._2)
    memoBuilds.foreach { case (k, sec) =>
      System.err.println(f"[bench] memo build $k%-40s $sec%8.2f s") }
    val memoTotal = memoBuilds.map(_._2).sum
    System.err.println(f"[bench] memo build TOTAL (untimed by medians) $memoTotal%8.2f s")

    // full per-query map (+ per-query max−min spread) → file + stderr
    // (not the driver-parsed line)
    val medians = results.map { case (n, v, _) => n -> v }
    val spreads = results.map { case (n, _, sp) => n -> sp }
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qmap(medians)},"spread":${qmap(spreads)},"noise":${fmt(noise)},"memo_build_total":${fmt(memoTotal)},"memo_builds":${qmap(memoBuilds)},"n_queries":${results.size},"failed":$nFail,"sf":"$sfDir"}"""
    val out = new java.io.File("target/bench_full.json")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out)
    try w.println(fullJson) finally w.close()
    System.err.println(s"[bench] full per-query timings: $out")

    // failed headline queries stay in the map as -1 (excluded from the
    // total) so a cross-round diff reads "failed", not "not run" (ADVICE r4)
    val head = medians.filter(r => headline.contains(r._1))
    val slow = medians.filter(_._2 >= 0).sortBy(-_._2).take(5)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","noise":${fmt(noise)},"memo_build_total":${fmt(memoTotal)},"queries":${qmap(head)},"slowest":${qmap(slow)},"n_queries":${results.size},"failed":$nFail,"sf":"$sfDir"}""")
    if (nFail > 0)
      System.err.println(s"[bench] $nFail queries FAILED — see above")
    spark.stop()
  }
}
