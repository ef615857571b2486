package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** GRAPH-1 PageRank: golden-graph values, rank-mass conservation, and
  * run-to-run determinism (the no-oracle checks behind graph1_pagerank). */
class GraphSpec extends SparkSpec {

  test("symmetric 3-cycle stays uniform at 1/3 per vertex") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val pr = GraphOps.pagerank(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, pr))
  }

  test("asymmetric golden graph matches the scalar reference iteration") {
    val s = spark
    import s.implicits._
    // a → b, a → c, b → c, c → a (unit weights)
    val edgeList = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
    val edges = edgeList.map { case (x, y) => (x, y, 1L) }.toDF("src", "dst", "w")
    val got = GraphOps.pagerank(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // same formula, plain Scala
    val d = 0.85; val n = 3
    var ref = Map("a" -> 1.0 / n, "b" -> 1.0 / n, "c" -> 1.0 / n)
    val out = Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0)
    for (_ <- 1 to 5) {
      val contrib = edgeList.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => ref(u) / out(u) }.sum }
      ref = ref.keys.map(v =>
        v -> ((1 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    ref.foreach { case (v, exp) =>
      assert(math.abs(got(v) - exp) < 1e-9, s"$v: got ${got(v)} exp $exp") }
  }

  test("in-degree-0 vertex keeps its teleport mass and keeps contributing") {
    val s = spark
    import s.implicits._
    // a → b, b → c, c → b: a receives NO contributions but must survive
    // every round at (1-d)/N and keep feeding b (the advisor's case).
    val edgeList = Seq(("a", "b"), ("b", "c"), ("c", "b"))
    val edges = edgeList.map { case (x, y) => (x, y, 1L) }.toDF("src", "dst", "w")
    val got = GraphOps.pagerank(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set("a", "b", "c"), got)
    val d = 0.85; val n = 3
    var ref = Map("a" -> 1.0 / n, "b" -> 1.0 / n, "c" -> 1.0 / n)
    for (_ <- 1 to 5) {
      val contrib = edgeList.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => ref(u) / 1.0 }.sum }
      ref = ref.keys.map(v =>
        v -> ((1 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    ref.foreach { case (v, exp) =>
      assert(math.abs(got(v) - exp) < 1e-9, s"$v: got ${got(v)} exp $exp") }
    assert(math.abs(got.values.sum - (ref("b") + ref("c") + (1 - d) / n)) < 1e-9)
  }

  test("dangling vertex redistributes its mass; Σpr stays 1") {
    val s = spark
    import s.implicits._
    // a → b, b → c; c has no out-edge (dangling) — its mass spreads
    // uniformly each round, so total rank mass must stay exactly 1.
    val edgeList = Seq(("a", "b"), ("b", "c"))
    val edges = edgeList.map { case (x, y) => (x, y, 1L) }.toDF("src", "dst", "w")
    val got = GraphOps.pagerank(edges, iters = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val d = 0.85; val n = 3
    var ref = Map("a" -> 1.0 / n, "b" -> 1.0 / n, "c" -> 1.0 / n)
    for (_ <- 1 to 6) {
      val dm = ref("c")
      val contrib = edgeList.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => ref(u) }.sum }
      ref = ref.keys.map(v =>
        v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    ref.foreach { case (v, exp) =>
      assert(math.abs(got(v) - exp) < 1e-9, s"$v: got ${got(v)} exp $exp") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass ${got.values.sum}")
  }

  test("iters=16 with a live dangling branch runs in bounded time") {
    val s = spark
    import s.implicits._
    // Regression guard for the round-9 exponential-plan bug: the dangling
    // branch references the previous round's pr TWICE, so without the
    // per-round checkpoint 16 lazy rounds build 2^16 subtree copies and
    // this test does not terminate. With O(1) plan depth it's seconds.
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val t0 = System.nanoTime()
    val got = GraphOps.pagerank(edges, iters = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60, f"16 dangling rounds took $secs%.1f s — plan growth?")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass ${got.values.sum}")
    // near the fixed point after 16 rounds: one more round moves ~nothing
    val next = GraphOps.pagerank(edges, iters = 17)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (v, p) => assert(math.abs(next(v) - p) < 1e-3, v) }
  }

  test("convergence tolerance stops the loop early") {
    val s = spark
    import s.implicits._
    // the symmetric cycle is ALREADY at its fixed point, so the first
    // delta check sees Σ|Δpr| = 0 and must stop at round `checkEvery`,
    // not run all 40.
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val (pr, rounds) =
      GraphOps.pagerankRounds(edges, iters = 40, tol = 1e-9, checkEvery = 2)
    assert(rounds == 2, s"expected early stop at round 2, ran $rounds")
    pr.collect().foreach(r => assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-9))
  }

  test("above-cap shuffle-join path matches the broadcast path " +
      "in bounded time (VERDICT r10 #2)") {
    val s = spark
    import s.implicits._
    // broadcastCap = 0 forces the >1M-vertex fallback (rank vector joins
    // by shuffle, never broadcast) — the plan a 1000-executor cluster runs
    // when the vertex table itself is cluster-sized. Dead code at test
    // scale unless forced, so a wrong plan there would be invisible.
    val edgeList = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("d", "a"), ("b", "d"))
    val edges = edgeList.map { case (x, y) => (x, y, 1L) }.toDF("src", "dst", "w")
    val t0 = System.nanoTime()
    val shuffled = GraphOps.pagerankRounds(edges, iters = 8, broadcastCap = 0L)
      ._1.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60, f"above-cap path took $secs%.1f s — plan growth?")
    val bcast = GraphOps.pagerankRounds(edges, iters = 8)
      ._1.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(shuffled.keySet === bcast.keySet)
    // DECIMAL rank-mass protocol makes both paths bit-deterministic — the
    // join strategy must not change a single rank
    shuffled.foreach { case (v, p) =>
      assert(p === bcast(v), s"$v: shuffle $p vs broadcast ${bcast(v)}") }
    assert(math.abs(shuffled.values.sum - 1.0) < 1e-9)
    // also exercise the dangling double-reference branch above the cap
    val dEdges = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val dGot = GraphOps.pagerankRounds(dEdges, iters = 6, broadcastCap = 0L)
      ._1.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dRef = GraphOps.pagerankRounds(dEdges, iters = 6)
      ._1.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dGot === dRef, "dangling graph diverges above the cap")
  }

  test("rank mass is conserved on the bidirected purchase graph") {
    val df = SparkEntry.queries("graph1_pagerank")(spark, Sf0001)
    // top-20 slice can't certify mass; recompute on the full rank vector
    val s = spark
    val ol = Tables.orders(s, Sf0001)
      .join(Tables.lineitem(s, Sf0001), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey")).agg(count(lit(1)).as("w"))
    val edges = ol.select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"), col("w"))
      .unionByName(ol.select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("c"), col("o_custkey")).as("dst"), col("w")))
    val mass = GraphOps.pagerank(edges)
      .agg(sum("pr")).collect()(0).getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass drifted: $mass")
    assert(df.collect().length == 20)
  }

  test("quantized integer pagerank tracks the double API within the " +
      "floor bound, and its mass stays within in-degree·iters units") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L),
      ("a", "c", 1L), ("c", "b", 2L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val exact = GraphOps.pagerankExactPpm(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dbl = GraphOps.pagerank(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet === dbl.keySet)
    exact.foreach { case (v, q) =>
      assert(math.abs(q / 1e12 - dbl(v)) < 1e-9,
        s"$v: quantized ${q / 1e12} vs double ${dbl(v)}") }
    // each floor discards < 1 unit per edge per round: Σpr ∈
    // (Scale - edges·iters - n, Scale]
    val mass = exact.values.sum
    assert(mass <= 1000000000000L && mass > 1000000000000L - 6 * 5 - 3,
      s"quantized mass $mass outside the floor bound")
  }

  test("ranking is deterministic across runs") {
    def run() = SparkEntry.queries("graph1_pagerank")(spark, Sf0001)
      .collect().map(_.toString).toSeq
    assert(run() == run())
  }

  test("sssp: relaxation finds the cheaper multi-hop path") {
    val s = spark
    import s.implicits._
    // 1→2 costs 10 direct, but 1→3→2 costs 1+2=3; relaxation must
    // overwrite the round-1 frontier value in a later round
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L))
      .toDF("src", "dst", "w")
    val got = GraphOps.sssp(edges, source = 1L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 3L, 3L -> 1L), got)
  }

  test("sssp: hop bound is the declared semantics") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L))
      .toDF("src", "dst", "w")
    // with only one hop allowed, the direct edge is the best ≤1-hop path
    val oneHop = GraphOps.sssp(edges, source = 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneHop === Map(1L -> 0L, 2L -> 10L, 3L -> 1L), oneHop)
  }

  test("sssp: unreachable vertices are absent; cycles terminate") {
    val s = spark
    import s.implicits._
    // a 3-ring reachable from the source plus a disconnected 2-ring;
    // the hop bound exceeds the cycle length, so the loop must not
    // revisit-and-grow (min() absorbs the lap) and 40/50 never appear
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L),
      (40L, 50L, 1L), (50L, 40L, 1L)).toDF("src", "dst", "w")
    val got = GraphOps.sssp(edges, source = 1L, maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L), got)
  }

  test("sssp: purchase-graph query is deterministic and hop-parity-sane") {
    val rows = SparkEntry.queries("graph2_sssp")(spark, Sf0001).collect()
    assert(rows.length == 30)
    // source c1 at dist 0; labels alternate parity with hop count, so any
    // supplier's dist is odd-hop reachable — spot-check the invariant that
    // dist is monotone down the sorted output
    assert(rows.head.getString(0) == "c1" && rows.head.getLong(1) == 0L)
    val dists = rows.map(_.getLong(1)).toSeq
    assert(dists == dists.sorted, "output must be ordered by dist")
    val rerun = SparkEntry.queries("graph2_sssp")(spark, Sf0001)
      .collect().map(_.toString).toSeq
    assert(rerun == rows.map(_.toString).toSeq)
  }

  test("triangles: K4 + pendant golden graph, both join strategies") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (4 triangles) plus pendant edge 4–5.
    // deg: 1,2,3→3; 4→4; 5→1. wedges = 3·3 + 6 + 0 = 15.
    // transitivity = 3·4/15 = 0.8.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("x", "y")
    def tris(cap: Long) =
      GraphOps.triangleRows(edges, broadcastCap = cap, edgeBroadcastCap = cap)
        .collect().map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    val exp = Seq(Set(1L, 2L, 3L), Set(1L, 2L, 4L), Set(1L, 3L, 4L),
      Set(2L, 3L, 4L))
    // each triangle enumerated exactly once, identically under the
    // broadcast-degree and shuffle-degree plans
    val bcast = tris(Long.MaxValue)
    val shuffled = tris(0L)
    assert(bcast.length == 4 && bcast.toSet === exp.toSet, bcast)
    assert(shuffled.length == 4 && shuffled.toSet === exp.toSet, shuffled)
  }

  test("triangle queries: golden stats + lcc on the K4+pendant graph") {
    // run the declared queries' arithmetic shape on the tiny graph by
    // checking the sf0.001 queries return sane, deterministic output
    val stats = SparkEntry.queries("graph3_triangle_stats")(spark, Sf0001)
      .collect()
    assert(stats.length == 1)
    val r = stats.head
    val (nv, ne, nw, nt) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nv > 0 && ne > 0 && nw >= ne && nt >= 0, r.toString)
    assert(r.getLong(4) == nt * 3000000L / nw, "transitivity_ppm formula")
    val lcc = SparkEntry.queries("graph3b_local_clustering")(spark, Sf0001)
      .collect()
    assert(lcc.length == 20)
    // ordered by tri desc; every lcc_ppm consistent with its own row
    val tris = lcc.map(_.getLong(2)).toSeq
    assert(tris == tris.sortBy(-_), "must be ordered by tri desc")
    lcc.foreach { row =>
      val (deg, tri, ppm) = (row.getLong(1), row.getLong(2), row.getLong(3))
      val expect = if (deg < 2) 0L else tri * 2000000L / (deg * (deg - 1))
      assert(ppm == expect, row.toString)
    }
    val rerun = SparkEntry.queries("graph3b_local_clustering")(spark, Sf0001)
      .collect().map(_.toString).toSeq
    assert(rerun == lcc.map(_.toString).toSeq, "lcc must be deterministic")
  }

  test("kcore: cascading peel converges to the dense core, both plans") {
    val s = spark
    import s.implicits._
    // triangle {1,2,3} (deg 2 in-core) + pendant path 3–4–5: peeling at
    // k=2 must CASCADE — 5 (deg 1) drops in round 1, which exposes 4
    // (deg 1 after losing 5) in round 2 — leaving exactly the triangle
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("x", "y")
    def core(cap: Long) = GraphOps.kcore(edges, k = 2, broadcastCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = Set((1L, 2L), (1L, 3L), (2L, 3L))
    assert(core(Long.MaxValue) === exp)
    assert(core(0L) === exp, "shuffle-join fallback must peel identically")
    // k above the max degree empties the graph without error
    assert(GraphOps.kcore(edges, k = 10).isEmpty)
    // declared query: one summary row, internally consistent
    val r = SparkEntry.queries("graph4_kcore")(spark, Sf0001).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 80L)
    val (nv, ne, md) = (r.head.getLong(1), r.head.getLong(2), r.head.getLong(3))
    assert(ne >= 0 && nv >= 0 && (nv == 0 || md >= 0), r.head.toString)
  }
}
