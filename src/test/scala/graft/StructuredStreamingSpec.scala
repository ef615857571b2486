package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** events-shaped record; ts in NANOS like the parquet table. Top-level so
  * Spark can derive an Encoder without an outer-instance scope. */
case class Ev(event_id: Long, user_id: Long, event_type: String,
              value: Double, ts: Long)

/** True incremental-execution coverage: MemoryStream → shared StreamOps
  * transforms → writeStream, with watermarks. This is what makes the
  * batch-replay STRM queries honest — the same functions run here as real
  * streams with state eviction and late-data drop. */
class StructuredStreamingSpec extends SparkSpec {

  private def nanosAt(minutes: Long): Long = minutes * 60L * 1000000000L

  test("tumbling agg stream: watermark drops late rows, emits closed windows") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val agg = StreamOps.tumblingAggStream(
      StreamOps.withEventTs(input.toDF()), "1 hour")
    val q = agg.writeStream.format("memory").queryName("tumbling_t")
      .outputMode("append").start()
    try {
      // batch 1: two rows in the 600-610min window, one at 720min that
      // advances the watermark to 660min after the batch
      input.addData(
        Ev(1, 1, "click", 1.0, nanosAt(600)),
        Ev(2, 1, "click", 2.0, nanosAt(605)),
        Ev(3, 2, "view", 3.0, nanosAt(720)))
      q.processAllAvailable()
      // batch 2: a row at 570min — behind the 660min watermark, its window
      // (570-580) is closed -> DROPPED, must not resurrect the window;
      // a row at 840min advances the watermark to 780min, closing 600+720
      input.addData(
        Ev(4, 1, "click", 99.0, nanosAt(570)),
        Ev(5, 2, "view", 4.0, nanosAt(840)))
      q.processAllAvailable()
      val rows = s.table("tumbling_t")
        .select("ws_us", "event_type", "n", "sum_value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      // emitted: the 600min window (n=2 — late row 4 NOT counted) and the
      // 720min window; the 570min window never appears; 840min still open
      assert(rows === Set(
        (nanosAt(600) / 1000, "click", 2L, 3.0),
        (nanosAt(720) / 1000, "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("dedup stream: duplicate ids within watermark collapse to one") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val deduped = StreamOps.dedupByIdStream(
      StreamOps.withEventTs(input.toDF()), "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      input.addData(Ev(1, 1, "click", 1.0, nanosAt(600)))
      q.processAllAvailable()
      // same event_id redelivered (at-least-once), plus a new one
      input.addData(Ev(1, 1, "click", 1.0, nanosAt(601)),
        Ev(2, 1, "view", 2.0, nanosAt(602)))
      q.processAllAvailable()
      val ids = s.table("dedup_t").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids === Array(1L, 2L))
    } finally q.stop()
  }

  test("windowed quantiles stream: sketch state accumulates across batches, " +
      "closed-window quantile == batch recompute on the union") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val agg = StreamOps.windowedQuantilesStream(
      StreamOps.withEventTs(input.toDF()), "1 hour")
    val q = agg.writeStream.format("memory").queryName("wq_t")
      .outputMode("append").start()
    // 10 values for the 600-660min window, deliberately SPLIT so the
    // sketch state must carry batch 1's rows into batch 2's fold
    val all = (1 to 10).map(i =>
      Ev(i.toLong, 1, "m", i * 1.5, nanosAt(600 + i % 30)))
    try {
      input.addData(all.take(4): _*)
      q.processAllAvailable()
      input.addData(all.drop(4): _*)
      q.processAllAvailable()
      // close the window: watermark needs an event past 660 + 1h
      input.addData(Ev(99, 9, "m", 1.0, nanosAt(800)))
      q.processAllAvailable()
      val emitted = s.table("wq_t")
        .filter($"ws_us" === nanosAt(600) / 1000)
        .select("n", "p50_bucket", "p50_est", "p95_bucket", "p95_est")
        .collect()
      assert(emitted.length === 1, "600min window must emit exactly once")
      // the incremental result must equal the one-shot batch aggregate of
      // the same rows — the mergeable-state guarantee, not a tolerance
      val batch = StreamOps.windowedQuantiles(
          StreamOps.withEventTs(all.toDF()))
        .filter($"ws_us" === nanosAt(600) / 1000)
        .select("n", "p50_bucket", "p50_est", "p95_bucket", "p95_est")
        .collect()
      assert(emitted.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("drift monitor stream: window×bucket state folds across batches; " +
      "finisher PSI == batch replay and flags the drifted hour") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val counts = StreamOps.windowedBucketCountsStream(
      StreamOps.withEventTs(input.toDF()), "1 hour")
    val q = counts.writeStream.format("memory").queryName("dm_t")
      .outputMode("append").start()
    // hour A (600min): values matching the reference spread; hour B
    // (660min): all mass herded into one bucket — the drifted hour.
    // Rows are SPLIT mid-window so bucket counters must merge batches.
    // hour A dominates the reference (40 spread rows vs 10 herded), so
    // the blended ref ≈ hour A's shape and hour B is the outlier
    val hourA = (1 to 40).map(i =>
      Ev(i.toLong, 1, "m", (i % 5) * 20.0 + 1.0, nanosAt(600 + i % 30)))
    val hourB = (1 to 10).map(i =>
      Ev(100 + i.toLong, 1, "m", 95.0, nanosAt(660 + i % 30)))
    val all = hourA ++ hourB
    try {
      input.addData(hourA.take(17) ++ hourB.take(4): _*)
      q.processAllAvailable()
      input.addData(hourA.drop(17) ++ hourB.drop(4): _*)
      q.processAllAvailable()
      input.addData(Ev(999, 9, "m", 1.0, nanosAt(900))) // close both
      q.processAllAvailable()
      val emitted = s.table("dm_t")
        .filter($"ws_us" < nanosAt(720) / 1000)
      // state half: closed-window bucket counts == one-shot batch agg
      val batchCounts = StreamOps.windowedBucketCounts(
        StreamOps.withEventTs(all.toDF()))
      assert(emitted.orderBy("ws_us", "bucket").collect().toSeq ===
        batchCounts.orderBy("ws_us", "bucket").collect().toSeq)
      // finisher over the streamed counts == finisher over batch counts,
      // and the herded hour B scores strictly higher drift than hour A
      val ref = all.toDF().groupBy(
          greatest(least(floor($"value" / 10.0), lit(9L)), lit(0L))
            .cast("long").as("bucket"))
        .agg(count(lit(1)).as("rc"))
      val psi = StreamOps.driftPsiFromCounts(s, emitted, ref)
        .collect().map(r => r.getLong(2 - 2) -> r.getDouble(2)).toMap
      val psiBatch = StreamOps.driftPsiFromCounts(s, batchCounts, ref)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(psi === psiBatch)
      val a = psi(nanosAt(600) / 1000); val b = psi(nanosAt(660) / 1000)
      assert(b > a && b > 0.25,
        s"herded hour must flag drift: psiA=$a psiB=$b")
    } finally q.stop()
  }

  test("windowed top-k stream: k-bounded counters emit at window close " +
      "with valid bounds; heavy key surfaces at rank 1 despite eviction") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    // k=4 < 7 distinct users in the window → eviction engages mid-stream
    val agg = StreamOps.windowedTopKStream(
      StreamOps.withEventTs(input.toDF()), k = 4, watermark = "1 hour")
    val q = agg.writeStream.format("memory").queryName("topk_t")
      .outputMode("append").start()
    // 20 events in the 600-660min window: user 1 ×12 (> 2N/k = 10 →
    // guaranteed present after any merge), user 2 ×4, user 3 ×2, 4/5 ×1
    val evs = (Seq.fill(12)(1L) ++ Seq.fill(4)(2L) ++ Seq.fill(2)(3L) ++
      Seq(4L, 5L)).zipWithIndex.map { case (u, i) =>
      Ev(i.toLong, u, "m", 1.0, nanosAt(600 + i % 30)) }
    val exact = evs.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    try {
      input.addData(evs.take(9): _*)
      q.processAllAvailable()
      assert(s.table("topk_t").count() === 0, "open window must not emit")
      input.addData(evs.drop(9): _*)
      q.processAllAvailable()
      input.addData(Ev(99, 9, "m", 1.0, nanosAt(800))) // close the window
      q.processAllAvailable()
      val rows = s.table("topk_t")
        .filter($"ws_us" === nanosAt(600) / 1000)
        .orderBy("rank")
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      assert(rows.nonEmpty && rows.length <= 4,
        s"at most k rows can come out of a k-counter summary: ${rows.toSeq}")
      for ((_, user, est, err) <- rows) {
        val t = exact.getOrElse(user, 0L)
        assert(est >= t, s"user $user: est $est under true $t")
        assert(est - err <= t, s"user $user: est-err ${est - err} over $t")
      }
      assert(rows.head._2 === 1L, s"heavy user must rank 1: ${rows.toSeq}")
    } finally q.stop()
  }

  test("transformWithState: the v2 state API reproduces STRM-8's running " +
      "counts exactly (RocksDB-backed ValueState across batches)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // RocksDB is the session DEFAULT provider (Graft.session) — TWS needs
    // it, and at scale every stateful op does; assert nothing overrode it
    assert(s.conf.get("spark.sql.streaming.stateStore.providerClass")
      .endsWith("RocksDBStateStoreProvider"),
      "Graft.session must default stateful streaming to RocksDB")
    val input = MemoryStream[StreamOps.UserEvent]
    val counts = StreamOps.userRunningCountsTws(input.toDS())
    val q = counts.toDF().writeStream.format("memory").queryName("tws_t")
      .outputMode("update").start()
    try {
      // same feed as the STRM-8 test — the two APIs must agree row-for-row
      input.addData(StreamOps.UserEvent(1, 1, 100),
        StreamOps.UserEvent(1, 2, 200), StreamOps.UserEvent(2, 3, 150))
      q.processAllAvailable()
      input.addData(StreamOps.UserEvent(1, 4, 300),
        StreamOps.UserEvent(2, 5, 120))
      q.processAllAvailable()
      val finalCounts = s.table("tws_t")
        .groupBy("user_id").agg(max("n").as("n"), max("last_us").as("last_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(finalCounts === Set((1L, 3L, 300L), (2L, 2L, 150L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState: running user counts accumulate across batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[StreamOps.UserEvent]
    val counts = StreamOps.userRunningCounts(input.toDS())
    val q = counts.toDF().writeStream.format("memory").queryName("state_t")
      .outputMode("update").start()
    try {
      input.addData(StreamOps.UserEvent(1, 1, 100), StreamOps.UserEvent(1, 2, 200),
        StreamOps.UserEvent(2, 3, 150))
      q.processAllAvailable()
      input.addData(StreamOps.UserEvent(1, 4, 300), StreamOps.UserEvent(2, 5, 120))
      q.processAllAvailable()
      // update mode: latest emission per user reflects accumulated state
      val finalCounts = s.table("state_t")
        .groupBy("user_id").agg(max("n").as("n"), max("last_us").as("last_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(finalCounts === Set((1L, 3L, 300L), (2L, 2L, 150L)))
    } finally q.stop()
  }

  test("EventTimeTimeout: per-user state evicted after TTL, counts restart") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[Ev]
    val counts = StreamOps.userRunningCountsTtl(
      StreamOps.withEventTs(input.toDF()), watermark = "10 minutes",
      ttlMinutes = 30)
    val q = counts.toDF().writeStream.format("memory").queryName("ttl_t")
      .outputMode("update").start()
    try {
      // user 1 active around t=600min; user 2 keeps the stream moving
      input.addData(Ev(1, 1, "click", 0, nanosAt(600)),
        Ev(2, 1, "click", 0, nanosAt(605)), Ev(3, 2, "view", 0, nanosAt(600)))
      q.processAllAvailable()
      // t=700min event advances the watermark to 690min — past user 1's
      // timeout (605 + 30 = 635min) → user 1 state removed
      input.addData(Ev(4, 2, "view", 0, nanosAt(700)))
      q.processAllAvailable()
      // user 1 returns: state must have restarted, NOT continued at 3
      input.addData(Ev(5, 1, "click", 0, nanosAt(701)))
      q.processAllAvailable()
      val u1 = s.table("ttl_t").filter(col("user_id") === 1)
        .select("n", "last_us").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(u1.contains((1L, nanosAt(701) / 1000)),
        s"expected restarted count 1 after eviction, got $u1")
      assert(!u1.exists(_._1 == 3L),
        s"state must not survive the TTL: $u1")
    } finally q.stop()
  }

  test("stream-stream interval join: purchases within 30min of a click") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = StreamOps.clickToPurchase(
      StreamOps.withEventTs(clicks.toDF()),
      StreamOps.withEventTs(purchases.toDF()))
    val q = joined.writeStream.format("memory").queryName("ssj_t")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(10, 1, "click", 0, nanosAt(600)),
        Ev(11, 2, "click", 0, nanosAt(600)))
      purchases.addData(
        Ev(20, 1, "purchase", 5, nanosAt(620)),   // within 30min → match
        Ev(21, 2, "purchase", 5, nanosAt(640)),   // 40min later → no match
        Ev(22, 1, "purchase", 5, nanosAt(590)))   // before click → no match
      q.processAllAvailable()
      val rows = s.table("ssj_t")
        .select("user_id", "click_id", "purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set((1L, 10L, 20L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: unmatched click emits null after watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = StreamOps.clickToPurchaseOuter(
      StreamOps.withEventTs(clicks.toDF()),
      StreamOps.withEventTs(purchases.toDF()))
    val q = joined.writeStream.format("memory").queryName("ssoj_t")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(10, 1, "click", 0, nanosAt(600)),
        Ev(11, 2, "click", 0, nanosAt(600)))
      purchases.addData(Ev(20, 1, "purchase", 5, nanosAt(620)))
      q.processAllAvailable()
      def rows() = s.table("ssoj_t")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))).toSet
      // user 1 matched; user 2's click CANNOT emit yet — a purchase at
      // t∈[600, 630) could still arrive, so it waits in state
      assert(rows() === Set((1L, 10L, Some(20L), true)),
        s"premature outer emission: ${rows()}")
      // advance both watermarks past 630 + 10min delay → click 11 provably
      // unmatchable → null row flushes
      clicks.addData(Ev(12, 9, "click", 0, nanosAt(700)))
      purchases.addData(Ev(21, 9, "purchase", 5, nanosAt(700)))
      q.processAllAvailable()
      clicks.addData(Ev(13, 9, "click", 0, nanosAt(701)))
      purchases.addData(Ev(22, 9, "purchase", 5, nanosAt(701)))
      q.processAllAvailable()
      assert(rows().contains((2L, 11L, None, false)),
        s"unmatched click never emitted: ${rows()}")
    } finally q.stop()
  }

  test("foreachBatch upsert stream == batch latest-wins on the same events") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val stateDir = s"$tmp/state"
    val ckDir = s"$tmp/ck"
    val all = Seq(
      Ev(1, 1, "click", 1.0, nanosAt(600)),
      Ev(2, 1, "purchase", 9.0, nanosAt(650)),   // user 1 latest
      Ev(3, 2, "view", 2.0, nanosAt(640)),
      Ev(4, 2, "view", 3.0, nanosAt(620)),       // older than 3
      Ev(5, 3, "signup", 0.0, nanosAt(700)))
    val input = MemoryStream[Ev]
    input.addData(all.take(2): _*)
    StreamOps.runUpsertStream(s, input.toDF(), stateDir, ckDir)
    input.addData(all.drop(2): _*)
    StreamOps.runUpsertStream(s, input.toDF(), stateDir, ckDir)

    val streamed = StreamOps.upsertState(s, stateDir)
      .select("user_id", "last_type", "last_value", "last_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    // each micro-batch committed one atomic version; the first batch's
    // state (users 1-2 only, pre-merge) is still readable = time travel
    val vs = graft.operators.VersionedStore.versions(stateDir)
    assert(vs.size === 2, s"one version per micro-batch, got $vs")
    val v1Users = graft.operators.VersionedStore.read(s, stateDir, vs.head)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(v1Users === Set(1L))
    val batch = StreamOps.latestByUser(all.toDF())
      .select("user_id", "last_type", "last_value", "last_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(streamed === batch)
    assert(streamed === Set(
      (1L, "purchase", 9.0, nanosAt(650) / 1000),
      (2L, "view", 2.0, nanosAt(640) / 1000),
      (3L, "signup", 0.0, nanosAt(700) / 1000)))
  }

  test("materialized agg view stream: CDC deletes/updates maintain the " +
      "stored aggregate exactly; zeroed groups vanish") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-mav").toString
    val input = MemoryStream[(String, String, Double)]
    def run() = StreamOps.runMaterializedAggStream(
      input.toDF().toDF("_change_type", "g", "v"),
      s"$tmp/state", s"$tmp/ck", "g", "v")
    // batch 1: plain inserts
    input.addData(("insert", "a", 10.0), ("insert", "a", 5.0),
      ("insert", "b", 7.0))
    run()
    // batch 2: delete one of a's rows, reprice the other (pre+post pair),
    // and delete b entirely — the update/delete path strm6/15 cannot take
    input.addData(("delete", "a", 10.0),
      ("update_preimage", "a", 5.0), ("update_postimage", "a", 8.0),
      ("delete", "b", 7.0))
    run()
    val got = graft.operators.VersionedStore.read(s, s"$tmp/state")
      .select(col("g"), col("n"), col("sum_dec").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // net rows: a → {8.0}; b → gone (absent, not a zero row)
    assert(got === Set(("a", 1L, 8.0)), got)
    // each micro-batch committed one atomic version; batch-1 state is
    // still readable (time travel) and shows the pre-churn aggregate
    val vs = graft.operators.VersionedStore.versions(s"$tmp/state")
    assert(vs.size === 2, s"one version per micro-batch, got $vs")
    val v1 = graft.operators.VersionedStore.read(s, s"$tmp/state", vs.head)
      .select(col("g"), col("n"), col("sum_dec").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(v1 === Set(("a", 2L, 15.0), ("b", 1L, 7.0)), v1)
  }

  test("materialized join view stream: two-sided CDC maintains the view " +
      "exactly; a late dim insert resurrects earlier fact rows") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-mjv").toString
    // tagged CDC rows — None for the other table's columns
    val input = MemoryStream[Cdc]
    def o(ct: String, k: Long, c: Long, p: Double) =
      Cdc("orders", ct, Some(k), Some(c), Some(p), None, None)
    def c(ct: String, k: Long, seg: String) =
      Cdc("customer", ct, None, None, None, Some(k), Some(seg))
    def run() = StreamOps.runMaterializedJoinStream(
      input.toDF(), s"$tmp/view", s"$tmp/orders", s"$tmp/cust", s"$tmp/ck")
    def view(): Set[(Long, Long, Double, String)] =
      graft.operators.VersionedStore.read(s, s"$tmp/view")
        .collect().map(r => (r.getAs[Long]("o_orderkey"),
          r.getAs[Long]("o_custkey"), r.getAs[Double]("o_totalprice"),
          r.getAs[String]("c_mktsegment"))).toSet
    // batch 1: two orders for cust 1 (exists), one for cust 2 (does NOT
    // exist yet — the inner view must not contain it)
    input.addData(
      o("insert", 101L, 1L, 10.0),
      o("insert", 102L, 1L, 20.0),
      o("insert", 103L, 2L, 30.0),
      c("insert", 1L, "AUTO"))
    run()
    assert(view() === Set((101L, 1L, 10.0, "AUTO"), (102L, 1L, 20.0, "AUTO")))
    // batch 2: cust 2 appears — order 103, streamed a batch AGO, must
    // surface (the O_old re-probe the view alone cannot serve); cust 1
    // re-segments; order 102 is deleted
    input.addData(
      c("insert", 2L, "BIKE"),
      c("update_preimage", 1L, "AUTO"),
      c("update_postimage", 1L, "MOTO"),
      o("delete", 102L, 1L, 20.0))
    run()
    assert(view() === Set((101L, 1L, 10.0, "MOTO"), (103L, 2L, 30.0, "BIKE")))
    // batch 3: cust 1 leaves entirely — its fact rows drop from the view
    input.addData(c("delete", 1L, "MOTO"))
    run()
    assert(view() === Set((103L, 2L, 30.0, "BIKE")))
    // the maintained view equals a from-scratch join of the shadow bases
    val recomputed = graft.operators.VersionedStore
      .read(s, s"$tmp/orders")
      .join(graft.operators.VersionedStore.read(s, s"$tmp/cust"),
        col("o_custkey") === col("c_custkey"))
      .collect().map(r => (r.getAs[Long]("o_orderkey"),
        r.getAs[Long]("o_custkey"), r.getAs[Double]("o_totalprice"),
        r.getAs[String]("c_mktsegment"))).toSet
    assert(view() === recomputed)
  }

  test("materialized top-k view stream: cross-batch successor promotion " +
      "from the persisted support table") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-mtk").toString
    val input = MemoryStream[(String, String, Long, Double)]
    def run() = StreamOps.runMaterializedTopKStream(
      input.toDF().toDF("_change_type", "g", "m", "v"),
      s"$tmp/view", s"$tmp/sup", s"$tmp/ck", "g", "m", "v", k = 2)
    def view(): Set[(String, Int, Long, String)] =
      graft.operators.VersionedStore.read(s, s"$tmp/view")
        .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("rnk"),
          r.getAs[Long]("m"), r.getAs[java.math.BigDecimal]("sum_dec")
            .toPlainString)).toSet
    // batch 1: g1 has three members (30, 20, 10) — view holds top-2;
    // member 3 exists ONLY in the support store
    input.addData(("insert", "g1", 1L, 30.0), ("insert", "g1", 2L, 20.0),
      ("insert", "g1", 3L, 10.0), ("insert", "g2", 9L, 7.0))
    run()
    assert(view() === Set(("g1", 1, 1L, "30.00"), ("g1", 2, 2L, "20.00"),
      ("g2", 1, 9L, "7.00")))
    // batch 2: delete g1's #2 — member 3, never in any committed view,
    // must be promoted from the support store; g2 is untouched
    input.addData(("delete", "g1", 2L, 20.0))
    run()
    assert(view() === Set(("g1", 1, 1L, "30.00"), ("g1", 2, 3L, "10.00"),
      ("g2", 1, 9L, "7.00")))
    // batch 3: score churn re-ranks g1 (member 3 overtakes member 1)
    input.addData(("insert", "g1", 3L, 25.0))
    run()
    assert(view() === Set(("g1", 1, 3L, "35.00"), ("g1", 2, 1L, "30.00"),
      ("g2", 1, 9L, "7.00")))
    // per-batch time travel: batch-1 view is still readable
    val vs = graft.operators.VersionedStore.versions(s"$tmp/view")
    assert(vs.size === 3, s"one version per micro-batch, got $vs")
    val v1 = graft.operators.VersionedStore
      .read(s, s"$tmp/view", vs.head)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("rnk"),
        r.getAs[Long]("m"))).toSet
    assert(v1 === Set(("g1", 1, 1L), ("g1", 2, 2L), ("g2", 1, 9L)))
    // exactly-once under at-least-once replay: every committed version is
    // txn-tagged with (appId, batchId), and re-applying an already-seen
    // batchId is a no-op (Left) that commits nothing — the crash-replay
    // path foreachBatch owes the state stores
    val appId = StreamOps.txnAppId(s"$tmp/view")
    val hist = graft.operators.VersionedStore.history(s, s"$tmp/view")
      .collect().map(_.getAs[String]("txn"))
    assert(hist.forall(t => t != null && t.startsWith(s"txn=$appId=")),
      s"every stream commit must carry the txn tag: ${hist.toSeq}")
    import s.implicits._
    val replay = graft.operators.VersionedStore.commitTxn(
      Seq(("gX", 0, 0L, new java.math.BigDecimal("1.00")))
        .toDF("g", "rnk", "m", "sum_dec"),
      s"$tmp/view", appId, 1L)
    assert(replay.isLeft, "replayed batchId must be skipped")
    assert(graft.operators.VersionedStore.versions(s"$tmp/view").size === 3,
      "replay must not create a version")
    assert(view().exists(_._1 == "g1"), "state untouched by the replay")
  }

  test("incremental corpus dedup: history and in-stream dupes drop, new docs pass") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val history = Seq((100L, "old news"), (101L, "stale doc"))
      .toDF("doc_id", "text")
      .select(sha2(col("text").cast("binary"), 256).as("h")).distinct()
    val input = MemoryStream[Doc]
    val q = StreamOps.dedupAgainstCorpus(input.toDF(), history)
      .writeStream.format("memory").queryName("incdedup_t")
      .outputMode("append").start()
    try {
      // batch 1: one history dupe (dropped), one in-batch dupe pair
      // (collapses to one), one fresh doc
      input.addData(Doc(1, "old news"), Doc(2, "fresh a"),
        Doc(3, "fresh a"), Doc(4, "fresh b"))
      q.processAllAvailable()
      // batch 2: a CROSS-batch dupe of "fresh a" (dedup state must
      // remember it), another history dupe, and one new doc
      input.addData(Doc(5, "fresh a"), Doc(6, "stale doc"),
        Doc(7, "fresh c"))
      q.processAllAvailable()
      val survived = s.table("incdedup_t")
        .select("text").collect().map(_.getString(0)).toSet
      assert(survived === Set("fresh a", "fresh b", "fresh c"))
    } finally q.stop()
  }

  test("near-dup ingest: persisted LSH index flags cross-batch near-dups") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    import graft.operators.VersionedStore
    val root = java.nio.file.Files
      .createTempDirectory("neardup-ingest").toString
    // ~40-word docs: near-dup differs in ONE word (3-gram J ~ 0.92),
    // distinct docs share nothing
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i")
      .mkString(" ")
    val other = (1 to 40).map(i => s"alt$i").mkString(" ")
    val input = MemoryStream[Doc]
    // batch 1 indexes docs 1-2; batch 2 brings a near-dup of doc 1, a
    // distinct doc, and nothing resembling doc 2
    input.addData(Doc(1, base), Doc(2, other))
    StreamOps.runNearDupIngest(input.toDF(), s"$root/index", s"$root/hits",
      s"$root/ckpt")
    input.addData(Doc(3, nearDup), Doc(4, (1 to 40).map(i => s"new$i").mkString(" ")))
    StreamOps.runNearDupIngest(input.toDF(), s"$root/index", s"$root/hits",
      s"$root/ckpt")
    val hits = s.read.parquet(s"$root/hits")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits === Set((3L, 1L)), "only the near-dup of doc 1 flags")
    // the index now holds band rows for all four docs (one version live)
    val idxDocs = VersionedStore.read(s, s"$root/index")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxDocs === Set(1L, 2L, 3L, 4L))
  }

  test("strm14: AvailableNow file ingest resumes from the checkpoint — " +
       "only files landed since are processed") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("file-ingest").toString
    val (src, ckpt, out) = (s"$root/src", s"$root/ckpt", s"$root/out")
    val schema = Seq((1L, "a")).toDF("id", "v").schema
    // backlog batch: ids 1-3 land
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("append").parquet(src)
    StreamOps.fileIngestAvailableNow(s, src, ckpt, out, schema)
    assert(s.read.schema(schema).parquet(out).count() === 3)
    // second run with NO new files: a no-op, nothing reprocessed
    StreamOps.fileIngestAvailableNow(s, src, ckpt, out, schema)
    assert(s.read.schema(schema).parquet(out).count() === 3)
    // two more files land; resume processes exactly those
    Seq((4L, "d"), (5L, "e")).toDF("id", "v")
      .write.mode("append").parquet(src)
    StreamOps.fileIngestAvailableNow(s, src, ckpt, out, schema)
    val ids = s.read.schema(schema).parquet(out)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids === Array(1L, 2L, 3L, 4L, 5L),
      "each row ingested exactly once across resumed runs")
  }

  test("strm22: streaming IVF-PQ maintenance — cross-batch vectors " +
      "retrievable, codes bit-parity with a full rebuild, replay no-op, " +
      "re-embeds upsert") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    import graft.operators.VersionedStore
    import graft.llm.LlmOps
    val root = java.nio.file.Files
      .createTempDirectory("strm22-spec").toString
    val e = Tables.embeddings(s, Sf0001).select("vec_id", "embedding")
    val hist = e.filter(col("vec_id") % 4 === 0 && col("vec_id") =!= 0)
    val arrivals = e.filter(col("vec_id") % 4 =!= 0 && col("vec_id") =!= 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (store, codesDir) = (s"$root/store", s"$root/codes")
    LlmOps.ivfpqBuild(train = e, index = hist, store = store)
    VersionedStore.commitTxn(s.read.parquet(s"$store/codes"), codesDir,
      "boot", 0L, partitionBy = Seq("cell"))
    // arrivals stream in as TWO MemoryStream micro-batches
    val input = MemoryStream[(Long, Array[Float])]
    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    input.addData(b1.toSeq)
    StreamOps.runIvfpqIngestStream(
      input.toDF().toDF("vec_id", "embedding"), store, codesDir,
      s"$root/ckpt", appId = "strm22t")
    input.addData(b2.toSeq)
    StreamOps.runIvfpqIngestStream(
      input.toDF().toDF("vec_id", "embedding"), store, codesDir,
      s"$root/ckpt", appId = "strm22t")
    // cross-batch retrievability: probing with a batch-2 vector's own
    // embedding returns that vector first (its cell is certainly probed,
    // exact re-rank puts distance 0 on top)
    val probeVec = b2.head._1
    val got = LlmOps.ivfpqProbe(e.filter(col("vec_id") === probeVec), e,
        store, codes0 = Some(VersionedStore.read(s, codesDir)))
      .collect().map(_.getLong(0))
    assert(got.head === probeVec,
      s"batch-2 vector $probeVec must be retrievable, got ${got.head}")
    // bit-parity with a train-once full rebuild against the SAME stored
    // artifacts: identical (vec_id, sub, code, cell) sets
    val store2 = s"$root/store2"
    LlmOps.ivfpqBuild(train = e,
      index = hist.unionByName(
        e.filter(col("vec_id") % 4 =!= 0 && col("vec_id") =!= 0)),
      store = store2,
      cents0 = Some(s.read.parquet(s"$store/centroids")),
      codebook0 = Some(s.read.parquet(s"$store/codebook")))
    def codeSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id").cast("long"), col("sub").cast("int"),
        col("code").cast("int"), col("cell").cast("long"))
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val maintained = codeSet(VersionedStore.read(s, codesDir))
    val rebuilt = codeSet(s.read.parquet(s"$store2/codes"))
    assert(maintained === rebuilt,
      "streamed snapshot must equal the full rebuild bit-for-bit")
    // crash-replay of the last committed batch: txn-tag no-op, no version
    val last = VersionedStore.lastTxn(codesDir, "strm22t").get
    val nVersions = VersionedStore.versions(codesDir).size
    val replay = StreamOps.ivfpqIngestBatch(
      b2.toSeq.toDF("vec_id", "embedding"), store, codesDir,
      "strm22t", batchId = last)
    assert(replay.isLeft && VersionedStore.versions(codesDir).size ===
      nVersions, "replayed batch must not commit")
    // a re-embedded vector UPSERTS: still one row per (vec, sub), and its
    // codes now encode the new embedding
    val (rid, rvec) = b1.head
    val shifted = rvec.map(v => -v)
    StreamOps.ivfpqIngestBatch(Seq((rid, shifted)).toDF("vec_id", "embedding"),
      store, codesDir, "strm22t", batchId = last + 1)
    val after = VersionedStore.read(s, codesDir)
    assert(after.groupBy("vec_id").count()
      .filter(col("count") =!= 8).isEmpty, "one row per (vec, sub) per m=8")
    val freshCodes = codeSet(after.filter(col("vec_id") === rid))
    assert(freshCodes !== maintained.filter(_._1 == rid),
      "re-embedded vector's codes must change")
  }
  test("strm22 drift retrain: skewed ingest trips the imbalance trigger; " +
      "the generation swap preserves full-probe parity, loses no ingested " +
      "vector, and keeps pre-swap replay a txn no-op") {
    val s = spark
    import s.implicits._
    import graft.operators.VersionedStore
    import graft.llm.LlmOps
    val root = java.nio.file.Files
      .createTempDirectory("strm22-drift").toString
    val (store, codesDir) = (s"$root/store", s"$root/codes")
    // bootstrap corpus: 32 one-hot vectors spread over dims 0..15 — the
    // trained centroids tile that subspace
    def oneHot(d: Int, mag: Float) =
      Array.tabulate(64)(j => if (j == d) mag else 0f)
    val hist = (1L to 32L).map(i =>
      (i, oneHot((i % 16).toInt, 1f + 0.01f * (i % 3))))
    // drifted arrivals: 4 tight subclusters in dims 56..59 — ORTHOGONAL
    // to every bootstrap centroid, so the old quantizer routes ALL of
    // them into one tie-broken cell (the drift pathology)
    val arrivals = (0 until 48).map { i =>
      val v = oneHot(56 + i % 4, 5f)
      v(61) = 0.01f * i // in-subcluster jitter
      (100L + i, v)
    }
    val histDf = hist.toDF("vec_id", "embedding")
    LlmOps.ivfpqBuild(train = histDf, index = histDf, store = store)
    VersionedStore.commitTxn(s.read.parquet(s"$store/codes"), codesDir,
      "boot", 0L, partitionBy = Seq("cell"))
    StreamOps.ivfpqIngestBatch(arrivals.toDF("vec_id", "embedding"),
      store, codesDir, "drift", batchId = 1L)
    val corpus = (hist ++ arrivals).toDF("vec_id", "embedding")
    val CodesDdl = "vec_id long, sub int, code int, cell long"
    def snapshot() = VersionedStore.read(s, codesDir, schema = Some(CodesDdl))
    val preImbalance = StreamOps.cellImbalancePpm(snapshot())
    assert(preImbalance >= 500000L,
      s"skewed ingest must trip the default threshold, got $preImbalance ppm")
    // full-probe baseline BEFORE the swap (nprobe = all cells → the ADC
    // shortlist ignores cell assignment entirely, so the swap must not
    // change a single row of this)
    def fullProbe(qid: Long) = LlmOps.ivfpqProbe(
        corpus.filter(col("vec_id") === qid), corpus, store, nprobe = 16,
        codes0 = Some(snapshot()),
        cents0 = Some(StreamOps.servedCentroids(s, store)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val preProbe = fullProbe(100L)
    // the swap
    val swapped = StreamOps.maybeRetrainIvfpq(s, store, codesDir, corpus,
      "drift", txnId = 2L)
    assert(swapped === Right(2L), s"retrain must fire and commit: $swapped")
    val postImbalance = StreamOps.cellImbalancePpm(snapshot())
    assert(postImbalance < preImbalance,
      s"retrained quantizer must spread the hot mass: " +
        s"$preImbalance -> $postImbalance ppm")
    // a second check on the healthy index is a no-op (one agg, Left)
    assert(StreamOps.maybeRetrainIvfpq(s, store, codesDir, corpus,
      "drift", txnId = 3L) === Left(postImbalance))
    // probe parity across the swap
    assert(fullProbe(100L) === preProbe,
      "full-nprobe probe must be bit-identical across the generation swap")
    // no lost vectors: the reassigned snapshot carries exactly the same
    // (vec_id, sub, code) set, only cells changed
    val preIds = (hist ++ arrivals).map(_._1).toSet
    assert(snapshot().select("vec_id").distinct().collect()
      .map(_.getLong(0)).toSet === preIds)
    // ingest continues onto the new generation and is retrievable
    val b2 = (0 until 4).map(i => (200L + i, oneHot(56, 5f + 0.1f * i)))
    StreamOps.ivfpqIngestBatch(b2.toDF("vec_id", "embedding"),
      store, codesDir, "drift", batchId = 4L)
    val corpus2 = (hist ++ arrivals ++ b2).toDF("vec_id", "embedding")
    val got = LlmOps.ivfpqProbe(
        corpus2.filter(col("vec_id") === 201L), corpus2, store, nprobe = 16,
        codes0 = Some(snapshot()),
        cents0 = Some(StreamOps.servedCentroids(s, store)))
      .collect().map(_.getLong(0))
    assert(got.head === 201L,
      s"post-swap ingest must be retrievable, got ${got.head}")
    // the post-swap batch must be BINNED by the served (new) generation,
    // not the bootstrap table — stale binning leaves new vectors outside
    // every pruned probe (reachable only at nprobe = nCells, which the
    // full-probe check above cannot distinguish)
    val wantB2 = LlmOps.ivfAssignCells(b2.toDF("vec_id", "embedding"),
        StreamOps.servedCentroids(s, store))
      .withColumnRenamed("cell", "want")
    assert(snapshot().filter(col("vec_id") >= 200L)
      .join(wantB2, "vec_id").filter(col("cell") =!= col("want")).isEmpty,
      "post-swap ingest must bin against the served generation")
    // crash-replay of the PRE-swap batch after the swap: still a no-op
    val nVersions = VersionedStore.versions(codesDir).size
    val replay = StreamOps.ivfpqIngestBatch(
      arrivals.toDF("vec_id", "embedding"), store, codesDir,
      "drift", batchId = 1L)
    assert(replay.isLeft && VersionedStore.versions(codesDir).size ===
      nVersions, "pre-swap batch replay must not commit after the swap")
  }

  test("strm22 drift retrain: a crash between the codes commit and the " +
      "manifest flip resumes to a completed generation swap on replay") {
    val s = spark
    import s.implicits._
    import graft.operators.VersionedStore
    import graft.llm.LlmOps
    val root = java.nio.file.Files
      .createTempDirectory("strm22-crash").toString
    val (store, codesDir) = (s"$root/store", s"$root/codes")
    def oneHot(d: Int, mag: Float) =
      Array.tabulate(64)(j => if (j == d) mag else 0f)
    val hist = (1L to 32L).map(i =>
      (i, oneHot((i % 16).toInt, 1f + 0.01f * (i % 3))))
    val arrivals = (0 until 48).map { i =>
      val v = oneHot(56 + i % 4, 5f)
      v(61) = 0.01f * i
      (100L + i, v)
    }
    val histDf = hist.toDF("vec_id", "embedding")
    LlmOps.ivfpqBuild(train = histDf, index = histDf, store = store)
    VersionedStore.commitTxn(s.read.parquet(s"$store/codes"), codesDir,
      "boot", 0L, partitionBy = Seq("cell"))
    StreamOps.ivfpqIngestBatch(arrivals.toDF("vec_id", "embedding"),
      store, codesDir, "crash", batchId = 1L)
    val corpus = (hist ++ arrivals).toDF("vec_id", "embedding")
    // run the retrain to completion, then erase the manifest store: the
    // exact on-disk state of a writer that died after the codes commitTxn
    // (step 2, txn-tagged) but before the manifest flip (step 3) — cells
    // already reassigned to new centroids, serve path still on the old
    // generation
    assert(StreamOps.maybeRetrainIvfpq(s, store, codesDir, corpus,
      "crash", txnId = 2L) === Right(2L))
    VersionedStore.destroy(s"$store/manifest")
    assert(VersionedStore.lastTxn(codesDir, "crash-retrain") === Some(2L))
    val stranded = StreamOps.servedCentroids(s, store)
      .collect().map(_.toString).toSet
    val bootstrap = s.read.parquet(s"$store/centroids")
      .collect().map(_.toString).toSet
    assert(stranded === bootstrap,
      "without the manifest the serve path is stranded on the bootstrap " +
        "generation — the recall-collapse state the resume guard targets")
    // an ingest batch lands BETWEEN the crash and the resume: the resume
    // must reuse the STORED generation-2 fit, not refit on the advanced
    // snapshot (a refit would produce centroids mismatching the already-
    // committed step-2 reassignment — the silent recall collapse)
    val lateArrivals = (0 until 4).map { i =>
      val v = oneHot(40 + i, 3f); (200L + i, v)
    }
    StreamOps.ivfpqIngestBatch(lateArrivals.toDF("vec_id", "embedding"),
      store, codesDir, "crash", batchId = 5L)
    val storedGen2 = VersionedStore.read(s, s"$store/gen-2/centroids")
      .collect().map(_.toString).toSet
    val corpus2 = (hist ++ arrivals ++ lateArrivals)
      .toDF("vec_id", "embedding")
    // the resume arrives as a LATER drift check (txnId 9, not a replay of
    // txn 2): the half-applied swap must still be detected from the txn
    // ledgers and completed — gating on the balanced snapshot here would
    // strand the old generation forever
    assert(StreamOps.maybeRetrainIvfpq(s, store, codesDir, corpus2,
      "crash", txnId = 9L) === Right(2L),
      "resume must complete the PENDING swap (txn 2), not gate on the " +
        "balanced snapshot")
    assert(VersionedStore.read(s, s"$store/gen-2/centroids")
      .collect().map(_.toString).toSet === storedGen2,
      "resume must reuse the stored generation fit, never refit on a " +
        "snapshot an ingest batch advanced after the crash")
    val served = StreamOps.servedCentroids(s, store)
      .collect().map(_.toString).toSet
    // per-generation centroids live in a VERSIONED store (txn-tagged so
    // the resume reuses the stored fit instead of refitting)
    val newGen = VersionedStore.read(s, s"$store/gen-2/centroids")
      .collect().map(_.toString).toSet
    assert(served === newGen, "manifest must now name generation 2")
    // the codes store took no duplicate commit on resume
    val CodesDdl = "vec_id long, sub int, code int, cell long"
    val snap = VersionedStore.read(s, codesDir, schema = Some(CodesDdl))
    assert(snap.groupBy("vec_id").count()
      .filter(col("count") =!= 8).isEmpty, "one row per (vec, sub), m=8")
    // GENERATION CONSISTENCY after the resume: every stored cell —
    // including the late batch binned by the old generation between the
    // crash and the resume — must equal the assignment under the SERVED
    // centroids, or those vectors are unreachable at any nprobe < nCells
    val wantCells = LlmOps.ivfAssignCells(corpus2,
        StreamOps.servedCentroids(s, store))
      .withColumnRenamed("cell", "want")
    assert(snap.join(wantCells, "vec_id")
      .filter(col("cell") =!= col("want")).isEmpty,
      "every stored cell must match the served generation's assignment " +
        "(late-ingested rows must be reconciled, not stranded)")
    // a later healthy-index check is an ordinary Left again
    assert(StreamOps.maybeRetrainIvfpq(s, store, codesDir, corpus2,
      "crash", txnId = 10L).isLeft)
  }

  test("strm22 drift retrain: an OUT-OF-ORDER maintenance call (older " +
      "txnId than the applied retrain) is a complete store no-op") {
    val s = spark
    import s.implicits._
    import graft.operators.VersionedStore
    import graft.llm.LlmOps
    val root = java.nio.file.Files
      .createTempDirectory("strm22-ooo").toString
    val (store, codesDir) = (s"$root/store", s"$root/codes")
    def oneHot(d: Int, mag: Float) =
      Array.tabulate(64)(j => if (j == d) mag else 0f)
    val hist = (1L to 32L).map(i =>
      (i, oneHot((i % 16).toInt, 1f + 0.01f * (i % 3))))
    val arrivals = (0 until 48).map { i =>
      val v = oneHot(56 + i % 4, 5f)
      v(61) = 0.01f * i
      (100L + i, v)
    }
    val histDf = hist.toDF("vec_id", "embedding")
    LlmOps.ivfpqBuild(train = histDf, index = histDf, store = store)
    VersionedStore.commitTxn(s.read.parquet(s"$store/codes"), codesDir,
      "boot", 0L, partitionBy = Seq("cell"))
    StreamOps.ivfpqIngestBatch(arrivals.toDF("vec_id", "embedding"),
      store, codesDir, "ooo", batchId = 1L)
    val corpus = (hist ++ arrivals).toDF("vec_id", "embedding")
    assert(StreamOps.maybeRetrainIvfpq(s, store, codesDir, corpus,
      "ooo", txnId = 7L) === Right(7L))
    val codesVersions = VersionedStore.versions(codesDir)
    val manifestVersions = VersionedStore.versions(s"$store/manifest")
    val served = StreamOps.servedCentroids(s, store)
      .collect().map(_.toString).toSet
    // a delayed drift check from BEFORE the applied retrain arrives late
    // (at-least-once scheduler replaying an old task, or two maintenance
    // drivers racing): it must not scan the corpus into a stale gen-3
    // fit, must not add a version anywhere, and must report the
    // generation actually in service
    assert(StreamOps.maybeRetrainIvfpq(s, store, codesDir, corpus,
      "ooo", txnId = 3L) === Right(7L),
      "out-of-order call must report the served (newer) generation")
    assert(!new java.io.File(s"$store/gen-3").exists(),
      "out-of-order call must not materialize a stale generation dir")
    assert(VersionedStore.versions(codesDir) === codesVersions &&
      VersionedStore.versions(s"$store/manifest") === manifestVersions,
      "out-of-order call must commit nothing")
    assert(StreamOps.servedCentroids(s, store)
      .collect().map(_.toString).toSet === served,
      "served generation must be untouched by the out-of-order call")
  }
}

/** documents-shaped record for the corpus-dedup stream. */
case class Doc(doc_id: Long, text: String)

/** Tagged two-sided CDC row for the strm20 join-view stream. */
case class Cdc(tbl: String, _change_type: String,
               o_orderkey: Option[Long], o_custkey: Option[Long],
               o_totalprice: Option[Double],
               c_custkey: Option[Long], c_mktsegment: Option[String])
