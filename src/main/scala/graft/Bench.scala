package graft
/** Benchmark entrypoint: times every declared query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line for the driver (BENCH_rN.json).
  *
  * Uses Graft.session (single session factory — nanosAsLong/UTC/AQE apply).
  * Failures are recorded per-query as -1 and reported loudly on stderr; they
  * are excluded from the headline total so a half-broken run can't look fast
  * (VERDICT r02 item 6).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("graft-bench")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s ${if (ok) f"$sec%8.2f s" else "FAILED"}")
      name -> (if (ok) sec else -1.0)
    }
    val nFail = results.count(_._2 < 0)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFail,"sf":"$sfDir"}""")
    if (nFail > 0)
      System.err.println(s"[bench] $nFail queries FAILED — see above")
    spark.stop()
  }
}
