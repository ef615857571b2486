package graft

/** Dev utility: print the executed physical plan of declared queries.
  *
  *   sbt "runMain graft.Explain <sfDir> <queryName> [queryName ...]"
  *
  * Runs the query first (so AQE settles and the printed plan is the FINAL
  * one, not the initial guess), then dumps the plan — the feedback loop for
  * the 100 TB posture checks (pushdown, broadcast vs shuffle, exchange
  * count, codegen spans) that PlanSpec then pins as asserts.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <queryName>...")
    val sfDir = args.head
    val spark = Graft.session("graft-explain")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"===== $name ($sec%.2f s) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
