package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("graft-timeq")
    val d = args(0)
    args.drop(1).foreach { name =>
      // warmup once, then time
      SparkEntry.queries(name)(spark, d).write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).write.mode("overwrite").format("noop").save()
      println(f"TIMEQ $name ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
