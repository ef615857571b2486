object PlanAudit {
  def main(a: Array[String]): Unit = {
    val s = graft.Graft.session("audit")
    val d = "/root/testdata/sf0.01"
    for (name <- a) {
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(s, d)
      println(df.queryExecution.executedPlan.toString.take(3500))
    }
    s.stop()
  }
}
