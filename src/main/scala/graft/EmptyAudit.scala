package graft

/** Diagnostic (temporary): run every declared query against an EMPTY lake
  * — a lake with every table present but zero rows — and report which
  * queries throw. Empty inputs are routine at scale (a filter or a
  * partition prune can empty any stage); the engine must degrade to empty
  * results, not exceptions. */
object EmptyAudit {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = "/root/repo/target/empty-lake"
    val s = Graft.session("graft-empty-audit")
    Tables.all.foreach { t =>
      Tables.load(s, src, t).limit(0).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }
    var ok, bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(s, out).count()
        ok += 1
      } catch {
        case e: Throwable =>
          bad += 1
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          println(s"[empty-audit] FAIL $name: ${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    println(s"[empty-audit] ok=$ok fail=$bad")
  }
}
