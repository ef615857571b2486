package graft

import org.apache.spark.sql.SparkSession

/** Run every declared query against an EMPTY lake — a lake with every
  * table present but zero rows — and report which queries throw. Empty
  * inputs are routine at scale (a filter or a partition prune can empty
  * any stage); the engine must degrade to empty results, not exceptions.
  * EmptyInputSpec asserts the failure list stays empty (through this
  * object, with its shared-path exclusions passed as `exclude`); the
  * `main` is the standalone full-set diagnostic form of the same audit.
  */
object EmptyAudit {

  /** Materialize a zero-row copy of every lake table under `out` (schema
    * preserved — limit(0) keeps the parquet footer's types). */
  def buildEmptyLake(s: SparkSession, src: String, out: String): Unit =
    Tables.all.foreach { t =>
      Tables.load(s, src, t).limit(0).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }

  /** Execute every `SparkEntry.queries` entry against the empty lake
    * (minus any `exclude` matches — EmptyInputSpec passes its shared-path
    * writers, which other suites read concurrently in the parallel test
    * JVM); returns (ok count, failures as "name: root cause" lines). */
  def audit(s: SparkSession, emptyLakeDir: String,
            exclude: String => Boolean = _ => false): (Int, Seq[String]) = {
    var ok = 0
    val failures = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => exclude(n) }
      .foreach { case (name, fn) =>
      try {
        fn(s, emptyLakeDir).count()
        ok += 1
      } catch {
        case e: Throwable =>
          val root = {
            var c: Throwable = e
            while (c.getCause != null && c.getCause != c) c = c.getCause
            c
          }
          failures += s"$name: ${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").linesIterator.take(1).mkString}"
      }
    }
    (ok, failures.result())
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = "/root/repo/target/empty-lake"
    val s = Graft.session("graft-empty-audit")
    buildEmptyLake(s, src, out)
    val (ok, failures) = audit(s, out)
    failures.foreach(f => println(s"[empty-audit] FAIL $f"))
    println(s"[empty-audit] ok=$ok fail=${failures.size}")
  }
}
