package graft

/** sink8's point is operational, not relational: the compacted copy must
  * actually contain fewer files than the fragmented one. */
class CompactionSpec extends SparkSpec {

  test("compaction reduces parquet file count 32 -> 2") {
    SparkEntry.queries("sink8_compacted")(spark, Sf0001).count()
    def parquetFiles(dir: String): Int =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    val frag = parquetFiles("/root/repo/target/tmp-sinks/sink8_fragmented")
    val comp = parquetFiles("/root/repo/target/tmp-sinks/sink8_compacted")
    assert(frag === 32, s"expected 32 fragment files, got $frag")
    assert(comp === 2, s"expected 2 compacted files, got $comp")
  }
}
