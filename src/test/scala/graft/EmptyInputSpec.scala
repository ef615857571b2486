package graft

/** Every declared query must DEGRADE to an empty (or well-defined small)
  * result on an empty lake — never throw. Empty inputs are not an edge
  * case at scale: any filter, partition prune, or source lull can hand any
  * stage zero rows (an empty micro-batch is routine in streaming).
  *
  * Round-10 findings this sweep caught before it became a spec: a null
  * Bloom-filter aggregate NPE (join12), schema inference failing on
  * all-empty partitioned store read-backs (join14/sink3/llm28d/e), and
  * exactly-once txn bookkeeping asserting a batch id that never committed
  * (strm15).
  *
  * Queries that write FIXED shared paths under target/tmp-sinks are
  * excluded here — other suites read those dirs concurrently in the
  * parallel test JVM, and an empty overwrite would race them. The
  * `graft.EmptyAudit` dev utility sweeps the FULL set (run it after
  * adding any query that writes a new store).
  */
class EmptyInputSpec extends SparkSpec {

  private val sharedPathWriters: String => Boolean = name =>
    name.startsWith("sink") || name.startsWith("mm") ||
      Set("ivm1_incremental_agg", "mig6b_homol_store", "mig11_datom_store",
        "mig12_ace_dump_roundtrip", "mig8_checkpoint_resume").contains(name)

  test("every query runs (does not throw) against an empty lake") {
    val out = "/root/repo/target/empty-lake-spec"
    // one sweep implementation: the spec IS EmptyAudit with the suite's
    // exclusions passed in, so the two can't drift
    EmptyAudit.buildEmptyLake(spark, Sf0001, out)
    val (ok, failures) = EmptyAudit.audit(spark, out,
      exclude = sharedPathWriters)
    assert(failures.isEmpty,
      s"${failures.size} queries throw on an empty lake:\n" +
        failures.mkString("\n"))
    assert(ok > 250, s"audit actually ran the query set (ok=$ok)")
  }
}
