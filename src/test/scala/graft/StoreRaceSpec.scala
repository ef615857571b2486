package graft

/** Cross-PROCESS commit-protocol proof (VERDICT r18 item 5).
  * VersionedStoreSpec covers in-JVM isolation; this spec forks REAL writer
  * JVMs (ProcessBuilder, this suite's own classpath) racing commits and
  * mid-race vacuums into one store root, then verifies via
  * [[StoreRace.race]]: exactly one winner per version number, distinct data
  * dirs per retained marker, zero torn reads (each writer read-verifies the
  * latest snapshot after every commit and exits non-zero on a partial
  * read), and every retained version complete after vacuum-under-race.
  *
  * Scaled for CI (3 JVMs × 4 commits ≈ real contention on the marker
  * create: 12 claims, every one retried by losers); the round artifact in
  * BENCH_NOTES.md records a bigger standalone run of the same harness. */
class StoreRaceSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("3 racing writer JVMs + mid-race vacuum: one winner per version, " +
    "no torn reads") {
    assume(new java.io.File(
      sys.props("java.home"), "bin/java").canExecute,
      "needs a forkable JVM")
    val root = java.nio.file.Files
      .createTempDirectory("graft-storerace").toString + "/store"
    val artifact = StoreRace.race(root, nWriters = 3, nCommits = 4)
    assert(artifact.contains("\"store_race\":\"ok\""))
    assert(artifact.contains("\"max_version\":12"))
    assert(artifact.contains("\"torn_reads\":0"))
    graft.operators.VersionedStore.destroy(root)
  }

  test("SIGKILL of a writer between data write and marker claim: orphan " +
    "invisible, restart clean, grace-gated vacuum sweeps it (r19 item 7)") {
    assume(new java.io.File(
      sys.props("java.home"), "bin/java").canExecute,
      "needs a forkable JVM")
    val root = java.nio.file.Files
      .createTempDirectory("graft-storecrash").toString + "/store"
    val artifact = StoreRace.crashKill(root)
    assert(artifact.contains("\"store_crash_kill\":\"ok\""))
    assert(artifact.contains("\"orphan_visible_versions\":0"))
    assert(artifact.contains("\"orphan_swept\":true"))
    graft.operators.VersionedStore.destroy(root)
  }
}
