package graft

import org.scalatest.funsuite.AnyFunSuite

/** OracleArtifacts is part of the correctness gate: a wrong token or a
  * stale fallback would point a DuckDB replay oracle at another SF's
  * bytes — exactly the race it exists to close. Pin the path algebra. */
class OracleArtifactsSpec extends AnyFunSuite {

  test("sfTok: last path segment, filesystem-safe, trailing-slash-proof") {
    assert(OracleArtifacts.sfTok("/root/testdata/sf0.01") === "sf0_01")
    assert(OracleArtifacts.sfTok("/root/testdata/sf0.01/") === "sf0_01")
    assert(OracleArtifacts.sfTok("/a/b/sf0.001") === "sf0_001")
    // distinct SFs must never collide after sanitization
    assert(OracleArtifacts.sfTok("/x/sf0.1") !== OracleArtifacts.sfTok("/x/sf0.01"))
  }

  test("record embeds the token and wins over the un-tokened fallback") {
    val name = s"spec_artifact_${System.nanoTime()}" // unique per run —
    // the registry is process-global and other suites share the JVM
    val sink = graft.operators.Scans.SinkDir
    assert(OracleArtifacts.path(name) === s"$sink/$name",
      "unrecorded artifact must fall back to the legacy un-tokened path")
    val p = OracleArtifacts.record(name, "/root/testdata/sf0.01")
    assert(p === s"$sink/${name}_sf0_01")
    assert(OracleArtifacts.path(name) === p,
      "the oracle must read the path the dump recorded")
    // a later dump for another SF re-points the oracle at ITS bytes
    val p2 = OracleArtifacts.record(name, "/root/testdata/sf0.001")
    assert(p2 === s"$sink/${name}_sf0_001")
    assert(OracleArtifacts.path(name) === p2)
    assert(p !== p2, "different SFs must dump to different dirs")
  }
}
