package graft

import graft.operators.{DeltaSnapshotStore, SnapshotStore}
import org.apache.spark.sql.SparkSession

/** [[DeltaSnapshotStore]] runtime contract, env-gated (VERDICT r14 #5 —
  * the same posture as S3aContractSpec).
  *
  * The offline container ships no delta-spark jars, so the live tests
  * run ONLY when the operator provides a Delta-bearing environment:
  *
  *   SPARK_GRAFT_DELTA=1    opt in (and confirms the operator put
  *                          delta-spark on the sbt/test classpath)
  *
  * Graft.session carries Delta's extensions under the same gate
  * (withDeltaConf), so the shared TestSession IS the Delta session when
  * the env contract holds — extensions are fixed at session build, which
  * is why they ride the factory and not the store.
  *
  * Without that contract each live test is CANCELED (assume()), keeping
  * the suite green offline while the same spec certifies the string-level
  * Delta binding the moment a classpath provides it:
  *   SPARK_GRAFT_DELTA=1 sbt "testOnly graft.DeltaContractSpec"
  */
class DeltaContractSpec extends SparkSpec {

  private def deltaEnabled: Boolean =
    sys.env.get("SPARK_GRAFT_DELTA").contains("1") &&
      SnapshotStore.deltaAvailable

  private def deltaSession: SparkSession = spark

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-delta").toString + "/tbl"

  test("refusal contract offline: forConf(delta) errors eagerly, " +
      "unsupported surfaces throw with actionable messages") {
    // always runs — this is the HALF of the Delta contract certifiable
    // without jars: selection refuses before any write starts, and the
    // two surfaces Delta cannot honor refuse loudly rather than lie
    assume(!SnapshotStore.deltaAvailable, "delta on classpath: skip")
    intercept[IllegalArgumentException] {
      withSQLConf(SnapshotStore.BackendConf -> "delta") {
        SnapshotStore.forConf(spark)
      }
    }
    intercept[UnsupportedOperationException] {
      DeltaSnapshotStore.lastTxn("/nonexistent", "app")
    }
    intercept[UnsupportedOperationException] {
      DeltaSnapshotStore.vacuum("/nonexistent", keep = 3)
    }
    // reading a never-written root reports "no table", not a crash
    assert(DeltaSnapshotStore.latestVersion("/nonexistent-delta") === None)
  }

  test("live: commit/read/latestVersion round-trip on a real Delta table") {
    assume(deltaEnabled, "SPARK_GRAFT_DELTA not set / no delta jars")
    val s = deltaSession
    import s.implicits._
    val root = freshRoot()
    val v0 = DeltaSnapshotStore.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"),
      root)
    val v1 = DeltaSnapshotStore.commit(Seq((3, "c")).toDF("k", "v"), root)
    assert(v1 > v0)
    assert(DeltaSnapshotStore.latestVersion(root) === Some(v1))
    assert(DeltaSnapshotStore.read(s, root, version = v0)
      .orderBy("k").collect().map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(DeltaSnapshotStore.read(s, root)
      .collect().map(_.getInt(0)).toSeq === Seq(3))
  }

  test("live: commitTxn idempotence — a replayed (appId, txnVersion) " +
      "skips without advancing the table") {
    assume(deltaEnabled, "SPARK_GRAFT_DELTA not set / no delta jars")
    val s = deltaSession
    import s.implicits._
    val root = freshRoot()
    val first = DeltaSnapshotStore.commitTxn(
      Seq((1, "a")).toDF("k", "v"), root, "appA", 10L)
    assert(first.isRight)
    val before = DeltaSnapshotStore.latestVersion(root)
    val replay = DeltaSnapshotStore.commitTxn(
      Seq((9, "x")).toDF("k", "v"), root, "appA", 10L)
    assert(replay === Left(10L))
    assert(DeltaSnapshotStore.latestVersion(root) === before)
    assert(DeltaSnapshotStore.read(s, root)
      .collect().map(_.getString(1)).toSeq === Seq("a"))
  }

  test("live: history/rollback/merge — time travel + RESTORE + " +
      "three-clause MERGE INTO") {
    assume(deltaEnabled, "SPARK_GRAFT_DELTA not set / no delta jars")
    val s = deltaSession
    import s.implicits._
    val root = freshRoot()
    val v0 = DeltaSnapshotStore.commit(
      Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    DeltaSnapshotStore.commit(Seq((3, "c")).toDF("k", "v"), root)
    assert(DeltaSnapshotStore.history(s, root).count() >= 2)
    DeltaSnapshotStore.rollback(s, root, v0)
    assert(DeltaSnapshotStore.read(s, root).orderBy("k")
      .collect().map(_.getInt(0)).toSeq === Seq(1, 2))
    val changes = Seq((1, "a2", "upsert"), (2, "b", "delete"),
      (5, "e", "upsert")).toDF("k", "v", "op")
    DeltaSnapshotStore.merge(s, root, changes, Seq("k"))
    assert(DeltaSnapshotStore.read(s, root).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      === Seq((1, "a2"), (5, "e")))
  }

  test("live: the sink9 program runs unchanged on the delta backend") {
    assume(deltaEnabled, "SPARK_GRAFT_DELTA not set / no delta jars")
    val s = deltaSession
    import s.implicits._
    // same shape as sink9_versioned: two commits, time-travel the first —
    // proving the trait indirection actually buys backend portability
    val root = freshRoot()
    val st = withSQLConf(SnapshotStore.BackendConf -> "delta") {
      SnapshotStore.forConf(s)
    }
    val v1 = st.commit(Seq((1, "F"), (2, "F")).toDF("k", "st"), root)
    st.commit(Seq((3, "O")).toDF("k", "st"), root)
    assert(st.read(s, root, version = v1).count() === 2L)
  }
}
