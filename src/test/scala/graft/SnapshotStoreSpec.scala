package graft

import graft.operators.{ParquetSnapshotStore, SnapshotStore, VersionedStore}
import org.apache.spark.sql.functions._

/** The backend-agnostic [[SnapshotStore]] contract: the parquet binding
  * must be behaviorally identical to [[VersionedStore]] (same versions,
  * same time travel, same txn idempotence, same merge/rollback/vacuum
  * results — VersionedStoreSpec covers the underlying protocol in depth;
  * here we pin the delegation end-to-end through the trait), and
  * `forConf` must resolve parquet by default, refuse `delta` eagerly on
  * a Delta-less classpath, and reject unknown backends. The Delta
  * binding's runtime behavior is certifiable only where a classpath
  * provides delta-spark — see DeltaContractSpec (env-gated). */
class SnapshotStoreSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-snapstore").toString +
      "/store"

  test("forConf: parquet by default, by explicit conf, and unknown rejected") {
    val s = spark
    assert(SnapshotStore.forConf(s) eq ParquetSnapshotStore)
    withSQLConf(SnapshotStore.BackendConf -> "parquet") {
      assert(SnapshotStore.forConf(s) eq ParquetSnapshotStore)
    }
    val e = intercept[IllegalArgumentException] {
      withSQLConf(SnapshotStore.BackendConf -> "rocksdb") {
        SnapshotStore.forConf(s)
      }
    }
    assert(e.getMessage.contains("rocksdb"))
  }

  test("forConf: delta refused eagerly on a Delta-less classpath") {
    // this sandbox ships no delta jars — the refusal must happen at
    // resolution time with an actionable message, not as a late
    // ClassNotFound mid-write
    assume(!SnapshotStore.deltaAvailable, "delta on classpath: skip")
    val e = intercept[IllegalArgumentException] {
      withSQLConf(SnapshotStore.BackendConf -> "delta") {
        SnapshotStore.forConf(spark)
      }
    }
    assert(e.getMessage.contains("delta-spark"))
  }

  test("parquet binding: commit/read/latestVersion/history ≡ VersionedStore") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    val st: SnapshotStore = SnapshotStore.forConf(s)
    val v1 = st.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    val v2 = st.commit(Seq((3, "c")).toDF("k", "v"), root)
    assert((v1, v2) === (1L, 2L))
    assert(st.latestVersion(root) === Some(2L))
    assert(st.latestVersion(root) === VersionedStore.latestVersion(root))
    // time travel through the trait sees what VersionedStore sees
    val viaTrait = st.read(s, root, version = v1).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val direct = VersionedStore.read(s, root, v1).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(viaTrait === direct && viaTrait === Seq((1, "a"), (2, "b")))
    assert(st.read(s, root).collect().map(_.getInt(0)).toSeq === Seq(3))
    val hist = st.history(s, root).select("version")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(hist === Seq(1L, 2L))
  }

  test("parquet binding: commitTxn idempotence + lastTxn through the trait") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    val st = SnapshotStore.forConf(s)
    assert(st.lastTxn(root, "appA") === None)
    val first = st.commitTxn(Seq((1, "a")).toDF("k", "v"), root, "appA", 10L)
    assert(first.isRight)
    // replaying the same (appId, txnVersion) must skip with the recorded
    // value, leaving the table untouched
    val replay = st.commitTxn(Seq((9, "x")).toDF("k", "v"), root, "appA", 10L)
    assert(replay === Left(10L))
    assert(st.lastTxn(root, "appA") === Some(10L))
    assert(st.read(s, root).collect().map(_.getString(1)).toSeq === Seq("a"))
    // a LOWER txnVersion is also a replay (contract: skip if recorded >=)
    assert(st.commitTxn(Seq((9, "x")).toDF("k", "v"), root, "appA", 9L)
      === Left(10L))
    // a fresh appId is independent
    assert(st.commitTxn(Seq((2, "b")).toDF("k", "v"), root, "appB", 1L).isRight)
    assert(st.lastTxn(root, "appA") === Some(10L))
  }

  test("parquet binding: rollback + merge + vacuum through the trait") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    val st = SnapshotStore.forConf(s)
    val v1 = st.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    st.commit(Seq((3, "c")).toDF("k", "v"), root)
    val v3 = st.rollback(s, root, v1)
    assert(v3 === 3L)
    assert(st.read(s, root).orderBy("k").collect().map(_.getInt(0)).toSeq
      === Seq(1, 2))
    // three-clause merge: update k=1, delete k=2, insert k=5
    val changes = Seq((1, "a2", "upsert"), (2, "b", "delete"),
      (5, "e", "upsert")).toDF("k", "v", "op")
    st.merge(s, root, changes, Seq("k"))
    val merged = st.read(s, root).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(merged === Seq((1, "a2"), (5, "e")))
    // vacuum: only the newest version survives, older time travel refused
    st.vacuum(root, keep = 1)
    assert(st.read(s, root).count() === 2L)
    intercept[IllegalArgumentException] { st.read(s, root, version = v1) }
  }
}
