package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Backend-agnostic versioned-snapshot table interface — the extraction
  * VERDICT r12 #10 asked for: every capability the engine's sinks and
  * incremental operators actually consume from [[VersionedStore]]
  * (atomic versioned commit, idempotent writer-txn commit, time-travel
  * read, history, rollback, merge, retention), stated without naming a
  * storage layout. Two bindings:
  *
  *  - [[ParquetSnapshotStore]] — the sandbox default: delegates to
  *    [[VersionedStore]]'s marker-protocol parquet layout (this offline
  *    image cannot ship Delta jars).
  *  - [[DeltaSnapshotStore]] — the same contract on a real Delta Lake
  *    table. Expressed ENTIRELY through string-level Spark APIs
  *    (`format("delta")`, `versionAsOf`, `txnAppId`/`txnVersion`
  *    options, `DESCRIBE HISTORY` / `RESTORE` / `MERGE INTO` SQL), so it
  *    compiles with zero Delta dependency and runs wherever the
  *    classpath provides delta-spark and the session enables its
  *    extensions.
  *
  * Selection: `SnapshotStore.forConf(spark)` reads
  * `spark.graft.store.backend` (`parquet` default | `delta`); `delta`
  * is refused with a clear error when the runtime classes are absent —
  * never a late ClassNotFound mid-write. SnapshotStoreSpec pins the
  * parquet binding to VersionedStore behavior and the selection rules;
  * the Delta binding's runtime behavior is certifiable only on a
  * Delta-bearing classpath (same env-gated posture as S3aContractSpec).
  */
trait SnapshotStore {

  /** Write `df` as the next version; returns the committed version. */
  def commit(df: DataFrame, root: String): Long

  /** Idempotent writer-transaction commit (Delta txnAppId/txnVersion
    * semantics): skip with Left(lastRecorded) if a commit tagged
    * (appId, >= txnVersion) exists, else commit and Right(version). */
  def commitTxn(df: DataFrame, root: String, appId: String,
                txnVersion: Long, partitionBy: Seq[String] = Nil)
  : Either[Long, Long]

  /** Highest recorded writer-transaction version for `appId`. */
  def lastTxn(root: String, appId: String): Option[Long]

  def latestVersion(root: String): Option[Long]

  /** Time-travel read: a specific version, or latest when version < 0.
    * `schema` (DDL) pins the shape where the layout may be footerless. */
  def read(s: SparkSession, root: String, version: Long = -1L,
           schema: Option[String] = None): DataFrame

  /** One row per committed version (DESCRIBE HISTORY shape varies by
    * backend; both carry a `version` column). */
  def history(s: SparkSession, root: String): DataFrame

  /** Make `version`'s contents the new latest version (RESTORE). */
  def rollback(s: SparkSession, root: String, version: Long): Long

  /** Three-clause MERGE INTO latest: source rows with opCol='delete'
    * drop the matched key, others upsert whole rows. */
  def merge(s: SparkSession, root: String, source: DataFrame,
            keys: Seq[String], opCol: String = "op"): Long

  /** Retention: drop all but the newest `keep` versions. */
  def vacuum(root: String, keep: Int): Unit

  /** Remove the store entirely (test/rerun hygiene). Backend-specific:
    * a bare directory delete corrupts a Delta table whose DeltaLog this
    * JVM has cached. */
  def destroy(root: String): Unit
}

object SnapshotStore {
  val BackendConf = "spark.graft.store.backend"

  /** True iff a Delta Lake runtime is on this classpath. */
  def deltaAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.DeltaLog"); true }
    catch { case _: ClassNotFoundException => false }

  /** Resolve the configured backend: `parquet` (default) always works;
    * `delta` only on a Delta-bearing classpath — refused eagerly here,
    * not at first write. */
  def forConf(s: SparkSession): SnapshotStore =
    s.conf.get(BackendConf, "parquet") match {
      case "parquet" => ParquetSnapshotStore
      case "delta" =>
        require(deltaAvailable,
          s"$BackendConf=delta but no Delta runtime on the classpath " +
            "(need delta-spark jars + DeltaSparkSessionExtension)")
        DeltaSnapshotStore
      case other =>
        throw new IllegalArgumentException(
          s"unknown $BackendConf '$other' (parquet | delta)")
    }
}

/** The sandbox-default binding: [[VersionedStore]]'s atomic-marker
  * parquet layout, delegated 1:1 (VersionedStoreSpec's full behavior
  * suite therefore covers this binding unchanged). */
object ParquetSnapshotStore extends SnapshotStore {
  def commit(df: DataFrame, root: String): Long =
    VersionedStore.commit(df, root)
  def commitTxn(df: DataFrame, root: String, appId: String,
                txnVersion: Long, partitionBy: Seq[String] = Nil)
  : Either[Long, Long] =
    VersionedStore.commitTxn(df, root, appId, txnVersion,
      partitionBy = partitionBy)
  def lastTxn(root: String, appId: String): Option[Long] =
    VersionedStore.lastTxn(root, appId)
  def latestVersion(root: String): Option[Long] =
    VersionedStore.latestVersion(root)
  def read(s: SparkSession, root: String, version: Long = -1L,
           schema: Option[String] = None): DataFrame =
    VersionedStore.read(s, root, version, schema)
  def history(s: SparkSession, root: String): DataFrame =
    VersionedStore.history(s, root)
  def rollback(s: SparkSession, root: String, version: Long): Long =
    VersionedStore.rollback(s, root, version)
  def merge(s: SparkSession, root: String, source: DataFrame,
            keys: Seq[String], opCol: String = "op"): Long =
    VersionedStore.merge(s, root, source, keys, opCol)
  def vacuum(root: String, keep: Int): Unit =
    VersionedStore.vacuum(root, keep)
  def destroy(root: String): Unit =
    VersionedStore.destroy(root)
}

/** The real-Delta binding. Every operation is a string-level Spark API —
  * no compile-time Delta types — so this file builds in the offline
  * sandbox; at runtime it requires delta-spark on the classpath and
  * `spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension` +
  * `spark.sql.catalog.spark_catalog=...DeltaCatalog` on the session
  * (exactly what a production Graft.session would set where Delta
  * deploys). Semantics map 1:1:
  *
  *  - commit            → `format("delta").mode("overwrite")` (Delta's
  *                        overwrite is a new table version, old versions
  *                        stay time-travel readable)
  *  - commitTxn/lastTxn → `txnAppId`/`txnVersion` write options; Delta
  *                        enforces the skip internally, detected here by
  *                        the table version not advancing
  *  - read(version)     → `option("versionAsOf", v)`
  *  - history           → `DESCRIBE HISTORY delta.\`root\``
  *  - rollback          → `RESTORE TABLE … TO VERSION AS OF v`
  *  - merge             → three-clause `MERGE INTO` SQL
  *  - vacuum            → `VACUUM delta.\`root\`` (hour-based retention;
  *                        Delta has no count-based keep — callers that
  *                        need version-count retention stay on the
  *                        parquet binding's contract)
  */
object DeltaSnapshotStore extends SnapshotStore {
  private def tbl(root: String): String = s"delta.`$root`"

  def commit(df: DataFrame, root: String): Long = {
    df.write.format("delta").mode("overwrite")
      .option("overwriteSchema", "true").save(root)
    latestVersion(root).getOrElse(
      throw new IllegalStateException(s"delta commit left no version: $root"))
  }

  def commitTxn(df: DataFrame, root: String, appId: String,
                txnVersion: Long, partitionBy: Seq[String] = Nil)
  : Either[Long, Long] = {
    val before = latestVersion(root)
    val w = df.write.format("delta").mode("overwrite")
      .option("overwriteSchema", "true")
      .option("txnAppId", appId).option("txnVersion", txnVersion)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(root)
    val after = latestVersion(root)
    // Delta skips an idempotent replay WITHOUT advancing the version.
    // Divergences from the trait contract, both rooted in Delta not
    // exposing writer-txn tags: the Left carries the skipped txnVersion
    // (a lower bound on lastRecorded, which Delta keeps internal), and
    // the before/after comparison assumes no concurrent writer advanced
    // the table between the two reads — single-writer-per-appId is the
    // operating assumption, as with the parquet binding's marker scan.
    if (after == before && before.isDefined) Left(txnVersion)
    else Right(after.getOrElse(0L))
  }

  def lastTxn(root: String, appId: String): Option[Long] =
    // DESCRIBE HISTORY does not expose writer-txn tags through SQL, and a
    // silent None would read as "no commit recorded" — a lie that could
    // talk a caller into replaying. The guard itself IS enforced (Delta
    // applies txnAppId/txnVersion inside commitTxn); callers needing the
    // value observable must stay on the parquet binding.
    throw new UnsupportedOperationException(
      "delta backend enforces writer-txn idempotence inside commitTxn " +
        "but does not expose lastTxn; use commitTxn's Left/Right result")

  def latestVersion(root: String): Option[Long] = {
    val s = SparkSession.active
    // table-existence probe through the Hadoop FileSystem of the PATH —
    // a java.io.File check is always false on s3a://-style roots, which
    // would make commit() throw after a successful write and commitTxn
    // misread every replay as a fresh commit on exactly the object
    // stores Delta deploys to
    val log = new org.apache.hadoop.fs.Path(root, "_delta_log")
    val fs = log.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(log)) None
    else s.sql(s"DESCRIBE HISTORY ${tbl(root)} LIMIT 1")
      .select("version").collect().headOption.map(_.getLong(0))
  }

  def read(s: SparkSession, root: String, version: Long = -1L,
           schema: Option[String] = None): DataFrame = {
    // Delta carries its own schema in the log — the DDL pin is only for
    // footerless parquet layouts and is ignored here
    val r = s.read.format("delta")
    (if (version >= 0) r.option("versionAsOf", version) else r).load(root)
  }

  def history(s: SparkSession, root: String): DataFrame =
    s.sql(s"DESCRIBE HISTORY ${tbl(root)}")

  def rollback(s: SparkSession, root: String, version: Long): Long = {
    s.sql(s"RESTORE TABLE ${tbl(root)} TO VERSION AS OF $version")
    latestVersion(root).get
  }

  def merge(s: SparkSession, root: String, source: DataFrame,
            keys: Seq[String], opCol: String = "op"): Long = {
    val v = s"graft_merge_src_${java.util.UUID.randomUUID().toString.take(8)}"
    source.createOrReplaceTempView(v)
    val on = keys.map(k => s"t.$k = s.$k").mkString(" AND ")
    val cols = source.columns.filterNot(_ == opCol)
    val sets = cols.map(c => s"t.$c = s.$c").mkString(", ")
    val ins = cols.mkString(", ")
    val insVals = cols.map(c => s"s.$c").mkString(", ")
    s.sql(
      s"""MERGE INTO ${tbl(root)} t USING $v s ON $on
         |WHEN MATCHED AND s.$opCol = 'delete' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET $sets
         |WHEN NOT MATCHED AND s.$opCol <> 'delete'
         |  THEN INSERT ($ins) VALUES ($insVals)""".stripMargin)
    s.catalog.dropTempView(v)
    latestVersion(root).get
  }

  def vacuum(root: String, keep: Int): Unit =
    // Delta retention is time-based (VACUUM ... RETAIN n HOURS); there is
    // no count-based "newest keep versions" primitive, and silently
    // running a time-based VACUUM would violate the trait contract while
    // appearing to succeed. Same posture as lastTxn: refuse loudly —
    // callers needing version-count retention stay on the parquet
    // binding; Delta deployments configure
    // delta.deletedFileRetentionDuration on the table instead.
    throw new UnsupportedOperationException(
      s"delta backend has no version-count retention (asked keep=$keep); " +
        "configure delta.deletedFileRetentionDuration on the table")

  def destroy(root: String): Unit = {
    // delete through the path's FileSystem (works on s3a://), then
    // invalidate the JVM-cached DeltaLog for the path — a bare directory
    // delete leaves a stale cached log and the next commit against the
    // same root fails or mis-versions. Reflective (string-level binding:
    // no compile-time Delta types); cache invalidation is best-effort —
    // the delete itself must succeed.
    val s = SparkSession.active
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    try {
      val cls = Class.forName("org.apache.spark.sql.delta.DeltaLog$")
      val module = cls.getField("MODULE$").get(null)
      cls.getMethod("invalidateCache",
          classOf[SparkSession], classOf[org.apache.hadoop.fs.Path])
        .invoke(module, s, p)
    } catch {
      // best-effort covers only LOOKUP failures (no such class/method on
      // this Delta build); an invocation that FAILED must propagate —
      // swallowing it leaves the stale cached log this method exists to
      // drop, and the next commit on the root fails or mis-versions
      case _: ClassNotFoundException | _: NoSuchMethodException |
           _: NoSuchFieldException => ()
      case e: java.lang.reflect.InvocationTargetException =>
        throw e.getCause
    }
  }
}
