package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned-snapshot table — the Delta-style layout the north-star
  * contract names, stood up on plain parquet because Delta jars cannot ship
  * in this offline image. Reference motivation: backup-db KEEPS prior
  * snapshots restorable (runcommand.py:221-255, datomic.py:12-23) — a plain
  * overwrite destroys them.
  *
  * Layout under `root/`:
  * {{{
  *   data-<uuid>/            one immutable parquet dir per commit ATTEMPT
  *   data-<uuid>/
  *   _versions/00001.commit  marker per version; its CONTENT names the data
  *   _versions/00002.commit  dir (a one-line manifest). Version visible iff
  *                           its marker exists.
  * }}}
  *
  * Commit protocol: (1) write a fresh uniquely-named `data-<uuid>` dir —
  * writers never share a path, so concurrent attempts cannot clobber each
  * other's files; (2) claim the next version number by creating
  * `_versions/N.commit` (create-new semantics) with the data-dir name as its
  * body, retrying with N+1 if another writer won N. The flip is one atomic
  * file creation, so a reader either sees version N complete or not at all —
  * no torn reads, no window where the table is empty mid-overwrite (the
  * failure mode of read-merge-overwrite upserts). A crashed writer leaves
  * only an invisible orphan data dir. Prior versions stay readable (time
  * travel) until [[vacuum]]. On an object store the marker create maps to a
  * conditional PUT-if-absent and no rename is ever needed — data dirs are
  * immutable and only referenced through the marker manifest.
  */
object VersionedStore {

  private def vdir(root: String) = new File(root, "_versions")
  private def marker(root: String, v: Long) =
    new File(vdir(root), f"$v%05d.commit")

  /** Committed (visible) versions, ascending. */
  def versions(root: String): Seq[Long] =
    Option(vdir(root).listFiles()).getOrElse(Array.empty).toSeq
      .map(_.getName).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).sorted

  def latestVersion(root: String): Option[Long] = versions(root).lastOption

  /** Data dir a committed version's manifest points at. */
  private def markerBody(root: String, v: Long): String = {
    val m = marker(root, v)
    require(m.exists(),
      s"version $v not committed under $root (have ${versions(root)})")
    new String(Files.readAllBytes(m.toPath), StandardCharsets.UTF_8)
  }

  /** Marker line 1 names the data dir; later lines carry commit metadata
    * (currently `txn=<appId>=<version>` from [[commitTxn]]). */
  private def dataDirOf(root: String, v: Long): File =
    new File(root, markerBody(root, v).linesIterator.next().trim)

  /** Claim the next version number for an existing data dir: create-new
    * marker semantics, retry at the next number if another writer won. */
  private def claimMarker(root: String, dataName: String,
                          maxRetries: Int = 64): Long = {
    vdir(root).mkdirs()
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      val v = latestVersion(root).getOrElse(0L) + 1
      try {
        Files.write(marker(root, v).toPath,
          dataName.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW)
        committed = v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt += 1
          require(attempt <= maxRetries,
            s"could not claim a version under $root after $maxRetries races")
      }
    }
    committed
  }

  /** Write `df` as the next version; returns the committed version number.
    * The version becomes visible only at the final marker create; on a
    * version-number race the loser retries at the next number — its data
    * dir is private, so nothing is ever overwritten. */
  def commit(df: DataFrame, root: String, maxRetries: Int = 64): Long = {
    val dataName = s"data-${java.util.UUID.randomUUID()}"
    df.write.mode("errorifexists").parquet(new File(root, dataName).toString)
    claimMarker(root, dataName, maxRetries)
  }

  /** CHECK-constraint commit (Delta `ALTER TABLE ADD CONSTRAINT` parity):
    * commit `df` only if every row satisfies `constraint`. The violation
    * count rides the write itself via observe() — ZERO extra scans (the
    * reference re-reads its output to validate; at 100 TB that second scan
    * is hours). Ordering is safe because the marker is claimed strictly
    * AFTER the write action finishes: on violation the freshly-written data
    * dir is simply never referenced — the same crash-orphan shape the store
    * already proves invisible (VersionedStoreSpec) and vacuum sweeps.
    * Returns Right(version) on commit, Left(violations) on rejection. */
  def commitChecked(df: DataFrame, root: String,
                    constraint: org.apache.spark.sql.Column,
                    maxRetries: Int = 64): Either[Long, Long] = {
    val obs = org.apache.spark.sql.Observation()
    val dataName = s"data-${java.util.UUID.randomUUID()}"
    df.observe(obs,
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(constraint, 0L).otherwise(1L)),
          org.apache.spark.sql.functions.lit(0L))
          .as("violations"))
      .write.mode("errorifexists").parquet(new File(root, dataName).toString)
    val violations = obs.getAsJava.get("violations").asInstanceOf[Long]
    if (violations > 0L) Left(violations)
    else Right(claimMarker(root, dataName, maxRetries))
  }

  /** Highest writer-transaction version recorded for `appId` across the
    * committed markers — the read side of [[commitTxn]]. O(retained
    * versions) tiny-file reads; [[vacuum]] bounds that, with the same
    * caveat as Delta's txn retention: keep more versions than the longest
    * possible replay window, or a very late replay re-applies. */
  def lastTxn(root: String, appId: String): Option[Long] = {
    val pfx = s"txn=$appId="
    val recorded = versions(root).flatMap(v =>
      markerBody(root, v).linesIterator
        .filter(_.startsWith(pfx)).map(_.stripPrefix(pfx).trim.toLong))
    if (recorded.isEmpty) None else Some(recorded.max)
  }

  /** Idempotent commit (Delta `txnAppId`/`txnVersion` parity): commit `df`
    * as the next version UNLESS a commit tagged (appId, >= txnVersion)
    * already exists — then skip, returning Left(lastRecorded). The tag
    * rides INSIDE the marker body, so recording is part of the same
    * one-file-create commit atom: a crash can never apply the data without
    * the tag or vice versa. This is what makes an at-least-once replayer
    * (foreachBatch re-running a batchId after a crash) exactly-once: the
    * guard covers sequential retries of one writer app — the Delta
    * guarantee scope — not two live racers on one appId. */
  def commitTxn(df: DataFrame, root: String, appId: String, txnVersion: Long,
                maxRetries: Int = 64,
                partitionBy: Seq[String] = Nil): Either[Long, Long] =
    lastTxn(root, appId) match {
      case Some(last) if last >= txnVersion => Left(last)
      case _ =>
        val dataName = s"data-${java.util.UUID.randomUUID()}"
        // partitionBy (Delta partitioned-table parity): the version's data
        // dir is hive-partitioned, so serve-path key filters prune
        // directories instead of scanning the snapshot (STRM-22's
        // cell-partitioned codes store). read() re-infers the partition
        // column from the layout.
        val w = df.write.mode("errorifexists")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
          .parquet(new File(root, dataName).toString)
        Right(claimMarker(root, s"$dataName\ntxn=$appId=$txnVersion",
          maxRetries))
    }

  /** DESCRIBE HISTORY analogue: one row per committed version — its data
    * dir and any writer-txn tag. Metadata-only: reads the O(retained
    * versions) marker files, never data; rollbacks are visible as two
    * versions sharing a data_dir. */
  def history(s: SparkSession, root: String): DataFrame = {
    import s.implicits._
    versions(root).map { v =>
      val lines = markerBody(root, v).linesIterator.toSeq
      (v, lines.head.trim, lines.find(_.startsWith("txn=")).orNull)
    }.toDF("version", "data_dir", "txn")
  }

  /** Restore-db: make version `version`'s contents the NEW latest version
    * (the reference restores a backup as the live db, runcommand.py:221-255
    * — here history stays intact and the rollback is itself an auditable
    * commit). Metadata-only: the new marker references the SAME immutable
    * data dir, so restoring a 100 TB snapshot costs one file create, zero
    * data movement. [[vacuum]] is reference-counted, so the shared data dir
    * survives as long as ANY retained version points at it. */
  def rollback(s: SparkSession, root: String, version: Long): Long =
    claimMarker(root, dataDirOf(root, version).getName)

  /** Read a specific committed version, or the latest when version < 0.
    * `schema` (DDL string) pins the shape instead of inferring — REQUIRED
    * for reading a version that may be an EMPTY partitionBy commit: a
    * partitioned write of zero rows creates no parquet footers, so
    * inference has nothing to read (plain empty commits keep a footer). */
  def read(s: SparkSession, root: String, version: Long = -1L,
           schema: Option[String] = None): DataFrame = {
    val v =
      if (version >= 0) version
      else latestVersion(root).getOrElse(
        throw new IllegalStateException(s"no committed versions under $root"))
    val r = schema.fold(s.read)(ddl => s.read.schema(ddl))
    r.parquet(dataDirOf(root, v).toString)
  }

  /** MERGE INTO the latest committed version — the batch form of Delta's
    * three-clause MERGE (the streaming form is StreamOps.runUpsertStream).
    * Source rows carry an `opCol`: 'delete' drops the matched target row;
    * anything else upserts the whole source row (replaces when the key
    * matches, inserts when it doesn't). Target rows unmatched by any source
    * key carry over unchanged.
    *
    * Plan shape: ONE left-anti shuffle join on the merge key plus a union —
    * no window, no global sort. At 100 TB both sides shuffle once on the
    * key and AQE splits skewed keys; a small change set broadcasts. (Delta
    * additionally file-skips so only touched files rewrite — with a
    * partitioned store root the same effect comes from partition-pruning
    * the target before the merge.) The result commits through the atomic
    * marker protocol: readers see the pre- or post-merge snapshot, never an
    * intermediate, and the pre-merge version stays time-travel readable. */
  def merge(s: SparkSession, root: String, source: DataFrame,
            keys: Seq[String], opCol: String = "op"): Long = {
    import org.apache.spark.sql.functions.{col, count, lit}
    // Delta-parity contract: two source rows with the same key make the
    // outcome order-dependent — fail loudly instead of silently writing a
    // duplicate-keyed version. One small agg over the change set (the small
    // side of the merge), not over the target.
    val dup = source.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1)
      .collect()
    require(dup.isEmpty,
      s"MERGE source has multiple rows for key ${dup.headOption.orNull} — " +
        "dedupe the change set (e.g. latest-wins) before merging")
    val target = read(s, root)
    val untouched = target.join(
      source.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val upserts = source.filter(col(opCol) =!= "delete").drop(opCol)
    commit(untouched.unionByName(upserts), root)
  }

  /** Change-data-feed between two committed versions (Delta CDF read
    * analogue): one row per key whose state changed from `fromV` to `toV`,
    * tagged `_change_type` ∈ insert | update | delete. Inserts/updates
    * carry the `toV` image, deletes the `fromV` image. Keys whose value
    * columns are null-safe-equal across the versions emit nothing.
    *
    * Delta derives CDF from per-commit change files; a snapshot store has
    * no row-level log, so the feed is a snapshot DIFF: ONE full-outer
    * shuffle join on the key (AQE splits skew), null-safe column compare,
    * no window, no sort. At 100 TB that is a single co-partitioned pass
    * over the two snapshots — and with both versions written by this
    * store's own commits the join can be made exchange-free by bucketing
    * the store root (join11's layout). Downstream incremental consumers
    * (the reference re-imports whole dumps per release; runcommand.py:221)
    * apply just this feed instead. */
  def changes(s: SparkSession, root: String, fromV: Long, toV: Long,
              keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val before = read(s, root, fromV)
    val after  = read(s, root, toV)
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema drift between v$fromV and v$toV is not diffable: " +
        s"${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val valCols = after.columns.filterNot(keys.contains).toIndexedSeq
    val b = before.select(keys.map(col) ++
      valCols.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__in_b"): _*)
    val a = after.select(keys.map(col) ++
      valCols.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__in_a"): _*)
    val changed = valCols.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, keys, "full_outer")
      .withColumn("_change_type",
        when(col("__in_b").isNull, "insert")
          .when(col("__in_a").isNull, "delete")
          .when(changed, "update"))
      .filter(col("_change_type").isNotNull)
      .select(keys.map(col) ++ valCols.map(c =>
        when(col("_change_type") === "delete", col(s"__b_$c"))
          .otherwise(col(s"__a_$c")).as(c)) :+ col("_change_type"): _*)
  }

  /** Delta-CDF-style change feed between two versions: like [[changes]]
    * but an update emits BOTH rows — `update_preimage` (old values) and
    * `update_postimage` (new values) — which is what downstream
    * incremental consumers need (subtract the pre, add the post; see
    * [[Incremental]]). Built in ONE pass over the full-outer key join:
    * each joined row expands to its 0–2 feed rows via an array+explode,
    * no second diff scan. */
  def changeFeed(s: SparkSession, root: String, fromV: Long, toV: Long,
                 keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val before = read(s, root, fromV)
    val after  = read(s, root, toV)
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema drift between v$fromV and v$toV is not diffable")
    val valCols = after.columns.filterNot(keys.contains).toIndexedSeq
    val b = before.select(keys.map(col) ++
      valCols.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__in_b"): _*)
    val a = after.select(keys.map(col) ++
      valCols.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__in_a"): _*)
    val changed = valCols.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def ev(tpe: String, prefix: String) =
      struct(valCols.map(c => col(s"$prefix$c").as(c)) :+
        lit(tpe).as("_change_type"): _*)
    val isIns = col("__in_b").isNull
    val isDel = col("__in_a").isNull
    val isUpd = !isIns && !isDel && changed
    b.join(a, keys, "full_outer")
      .select(keys.map(col) :+ array(
        when(isIns, ev("insert", "__a_")),
        when(isDel, ev("delete", "__b_")),
        when(isUpd, ev("update_preimage", "__b_")),
        when(isUpd, ev("update_postimage", "__a_"))).as("__evs"): _*)
      .select(keys.map(col) :+
        explode(filter(col("__evs"), _.isNotNull)).as("__ev"): _*)
      .select(keys.map(col) ++ valCols.map(c =>
        col(s"__ev.$c")) :+ col("__ev._change_type"): _*)
  }

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }

  /** Drop all but the newest `keep` versions. Marker deleted before data so
    * a concurrent reader never resolves a visible version to missing files.
    * Data dirs are reference-counted across markers: a dir still named by
    * any RETAINED version's manifest (e.g. after [[rollback]]) survives.
    *
    * Also sweeps ORPHAN data dirs — attempts never referenced by any
    * surviving marker (crashed writers, [[commitChecked]] rejections, the
    * losing side of a commit race). Orphans are age-gated by
    * `orphanGraceMs` (Delta's VACUUM retention-window analogue): an
    * in-flight writer's freshly-written dir whose marker is not yet
    * claimed must never be swept, so only dirs untouched for the grace
    * window qualify. Pass 0 only when no writer can be live. */
  def vacuum(root: String, keep: Int,
             orphanGraceMs: Long = 24L * 3600 * 1000): Unit = {
    val vs = versions(root)
    val dropped = vs.dropRight(keep)
    val retained = vs.takeRight(keep).map(dataDirOf(root, _).getName).toSet
    dropped.foreach { v =>
      val data = dataDirOf(root, v)
      marker(root, v).delete(): Unit
      if (!retained.contains(data.getName)) rmTree(data)
    }
    val now = System.currentTimeMillis()
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("data-") &&
        !retained.contains(f.getName) &&
        now - f.lastModified() >= orphanGraceMs)
      .foreach(rmTree)
  }

  /** Recursive delete of a store root (test/sink reset helper). */
  def destroy(root: String): Unit = rmTree(new File(root))
}
