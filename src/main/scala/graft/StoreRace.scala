package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VersionedStore

/** Cross-PROCESS contention proof for [[graft.operators.VersionedStore]]
  * (VERDICT r18 item 5). VersionedStoreSpec proves writer isolation inside
  * one JVM; the commit protocol's actual claim — "the flip is one atomic
  * file creation" — is about concurrent WRITER PROCESSES (a real cluster's
  * writers share only the filesystem, nothing in-process). This harness
  * races N real JVMs, each committing M versions into ONE store root while
  * reading the latest version back after every commit, with one writer also
  * vacuuming mid-race; a final check pass proves:
  *
  *  - exactly one winner per version: max version == N·M, every retained
  *    marker names a DISTINCT data dir (no double-claim, no lost commit);
  *  - no torn reads: every in-race read of the latest version returned a
  *    complete snapshot (each writer asserts rows==ROWS_PER_COMMIT and a
  *    self-consistent (writer, seq) body, exiting non-zero otherwise);
  *  - vacuum-under-race safety: the mid-race `vacuum(keep=10)` calls never
  *    broke a concurrent reader (default orphan grace protects in-flight
  *    unclaimed data dirs), and after the race every RETAINED version still
  *    reads back complete.
  *
  * Modes (argv(0)):
  *  - `write <root> <writerId> <nCommits> <vacuumEvery>` — one racing
  *    writer JVM (vacuumEvery=0 disables its vacuum calls).
  *  - `race <root> <nWriters> <nCommits>` — orchestrator: forks the writer
  *    JVMs with this JVM's own classpath, waits, checks every invariant,
  *    prints one JSON line (the committed artifact; BENCH_NOTES convention).
  *
  * StoreRaceSpec drives `race` in-process so the proof re-runs with every
  * `sbt test` rather than living only in a round note.
  */
object StoreRace {

  val RowsPerCommit = 3

  private def session(app: String): SparkSession = Graft.session(app)

  /** One racing writer: commit, then immediately read the latest visible
    * version and assert it is a COMPLETE snapshot of whoever's commit won
    * that slot. Any torn read (partial file list, missing data dir,
    * malformed body) throws and fails the process. */
  def write(root: String, writerId: Int, nCommits: Int,
            vacuumEvery: Int): Unit = {
    val spark = session(s"store-race-w$writerId")
    try {
      (1 to nCommits).foreach { seq =>
        import spark.implicits._
        val df = Seq.tabulate(RowsPerCommit)(i => (writerId, seq, i))
          .toDF("writer", "seq", "row")
        val v = VersionedStore.commit(df.coalesce(1), root)
        // read-back of the LATEST version (>= v, possibly someone else's):
        // must always be a complete ROWS_PER_COMMIT snapshot of one commit
        val got = VersionedStore.read(spark, root)
          .select("writer", "seq", "row").collect()
        require(got.length == RowsPerCommit,
          s"torn read after v$v: ${got.length} rows != $RowsPerCommit")
        val owners = got.map(r => (r.getInt(0), r.getInt(1))).distinct
        require(owners.length == 1,
          s"torn read after v$v: mixed commits ${owners.mkString(",")}")
        require(got.map(_.getInt(2)).sorted.sameElements(0 until RowsPerCommit),
          s"torn read after v$v: incomplete row set")
        if (vacuumEvery > 0 && seq % vacuumEvery == 0)
          VersionedStore.vacuum(root, keep = 10)
      }
    } finally spark.stop()
  }

  /** Fork one writer JVM with this process's classpath. Tests fork (see
    * build.sbt), so java.class.path is the real suite classpath here. */
  private def forkWriter(root: String, writerId: Int, nCommits: Int,
                         vacuumEvery: Int, logDir: File): Process = {
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = Seq(java, "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.StoreRace", "write", root, writerId.toString,
      nCommits.toString, vacuumEvery.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", "2")
    pb.environment().remove("SPARK_GRAFT_MASTER") // writers race as local JVMs
    pb.redirectErrorStream(true)
    pb.redirectOutput(new File(logDir, s"writer-$writerId.log"))
    pb.start()
  }

  /** Orchestrate the race and verify the invariants; returns the JSON
    * artifact line. Throws on any violation. */
  def race(root: String, nWriters: Int, nCommits: Int): String = {
    val logDir = new File(root, "_racelogs")
    logDir.mkdirs()
    val procs = (0 until nWriters).map(w =>
      // writer 0 vacuums every 2 commits — vacuum racing live commits
      forkWriter(root, w, nCommits, if (w == 0) 2 else 0, logDir))
    val rcs = procs.map(_.waitFor())
    require(rcs.forall(_ == 0),
      s"writer JVMs exited ${rcs.mkString(",")} — torn read or failed " +
        s"commit; see ${logDir}/writer-*.log")

    // Invariant 1: every claim won exactly one version — no lost commits,
    // no double-claims. max version == total commits even though vacuum
    // dropped old markers mid-race.
    val vs = VersionedStore.versions(root)
    val total = nWriters.toLong * nCommits
    require(vs.last == total,
      s"expected max version $total, saw ${vs.last} — lost/duplicated claim")
    require(vs == vs.distinct && vs == vs.sorted, s"non-monotone versions $vs")

    // Invariant 2: one data dir per retained marker (winners are unique).
    val dirs = vs.map { v =>
      val body = new String(Files.readAllBytes(
        new File(root, f"_versions/$v%05d.commit").toPath),
        StandardCharsets.UTF_8)
      body.linesIterator.next().trim
    }
    require(dirs.distinct.length == dirs.length,
      "two versions share a data dir — double-claimed commit")

    // Invariant 3: every retained version still reads back complete after
    // the mid-race vacuums (marker-then-data delete order + grace window).
    // Graft.session getOrCreate's may hand back a PRE-EXISTING session
    // (StoreRaceSpec runs inside the suite's shared TestSession) — only
    // stop what this call actually created, or every later suite inherits
    // a stopped SparkContext.
    val preExisting =
      org.apache.spark.sql.SparkSession.getDefaultSession.exists(
        s => !s.sparkContext.isStopped)
    val spark = session("store-race-check")
    val perVersion =
      try vs.map { v =>
        val rows = VersionedStore.read(spark, root, v)
          .select("writer", "seq", "row").collect()
        require(rows.length == RowsPerCommit,
          s"v$v torn after vacuum: ${rows.length} rows")
        val owner = rows.map(r => (r.getInt(0), r.getInt(1))).distinct
        require(owner.length == 1, s"v$v mixes commits")
        owner.head
      } finally if (!preExisting) spark.stop()

    // Invariant 4: no (writer, seq) commit appears under two versions.
    require(perVersion.distinct.length == perVersion.length,
      "one (writer,seq) commit visible under two versions")

    s"""{"store_race":"ok","writers":$nWriters,"commits_per_writer":$nCommits,""" +
      s""""max_version":${vs.last},"retained_versions":${vs.length},""" +
      s""""distinct_data_dirs":${dirs.distinct.length},"torn_reads":0}"""
  }

  /** One crash-victim writer: runs commit's REAL first half (the parquet
    * write of a private data dir), drops a beacon naming the dir, then
    * parks — the orchestrator SIGKILLs this process inside the exact
    * window the commit protocol claims is safe: after the data write,
    * before the marker claim. SIGKILL bypasses every shutdown hook, so
    * nothing "cleans up" on the way down — the orphan is as raw as a
    * kernel OOM-kill would leave it. */
  def crashWrite(root: String, beacon: String): Unit = {
    val spark = session("store-race-victim")
    import spark.implicits._
    val df = Seq.tabulate(RowsPerCommit)(i => (999, 1, i))
      .toDF("writer", "seq", "row")
    // commit()'s first step, verbatim: private UUID dir, errorifexists
    val dataName = s"data-${java.util.UUID.randomUUID()}"
    df.coalesce(1).write.mode("errorifexists")
      .parquet(new File(root, dataName).toString)
    Files.write(Paths.get(beacon),
      dataName.getBytes(StandardCharsets.UTF_8))
    Thread.sleep(Long.MaxValue) // parked in the kill window
  }

  /** SIGKILL-a-writer-mid-commit proof (VERDICT r19 item 7): the claimed
    * crash invariant — an unclaimed data dir is INVISIBLE to readers,
    * harmless to later writers, protected by vacuum's orphan grace while
    * young, and sweepable once the grace lapses — verified against a real
    * forcibly-killed JVM, not an in-process simulated crash. */
  def crashKill(root: String): String = {
    // same shared-TestSession discipline as race(): only stop a session
    // this call itself created
    val preExisting =
      org.apache.spark.sql.SparkSession.getDefaultSession.exists(
        s => !s.sparkContext.isStopped)
    val spark = session("store-race-crash")
    try {
      import spark.implicits._
      def snapshot(writer: Int, seq: Int) =
        Seq.tabulate(RowsPerCommit)(i => (writer, seq, i))
          .toDF("writer", "seq", "row").coalesce(1)
      // a committed baseline the victim's orphan must never disturb
      val v1 = VersionedStore.commit(snapshot(1, 1), root)

      // fork the victim; kill it inside the data-written/marker-unclaimed
      // window (the beacon marks entry into that window)
      val logDir = new File(root, "_racelogs"); logDir.mkdirs()
      val beacon = new File(logDir, "victim.beacon").toString
      val java = Paths.get(sys.props("java.home"), "bin", "java").toString
      val pb = new ProcessBuilder(java, "-Xmx2g", "-cp",
        sys.props("java.class.path"), "graft.StoreRace", "crashwrite",
        root, beacon)
      pb.environment().put("SPARK_GRAFT_CPUS", "2")
      pb.environment().remove("SPARK_GRAFT_MASTER")
      pb.redirectErrorStream(true)
      pb.redirectOutput(new File(logDir, "victim.log"))
      val victim = pb.start()
      val deadline = System.currentTimeMillis() + 120000
      while (!Files.exists(Paths.get(beacon)) &&
             System.currentTimeMillis() < deadline) {
        require(victim.isAlive, s"victim died before the kill window; " +
          s"see $logDir/victim.log")
        Thread.sleep(50)
      }
      require(Files.exists(Paths.get(beacon)),
        "victim never reached the kill window")
      victim.destroyForcibly() // SIGKILL — no hooks, no cleanup
      victim.waitFor()
      val orphan = new String(Files.readAllBytes(Paths.get(beacon)),
        StandardCharsets.UTF_8).trim

      // 1. orphan bytes exist, but the store never saw a commit
      require(new File(root, orphan).isDirectory,
        s"expected the victim's data dir $orphan on disk")
      require(VersionedStore.versions(root) == Seq(v1),
        s"killed writer must not add a version: ${VersionedStore.versions(root)}")
      val after = VersionedStore.read(spark, root)
        .select("writer", "seq", "row").collect()
      require(after.length == RowsPerCommit &&
        after.forall(_.getInt(0) == 1),
        "reader after the kill must still see exactly the v1 snapshot")

      // 2. restart: the next writer commits normally over the orphan
      val v2 = VersionedStore.commit(snapshot(2, 1), root)
      require(v2 == v1 + 1, s"restart writer got v$v2, expected ${v1 + 1}")

      // 3. young orphan survives a graced vacuum (in-flight protection) …
      VersionedStore.vacuum(root, keep = 10)
      require(new File(root, orphan).isDirectory,
        "default-grace vacuum must not sweep a young orphan")
      // … and is swept once the grace lapses (no writer can be live here)
      VersionedStore.vacuum(root, keep = 10, orphanGraceMs = 0)
      require(!new File(root, orphan).exists(),
        "grace-lapsed vacuum must sweep the crash orphan")

      // 4. every retained version still reads back complete
      VersionedStore.versions(root).foreach { v =>
        val rows = VersionedStore.read(spark, root, v)
          .select("writer", "seq", "row").collect()
        require(rows.length == RowsPerCommit, s"v$v torn after sweep")
      }
      s"""{"store_crash_kill":"ok","orphan_visible_versions":0,""" +
        s""""restart_version":$v2,"orphan_swept":true}"""
    } finally if (!preExisting) spark.stop()
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "write" =>
      write(args(1), args(2).toInt, args(3).toInt, args(4).toInt)
    case "crashwrite" =>
      crashWrite(args(1), args(2))
    case "race" =>
      val line = race(args(1), args(2).toInt, args(3).toInt)
      println(line)
    case "crash" =>
      println(crashKill(args(1)))
    case other => sys.error(s"unknown mode $other")
  }
}
