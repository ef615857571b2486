package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Scratch-store hygiene for queries that must write a FRESH on-disk store
  * per invocation (join14's DPP-partitioned fact table, llm28d/e's
  * persisted IVF-PQ index): a UUID-tagged dir avoids stale-parquet reuse
  * and check-then-write races under concurrent suites, but with no cleanup
  * the dirs accumulate across rounds (ADVICE r9: 103 leftover dirs,
  * unbounded disk growth under median-of-3 bench).
  *
  * [[scratch]] pairs the UUID dir with a JVM shutdown hook that deletes it,
  * so every normally-exiting Bench/Verify/test JVM leaves zero scratch
  * dirs behind. [[sweep]] (called at Bench/Verify startup, before any
  * query can hold a live reader on a scratch path) removes whatever a
  * crashed or killed JVM still left.
  */
object TmpStores {

  val Root = "/root/repo/target/tmp-sinks"

  /** UUID-suffixed scratch dirs only — named sinks (sink1_csv …,
    * mig6b_homol_store) are session-stable by design and never swept. */
  private val ScratchName = "^[A-Za-z0-9_]+_[0-9a-f]{8}$".r.pattern

  private val created = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Fresh scratch-dir path `Root/<prefix>_<8-hex-uuid>`, deleted on JVM
    * exit. The caller writes it via Spark; nothing is created here. */
  def scratch(prefix: String): String = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        created.forEach(p => deleteRecursively(Paths.get(p)))
      }, "tmpstores-cleanup"))
    val dir = s"$Root/${prefix}_${java.util.UUID.randomUUID.toString.take(8)}"
    created.add(dir)
    dir
  }

  /** Delete leftover scratch dirs (UUID-suffixed only) from previous JVMs.
    * Safe only BEFORE any query of this JVM runs — a swept dir must have
    * no live reader. */
  def sweep(): Unit = {
    val root = Paths.get(Root)
    if (Files.isDirectory(root)) {
      val it = Files.list(root)
      try it.forEach { p =>
        if (ScratchName.matcher(p.getFileName.toString).matches
            && !created.contains(p.toString))
          deleteRecursively(p)
      } finally it.close()
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally walk.close()
    }
}
