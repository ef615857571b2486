package graft.sources

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.{URI, URLDecoder, URLEncoder}
import java.nio.file.{Files, Paths, StandardCopyOption, Path => JPath}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** SINK-5 test double: a Hadoop [[FileSystem]] with OBJECT STORE semantics
  * (`s3m://bucket/key`), so the object-store write path (reference: S3
  * snapshot upload, runcommand.py:463-498) is exercised end-to-end in the
  * offline sandbox — the real Spark commit machinery (FileOutputCommitter
  * task/job temp dirs, parquet/csv writers, glob listing) runs against a
  * store that behaves like S3, not like POSIX:
  *
  *  - **flat key space**: "directories" exist only as key prefixes (plus
  *    explicit zero-byte markers from `mkdirs`, as S3A writes);
  *  - **PUT-on-close visibility**: `create` buffers the object and it
  *    becomes visible ATOMICALLY when the stream closes — readers never
  *    see a half-written object (S3 PUT semantics);
  *  - **strong read-after-write consistency** (post-2020 S3);
  *  - **rename = server-side COPY + DELETE, per key, NOT atomic** across
  *    a prefix — exactly the property that makes rename-based commit
  *    protocols slow/unsafe on object stores (why Graft.session opts
  *    into the S3A magic committer on real clusters). The contract spec
  *    measures this: an N-object prefix rename is N visible steps.
  *  - **no append** (objects are immutable).
  *
  * State is a flat DISK region (one URL-encoded file per object under
  * `fs.s3m.root`), NOT JVM heap — a real object store is external to every
  * process, and this mock must be too: under `local-cluster[…]` (multi-JVM
  * Verify, VERDICT r18 item 3) executors write task attempts from their own
  * processes and the driver lists/commits them from its own. A heap-backed
  * region silently passes under local[n] and loses every executor-written
  * byte under a real cluster — found by the r19 local-cluster gate.
  * [[S3MockFileSystem.install]] pins a per-driver region root into the
  * Hadoop conf, which Spark ships to executors with each job, so concurrent
  * driver JVMs stay isolated while each driver's executors share its
  * region. PUT atomicity rides an ATOMIC_MOVE of the buffered object into
  * the region.
  */
object S3MockFileSystem {

  /** total COPY operations issued by renames in THIS JVM — the contract
    * spec asserts a prefix rename costs one copy per object (the S3
    * reality) */
  val copies = new java.util.concurrent.atomic.AtomicLong(0)

  val RootKey = "fs.s3m.root"

  /** Register the scheme on a Hadoop conf and pin this driver's region
    * root (idempotent — re-install keeps an existing root so one session's
    * specs and queries share a region). */
  def install(conf: Configuration): Unit = {
    conf.set("fs.s3m.impl", classOf[S3MockFileSystem].getName)
    // Hadoop's FileSystem cache keys on (scheme, authority, ugi) — NOT on
    // the conf — so a second session in one JVM would resolve a cached FS
    // pointing at the FIRST session's region while its executors write to
    // the new one. A mock can afford a fresh instance per access.
    conf.set("fs.s3m.impl.disable.cache", "true")
    if (conf.get(RootKey) == null) {
      val dir = Files.createTempDirectory("graft-s3m-region")
      // this JVM owns the region it created: sweep it at exit so repeated
      // test/Verify runs don't accumulate full dump copies under tmp
      // (executor JVMs receive RootKey via the shipped conf and never
      // enter this branch, so only the creating driver deletes)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rec(p: JPath): Unit = {
          if (Files.isDirectory(p)) {
            val s = Files.list(p)
            try s.forEach(rec(_)) finally s.close()
          }
          Files.deleteIfExists(p): Unit
        }
        try rec(dir) catch { case _: Throwable => () }
      }))
      conf.set(RootKey, dir.toString)
    }
  }

  /** Flat on-disk key space: objects under `o/`, directory markers under
    * `m/`, PUT staging under `t/`; file name = URL-encoded full key
    * ("bucket/a/b/c"). Stateless beyond the directory, so every FS
    * instance (any JVM) constructing over the same root sees one region.
    *
    * Listings scan the whole flat region — O(total objects) per metadata
    * call, like a naive LIST on a real store. Acceptable at test scale
    * (regions hold committer temp files + small dumps); if a future
    * workload makes FileOutputCommitter's O(files) metadata calls bite,
    * shard `o/` by bucket/first key segment so listings scan one subtree. */
  final class Region(rootDir: String) {
    private val o = Paths.get(rootDir, "o")
    private val m = Paths.get(rootDir, "m")
    private val t = Paths.get(rootDir, "t")
    Seq(o, m, t).foreach(Files.createDirectories(_))

    /** Filename for a key: URL-encoded, but a long key ('/' inflates to
      * %2F — committer temp paths under a partitioned table run deep)
      * switches to prefix + SHA-256 to stay under the 255-byte Linux
      * filename component limit (real S3 allows 1024-byte keys). Hashed
      * names are listed through their sidecar `.name` file holding the
      * raw key, keeping listings exact. */
    private def enc(name: String): String = {
      val e = URLEncoder.encode(name, "UTF-8")
      if (e.length <= 200) e
      else {
        val h = java.security.MessageDigest.getInstance("SHA-256")
          .digest(name.getBytes("UTF-8")).map("%02x".format(_)).mkString
        s"LONG-$h"
      }
    }
    private def sidecarFor(dir: JPath, n: String): Unit = {
      val e = enc(n)
      if (e.startsWith("LONG-")) {
        val tmp = Files.createTempFile(t, "name", null)
        Files.write(tmp, n.getBytes("UTF-8"))
        Files.move(tmp, dir.resolve(e + ".name"),
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING): Unit
      }
    }
    /** Raw key for a listed filename; None when a LONG- entry's sidecar is
      * gone — i.e. a concurrent remover got between our listing and this
      * resolve (removals delete the entry FIRST, so sidecar-missing means
      * the entry itself is dead or dying; a lister skips it rather than
      * failing mid-commit). */
    private def dec(dir: JPath, file: String): Option[String] =
      if (file.startsWith("LONG-"))
        try Some(new String(
          Files.readAllBytes(dir.resolve(file + ".name")), "UTF-8"))
        catch { case _: java.nio.file.NoSuchFileException => None }
      else Some(URLDecoder.decode(file, "UTF-8"))
    private def ls(dir: JPath): Seq[String] = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.endsWith(".name"))
        .flatMap(f => dec(dir, f)).toVector
      finally s.close()
    }
    private implicit class IterAdapter[A](it: java.util.Iterator[A]) {
      def asScala: Iterator[A] = new Iterator[A] {
        def hasNext = it.hasNext; def next() = it.next()
      }
    }

    def objExists(n: String): Boolean = Files.exists(o.resolve(enc(n)))
    def objNames: Seq[String] = ls(o)
    def objBytes(n: String): Array[Byte] =
      try Files.readAllBytes(o.resolve(enc(n)))
      catch { case _: java.nio.file.NoSuchFileException =>
        throw new FileNotFoundException(n) }
    def objStat(n: String): Option[(Long, Long)] = {
      val p = o.resolve(enc(n))
      try Some((Files.size(p), Files.getLastModifiedTime(p).toMillis))
      catch { case _: java.nio.file.NoSuchFileException => None }
    }
    /** Atomic PUT: stage then ATOMIC_MOVE — visible whole or not at all.
      * The sidecar (if any) lands first so a listed hashed object always
      * resolves its raw key. */
    def putObj(n: String, bytes: Array[Byte],
               mtime: Option[Long] = None): Unit = {
      sidecarFor(o, n)
      val tmp = Files.createTempFile(t, "put", null)
      Files.write(tmp, bytes)
      mtime.foreach(ms => Files.setLastModifiedTime(tmp,
        java.nio.file.attribute.FileTime.fromMillis(ms)))
      Files.move(tmp, o.resolve(enc(n)), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING): Unit
    }
    /** Reads bytes + mtime as ONE guarded step: None when the object
      * vanished under a concurrent delete/rename (rename's COPY side needs
      * a single success-or-absent answer, not a stat that can go stale
      * before the read). */
    def objRead(n: String): Option[(Array[Byte], Long)] = {
      val p = o.resolve(enc(n))
      try {
        val mtime = Files.getLastModifiedTime(p).toMillis
        Some((Files.readAllBytes(p), mtime))
      } catch { case _: java.nio.file.NoSuchFileException => None }
    }
    // entry FIRST, sidecar second: a concurrent lister that saw the LONG-
    // entry must still be able to resolve its sidecar (dec() additionally
    // tolerates the post-delete window by skipping)
    def removeObj(n: String): Boolean = {
      val r = Files.deleteIfExists(o.resolve(enc(n)))
      Files.deleteIfExists(o.resolve(enc(n) + ".name"))
      r
    }

    def markerExists(n: String): Boolean = Files.exists(m.resolve(enc(n)))
    def markerNames: Seq[String] = ls(m)
    def addMarker(n: String): Unit = {
      sidecarFor(m, n)
      try Files.createFile(m.resolve(enc(n)))
      catch { case _: java.nio.file.FileAlreadyExistsException => }
      (): Unit
    }
    def removeMarker(n: String): Boolean = {
      val r = Files.deleteIfExists(m.resolve(enc(n)))
      Files.deleteIfExists(m.resolve(enc(n) + ".name"))
      r
    }
  }
}

class S3MockFileSystem extends FileSystem {
  import S3MockFileSystem._

  private var fsUri: URI = _
  private var bucket: String = _
  private var workDir: Path = _
  private var region: Region = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    require(name.getAuthority != null, s"s3m URI needs a bucket: $name")
    bucket = name.getAuthority
    fsUri = URI.create(s"s3m://$bucket")
    workDir = new Path(s"s3m://$bucket/")
    region = new Region(Option(conf.get(RootKey)).getOrElse(
      throw new IllegalStateException(
        s"$RootKey unset — call S3MockFileSystem.install(conf) first")))
    setConf(conf)
  }

  override def getScheme: String = "s3m"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(p: Path): Unit = workDir = p

  /** canonical key: "/a/b/c" ("" = bucket root) */
  private def key(p: Path): String = {
    val abs = makeQualified(p).toUri.getPath
    if (abs == null || abs == "/" || abs.isEmpty) ""
    else abs.stripSuffix("/")
  }
  /** region-global name (buckets share one flat region) */
  private def g(k: String): String = s"$bucket$k"
  private def marker(k: String) = s"$bucket$k"

  /** this bucket's object keys, bucket-local form "/a/b" */
  private def objKeys: Seq[String] =
    region.objNames.filter(_.startsWith(s"$bucket/"))
      .map(_.substring(bucket.length))

  private def isFile(k: String): Boolean = region.objExists(g(k))
  private def hasPrefix(k: String): Boolean = {
    val pre = s"$k/"
    // O(1) marker probe first — the common mkdirs'd-dir case skips the
    // O(region) listings (a disk region pays per-entry where the old heap
    // map paid O(1); at test scale the listings are small, but don't pay
    // them when a probe answers)
    region.markerExists(marker(k)) ||
      objKeys.exists(_.startsWith(pre)) ||
      region.markerNames.exists(_.startsWith(s"$bucket$pre"))
  }

  private def fileStatus(k: String): FileStatus = {
    val p = new Path(s"s3m://$bucket${if (k.isEmpty) "/" else k}")
    region.objStat(g(k)) match {
      case Some((len, mtime)) =>
        new FileStatus(len, false, 1, 32L * 1024 * 1024, mtime, p)
      case None => new FileStatus(0L, true, 1, 0L, 0L, p)
    }
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    if (k.isEmpty || isFile(k) || hasPrefix(k)) fileStatus(k)
    else throw new FileNotFoundException(s"s3m://$bucket$k")
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (isFile(k)) return Array(fileStatus(k))
    if (!k.isEmpty && !hasPrefix(k))
      throw new FileNotFoundException(s"s3m://$bucket$k")
    val pre = s"$k/"
    val names = scala.collection.mutable.SortedSet[String]()
    val dirs = scala.collection.mutable.SortedSet[String]()
    objKeys.foreach { kk =>
      if (kk.startsWith(pre)) {
        val rest = kk.substring(pre.length)
        val i = rest.indexOf('/')
        if (i < 0) names += rest else dirs += rest.substring(0, i)
      }
    }
    region.markerNames.foreach { m =>
      if (m.startsWith(s"$bucket$pre")) {
        val rest = m.substring(bucket.length + pre.length)
        if (rest.nonEmpty) {
          val i = rest.indexOf('/')
          dirs += (if (i < 0) rest else rest.substring(0, i))
        }
      }
    }
    // file-vs-dir shadowing, decided explicitly: when both an object
    // "a/b" and keys under "a/b/" exist (legal in a flat key space but
    // unrepresentable as one Hadoop FileStatus), the FILE entry wins —
    // matching fileStatus()/getFileStatus, which resolve isFile first,
    // so listing and stat can never disagree about the same path
    (dirs.diff(names).toSeq.map(d => fileStatus(s"$pre$d")) ++
      names.toSeq.map(n => fileStatus(s"$pre$n"))).toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val k = key(f)
    if (isFile(k)) throw new FileAlreadyExistsException(s"file exists: $k")
    if (k.nonEmpty) region.addMarker(marker(k))
    true
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = key(f)
    val bytes =
      try region.objBytes(g(k))
      catch { case _: FileNotFoundException =>
        throw new FileNotFoundException(s"s3m://$bucket$k") }
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (!overwrite && isFile(k))
      throw new FileAlreadyExistsException(s"s3m://$bucket$k")
    if (hasPrefix(k))
      throw new FileAlreadyExistsException(s"is a directory: $k")
    // PUT semantics: buffered locally, visible atomically at close
    val buf = new ByteArrayOutputStream(8192) {
      override def close(): Unit = region.putObj(g(k), toByteArray)
    }
    new FSDataOutputStream(buf, statistics)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "s3m objects are immutable — append is not an object-store operation")

  /** COPY + DELETE per key; a prefix rename is N separate visible steps
    * (the non-atomicity that disqualifies rename-commit on S3). */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    var dk = key(dst)
    val srcIsFile = isFile(sk)
    val srcIsDir = !srcIsFile && (sk.isEmpty || hasPrefix(sk))
    if (!srcIsFile && !srcIsDir) return false
    if (isFile(dk) || (hasPrefix(dk) && !srcIsDir)) {
      // rename INTO an existing directory (Hadoop contract)
      if (!isFile(dk) && hasPrefix(dk)) dk = s"$dk/${src.getName}"
      else return false
    } else if (hasPrefix(dk) && srcIsDir) dk = s"$dk/${src.getName}"
    if (sk == dk) return true
    if (srcIsDir && (dk + "/").startsWith(sk + "/")) return false
    // COPY (one guarded read — bytes+mtime together, so a concurrent
    // delete yields the contract's false/skip, not FileNotFoundException
    // out of a stat-then-read gap) … then DELETE: two steps, not one atom
    def copyThenDelete(from: String, to: String): Boolean =
      region.objRead(g(from)) match {
        case Some((bytes, mtime)) =>
          copies.incrementAndGet()
          region.putObj(g(to), bytes, Some(mtime))
          region.removeObj(g(from)): Unit
          true
        case None => false // source vanished under us
      }
    if (srcIsFile) {
      if (!copyThenDelete(sk, dk)) return false
    } else {
      val pre = s"$sk/"
      // a key that vanished mid-prefix-rename is simply skipped — exactly
      // S3's per-key, non-atomic batch-rename behavior
      objKeys.filter(_.startsWith(pre)).foreach(kk =>
        copyThenDelete(kk, s"$dk/${kk.substring(pre.length)}"): Unit)
      val mpre = s"$bucket$pre"
      region.markerNames.filter(m =>
          m.startsWith(mpre) || m == marker(sk))
        .foreach { m =>
          region.removeMarker(m)
          if (m == marker(sk)) region.addMarker(marker(dk))
          else region.addMarker(s"$bucket$dk/${m.substring(mpre.length)}")
        }
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (isFile(k)) { region.removeObj(g(k)); return true }
    if (k.isEmpty || hasPrefix(k)) {
      val pre = s"$k/"
      val keys = objKeys.filter(_.startsWith(pre))
      val ms = region.markerNames.filter(m =>
        m.startsWith(s"$bucket$pre") || m == marker(k))
      // markers nested UNDER k are contents too — a dir whose only
      // children are empty subdirectories is still non-empty for the
      // recursive=false contract
      if (!recursive && (keys.nonEmpty || ms.exists(_ != marker(k))))
        throw new IOException(s"directory not empty: $k")
      keys.foreach(kk => region.removeObj(g(kk)))
      ms.foreach(region.removeMarker)
      true
    } else region.removeMarker(marker(k))
  }
}

/** Seekable in-memory stream backing [[FSDataInputStream]] (parquet
  * footers read via seek + positioned reads). */
private[sources] class SeekableBytes(bytes: Array[Byte])
    extends java.io.InputStream with Seekable with PositionedReadable {
  private var pos = 0

  override def read(): Int =
    if (pos >= bytes.length) -1
    else { val b = bytes(pos) & 0xff; pos += 1; b }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= bytes.length) return -1
    val n = math.min(len, bytes.length - pos)
    System.arraycopy(bytes, pos, b, off, n)
    pos += n
    n
  }

  override def seek(p: Long): Unit = {
    if (p < 0 || p > bytes.length)
      throw new java.io.EOFException(s"seek $p outside 0..${bytes.length}")
    pos = p.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int,
                    length: Int): Int = {
    if (position >= bytes.length) return -1
    val n = math.min(length, bytes.length - position.toInt)
    System.arraycopy(bytes, position.toInt, buffer, offset, n)
    n
  }
  override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                         length: Int): Unit = {
    if (position + length > bytes.length)
      throw new java.io.EOFException(
        s"readFully past end: $position+$length > ${bytes.length}")
    System.arraycopy(bytes, position.toInt, buffer, offset, length)
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)
}
