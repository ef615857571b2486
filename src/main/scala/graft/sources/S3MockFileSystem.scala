package graft.sources

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FSDataInputStream, FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** SINK-5 test double: an in-process Hadoop [[FileSystem]] with OBJECT
  * STORE semantics (`s3m://bucket/key`), so the object-store write path
  * (reference: S3 snapshot upload, runcommand.py:463-498) is exercised
  * end-to-end in the offline sandbox — the real Spark commit machinery
  * (FileOutputCommitter task/job temp dirs, parquet/csv writers, glob
  * listing) runs against a store that behaves like S3, not like POSIX:
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
  * State is JVM-global (one "region" of buckets), so a query can write
  * through one FileSystem instance and read through another, as Spark's
  * executor/driver split does in local mode.
  */
object S3MockFileSystem {
  final case class Obj(bytes: Array[Byte], mtime: Long)

  /** bucket → (key "/a/b/c" → object) */
  private[sources] val buckets =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.ConcurrentHashMap[String, Obj]]()
  /** explicit directory markers: "bucket/a/b" */
  private[sources] val markers =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** total COPY operations issued by renames — the contract spec asserts
    * a prefix rename costs one copy per object (the S3 reality) */
  val copies = new java.util.concurrent.atomic.AtomicLong(0)

  def clear(): Unit = { buckets.clear(); markers.clear(); copies.set(0) }

  /** Register the scheme on a Hadoop conf (idempotent). */
  def install(conf: Configuration): Unit =
    conf.set("fs.s3m.impl", classOf[S3MockFileSystem].getName)
}

class S3MockFileSystem extends FileSystem {
  import S3MockFileSystem._

  private var fsUri: URI = _
  private var bucket: String = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    require(name.getAuthority != null, s"s3m URI needs a bucket: $name")
    bucket = name.getAuthority
    fsUri = URI.create(s"s3m://$bucket")
    workDir = new Path(s"s3m://$bucket/")
    setConf(conf)
  }

  override def getScheme: String = "s3m"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(p: Path): Unit = workDir = p

  private def store =
    buckets.computeIfAbsent(bucket,
      _ => new java.util.concurrent.ConcurrentHashMap[String, Obj]())

  /** canonical key: "/a/b/c" ("" = bucket root) */
  private def key(p: Path): String = {
    val abs = makeQualified(p).toUri.getPath
    if (abs == null || abs == "/" || abs.isEmpty) ""
    else abs.stripSuffix("/")
  }
  private def marker(k: String) = s"$bucket$k"

  private def isFile(k: String): Boolean = store.containsKey(k)
  private def hasPrefix(k: String): Boolean = {
    val pre = s"$k/"
    store.keySet.stream.anyMatch(_.startsWith(pre)) ||
      markers.contains(marker(k)) ||
      markers.stream.anyMatch(_.startsWith(s"$bucket$pre"))
  }

  private def fileStatus(k: String): FileStatus = {
    val p = new Path(s"s3m://$bucket${if (k.isEmpty) "/" else k}")
    if (isFile(k)) {
      val o = store.get(k)
      new FileStatus(o.bytes.length.toLong, false, 1, 32L * 1024 * 1024,
        o.mtime, p)
    } else new FileStatus(0L, true, 1, 0L, 0L, p)
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
    store.keySet.forEach { kk =>
      if (kk.startsWith(pre)) {
        val rest = kk.substring(pre.length)
        val i = rest.indexOf('/')
        if (i < 0) names += rest else dirs += rest.substring(0, i)
      }
    }
    markers.forEach { m =>
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
    if (k.nonEmpty) markers.add(marker(k))
    true
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = key(f)
    val o = store.get(k)
    if (o == null) throw new FileNotFoundException(s"s3m://$bucket$k")
    new FSDataInputStream(new SeekableBytes(o.bytes))
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
      override def close(): Unit =
        store.put(k, Obj(toByteArray, System.currentTimeMillis()))
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
    if (srcIsFile) {
      val o = store.get(sk)
      copies.incrementAndGet()
      store.put(dk, o) // COPY …
      store.remove(sk) // … then DELETE: two steps, not one atom
    } else {
      val pre = s"$sk/"
      val keys = store.keySet.stream.filter(_.startsWith(pre))
        .toArray(n => new Array[String](n))
      keys.foreach { kk =>
        val o = store.get(kk)
        copies.incrementAndGet()
        store.put(s"$dk/${kk.substring(pre.length)}", o)
        store.remove(kk)
      }
      val mpre = s"$bucket$pre"
      val ms = markers.stream.filter(m =>
          m.startsWith(mpre) || m == marker(sk))
        .toArray(n => new Array[String](n))
      ms.foreach { m =>
        markers.remove(m)
        if (m == marker(sk)) markers.add(marker(dk))
        else markers.add(s"$bucket$dk/${m.substring(mpre.length)}")
      }
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (isFile(k)) { store.remove(k); return true }
    if (k.isEmpty || hasPrefix(k)) {
      val pre = s"$k/"
      val keys = store.keySet.stream.filter(_.startsWith(pre))
        .toArray(n => new Array[String](n))
      val ms = markers.stream.filter(m =>
          m.startsWith(s"$bucket$pre") || m == marker(k))
        .toArray(n => new Array[String](n))
      // markers nested UNDER k are contents too — a dir whose only
      // children are empty subdirectories is still non-empty for the
      // recursive=false contract
      if (!recursive && (keys.nonEmpty || ms.exists(_ != marker(k))))
        throw new IOException(s"directory not empty: $k")
      keys.foreach(store.remove)
      ms.foreach(markers.remove)
      true
    } else markers.remove(marker(k))
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
