package graft.util

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.xz.{XZCompressorInputStream, XZCompressorOutputStream}

/** UTIL-1 — tar.xz snapshot archiving, the reference's backup-upload
  * packaging (runcommand.py:245-249: `tarfile.open(path, mode='w:xz');
  * tf.add(local_backup_path, arcname=db_name)`). A driver-side utility,
  * not a relational operator: it packages an already-written store
  * snapshot (e.g. a [[graft.operators.VersionedStore]] version dir) for
  * transfer, exactly as the reference tars its database backup before the
  * object-store upload.
  *
  * Scale posture: an archive is a single sequential stream, so this runs
  * on ONE machine over ONE store snapshot — it is the transfer-packaging
  * tail of a pipeline, never a data-plane operator (at 100 TB the data
  * path ships partitioned parquet, not tarballs). Uses commons-compress +
  * the xz codec from the Spark runtime classpath; entries are added in
  * sorted path order so identical trees produce identical member order.
  */
object Archive {

  /** Archive `srcDir` (recursively) to `outFile` as tar.xz; entry names
    * are `arcname/<relative path>` — the reference's
    * `tf.add(dir, arcname=db_name)` shape. Parent dirs of `outFile` are
    * created. Returns the number of file entries written. */
  def tarXz(srcDir: String, outFile: String, arcname: String): Int = {
    val root = Paths.get(srcDir)
    require(Files.isDirectory(root), s"not a directory: $srcDir")
    val out = Paths.get(outFile)
    Option(out.getParent).foreach(Files.createDirectories(_))
    val tar = new TarArchiveOutputStream(new XZCompressorOutputStream(
      new BufferedOutputStream(Files.newOutputStream(out))))
    // parquet part files exceed tar's 100-char USTAR name limit routinely
    tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    var n = 0
    try {
      val walk = Files.walk(root)
      val files =
        try walk.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        finally walk.close()
      files.sortBy(p => root.relativize(p).toString).foreach { p =>
        val entry = new TarArchiveEntry(p.toFile,
          s"$arcname/${root.relativize(p).toString}")
        tar.putArchiveEntry(entry)
        Files.copy(p, tar)
        tar.closeArchiveEntry()
        n += 1
      }
    } finally tar.close()
    n
  }

  /** Extract a [[tarXz]] archive under `destDir`. Entry paths are
    * validated to stay inside `destDir` (a hostile `../` member must not
    * escape — the classic tar-slip). Returns the extracted file count. */
  def untarXz(archive: String, destDir: String): Int = {
    val dest = Paths.get(destDir).toAbsolutePath.normalize
    Files.createDirectories(dest)
    val tar = new TarArchiveInputStream(new XZCompressorInputStream(
      new BufferedInputStream(Files.newInputStream(Paths.get(archive)))))
    var n = 0
    try {
      var entry = tar.getNextEntry
      while (entry != null) {
        val target = dest.resolve(entry.getName).normalize
        require(target.startsWith(dest),
          s"archive entry escapes destination: ${entry.getName}")
        if (entry.isDirectory) Files.createDirectories(target)
        else {
          Option(target.getParent).foreach(Files.createDirectories(_))
          Files.copy(tar, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          n += 1
        }
        entry = tar.getNextEntry
      }
    } finally tar.close()
    n
  }

  /** xz magic (FD 37 7A 58 5A 00) — lets callers/specs assert the file
    * really is xz-compressed, not a renamed gz. */
  def isXz(file: String): Boolean = {
    val in = Files.newInputStream(Paths.get(file))
    try {
      val magic = in.readNBytes(6)
      magic.sameElements(Array(0xFD, 0x37, 0x7A, 0x58, 0x5A, 0x00).map(_.toByte))
    } finally in.close()
  }
}
