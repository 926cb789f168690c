package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import scala.jdk.CollectionConverters._

/** Archive sink (reference parity: `mitx/mitx_etl.py:108-121` — tar.gz the
  * day's exported courses into the daily folder).
  *
  * Spark has no archive writer, so this stays a DRIVER-SIDE post-step over a
  * completed export directory (the same position it occupies in the
  * reference DAG). Large-scale note: at 100 TB you would not tar at all —
  * you'd keep per-course blobs as individual objects (CourseExport.readBlobs
  * re-ingests them) — the archive exists only to reproduce the reference's
  * daily-artifact contract.
  */
object ArchiveSink {

  /** tar.gz every regular file under `srcDir` (relative paths preserved)
    * into `destFile`. Overwrites an existing archive (idempotent re-runs). */
  def tarGzDirectory(srcDir: String, destFile: String): Long = {
    val src = Paths.get(srcDir)
    // Files.walk requires explicit close (try-with-resources contract) —
    // a leaked directory handle per archive run starves a long-lived
    // driver of fds under daily/retry cadence
    val walk = Files.walk(src)
    val files =
      try walk.iterator().asScala.filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
      finally walk.close()
    val out = new TarArchiveOutputStream(new GZIPOutputStream(
      new BufferedOutputStream(new FileOutputStream(destFile))))
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    // default BIGNUMBER_ERROR aborts mid-archive on any file >= 8 GiB
    out.setBigNumberMode(TarArchiveOutputStream.BIGNUMBER_POSIX)
    try {
      files.foreach { f =>
        val entry = new TarArchiveEntry(f.toFile, src.relativize(f).toString)
        out.putArchiveEntry(entry)
        val in = new BufferedInputStream(new FileInputStream(f.toFile))
        try in.transferTo(out) finally in.close()
        out.closeArchiveEntry()
      }
    } finally out.close()
    files.size.toLong
  }

  /** The reference's daily layout: `{root}/{YYYYMMDD}/exported_courses_{YYYYMMDD}.tar.gz`
    * (`mitx_etl.py:115,138`). Returns the archive path. */
  def dailyArchive(exportDir: String, root: String, dateSuffix: String): Path = {
    val dailyFolder = Paths.get(root, dateSuffix)
    Files.createDirectories(dailyFolder)
    val dest = dailyFolder.resolve(s"exported_courses_$dateSuffix.tar.gz")
    tarGzDirectory(exportDir, dest.toString)
    dest
  }
}
