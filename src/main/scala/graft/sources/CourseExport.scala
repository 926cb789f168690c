package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Course-export fan-out (reference parity: `mitx/mitx_etl.py:74-121` —
  * `dump_course_ids` → per-course `export_olx` subprocess → daily folder →
  * S3 sync).
  *
  * The reference exports courses ONE AT A TIME in a driver loop
  * (`mitx_etl.py:86-102`). Here the id list becomes a Dataset fanned out
  * with `foreachPartition`: each executor slot runs the (injected) exporter
  * for its slice and writes `{outDir}/{courseId}.tar.gz`. Exports are
  * deterministic-output + overwrite, so task retries are idempotent
  * (at-least-once execution converges — SURVEY.md §7.3).
  *
  * The exporter is a function `courseId => bytes` so tests inject a fake;
  * production wires `sys.process` around the real `export_olx` CLI.
  */
object CourseExport {

  /** Driver-side id listing (the `dump_course_ids` stdout analog). */
  def courseIds(raw: String): Seq[String] =
    raw.split("\n").map(_.trim).filter(_.nonEmpty).toSeq

  /** Filesystem-safe blob name: sanitized id, plus a short content hash of
    * the ORIGINAL id whenever sanitization changed it — so distinct ids
    * like `course/a` and `course:a` can never collide on `course_a`. */
  private[sources] def safeName(id: String): String = {
    val safe = id.replaceAll("[^A-Za-z0-9._-]", "_")
    if (safe == id) safe
    else {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(id.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      s"$safe-$digest"
    }
  }

  /** Parallel export: ids → executor-side exporter calls → one blob per id.
    * Repartitions to `parallelism` so the fan-out width is explicit.
    *
    * Blobs are written through the Hadoop FileSystem API from the
    * EXECUTORS, so `outDir` must be a shared filesystem URI (file:// in
    * local mode, hdfs:///s3a:// on a cluster) — executor-local java.nio
    * writes would scatter blobs across worker disks. */
  def exportAll(spark: SparkSession, ids: Seq[String], outDir: String,
                exporter: String => Array[Byte], parallelism: Int = 8): Unit = {
    import spark.implicits._
    // Ship the session's Hadoop configuration (s3a credentials, defaultFS…)
    // to the executors as plain entries — a fresh Configuration() there
    // would silently drop every spark.hadoop.* setting.
    val confEntries: Seq[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.toSeq
    }
    spark.createDataset(ids)
      .repartition(parallelism)
      .foreachPartition { part: Iterator[String] =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        part.foreach { id =>
          val dest = new org.apache.hadoop.fs.Path(s"$outDir/${safeName(id)}.tar.gz")
          val fs = dest.getFileSystem(conf)
          val out = fs.create(dest, true) // creates parent dirs on any scheme
          try out.write(exporter(id)) finally out.close()
        }
      }
  }

  /** Re-ingest exported blobs as a binary DataFrame
    * (path, modificationTime, length, content) for downstream processing. */
  def readBlobs(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tar.gz").load(dir)
}
