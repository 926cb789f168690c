package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Object-store prefix discovery → catalog maintenance (reference parity:
  * `mailgun_crawler/manage_crawler_targets.py:3-9` — list first-level
  * prefixes under `mailgun/`, register each as a crawler target).
  *
  * The Hadoop FileSystem API abstracts local paths in tests and `s3a://` in
  * production; listing is a driver-side metadata operation either way. The
  * downstream "crawler" step becomes native catalog registration.
  */
object PrefixCatalog {

  final case class CrawlTarget(path: String, exclusions: Seq[String] = Nil)

  /** First-level "directories" under `base` — the `CommonPrefixes` call. */
  def listFirstLevelPrefixes(spark: SparkSession, base: String): Seq[CrawlTarget] = {
    val p = new Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(st => CrawlTarget(st.getPath.toString + "/"))
      .sortBy(_.path)
  }

  /** Register one external table per discovered prefix (the engine-native
    * analog of `glue.update_crawler(Targets=...)`). Table names are derived
    * from the leaf prefix name. */
  def registerPrefixTables(spark: SparkSession, base: String, namePrefix: String): Seq[String] =
    listFirstLevelPrefixes(spark, base).map { t =>
      val leaf = new Path(t.path).getName
      val table = s"${namePrefix}_$leaf".replaceAll("[^A-Za-z0-9_]", "_")
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"CREATE TABLE $table USING parquet LOCATION '${t.path}'")
      table
    }
}
