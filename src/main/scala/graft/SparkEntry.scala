package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory; EVERY entry has a
  * companion `oracleSql` row and is hash-checked against DuckDB on the same
  * parquet inputs (t2 gate). The formerly rows-only families (LSH/ANN/
  * multimodal) are SQL-replayable since round 2: sketches hash through
  * `graft_md5_64` (= DuckDB `md5_number_lower`) and the permutation/
  * hyperplane constants are embedded as literals in the oracle SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q25_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ EventOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      SamplingOps.queries ++ CorpusOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TextOps.oracleSql ++ EventOps.oracleSql ++
      DedupOps.oracleSql ++ SimilarityOps.oracleSql ++ MultimodalOps.oracleSql ++
      SamplingOps.oracleSql ++ CorpusOps.oracleSql
}
