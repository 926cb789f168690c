package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The email-mapping pipeline — the reference's one real data query
  * (`email_mapping/email_mapping.py:43-68`), re-expressed as a lazy Spark
  * plan: JDBC/parquet source → project (username, email) → salted SHA-256 →
  * parquet sink at `{out}/{app}_user_map/`.
  *
  * Differences from the reference, by design:
  *  - the whole-table-into-pandas step disappears: executors pull source
  *    partitions and write parquet directly (no local staging, no s3fs
  *    upload step — Hadoop S3A writes straight to object storage);
  *  - the salted hash is composed from codegen'd built-ins
  *    (`sha2(concat(lit(salt), col))`), not a per-row UDF — semantics are
  *    identical to Python `hashlib.sha256(salt.encode()+email.encode())
  *    .hexdigest()`: UTF-8 both parts, lowercase hex;
  *  - JDBC reads are partitioned (`partitionColumn/numPartitions`) so a
  *    100 TB-scale source table fans out across executors instead of one
  *    cursor.
  */
object EmailMapping {

  /** The transform, exposed for tests and reuse: project + salted hash. */
  def saltedHash(df: DataFrame, salt: String): DataFrame =
    df.select(
      col("username"),
      sha2(concat(lit(salt), col("email")), 256).as("email"))

  /** JDBC extract with partitioned reads. `partitionColumn` must be numeric
    * and indexed on the source; bounds are discovered by the caller. */
  def extractJdbc(spark: SparkSession, cfg: EtlConfig,
                  partitionColumn: String, lower: Long, upper: Long,
                  numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.dbUrl)
      .option("dbtable", cfg.userTable)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
      .select("username", "email") // Catalyst pushes the projection into the JDBC query

  /** Full pipeline against an already-extracted frame (parquet stand-in or
    * JDBC): transform + write to `{outRoot}/{app}_user_map/`. */
  def run(source: DataFrame, cfg: EtlConfig, outRoot: String): String = {
    val dest = s"$outRoot/${cfg.appName}_user_map"
    saltedHash(source, cfg.hashSalt)
      .write.mode(SaveMode.Overwrite).parquet(dest)
    dest
  }
}
