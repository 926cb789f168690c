package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All tables are plain parquet files at `\$dir/<name>.parquet`. At 100 TB the
  * same code path works unchanged against `s3a://bucket/prefix/<name>` roots:
  * `spark.read.parquet` does partition discovery, predicate pushdown and
  * column pruning through the vectorized parquet reader, so operators built
  * on these loaders inherit scan-level optimization for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark has no native type
    * for. With `spark.sql.legacy.parquet.nanosAsLong=true` (set in the
    * Verify/Bench/test session builders) it surfaces as LongType nanos; we
    * truncate to microseconds — the same truncation DuckDB/pandas apply when
    * downcasting — so both engines see identical timestamp values. */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => df
    }

  /** Register every table as a temp view so `spark.sql` / SQL-surface tests
    * can address them by the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
