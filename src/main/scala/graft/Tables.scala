package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    val df = normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"))
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Driver testdata has shipped two timestamp encodings across rounds:
    * TIMESTAMP(NANOS) (no native Spark type; surfaces as LongType nanos
    * under `spark.sql.legacy.parquet.nanosAsLong=true`, handled by
    * [[normalizeEventTs]]) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (surfaces as TIMESTAMP_NTZ). Normalize NTZ columns to the session-zone
    * TIMESTAMP — the session is pinned to UTC everywhere in this repo, so
    * the cast reinterprets the same wall-clock instant and every operator
    * (incl. `unix_micros`, which rejects NTZ) sees ONE timestamp type
    * regardless of which writer produced the input. The DuckDB oracle reads
    * the same parquet as naive timestamps, so canonical values agree. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntz.foldLeft(df)((acc, c) => acc.withColumn(c, col(c).cast(TimestampType)))
  }

  /** events.ts as TIMESTAMP(NANOS) parquet surfaces as LongType nanos (see
    * above); truncate to microseconds — the same truncation DuckDB/pandas
    * apply when downcasting — so both engines see identical values. */
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
