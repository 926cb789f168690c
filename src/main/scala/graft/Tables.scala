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

  /** Plan memo — NOT a result cache: the memoized value is the lazy
    * DataFrame (logical plan + file index), never rows. Every query still
    * computes from the parquet bytes; what the memo removes is the
    * per-construction driver work `spark.read.parquet` repeats on every
    * call — leaf-file listing and a footer read for schema inference
    * (~10–30 ms per table here, minutes against an object-store table with
    * many files). A 129-query bench sweep at 3 trials constructs ~900
    * table scans; at 100 TB the same memo is what keeps repeated queries
    * from re-listing the lake. Keyed by (session uuid, dir, name) so
    * Verify/Bench/test sessions and different scale dirs never share
    * plans. */
  private val loadCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), DataFrame]()
  operators.WarmState.registerCache(() => loadCache.clear())

  /** Session identity as a STRING (classic sessionUUID; identityHashCode
    * fallback for non-classic impls): cache keys built on it hold no
    * strong reference to the session object — the r18 shape keyed these
    * maps on the SparkSession itself, which pinned every session (and its
    * driver-side object graph) for the JVM lifetime in long-lived multi-
    * session processes (ADVICE r18). Cached VALUES that are DataFrames
    * still reference their session, so the DataFrame-valued maps also
    * register a WarmState clearer; the primitive-valued maps are leak-free
    * by key alone. */
  private def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.GraftBridge.sessionUUID(spark)
      .getOrElse(s"id@${System.identityHashCode(spark)}")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loadCache.computeIfAbsent((sessionKey(spark), dir, name), _ => {
      val df = normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"))
      if (name == "events") normalizeEventTs(df) else df
    })

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

  /** Spread a freshly-SCANNED frame across the session's cores when the
    * scan itself cannot: parquet parallelism is capped at row-group
    * granularity, so a single-file/single-row-group table (the driver's
    * sf0.1 fixtures; any gzip-style unsplittable source at a real site)
    * pins every downstream NARROW stage — regex, hashing, shingling — to
    * ONE task no matter how many cores the cluster has (measured: the
    * whole text family at 1.06 effective cores over a 1143 s sf10 chunk,
    * VERDICT r16 defect 1). The round-robin exchange costs one pass over
    * the payload, repaid ~cores× by the CPU-dense map above it.
    *
    * SCALE-CORRECT BY CONSTRUCTION: the exchange is inserted only when the
    * scan's split count is below the session's default parallelism — at
    * 100 TB inputs arrive in thousands of row groups, the condition is
    * false, and this is a zero-cost identity. Use it under CPU-dense
    * per-row families only; shuffle-bound pipelines re-spread at their
    * first exchange anyway. */
  /** Scans at or above this size are worth the exchange; below it the
    * serial per-row work costs less than the exchange itself (measured at
    * sf0.1: unconditional spread regressed 40+ small queries 1.3–3.2×
    * while winning <0.1 s back — the exchange + extra stage is ~0.2 s).
    * 16 MB compressed ≈ 50–60 MB of text ≈ multiple seconds of serial
    * regex/hash work — the first point where cores× repayment clearly
    * beats the fixed cost. */
  private val MinSpreadBytes: Long =
    sys.env.get("SPARK_GRAFT_SPREAD_MIN") // A/B override only — default is the measured break-even
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(16L << 20)

  /** Lower floor for CPU-DENSE per-row pipelines — shingling + MinHash/
    * SimHash sketching, containment verify, fingerprinting, PII regex —
    * where one serial scan task costs ~1–2 s/MB of input (StageProbe r18:
    * q58's three single-task shingle stages burned 1.0 s on a 0.58 MB
    * table; q33's fingerprint pass 1.0 s). There the ~0.15 s round-robin
    * exchange repays ~cores× immediately; byte-cheap consumers (plain
    * stats, id-only projections) keep the 16 MB default, which r17
    * measured as their break-even. Env-overridable for A/B
    * (SPARK_GRAFT_SPREAD_DENSE, byte-string syntax). */
  private[graft] val CpuDenseSpreadBytes: Long =
    sys.env.get("SPARK_GRAFT_SPREAD_DENSE")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(256L << 10)

  /** Layout cache key: session uuid + hash of the FULL sorted file list +
    * count. The r18 key (`files.min + ":" + length`) went stale when a
    * dataset was regenerated AT THE SAME PATH with the same file count
    * within one session (ADVICE r18: a stale byte total can flip
    * pinPairsIfSmall into pinning a huge pair set — the exact ENOSPC the
    * threshold exists to prevent). Spark parquet writers UUID their part
    * files, so any regeneration changes the full list; hashing it keys the
    * cache on actual layout identity without paying an FS stat on hit. */
  private def layoutKey(spark: SparkSession, files: Array[String]): (String, String) =
    (sessionKey(spark),
      s"${scala.util.hashing.MurmurHash3.orderedHash(files.sorted.toSeq)}:${files.length}")

  /** spread decisions keyed by file layout ([[layoutKey]]) and threshold:
    * the decision is a pure function of (layout, floor), and the per-file
    * FS stat behind the split estimate is the probe's only non-trivial
    * cost — pay it once per table per session, not once per query
    * construction. */
  private val spreadCache =
    new java.util.concurrent.ConcurrentHashMap[((String, String), Long), Boolean]()

  def spread(df: DataFrame): DataFrame = spread(df, MinSpreadBytes)

  def spread(df: DataFrame, minBytes: Long): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // inputFiles reads the relation's cached listing — no RDD
    // materialization, no job. Bare file COUNT is not a bound on splits in
    // either direction (a large file splits into multiple byte-range
    // partitions), so only the trivial cases short-circuit here; the real
    // decision estimates splits from file SIZES below.
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    val key = (layoutKey(spark, files), minBytes)
    val go = spreadCache.computeIfAbsent(key, _ => {
      // ≤ target-1 files to stat (guaranteed by the short-circuit above),
      // one FS metadata call each — cheap even against an object store.
      val hconf = spark.sparkContext.hadoopConfiguration
      val maxPB = math.max(1L, org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")))
      val lens = files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).getFileStatus(p).getLen
      }
      // splits ≈ Σ ceil(len / maxPartitionBytes): a few-large-files layout
      // (e.g. 8×1 GB on 32 cores) already scans with ≥ target byte-range
      // splits and must NOT pay a full round-robin exchange of the payload.
      // Caveat this estimate cannot see: byte-range splits over a file with
      // ONE giant row group still hand all rows to one task — writers that
      // produce such files (the pre-r17 ScaleUp did) need fixing at the
      // writer, not here (ScaleUp now writes spread files).
      val estSplits = lens.map(l => math.max(1L, (l + maxPB - 1) / maxPB)).sum
      estSplits < target && lens.sum >= minBytes
    })
    if (go) df.repartition(target) else df
  }

  /** Summed on-disk bytes of a scan-rooted frame's input files — the cheap
    * scale probe behind stats-conditional dispatches (pin-vs-recompute,
    * spread): file length is ground truth where optimizer row-count stats
    * are estimates. Cached per (session uuid, file layout — [[layoutKey]],
    * so a same-path regeneration can't serve stale bytes); ≤ one FS
    * metadata call per file per session. */
  private val bytesCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()

  def inputBytes(df: DataFrame): Long = {
    val files = df.inputFiles
    if (files.isEmpty) return 0L
    val spark = df.sparkSession
    bytesCache.computeIfAbsent(layoutKey(spark, files), _ => {
      val hconf = spark.sparkContext.hadoopConfiguration
      files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).getFileStatus(p).getLen
      }.sum
    })
  }

  /** Pin-then-sort for presentation ORDER BYs over scan-rooted NARROW
    * pipelines — plans with no exchange between the scan and the sort
    * (optimization r18, guide §1.4/§2.4): the sort's range sampler
    * executes the child once to pick partition bounds, and the sort
    * exchange then executes it AGAIN to write shuffle — a 2× tax on the
    * whole map (StageProbe at sf1: q33's twin ~75-CPU-s stages, q35/q36
    * the same shape; 16 declared queries carried it). The lazy
    * localCheckpoint materializes the map once and both passes read the
    * blocks; pinned mass = exactly the rows the sort's own shuffle
    * carries, so no new disk class at any scale. Queries whose sort
    * child already contains an exchange do NOT need this — AQE reuses
    * the shuffle stage for the sampler (verified: q85's single pass). */
  def sortOnce(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    pin(df).orderBy(cols: _*)

  /** Presentation sort for outputs whose CARDINALITY IS BOUNDED BY
    * CONSTRUCTION (fixed group domains: return-flag × line-status,
    * regions, buckets — a handful to a few thousand rows at ANY corpus
    * size). A global ORDER BY plans a range exchange whose partitioner
    * runs a separate SAMPLING JOB over the child before the sort proper —
    * two driver round-trips and an exchange to order rows that already fit
    * one task. `coalesce(1).sortWithinPartitions` produces the identical
    * total order (single partition ⇒ within-partition order IS the total
    * order) with no exchange and no sampler at all; the single sort task
    * is the natural shape for a presentation-sized result on a 100 TB
    * corpus too. Do NOT use for outputs that scale with the data (one row
    * per doc/pair) — those keep the distributed sort. Also do NOT use
    * over a LAZILY pinned (or otherwise narrow) child: coalesce(1) is a
    * narrow merge, so an unmaterialized upstream pipeline would execute
    * INSIDE the single sort task (measured: q27's pinned window path
    * +0.73 s) — the child must be exchange-rooted (an aggregate/join
    * output) for the collapse to stop at the shuffle boundary. */
  def sortSmall(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)

  def sortSmall(df: DataFrame, col0: String, rest: String*): DataFrame =
    df.coalesce(1).sortWithinPartitions(col0, rest: _*)

  def sortOnce(df: DataFrame, col0: String, rest: String*): DataFrame =
    pin(df).orderBy(col0, rest: _*)

  /** EXPLAIN-ONLY escape hatch: every pin truncates the committed plan
    * dump at `Scan ExistingRDD`, hiding exactly the pipeline a plan
    * reviewer needs to audit (the r17-verdict PlanDump lesson).
    * `SPARK_GRAFT_NOPIN=1` makes [[pin]]/[[sortOnce]] identities so
    * ExplainDump can emit the full `_prepin_` twin of each plan. Never
    * set for Bench/Verify — the pins are load-bearing there. */
  private[graft] val noPin: Boolean =
    sys.env.get("SPARK_GRAFT_NOPIN").contains("1")

  /** The ONE spelling of the lazy write-then-read pin (see call sites for
    * per-operator rationale; scale notes in [[sortOnce]]'s scaladoc and
    * the r18 optimization log). */
  def pin(df: DataFrame): DataFrame =
    if (noPin) df else df.localCheckpoint(eager = false)

  /** Eager twin of [[pin]] — for frames multiple subtrees read where the
    * materialization must happen before plan assembly (the media sigs
    * pattern). Same NOPIN escape hatch. */
  def pinEager(df: DataFrame): DataFrame =
    if (noPin) df else df.localCheckpoint(eager = true)

  /** Register every table as a temp view so `spark.sql` / SQL-surface tests
    * can address them by the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
