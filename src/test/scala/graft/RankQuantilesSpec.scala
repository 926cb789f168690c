package graft.operators

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r17 rank-SELECTION rewrite of [[Relational.rankQuantiles]]
  * (range-partition → per-cell counts → sort only boundary partitions) must
  * be value-identical to the window formulation it replaced — including on
  * heavy TIES (equal values straddling range-partition boundaries), groups
  * spanning many partitions, 1-row groups, and group counts larger than the
  * partition count. */
class RankQuantilesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val qs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75", 0.95 -> "p95")

  /** The replaced window-sort formulation — kept here as the reference. */
  private def windowed(base: DataFrame, groupCol: String): DataFrame = {
    val counts = base.groupBy(groupCol).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupCol).orderBy("v")
    def pos(q: Double) = lit(q) * (col("n") - 1).cast("double")
    val boundary = qs.map { case (q, _) =>
      col("rk") === (floor(pos(q)) + 1) || col("rk") === (ceil(pos(q)) + 1)
    }.reduce(_ || _)
    val ranked = base
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .join(broadcast(counts), groupCol)
      .filter(boundary)
    val aggs = qs.flatMap { case (q, nm) => Seq(
      max(when(col("rk") === (floor(pos(q)) + 1), col("v"))).as(s"lo_$nm"),
      max(when(col("rk") === (ceil(pos(q)) + 1), col("v"))).as(s"hi_$nm"))
    } :+ max("n").as("n")
    val interp = qs.map { case (q, nm) =>
      val p = pos(q)
      round(when(floor(p) === ceil(p), col(s"lo_$nm"))
        .otherwise((ceil(p) - p) * col(s"lo_$nm") + (p - floor(p)) * col(s"hi_$nm")), 4)
        .as(nm)
    }
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
      .select((col(groupCol) +: interp :+ col("n")): _*)
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("g").collect().toSeq.map(_.toSeq)

  private def check(base: DataFrame): Unit = {
    // force the SELECTION path (the r18 dispatch would route these small
    // inputs to the fused window path, which is the reference itself)
    val got = canon(Relational.rankQuantiles(base, "g", qs, selectionMinRows = 0L))
    val want = canon(windowed(base, "g"))
    assert(got == want, s"\ngot  = $got\nwant = $want")
    // the default dispatch must agree regardless of which path it picks
    val dispatched = canon(Relational.rankQuantiles(base, "g", qs))
    assert(dispatched == want, s"\ndispatched = $dispatched\nwant = $want")
  }

  test("selection == window formulation on deterministic pseudo-random data") {
    // xxhash-scattered values, 4 groups of very different sizes
    val base = spark.range(20011)
      .select(
        concat(lit("grp"), pmod(col("id"), lit(4))).as("g"),
        (pmod(xxhash64(col("id")), lit(100000)) / lit(100.0)).as("v"))
    check(base)
  }

  test("selection == window on heavy ties straddling partition boundaries") {
    // only 5 distinct values over 9973 rows: every range boundary cuts
    // through a run of equal values
    val base = spark.range(9973)
      .select(
        concat(lit("t"), pmod(col("id"), lit(3))).as("g"),
        pmod(xxhash64(col("id"), lit(7)), lit(5)).cast("double").as("v"))
    check(base)
  }

  test("selection == window on 1-row groups and more groups than partitions") {
    val base = spark.range(977)
      .select(
        concat(lit("one"), col("id")).as("g"), // every group has exactly 1 row
        (col("id") * lit(1.5)).as("v"))
    check(base)
    val many = spark.range(50 * 97)
      .select(
        concat(lit("m"), pmod(col("id"), lit(97))).as("g"), // 97 groups > 4 partitions
        (pmod(xxhash64(col("id"), lit(3)), lit(1000)) / lit(10.0)).as("v"))
    check(many)
  }

  test("boundary-only partitions are sorted: non-needed partitions emit nothing") {
    // structural invariant is internal; assert the observable contract —
    // output has exactly one row per group with the exact interpolation
    val base = spark.range(5000)
      .select(concat(lit("z"), pmod(col("id"), lit(2))).as("g"),
        col("id").cast("double").as("v"))
    val out = Relational.rankQuantiles(base, "g", qs, selectionMinRows = 0L).collect()
    assert(out.length == 2)
    // group z0: values 0,2,...,4998 (n=2500): p50 = (v at rk 1250 + v at rk 1251)/2... use window truth
    check(base)
  }

  test("r18 dispatch: small inputs take the fused window path, non-double v accepted") {
    // the decision itself (plan-level detection went away in r18: BOTH
    // paths now end in a lazy localCheckpoint pin, so the executed plan is
    // a Scan ExistingRDD either way — the pin is what stops the caller's
    // presentation ORDER BY from re-running the window sort)
    assert(!Relational.selectionPathFor(totalRows = 5000, nGroups = 2),
      "small input should dispatch to the window formulation")
    assert(Relational.selectionPathFor(totalRows = 5L * 1000 * 1000, nGroups = 4),
      "large low-G input should dispatch to selection")
    val small = spark.range(5000)
      .select(concat(lit("w"), pmod(col("id"), lit(2))).as("g"),
        col("id").as("v")) // LONG v: the up-front cast must handle it
    val df = Relational.rankQuantiles(small, "g", qs)
    // r18 pin: the window path's G-row output must come back checkpointed
    // so downstream range-sampling/broadcast builds re-read cached rows
    assert(df.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "window-path output should be pinned (lazy localCheckpoint)")
    // and a LongType v through the SELECTION path must not ClassCastException
    val sel = Relational.rankQuantiles(small, "g", qs, selectionMinRows = 0L)
    assert(canon(sel) == canon(df))
  }

  test("r18 guard: group cardinality above the driver-collect bound falls back") {
    // 20k one-row groups > SelectionMaxGroups (10k): even when selection is
    // forced by row count the guard must route to the window path rather
    // than collect a 20k×P cell map
    assert(!Relational.selectionPathFor(totalRows = 5L * 1000 * 1000, nGroups = 20000),
      "high-G input should fall back to the window formulation")
    val wide = spark.range(20000)
      .select(concat(lit("g"), col("id")).as("g"), (col("id") * 1.5).as("v"))
    val df = Relational.rankQuantiles(wide, "g", qs, selectionMinRows = 0L)
    assert(df.count() == 20000)
  }
}
