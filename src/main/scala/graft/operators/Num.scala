package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Engine-parity numeric helpers: EXACT aggregation of money-valued double
  * columns.
  *
  * `round(sum(<double>), k)` is a rounding coin-flip between engines: the
  * FP sum is summation-order-dependent, and Spark's partial-aggregate order
  * differs from DuckDB's (and from itself run to run). Worse, the inputs
  * here are MONEY — doubles sitting on the 2-decimal grid (verified ≤ 4e-9
  * off-grid across every sf) — so true sums land EXACTLY on .005 rounding
  * midpoints and the flip is not even rare (two observed at sf0.1).
  *
  * The fix: snap each input to its true grid with a cast to DECIMAL(12,2)
  * (the stored double is ~1e-9 from the grid point, never near a midpoint,
  * so both engines recover the identical decimal), then do ALL arithmetic —
  * products with (1 ± rate) factors, sums, rounding — in exact decimal, and
  * cast the rounded result back to double (identical bits from identical
  * decimals). Used by every rounded-sum/avg output the DuckDB oracle
  * hash-checks.
  */
object Num {
  private val DT = "decimal(12,2)"

  /** Snap a money double to its exact 2-decimal value. */
  def money(c: Column): Column = c.cast(DT)

  /** Exact decimal literal 1.00 for (1 − discount) / (1 + tax) factors. */
  val one: Column = lit(new java.math.BigDecimal("1.00"))

  /** Exact rounded sum of a GRID-VALUED double column, returned as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(money(c)), scale).cast("double")

  /** Exact rounded sum of an already-decimal expression. */
  def dsumDec(c: Column, scale: Int = 2): Column =
    round(sum(c), scale).cast("double")

  /** Window variant of [[dsum]]. */
  def dsumOver(c: Column, w: WindowSpec, scale: Int = 2): Column =
    round(sum(money(c)).over(w), scale).cast("double")

  /** Exact-sum average: one double division of engine-identical operands. */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(money(c)).cast("double") / count(c), scale)

  /** DuckDB oracle text for [[dsum]]. */
  def dsumSql(e: String, scale: Int = 2): String =
    s"CAST(round(sum(CAST($e AS DECIMAL(12,2))), $scale) AS DOUBLE)"

  /** DuckDB oracle text for [[dsumDec]] (expression already decimal). */
  def dsumDecSql(e: String, scale: Int = 2): String =
    s"CAST(round(sum($e), $scale) AS DOUBLE)"

  /** DuckDB oracle text for [[davg]]. */
  def davgSql(e: String, scale: Int = 4): String =
    s"round(CAST(sum(CAST($e AS DECIMAL(12,2))) AS DOUBLE) / count($e), $scale)"
}
