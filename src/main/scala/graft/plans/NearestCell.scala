package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: the IVF cell (centroid id) nearest to one
  * embedding under cosine, over a centroid matrix that rides along as one
  * flat primitive `Array[Double]` reference — `argmax_cell cos(emb, c)`.
  *
  * Exists because the composed assignment it replaces — broadcast-join
  * every vector against all k centroids, then `row_number` over a
  * per-vector window — MATERIALIZES AND SHUFFLES n×k rows: at the sf10
  * record that was 2M vectors × ~2000 label-seeded cells = 4×10⁹ joined
  * rows through a window exchange (measured: q102 at 302 s, ~141× its
  * sf1 time at 10× data). The argmax is per-row arithmetic — n rows, n·k
  * fused FMAs, ZERO extra rows, zero shuffle — and the window's ordering
  * is replicated exactly, so assignments are bit-identical:
  *
  *  - per-cell value = dot/(√na·√nb), accumulated in element order (same
  *    FP rounding as [[CosineSimilarity]] / the composed `cosine`);
  *  - the window ordered `(cdist DESC, cell ASC)`: Spark sorts NaN above
  *    every double, so NaN (zero-norm side) outranks finite; NULL (null
  *    emb / null element / length ≠ dim) sorts last. All NULL cases are
  *    emb-side and hit every cell equally → the tie-break picks the
  *    SMALLEST cell id — reproduced by iterating cells in ascending id
  *    order (enforced by the companion) with strictly-greater wins;
  *  - output is never NULL: the window kept rank-1 rows regardless of
  *    cdist, so every vector got SOME cell (all-tie cases → smallest id).
  */
case class NearestCell(child: Expression,
                       cells: Array[Long],
                       centroids: Array[Double],
                       dim: Int)
    extends UnaryExpression {

  require(cells.nonEmpty, "NearestCell needs at least one centroid")
  require(centroids.length == cells.length * dim,
    s"centroid matrix ${centroids.length} != ${cells.length}*$dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nearest_cell"

  // value-equality over the matrix (the LshCodes discipline): two
  // NearestCell over different centroid sets must not compare equal
  override def equals(other: Any): Boolean = other match {
    case o: NearestCell =>
      child == o.child && dim == o.dim &&
        java.util.Arrays.equals(cells, o.cells) &&
        java.util.Arrays.equals(centroids, o.centroids)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dim),
      Int.box(java.util.Arrays.hashCode(cells)),
      Int.box(java.util.Arrays.hashCode(centroids)))

  /** Per-row entry point shared by eval and codegen (TextProfile pattern:
    * the hot loop lives in one JIT-friendly compiled method). */
  def cellOf(emb: ArrayData): Long = {
    if (emb == null || emb.numElements() != dim) return cells(0)
    var j = 0
    while (j < dim) { if (emb.isNullAt(j)) return cells(0); j += 1 }
    var na = 0.0
    j = 0
    while (j < dim) { val x = emb.getDouble(j); na += x * x; j += 1 }
    val sna = math.sqrt(na)
    // rank classes under (cdist DESC, cell ASC): NaN(2) > finite(1);
    // strictly-greater wins + ascending cell order = smallest-id tie-break
    var bestCell = cells(0)
    var bestClass = -1
    var bestVal = 0.0
    var c = 0
    val k = cells.length
    while (c < k) {
      var dot = 0.0; var nb = 0.0
      val base = c * dim
      var i = 0
      while (i < dim) {
        val x = emb.getDouble(i); val y = centroids(base + i)
        dot += x * y; nb += y * y
        i += 1
      }
      val v = dot / (sna * math.sqrt(nb))
      val cls = if (java.lang.Double.isNaN(v)) 2 else 1
      if (cls > bestClass || (cls == bestClass && cls == 1 && v > bestVal)) {
        bestClass = cls; bestVal = v; bestCell = cells(c)
      }
      c += 1
    }
    bestCell
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    cellOf(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code +
        code"""long ${ev.value} =
              |  $self.cellOf(${childGen.isNull} ? null : ${childGen.value});
              |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCell {
  import org.apache.spark.sql.{Column, GraftBridge}
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.{ArrayType => AT, DoubleType => DT}

  /** Column API over driver-side centroids `(cell, vector)` — k×dim
    * bounded, the same budget the broadcast it replaces assumed. Cells
    * are sorted ascending here so first-max-wins = smallest-id
    * tie-break. */
  def cellFor(emb: Column, centroids: Seq[(Long, Array[Double])]): Column = {
    require(centroids.nonEmpty, "no centroids")
    val sorted = centroids.sortBy(_._1).toArray
    val dim = sorted.head._2.length
    require(sorted.forall(_._2.length == dim), "ragged centroid matrix")
    GraftBridge.column(NearestCell(
      Cast(GraftBridge.expression(emb), AT(DT)),
      sorted.map(_._1), sorted.flatMap(_._2), dim))
  }
}
