package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `|distinct(A) ∩ B|` of two string-array columns in one fused pass —
  * value-identical to `size(array_intersect(a, b))` (optimization r19, the
  * [[JaccardSimilarity]] treatment applied to the containment verify).
  *
  * `array_intersect` materializes the full intersection ARRAY (copying
  * every common UTF8String into a fresh GenericArrayData) just so `size`
  * can read its length; the containment verify (q114/q116/q129) evaluates
  * it once per candidate pair with ~100-element shingle arrays, so the
  * per-row allocation is on the hot path. This expression counts instead
  * of copying: one membership hash set over B, one seen-set over A, zero
  * intermediate arrays.
  *
  * Parity with `size(array_intersect(a, b))`, exactly:
  *  - count = distinct non-null elements of A present in B, plus 1 when
  *    BOTH sides contain a null element (array_intersect keeps one null in
  *    that case);
  *  - NULL input array → NULL (size(NULL) is NULL under the non-legacy
  *    default this repo runs);
  *  - result type LONG: every consumer divides by an int (`least(na, nb)`),
  *    and int/int vs long/int both go through Spark's double Divide, so
  *    the quotient is bit-identical.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStrArray(dt: DataType) = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStrArray(left.dataType) && isStrArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_count requires two array<string> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Public so generated code can call it directly. */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    // null elements are set members (array_intersect parity); isNullAt must
    // be checked — UnsafeArrayData.getUTF8String on a null slot returns an
    // empty string, silently conflating NULL with ""
    val sb = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var bHasNull = false
    var i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bHasNull = true else sb.add(b.getUTF8String(i))
      i += 1
    }
    val seenA = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var aHasNull = false
    var inter = 0L
    i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) aHasNull = true
      else {
        val e = a.getUTF8String(i)
        if (sb.contains(e) && seenA.add(e)) inter += 1
      }
      i += 1
    }
    if (aHasNull && bHasNull) inter += 1
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("interCount", this, classOf[IntersectCount].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$self.intersectCount($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[IntersectCount].getName, "graft_intersect_count")

  import org.apache.spark.sql.{Column, GraftBridge}
  def of(a: Column, b: Column): Column =
    GraftBridge.column(IntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
