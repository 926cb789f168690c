package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two string-array columns in one fused pass:
  * |A ∩ B| / |A ∪ B| over the DISTINCT elements of each side.
  *
  * Replaces `size(array_intersect(a, b)) / size(array_union(a, b))`, which
  * materializes two intermediate arrays (and two hash sets) per row just to
  * take their sizes. The verify stage of every LSH dedup path (q51/q74 and
  * DedupPipeline) evaluates this per candidate pair, so the allocation is
  * on the hot path. Value parity with the composed form (and the DuckDB
  * oracle's `len(list_intersect(..)) / len(list_distinct(list_concat(..)))`)
  * is exact: same set semantics (a null ELEMENT is a distinct member, as in
  * array_intersect/array_union), empty ∪ empty → NULL (Spark's Divide
  * returns NULL on a zero divisor — NOT NaN, which would sort above every
  * threshold), and the division is the same IEEE op — only the
  * intermediates disappear.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStrArray(dt: DataType) = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStrArray(left.dataType) && isStrArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard requires two array<string> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  // beyond null inputs, empty ∪ empty yields a null RESULT
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Public so generated code can call it directly; null when both sides
    * are empty (0/0 — Spark's Divide semantics for the composed form). */
  def jaccard(a: ArrayData, b: ArrayData): java.lang.Double = {
    // null elements are distinct set members (array_intersect/union parity);
    // isNullAt must be checked — UnsafeArrayData.getUTF8String on a null
    // slot returns an empty string, silently conflating NULL with ""
    val sa = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var aHasNull = false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) aHasNull = true else sa.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var bHasNull = false
    var inter = 0L
    var unionExtra = 0L
    i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bHasNull = true
      else {
        val e = b.getUTF8String(i)
        if (seenB.add(e)) {
          if (sa.contains(e)) inter += 1 else unionExtra += 1
        }
      }
      i += 1
    }
    if (aHasNull && bHasNull) inter += 1
    val union = sa.size.toLong + unionExtra + (if (aHasNull || bHasNull) 1 else 0)
    if (union == 0L) null else java.lang.Double.valueOf(inter.toDouble / union)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jaccardSim", this, classOf[JaccardSimilarity].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r = $self.jaccard($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[JaccardSimilarity].getName, "graft_jaccard")

  import org.apache.spark.sql.{Column, GraftBridge}
  def of(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))
}
