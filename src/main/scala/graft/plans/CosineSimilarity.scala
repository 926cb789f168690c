package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two array<double>
  * columns in a single fused loop.
  *
  * The composed built-in version ([[graft.operators.SimilarityOps.cosine]])
  * walks each array three times (zip_with dot + two transform norms), each
  * pass allocating an intermediate array. This expression computes dot and
  * both norms in ONE pass with zero allocation, and participates in
  * whole-stage codegen via [[doGenCode]] — the preference order from the
  * build brief: built-ins first, then a native Expression (this), never a
  * Scala UDF (which would box every element and break codegen).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  // nullable even for non-null children: length mismatch yields NULL
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  /** Mismatched lengths yield NULL — DuckDB's list_cosine_similarity errors
    * on them, so silently truncating to the shorter array would return a
    * plausible-but-wrong number where the oracle aborts. A NULL ELEMENT in
    * either array also yields NULL: ArrayData.getDouble reads a null slot
    * as 0.0, which would fabricate a finite similarity where the composed
    * zip_with/aggregate form this expression replaces propagates NULL. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (xs.isNullAt(i) || ys.isNullAt(i)) return null
        val x = xs.getDouble(i); val y = ys.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "graft_cosine")
}

/** cos(x, x) computed in ONE norm pass instead of cosine's dot + 2 norms —
  * the target of [[SelfCosineToOne]]: NULL input stays NULL; zero vectors
  * and vectors containing NaN/Infinity (or whose norm overflows) stay NaN,
  * matching graft_cosine's 0/0, NaN-propagation and Inf/Inf results;
  * everything else is exactly 1.0 (where the unfused form may differ from
  * 1.0 in the final ulp, since sqrt(n)*sqrt(n) ≠ n in floating point). */
case class SelfCosine(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"graft_self_cosine requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_self_cosine"

  // nullable even for a non-null child: a NULL element propagates NULL
  // (graft_cosine's own semantics for the same vector twice)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    var norm = 0.0
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val x = xs.getDouble(i); norm += x * x; i += 1
    }
    if (java.lang.Double.isFinite(norm) && norm > 0.0) 1.0 else Double.NaN
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val norm = ctx.freshName("norm")
      s"""
         |double $norm = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double x = $a.getDouble($i); $norm += x * x;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = (java.lang.Double.isFinite($norm) && $norm > 0.0) ? 1.0 : Double.NaN;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
