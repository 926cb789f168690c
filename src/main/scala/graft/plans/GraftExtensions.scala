package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Engine extension point, registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions`:
  *  - `graft_cosine(a, b)` — the fused native cosine Expression;
  *  - a small optimizer rule collapsing `graft_cosine(x, x)` to 1.0
  *    (self-similarity), demonstrating Rule[LogicalPlan] injection.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.arity
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      CosineSimilarity.info,
      (children: Seq[Expression]) => { arity("graft_cosine", children, 2)
        CosineSimilarity(
          Cast(children.head, ArrayType(DoubleType)),
          Cast(children(1), ArrayType(DoubleType))) }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      WordShingles.info,
      (children: Seq[Expression]) => { arity("graft_shingles", children, 2)
        WordShingles(
          children.head, GraftExtensions.intLiteral("graft_shingles", children(1))) }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      MinHashSketchAgg.info,
      (children: Seq[Expression]) => { arity("graft_minhash", children, 2)
        MinHashSketchAgg(
          children.head,
          GraftExtensions.intLiteral("graft_minhash", children(1))).toAggregateExpression() }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_64"),
      Md5Lower64.info,
      (children: Seq[Expression]) => { arity("graft_md5_64", children, 1)
        Md5Lower64(children.head) }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      DotProduct.info,
      (children: Seq[Expression]) => { arity("graft_dot", children, 2)
        DotProduct(
          Cast(children.head, ArrayType(DoubleType)),
          Cast(children(1), ArrayType(DoubleType))) }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard"),
      JaccardSimilarity.info,
      (children: Seq[Expression]) => { arity("graft_jaccard", children, 2)
        JaccardSimilarity(children.head, children(1)) }))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_count"),
      IntersectCount.info,
      (children: Seq[Expression]) => { arity("graft_intersect_count", children, 2)
        IntersectCount(children.head, children(1)) }))
    ext.injectOptimizerRule(_ => SelfCosineToOne)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {
  /** Wrong argument counts must surface as an AnalysisException naming the
    * function — not the IndexOutOfBoundsException `children(1)` would throw
    * mid-resolution. */
  private[plans] def arity(fn: String, children: Seq[Expression], n: Int): Unit =
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3000",
        messageParameters = Map("message" ->
          s"$fn expects $n argument(s), got ${children.length}"))

  /** Resolve a FOLDABLE integer argument at registration time with a clear
    * analysis-style error: accepts INT and BIGINT literals (CAST(3 AS
    * BIGINT) included), rejects non-foldable or wrong-typed arguments
    * instead of failing later with an obscure eval/ClassCastException. */
  private[plans] def intLiteral(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case other if other.foldable => other.eval() match {
      case v: Int => v
      case v: Long if v.isValidInt => v.toInt
      case v => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3000",
        messageParameters = Map("message" ->
          s"$fn: expected an integer literal argument, got $v"))
    }
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3000",
      messageParameters = Map("message" ->
        s"$fn: argument must be a foldable integer literal, got ${other.sql}"))
  }
}

/** Rewrite graft_cosine(x, x) to the single-pass [[SelfCosine]] — 3 array
  * traversals become 1 with IDENTICAL semantics (NULL → NULL, zero vector →
  * NaN, else exactly 1.0). Folding to a literal would be wrong: it changes
  * results for NULL inputs and zero vectors. */
object SelfCosineToOne extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.deterministic && a.semanticEquals(b) =>
        SelfCosine(a)
    }
}
