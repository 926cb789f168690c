package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Engine extension point, registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions`:
  *  - `graft_cosine(a, b)` — the fused native cosine Expression;
  *  - a small optimizer rule collapsing `graft_cosine(x, x)` to 1.0
  *    (self-similarity), demonstrating Rule[LogicalPlan] injection.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      CosineSimilarity.info,
      (children: Seq[Expression]) => CosineSimilarity(
        Cast(children.head, ArrayType(DoubleType)),
        Cast(children(1), ArrayType(DoubleType)))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      WordShingles.info,
      (children: Seq[Expression]) => WordShingles(
        children.head,
        children(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Int]
        })))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      MinHashSketchAgg.info,
      (children: Seq[Expression]) => MinHashSketchAgg(
        children.head,
        children(1).eval().asInstanceOf[Int]).toAggregateExpression()))
    ext.injectOptimizerRule(_ => SelfCosineToOne)
    ext.injectPlannerStrategy(_ => TopKStrategy)
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
