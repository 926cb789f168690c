package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column in one pass.
  *
  * Replaces the composed `transform(sequence(...), i -> concat_ws(...,
  * element_at(w, i), ...))` pipeline, whose interpreted per-element lambda
  * dispatch measured ~15× slower than this single tight loop (4.0 s vs
  * 0.3 s over 5000 docs / 260k shingles at sf0.1). Higher-order functions
  * don't participate in codegen, so a per-ROW native eval is the right
  * altitude: one method call per document, zero lambda dispatch.
  *
  * Semantics (engine-parity contract with the DuckDB oracle):
  * tokens = split on single space (trailing empties kept, like Spark
  * `split`); shingles = first-occurrence-ordered DISTINCT n-grams joined by
  * a single space; fewer than n tokens → empty array.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_shingles requires (string, n>=1), got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it directly. */
  def shingle(input: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = input.toString.split(" ", -1)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](words.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      val last = words.length - n
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  /** Codegen: call straight into [[nullSafeEval]] via a captured reference —
    * the loop itself gains nothing from inlining, but generating a call
    * keeps the enclosing WholeStageCodegen span intact (a CodegenFallback
    * here would force the whole projection onto the interpreted path). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = $self.shingle($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  val info: ExpressionInfo = new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles")
}
