package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FUSED perceptual fingerprint: the 64-bit SimHash over sliding char
  * 4-grams of a string, in ONE per-row pass — md5 per gram
  * ([[Md5Lower64.lower64]], the engine-neutral hash the DuckDB oracle
  * replays), per-bit majority vote, signature emitted directly.
  *
  * Replaces the media family's three-operator pipeline
  * `explode(transform(sequence(...), substring)) → graft_md5_64 →
  * graft_simhash-aggregate` which materialized ONE ROW PER PAYLOAD BYTE
  * (1.7 × 10⁹ gram rows at sf10) and pushed them through an
  * ObjectHashAggregate whose sort-based fallback (default threshold: 128
  * distinct groups per task) SORTED the whole gram stream — measured r16
  * at sf10: 520 s wall at ~1.3 effective cores with 7.2 GB spill for what
  * is a narrow linear scan. Here: n rows in, n rows out, no explode, no
  * aggregate, whole-stage-codegen-friendly (static call, like
  * [[Md5Lower64]]). At 100 TB the fingerprint pass is a pure map over
  * payload bytes — exactly the shape a 1000-executor scan wants.
  *
  * Gram semantics are IDENTICAL to the replaced pipeline (and to the
  * oracle's `substr(s, i, 4)` over `range(1, length(s) - 3 + 1)`):
  * code-point windows, so the caller's `length(s) >= 4` guard keeps
  * sub-gram payloads out. ASCII payloads (the common case; detected by
  * numChars == numBytes) hash 4-byte windows from the raw bytes with no
  * per-gram string allocation; multi-byte strings take the substring
  * path, matching SQL substring exactly. */
case class SimHashGrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_grams requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_grams"

  override protected def nullSafeEval(input: Any): Any =
    SimHashGrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.plans.SimHashGrams.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashGrams {
  /** Static so generated code calls it without a reference object. */
  def compute(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val nBytes = s.numBytes()
    val ascii = s.numChars() == nBytes
    if (ascii) {
      // fast path: 4-gram bytes are 4 consecutive raw bytes
      val bytes = s.getBytes
      val window = new Array[Byte](4)
      var i = 0
      while (i + 4 <= nBytes) {
        window(0) = bytes(i); window(1) = bytes(i + 1)
        window(2) = bytes(i + 2); window(3) = bytes(i + 3)
        vote(votes, Md5Lower64.lower64(window))
        i += 1
      }
    } else {
      // code-point windows via the same substring SQL semantics the
      // replaced `substring(s, i, 4)` pipeline used
      val n = s.numChars()
      var i = 1
      while (i + 3 <= n) {
        vote(votes, Md5Lower64.lower64(s.substringSQL(i, 4).getBytes))
        i += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  private def vote(votes: Array[Int], th: Long): Unit = {
    var b = 0
    while (b < 64) {
      votes(b) += (if (((th >>> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
  }

  import org.apache.spark.sql.{Column, GraftBridge}
  def of(c: Column): Column =
    GraftBridge.column(SimHashGrams(GraftBridge.expression(c)))
}
