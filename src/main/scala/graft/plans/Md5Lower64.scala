package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lower 64 bits of the MD5 digest (bytes 8..15, little-endian) of a string
  * or binary column, as a signed long bit pattern.
  *
  * This is the ENGINE-NEUTRAL 64-bit content hash: the value is identical to
  * DuckDB's `md5_number_lower(x)` (same bytes, same byte order — the signed
  * long here carries the same bit pattern as DuckDB's UBIGINT), so every
  * sketch built on it (MinHash bases, SimHash token hashes, multimodal
  * feature derivation) is replayable by the SQL oracle. `xxhash64` is faster
  * but engine-specific — use this wherever cross-engine verification
  * matters, xxhash where it doesn't.
  */
case class Md5Lower64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_64 requires string or binary input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_64"

  override protected def nullSafeEval(input: Any): Any = hash(input)

  /** Public so generated code can call it directly. */
  def hash(input: Any): Long = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Md5Lower64.lower64(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("md5lower", this, classOf[Md5Lower64].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $self.hash($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Lower64 {
  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[Md5Lower64].getName, "graft_md5_64")

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian long from digest bytes 8..15 — the exact value of
    * DuckDB `md5_number_lower` (as a signed bit pattern). */
  def lower64(bytes: Array[Byte]): Long = {
    val d = digests.get().digest(bytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  import org.apache.spark.sql.{Column, GraftBridge}
  def of(c: Column): Column = GraftBridge.column(Md5Lower64(GraftBridge.expression(c)))
}
