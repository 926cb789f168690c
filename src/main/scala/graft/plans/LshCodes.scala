package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: ALL sign-LSH table codes for one embedding
  * in a single fused loop — `array<long>` of length `tables`, code `t` =
  * Σ_i [dot(emb, plane(t·stride + i)) ≥ 0] · 2^i for i < bits.
  *
  * Exists because the composed form (tables×bits separate dot-product
  * CASE-WHEN columns summed into codes, exploded) generates a codegen
  * method so large the JVM refuses to JIT it — the r15 q66 profile
  * measured ~190 µs/row (~3.8 s for 20k vectors) for what is ~2304 FMAs
  * (~2 µs) of real work. Here the plane matrix rides along as ONE flat
  * primitive `Array[Double]` reference (`ctx.addReferenceObj`) and the
  * generated code is a three-level loop — tiny bytecode, JIT-friendly,
  * no per-plane literal boxing.
  *
  * Parity contract with the composed form it replaces (and the DuckDB
  * oracle's `list_dot_product(emb, pl) >= 0`):
  *  - dot accumulates elements in index order (same FP rounding);
  *  - a NULL embedding, a NULL element, or a length-≠-dim embedding made
  *    every per-plane dot NULL, every `when(dot >= 0, 1)` bit 0, hence
  *    code 0 in EVERY table — reproduced here by emitting all-zero codes
  *    (NOT null: a null array would vanish under explode, silently
  *    dropping the vector the composed form kept in bucket 0; the oracle's
  *    `CASE WHEN list_dot_product(...) >= 0 THEN 1 ELSE 0 END` keeps it
  *    too). The expression is therefore never NULL.
  */
case class LshCodes(child: Expression,
                    planes: Array[Double],
                    tables: Int,
                    bits: Int,
                    stride: Int,
                    dim: Int)
    extends UnaryExpression {

  require(planes.length >= tables * stride * dim,
    s"plane matrix too small: ${planes.length} < $tables*$stride*$dim")
  require(bits <= stride, s"bits $bits exceeds stride $stride")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_codes requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lsh_codes"

  // The plane matrix is a value parameter: two LshCodes over different
  // matrices must not compare equal just because tables/bits match.
  override def equals(other: Any): Boolean = other match {
    case o: LshCodes =>
      child == o.child && tables == o.tables && bits == o.bits &&
        stride == o.stride && dim == o.dim &&
        java.util.Arrays.equals(planes, o.planes)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(tables), Int.box(bits),
      Int.box(stride), Int.box(dim), Int.box(java.util.Arrays.hashCode(planes)))

  private def compute(emb: ArrayData): Array[Long] = {
    val codes = new Array[Long](tables)
    val n = emb.numElements()
    if (n != dim) return codes
    var j = 0
    while (j < n) { if (emb.isNullAt(j)) return codes; j += 1 }
    var t = 0
    while (t < tables) {
      var code = 0L
      var i = 0
      while (i < bits) {
        val base = (t * stride + i) * dim
        var dot = 0.0
        var k = 0
        while (k < dim) { dot += emb.getDouble(k) * planes(base + k); k += 1 }
        if (dot >= 0) code |= (1L << i)
        i += 1
      }
      codes(t) = code
      t += 1
    }
    codes
  }

  /** Per-row entry point shared by eval and codegen (the TextProfile
    * pattern: the hot loop lives in ONE JIT-friendly compiled method
    * referenced from the generated code — bytecode stays tiny no matter
    * how many planes ride along). */
  def codesOf(emb: ArrayData): GenericArrayData =
    if (emb == null) new GenericArrayData(new Array[Long](tables))
    else new GenericArrayData(compute(emb))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    codesOf(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val self = ctx.addReferenceObj("lshCodes", this, classOf[LshCodes].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code +
        code"""org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
              |  $self.codesOf(${childGen.isNull} ? null : ${childGen.value});
              |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshCodes {
  import org.apache.spark.sql.{Column, GraftBridge}
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.{ArrayType => AT, DoubleType => DT}

  /** Column API: `codesFor(emb, planes, tables, bits, stride)` — planes as
    * the same Seq[Seq[Double]] the composed signBits path consumed. */
  def codesFor(emb: Column, planes: Seq[Seq[Double]],
               tables: Int, bits: Int, stride: Int): Column = {
    val dim = planes.head.length
    GraftBridge.column(LshCodes(
      Cast(GraftBridge.expression(emb), AT(DT)),
      planes.flatten.toArray, tables, bits, stride, dim))
  }
}
