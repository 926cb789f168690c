package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single imperative aggregate: for each group, the
  * element-wise minimum of `numHashes` seeded XXH64 values over the input
  * strings — `minhash_sketch(shingle, 32)` replaces 32 separate
  * `min(xxhash64(lit(i), shingle))` aggregate expressions.
  *
  * Why TypedImperativeAggregate (the guide's recommendation for sketches):
  * the buffer is ONE mutable Array[Long] updated in place per row — partial
  * (map-side) aggregation ships 8·numHashes bytes per group to the shuffle,
  * the planner sees a single aggregate function instead of numHashes
  * expression trees, and the per-row work is a tight loop hashing the
  * string once per seed with zero per-seed expression dispatch.
  */
case class MinHashSketchAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && numHashes >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch requires (string, n>=1), got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      val base = v.getBaseObject
      val offset = v.getBaseOffset
      val len = v.numBytes()
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, offset, len, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSketchAgg =
    copy(child = newChild)
}

object MinHashSketchAgg {
  val info: ExpressionInfo = new ExpressionInfo(classOf[MinHashSketchAgg].getName, "graft_minhash")

  import org.apache.spark.sql.{Column, GraftBridge}
  /** Column API: minhash signature (array<long> of length n) of a string
    * column within each group. */
  def sketch(c: Column, n: Int): Column =
    GraftBridge.column(MinHashSketchAgg(GraftBridge.expression(c), n)
      .toAggregateExpression())
}

/** Oracle-replayable MinHash: element-wise minimum of a fixed family of
  * universal-hash permutations h_i(x) = (a_i·x + b_i) mod p (p = 2³¹−1)
  * over a NON-NEGATIVE 31-bit base value per input row — typically
  * `shiftrightunsigned(graft_md5_64(shingle), 33)`.
  *
  * Unlike [[MinHashSketchAgg]] (seeded XXH64 — faster, engine-specific),
  * every h_i here is plain modular arithmetic on an engine-neutral base, so
  * the DuckDB oracle recomputes the identical signature from the same
  * (a_i, b_i) constants (exported by [[MinHashPermAgg.coeffs]] into the
  * oracle SQL). a_i < 2³¹ and x < 2³¹ keep a_i·x + b_i inside a signed
  * 64-bit long — no overflow on either engine.
  */
case class MinHashPermAgg(
    child: Expression,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && numHashes >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_perm requires (bigint, n>=1), got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_perm"

  @transient private lazy val (as, bs) = MinHashPermAgg.coeffs(numHashes)

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // FAIL FAST on the documented domain (non-negative 31-bit): outside
      // it, as(i)*x overflows Long and Scala's % goes negative — signatures
      // fill with garbage that only surfaces as an oracle mismatch much
      // later. The usual cause is feeding graft_md5_64 output directly
      // instead of shiftrightunsigned(graft_md5_64(x), 33).
      if (x < 0L || x > Int.MaxValue.toLong)
        throw new IllegalArgumentException(
          s"graft_minhash_perm input $x outside [0, 2^31): hash tokens with " +
            "shiftrightunsigned(graft_md5_64(tok), 33) before sketching")
      var i = 0
      while (i < numHashes) {
        val h = (as(i) * x + bs(i)) % MinHashPermAgg.P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashPermAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashPermAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashPermAgg =
    copy(child = newChild)
}

object MinHashPermAgg {
  /** Mersenne prime 2³¹−1: the permutation modulus on both engines. */
  val P: Long = 2147483647L

  /** Deterministic (a_i, b_i) family — the SAME constants are embedded as
    * literals in the DuckDB oracle SQL (see DedupOps.permCoeffsSql). */
  def coeffs(n: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(7919)
    val as = Array.fill(n)(1L + rnd.nextInt((P - 1).toInt))
    val bs = Array.fill(n)(rnd.nextInt(P.toInt).toLong)
    (as, bs)
  }

  import org.apache.spark.sql.{Column, GraftBridge}
  /** Column API: permutation-minhash signature of a non-negative 31-bit
    * long column within each group. */
  def sketch(c: Column, n: Int): Column =
    GraftBridge.column(MinHashPermAgg(GraftBridge.expression(c), n)
      .toAggregateExpression())
}
