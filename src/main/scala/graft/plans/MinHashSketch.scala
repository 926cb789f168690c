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
