package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash as a TypedImperativeAggregate: input is a per-token 64-bit
  * hash, the buffer is the 64 bit-vote counters (one mutable Array[Int],
  * fixed-width 256-byte binary serialization), output is the signature (bit b
  * set iff the vote for b is positive).
  *
  * Replaces the earlier typed-Aggregator formulation whose buffer rode the
  * shuffle through `Encoders.javaSerialization` — Java object serialization
  * per partial-aggregate row (r01 verdict finding #4). Here the buffer
  * serde is the same ByteBuffer pattern as [[MinHashSketchAgg.serialize]],
  * map-side combined: each partition ships one 256-byte buffer per group.
  */
case class SimHashSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sketch requires bigint token hashes, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val th = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (if (((th >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    bb.asIntBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](64)
    ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashSketchAgg =
    copy(child = newChild)
}

object SimHashSketchAgg {
  import org.apache.spark.sql.{Column, GraftBridge}
  /** Column API: 64-bit simhash signature of a long token-hash column. */
  def sketch(c: Column): Column =
    GraftBridge.column(SimHashSketchAgg(GraftBridge.expression(c))
      .toAggregateExpression())
}
