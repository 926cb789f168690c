package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a typed [[Aggregator]]: input is a per-token 64-bit
  * hash, the buffer is the 64 bit-vote counters, output is the signature
  * (bit b set iff the weighted vote for b is positive).
  *
  * This is the one custom typed aggregate the engine needs (SURVEY.md §7.2):
  * element-wise vector accumulation across rows is not expressible with
  * built-in aggregates without collect_list (which would buffer whole groups
  * in memory). As an Aggregator it runs map-side partial aggregation, so at
  * 100 TB each partition ships exactly one 64-int buffer per document to the
  * shuffle, never the token stream.
  */
object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
    var b = 0
    while (b < 64) {
      buf(b) += (if (((tokenHash >>> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] = Encoders.javaSerialization[Array[Int]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
