package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SimHashAgg

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("SimHashAgg: identical token multisets yield identical signatures") {
    val a = Seq(1L, 2L, 3L, -7L).foldLeft(SimHashAgg.zero)(SimHashAgg.reduce)
    val b = Seq(3L, 1L, -7L, 2L).foldLeft(SimHashAgg.zero)(SimHashAgg.reduce)
    assert(SimHashAgg.finish(a) == SimHashAgg.finish(b))
  }

  test("SimHashAgg: merge == reduce over concatenation") {
    val xs = Seq(5L, 99L, 123456789L)
    val ys = Seq(-42L, 7L)
    val merged = SimHashAgg.merge(
      xs.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce),
      ys.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce))
    val direct = (xs ++ ys).foldLeft(SimHashAgg.zero)(SimHashAgg.reduce)
    assert(SimHashAgg.finish(merged) == SimHashAgg.finish(direct))
  }

  test("SimHashAgg: near-identical docs have small hamming distance") {
    def sig(tokens: Seq[String]): Long =
      SimHashAgg.finish(tokens.map(t => scala.util.hashing.MurmurHash3.stringHash(t).toLong)
        .foldLeft(SimHashAgg.zero)(SimHashAgg.reduce))
    val doc = (1 to 100).map(i => s"token$i")
    val near = doc.updated(50, "CHANGED")
    val far = (1 to 100).map(i => s"other$i")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(doc), sig(near)) < hamming(sig(doc), sig(far)))
    assert(hamming(sig(doc), sig(near)) <= 8)
  }

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    def dedup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(md5(col("text")).as("fp")).agg(min("doc_id").as("doc_id"))
    val once = dedup(docs)
    val twice = once.groupBy("fp").agg(min("doc_id").as("doc_id"))
    assert(once.orderBy("fp").collect().toSeq == twice.orderBy("fp").collect().toSeq)
    assert(once.count() == 2)
  }

  test("MinHash-LSH finds the planted near-duplicates at sf0.001") {
    val out = graft.operators.DedupOps.queries("q51_minhash_lsh")(spark, TestSpark.sf)
    val top = out.select("jac").as[Double].collect()
    assert(top.nonEmpty, "LSH found no candidate pairs")
    assert(top.max >= 0.8, s"expected a high-Jaccard planted pair, max=${top.max}")
  }
}
