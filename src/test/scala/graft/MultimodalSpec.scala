package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaIn

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("decode stub is deterministic and kind-sensitive") {
    val payload = "some media bytes".getBytes("UTF-8")
    val a = MultimodalOps.decodeStub(MediaIn(1L, "video", payload))
    val b = MultimodalOps.decodeStub(MediaIn(1L, "video", payload))
    assert(a == b)
    assert(a.n_bytes == payload.length)
    assert(a.width >= 64 && a.width < 1024 && a.height >= 64 && a.height < 1024)
    val img = MultimodalOps.decodeStub(MediaIn(1L, "image", payload))
    assert(img.n_frames == 1L)
    assert(a.n_frames >= 1L)
    assert(a.content_hash == img.content_hash) // hash depends on bytes, not kind
  }

  test("pipeline emits one feature row per document with consistent bytes") {
    val out = MultimodalOps.queries("q70_media_features")(spark, TestSpark.sf)
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    assert(out.count() == docs.count())
    // ASCII word-salad text → n_bytes == n_chars
    val joined = out.join(docs, "doc_id")
      .filter(org.apache.spark.sql.functions.col("n_bytes") =!=
        org.apache.spark.sql.functions.col("n_chars"))
    assert(joined.count() == 0)
  }
}
