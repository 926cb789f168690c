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

  test("media near-dup bridges into cluster/split membership: the perturbed copy joins its original's cluster and split; unrelated assets stay apart") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.{DedupPipeline, SplitState}
    // three unrelated media payloads (long, low char overlap) + one
    // perturbed copy of asset 1 — re-encode jitter as an appended suffix
    def blob(tag: String): Array[Byte] =
      (0 until 40).map(j => s"${tag}byte$j").mkString(" ").getBytes("UTF-8")
    val media = Seq(
      (1L, "image", blob("aa")),
      (2L, "image", blob("qq")),
      (3L, "video", blob("zz")),
      (11L, "image", (new String(blob("aa"), "UTF-8") + " jitter").getBytes("UTF-8")))
      .toDF("doc_id", "kind", "payload")
    val pairs = MultimodalOps.mediaNearDupPairs(media, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 11L)), s"expected only the planted pair: $pairs")
    // the pair set feeds the SAME cluster machinery documents use...
    val labels = DedupPipeline.clusters(
      MultimodalOps.mediaNearDupPairs(media, maxHamming = 10).select("a", "b"),
      maxIter = 10).toDF()
    val lab = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab(11L) == lab(1L))
    // ...and therefore the same split: rep-hash assignment puts the copy
    // exactly where its original went, never across the wall
    val p = "graft_media_split"
    def dropAll(): Unit =
      for (t <- Seq("_assign", "_meta", "_moves", "_pairs", "_tombstones"))
        spark.sql(s"DROP TABLE IF EXISTS $p$t")
    try {
      dropAll()
      SplitState.init(spark, p, media.select("doc_id"), labels)
      val m = SplitState.load(spark, p).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(m(11L) == m(1L),
        s"media near-dup straddles the wall: ${m(1L)} / ${m(11L)}")
      // ...and the pair artifact is modality-agnostic: record the media
      // pair (Hamming mapped to a [0,1] similarity) and the at-rest wall
      // audit covers media assets with the same ok/pending/leak verdicts
      SplitState.recordPairs(spark, p,
        MultimodalOps.mediaNearDupPairs(media, maxHamming = 10)
          .select(col("a"), col("b"),
            (lit(1.0) - col("hamming") / 64.0).as("jac")), 1L, 11L)
      val audit = graft.operators.DedupOps.wallAudit(
        SplitState.loadPairs(spark, p).select("a", "b"),
        SplitState.load(spark, p))
        .collect().map(r => r.getString(r.fieldIndex("status")))
      assert(audit.toSeq == Seq("ok"), s"${audit.toSeq}")
    } finally dropAll()
  }
}
