package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusOps

class CorpusOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("ngramNovelty: first doc is fully novel, an exact repeat contributes zero") {
    val docs = Seq(
      (0L, "a b c d e"),        // shingles: abc bcd cde — all first here
      (1L, "a b c d e"),        // exact repeat: zero novel
      (2L, "a b c x y z")       // abc seen; bcx cxy xyz novel
    ).toDF("doc_id", "text")
    val out = CorpusOps.ngramNovelty(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((0L, 3L, 3L, 1.0)), s"doc 0: ${out(0)}")
    assert(out(1) == ((1L, 3L, 0L, 0.0)), s"doc 1: ${out(1)}")
    assert(out(2) == ((2L, 4L, 3L, 0.75)), s"doc 2: ${out(2)}")
  }

  test("ngramNovelty: within-doc repeated shingles count once (distinct shingles)") {
    val docs = Seq((7L, "a b c a b c a b c")).toDF("doc_id", "text")
    val out = CorpusOps.ngramNovelty(docs).collect()
    // distinct shingles of the cycle: abc bca cab — 3, all novel
    assert(out.head.getLong(1) == 3L && out.head.getLong(2) == 3L)
  }

  test("vocabGrowth: two-level prefix sum == global running sum, across bucket boundaries") {
    // doc_ids straddle several width-4 buckets, with gaps and a zero-novelty doc
    val docs = Seq(
      (0L, "w0 w1"), (1L, "w1 w2"), (3L, "w0 w1"), (4L, "w3"),
      (9L, "w4 w5 w6"), (10L, "w2 w6"), (12L, "w7")
    ).toDF("doc_id", "text")
    val out = CorpusOps.vocabGrowth(docs, bucketWidth = 4)
    val got = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: plain global window over the same per-doc novel counts
    val firstSeen = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val ref = docs.select("doc_id").join(firstSeen, Seq("doc_id"), "left")
      .withColumn("new_tokens", coalesce(col("nt"), lit(0L)))
      .withColumn("cum_vocab", sum("new_tokens").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "new_tokens", "cum_vocab").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == ref.toSeq, s"got ${got.toSeq}\nref ${ref.toSeq}")
    assert(got.last == ((12L, 1L, 8L)), s"final vocab: ${got.last}")
    assert(got.toSeq.exists { case (id, nt, _) => id == 3L && nt == 0L },
      "doc 3 repeats earlier tokens — zero new")
  }

  test("vocabGrowth plan: no corpus-sized global-sort window (only the bucket frame crosses one)") {
    val docs = Seq((0L, "x"), (1L, "y")).toDF("doc_id", "text")
    val plan = CorpusOps.vocabGrowth(docs).queryExecution.optimizedPlan.toString
    // the intra-bucket window must be partitioned by bkt; the only
    // unpartitioned window may run over the per-bucket totals frame
    // the per-doc running sum must carry a bkt partition spec — the spec
    // string puts partition columns before the order spec, so the intra
    // window renders as windowspecdefinition(bkt…, doc_id… ASC …)
    assert(plan.contains("windowspecdefinition(bkt"),
      s"expected a bkt-partitioned window in:\n$plan")
  }

  private def noveltyRows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_shingles", "n_novel", "novelty").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("noveltyVsIndex == full ngramNovelty restricted to the batch (monotone ids)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id", "text")
    val thr = docs.agg(max("doc_id")).collect()(0).getLong(0) * 9 / 10
    val corpus = docs.filter(col("doc_id") <= thr)
    val batch = docs.filter(col("doc_id") > thr)
    val incremental = noveltyRows(
      CorpusOps.noveltyVsIndex(CorpusOps.firstSeenOf(corpus), batch))
    val full = noveltyRows(
      CorpusOps.ngramNovelty(docs).filter(col("doc_id") > thr))
    assert(incremental == full)
    assert(full.nonEmpty)
  }

  test("first-seen index: at-rest round-trip, batch-over-batch append visibility, bucketed join") {
    import spark.implicits._
    val mk = (ws: Seq[String]) => ws.mkString(" ")
    val corpus = Seq((0L, mk((1 to 10).map(i => f"c$i%02d")))).toDF("doc_id", "text")
    // batch 1 doc 10 introduces new shingles; doc 11 repeats doc 10 exactly
    val b1 = Seq(
      (10L, mk((1 to 8).map(i => f"n$i%02d"))),
      (11L, mk((1 to 8).map(i => f"n$i%02d")))).toDF("doc_id", "text")
    // batch 2 repeats batch 1's content — must be zero-novel ONLY if the
    // append made batch 1's admissions visible
    val b2 = Seq((20L, mk((1 to 8).map(i => f"n$i%02d")))).toDF("doc_id", "text")
    try {
      CorpusOps.saveFirstSeenIndex(corpus, "graft_fs", nBuckets = 4)
      val idx = CorpusOps.loadFirstSeenIndex(spark, "graft_fs")
      val out1 = noveltyRows(CorpusOps.noveltyVsIndex(idx, b1))
      assert(out1(10L) == ((10L, 6L, 6L, 1.0)), s"${out1.get(10L)}")
      assert(out1(11L) == ((11L, 6L, 0L, 0.0)), s"${out1.get(11L)}")
      // parity with the in-session frame (round-trip loses nothing)
      assert(out1 == noveltyRows(
        CorpusOps.noveltyVsIndex(CorpusOps.firstSeenOf(corpus), b1)))
      CorpusOps.appendToFirstSeenIndex(spark, "graft_fs", b1)
      val out2 = noveltyRows(CorpusOps.noveltyVsIndex(
        CorpusOps.loadFirstSeenIndex(spark, "graft_fs"), b2))
      assert(out2(20L) == ((20L, 6L, 0L, 0.0)), s"${out2.get(20L)}")
      // the index stores batch 1's shingles under the SENIOR doc once
      val stored = spark.table("graft_fs_firstseen")
        .filter(col("first_doc") === 10L).count()
      assert(stored == 6L, s"stored $stored")
      assert(spark.table("graft_fs_firstseen")
        .filter(col("first_doc") === 11L).count() == 0L)
      // idempotent append: nothing new to admit
      CorpusOps.appendToFirstSeenIndex(spark, "graft_fs", b1)
      assert(spark.table("graft_fs_firstseen").groupBy("g").count()
        .filter(col("count") > 1).count() == 0L, "duplicate shingle rows")
      // the batch joins the loaded table without shuffling the corpus side
      val bcKey = "spark.sql.autoBroadcastJoinThreshold"
      val prevBc = spark.conf.get(bcKey)
      try {
        spark.conf.set(bcKey, "-1")
        val q = CorpusOps.noveltyVsIndex(
          CorpusOps.loadFirstSeenIndex(spark, "graft_fs"), b2)
        q.collect()
        assert(q.queryExecution.executedPlan.toString.contains("Bucketed: true"))
      } finally spark.conf.set(bcKey, prevBc)
    } finally spark.sql("DROP TABLE IF EXISTS graft_fs_firstseen")
  }
}
