package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{SimilarityOps, TextOps}

/** Invariant specs for the round-4 curation operators (q83–q86). The hard
  * cross-engine check is the DuckDB oracle (Verify); these assert the
  * SEMANTIC invariants the oracle hash cannot express. */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ---- q83 semantic dedup -------------------------------------------------

  test("q83: one row per corpus vector, nn is never self, sim symmetric bound") {
    val d = SimilarityOps.queries("q83_semantic_dedup")(spark, TestSpark.sf)
    val n = Tables.load(spark, TestSpark.sf, "embeddings").count()
    val rows = d.collect()
    // every vector whose cell has >= 2 members gets exactly one row
    assert(rows.length > 0 && rows.length <= n)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("nn_id") != r.getAs[Long]("vec_id"))
      val sim = r.getAs[Double]("sim")
      assert(sim >= -1.000001 && sim <= 1.000001)
      val isDup = r.getAs[Long]("is_dup")
      assert(if (sim >= 0.3) isDup == 1L else isDup == 0L)
    }
  }

  test("q83: a planted near-duplicate is flagged against its twin") {
    val v = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"), col("label"))
    // clone vector 0 with a new id: nearest neighbor of the clone must be
    // vec 0 (cosine 1) and it must be flagged
    val maxId = v.agg(max("vec_id")).as[Long].head()
    val clone = v.filter(col("vec_id") === 0)
      .select((col("vec_id") + maxId + 1).as("vec_id"), col("emb"), col("label"))
    val planted = v.unionByName(clone)
    val idx = graft.operators.IvfIndex.build(planted)
    val a = idx.assigned
    val pair = a.filter(col("vec_id").isin(0L, maxId + 1))
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // identical vectors land in the same cell by construction
    assert(pair(0L) == pair(maxId + 1))
  }

  // ---- q84 chunking -------------------------------------------------------

  test("q84: chunk accounting — strides cover every token exactly once per stride grid") {
    val ch = TextOps.queries("q84_doc_chunks")(spark, TestSpark.sf)
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
    val agg = ch.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max("start").as("last_start"),
      min("n_tok").as("min_tok"),
      max("n_tok").as("max_tok"))
    val joined = agg.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val n = r.getAs[Long]("n")
      val expectChunks = (n + 11) / 12 // ceil(n / stride): starts 0,12,.. < n
      assert(r.getAs[Long]("n_chunks") == expectChunks,
        s"doc ${r.getAs[Long]("doc_id")}: chunks ${r.getAs[Long]("n_chunks")} != $expectChunks for n=$n")
      assert(r.getAs[Long]("last_start") < n)
      assert(r.getAs[Long]("max_tok") <= 16L)
      assert(r.getAs[Long]("min_tok") >= 1L)
    }
  }

  test("q84: consecutive chunks overlap by chunk-stride tokens on full windows") {
    // doc with >= 28 tokens: chunk 0 covers [1,16], chunk 1 covers [13,28] —
    // overlap = C - S = 4 tokens
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 28)
      .limit(5)
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val tk = r.getAs[scala.collection.Seq[String]]("tk")
      val c0 = tk.slice(0, 16)
      val c1 = tk.slice(12, 28)
      assert(c0.drop(12) == c1.take(4)) // the 4-token overlap is identical
    }
  }

  // ---- q85 source quality -------------------------------------------------

  test("q85: per-source doc counts reconcile with the corpus and rates are in range") {
    val q = TextOps.queries("q85_source_quality")(spark, TestSpark.sf)
    val total = q.agg(sum("n_docs")).as[Long].head()
    val corpus = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(total == corpus)
    q.collect().foreach { r =>
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_docs"))
      val dup = r.getAs[Double]("dup_rate")
      assert(dup >= 0.0 && dup < 1.0)
      assert(r.getAs[Long]("pii_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("avg_tokens") > 0.0)
    }
  }

  // ---- q86 BM25 -----------------------------------------------------------

  test("q86: scores are positive, descending, and only conjunctive matches surface") {
    val q = TextOps.queries("q86_bm25")(spark, TestSpark.sf).collect()
    assert(q.nonEmpty)
    assert(q.forall(_.getAs[Long]("n_terms") == 3L))
    val scores = q.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sortBy(-_)))
    // every surfaced doc really contains all three terms
    val ids = q.map(_.getAs[Long]("doc_id")).toSeq
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
      .collect()
    docs.foreach { r =>
      val tk = r.getAs[scala.collection.Seq[String]]("tk").toSet
      assert(Set("spark", "join", "window").subsetOf(tk))
    }
  }

  // ---- incremental cluster maintenance ------------------------------------

  test("updateClusters matches a full recluster on bridges, new-only and new~old edges") {
    import graft.operators.DedupPipeline
    val batch1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val existing = DedupPipeline.clusters(batch1)
    // sanity: {1,2,3} -> 1, {10,11} -> 10
    val e = existing.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // new batch: a bridge between the two old clusters, a new-only pair,
    // and a new~old attachment
    val batch2 = Seq((3L, 10L), (20L, 21L), (22L, 11L)).toDF("a", "b")
    val incremental = DedupPipeline.updateClusters(existing, batch2)
    val full = DedupPipeline.clusters(batch1.unionByName(batch2))
    val inc = incremental.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ful = full.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == ful, s"incremental $inc != full $ful")
    // everything merged into cluster 1 except the disjoint new pair
    assert(inc(22L) == 1L && inc(10L) == 1L && inc(20L) == 20L && inc(21L) == 20L)
  }

  test("updateClusters with no overlapping edges leaves old labels untouched") {
    import graft.operators.DedupPipeline
    val existing = DedupPipeline.clusters(Seq((1L, 2L)).toDF("a", "b"))
    val updated = DedupPipeline.updateClusters(existing, Seq((5L, 6L)).toDF("a", "b"))
    val m = updated.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("removeFromClusters: bridge removal SPLITS, untouched components pass through") {
    import graft.operators.DedupPipeline
    // component {1..5} bridged by 3 (1-2-3, 3-4-5), component {10,11}
    // untouched, component {20,21} fully removed, 30's only neighbor 31
    // is removed (30 loses every edge)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (30L, 31L)).toDF("a", "b")
    val existing = DedupPipeline.clusters(pairs)
    val removed = Seq(3L, 20L, 21L, 31L).toDF("node")
    val remaining = Seq((1L, 2L), (4L, 5L), (10L, 11L)).toDF("a", "b")
    val got = DedupPipeline.removeFromClusters(existing, removed, remaining)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full recluster of the remainder: the ground-truth the oracle replays
    val full = DedupPipeline.clusters(remaining)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == full, s"incremental $got != full $full")
    // the bridge split: {1,2} and {4,5} are now SEPARATE components;
    // removed nodes and the edge-less survivor 30 are gone from the table
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L, 10L -> 10L, 11L -> 10L))
  }

  test("removeFromClusters: empty removal batch is an identity") {
    import graft.operators.DedupPipeline
    val pairs = Seq((1L, 2L), (10L, 11L)).toDF("a", "b")
    val existing = DedupPipeline.clusters(pairs)
    val got = DedupPipeline.removeFromClusters(existing,
        Seq.empty[Long].toDF("node"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("q86: higher term frequency at equal length scores higher (BM25 monotonicity)") {
    // direct check of the scoring shape on a two-doc synthetic frame run
    // through the same formula constants
    val k1 = 1.2; val b = 0.75
    def score(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double): Double =
      math.log((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * (k1 + 1.0)) /
        (tf + k1 * (1.0 - b + b * dl / avgdl))
    assert(score(3, 50, 10, 100, 50.0) > score(1, 50, 10, 100, 50.0))
    assert(score(2, 30, 10, 100, 50.0) > score(2, 80, 10, 100, 50.0))
  }
}
