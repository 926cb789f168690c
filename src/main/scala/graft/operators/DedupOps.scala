package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.SimHashAgg

/** Deduplication operators over `documents` (driver north-star scope):
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection.
  *
  * Scale design (100 TB):
  *  - exact dedup is a hash-groupBy on a content fingerprint — shuffles only
  *    (fp, doc_id), never text;
  *  - MinHash signatures are computed with map-side partial `min` aggregation
  *    (32 aggregates over the exploded shingle stream), then banded: an
  *    equi-join on (band, band_hash) finds candidates WITHOUT any pairwise
  *    scan — the only near-dup path that survives 100 TB. Skewed bands
  *    (boilerplate shingles) are AQE skew-join territory; the verify stage
  *    re-checks true Jaccard so false candidates cost only compute;
  *  - SimHash uses a typed Aggregator (one 64-int buffer per doc to the
  *    shuffle) and 16-bit band LSH over the 64-bit signature;
  *  - n-gram Jaccard is the quadratic baseline, contained by blocking on
  *    (length bucket) — kept for correctness comparison, not the scale path.
  */
object DedupOps {

  private val numHashes = 32
  private val numBands = 8 // r = 4 rows per band

  /** doc_id → distinct word-3-gram shingle array. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    TextOps.withShingles(Tables.load(s, d, "documents")).select("doc_id", "sh")

  /** Full MinHash+LSH near-dup pair detection over any (doc_id, text)
    * frame: signatures → banded candidates → exact-Jaccard verify.
    * Returns (a, b, jac) with a < b; used by q51 and [[DedupPipeline]]. */
  def minHashNearDupPairs(docs: DataFrame): DataFrame = {
    // The shingled frame feeds three subtrees (signatures + both verify
    // sides). With the native WordShingles expression the recompute is a
    // cheap narrow scan, so we deliberately do NOT persist here — a cached
    // copy could never be safely unpersisted from inside a lazy plan and
    // would pin block-manager memory for the session. At 100 TB, persist
    // the SIGNATURE table explicitly at the pipeline level instead.
    val shingled = TextOps.withShingles(docs).select("doc_id", "sh")
    val sigs = signatures(shingled)
    val bandStructs = (0 until numBands).map { b =>
      val cols = (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val banded = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    verifyJaccard(shingled, candidates)
  }

  /** MinHash signatures via the single imperative sketch aggregate
    * ([[graft.plans.MinHashSketchAgg]]): one array<long> buffer per doc,
    * map-side combined — not 32 separate min(xxhash64) expression trees. */
  private def signatures(shingled: DataFrame): DataFrame =
    shingled.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .groupBy("doc_id")
      .agg(graft.plans.MinHashSketchAgg.sketch(col("shingle"), numHashes).as("sig"))

  /** Exact Jaccard verification of candidate (a, b) pairs against a
    * doc_id → shingles frame. */
  private def verifyJaccard(sh: DataFrame, pairs: DataFrame): DataFrame = {
    pairs
      .join(sh.select(col("doc_id").as("a"), col("sh").as("sh_a")), "a")
      .join(sh.select(col("doc_id").as("b"), col("sh").as("sh_b")), "b")
      .withColumn("jac",
        round(size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .select("a", "b", "jac")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: group by canonical content fingerprint, keep the smallest
    // doc_id (deterministic keeper), count copies.
    "q50_dedup_exact" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("doc_id"), md5(TextOps.normText).as("fp"))
        .groupBy("fp")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("fp")
    }),

    // MinHash + LSH near-dedup: shingle → 32 minhashes → 8 bands of 4 →
    // band-hash equi-join for candidates → exact-Jaccard verify → top pairs
    // (see minHashNearDupPairs for the materialization trade-off).
    "q51_minhash_lsh" -> ((s, d) => {
      minHashNearDupPairs(Tables.load(s, d, "documents").select("doc_id", "text"))
        .filter(col("jac") >= 0.5)
        .orderBy(col("jac").desc, col("a"), col("b"))
        .limit(50)
    }),

    // SimHash near-dedup: 64-bit signature via the typed SimHashAgg
    // aggregator, 16-bit chunk LSH for candidates, Hamming-distance verify.
    "q52_simhash" -> ((s, d) => {
      import s.implicits._
      val tokenHashes = Tables.load(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
        .select(col("doc_id"), xxhash64(col("tok")).as("th"))
        .as[(Long, Long)]
      val sigs = tokenHashes
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(SimHashAgg.toColumn.name("simhash"))
        .toDF("doc_id", "simhash")
      val chunks = sigs.select(
        col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"), shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ch"))): _*)).as("cc"))
        .select(col("doc_id"), col("simhash"), col("cc.c").as("c"), col("cc.ch").as("ch"))
      chunks.as("x")
        .join(chunks.as("y"),
          col("x.c") === col("y.c") && col("x.ch") === col("y.ch") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("bigint").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 16)
        .orderBy(col("hamming"), col("a"), col("b"))
        .limit(50)
    }),

    // n-gram Jaccard near-dup baseline within (length-bucket) blocks.
    // Computed as an INVERTED-INDEX join — explode shingles, equi-join on
    // (block, shingle), count hits per pair — instead of pairing documents
    // quadratically and intersecting arrays: only pairs that actually share
    // a shingle ever materialize, which is the difference between O(pairs)
    // set-intersections and O(postings²-per-shingle) at 100 TB. Pairs with
    // zero overlap (jac = 0) never appear, which cannot affect a top-k by
    // descending Jaccard as long as ≥ k overlapping pairs exist.
    "q53_ngram_jaccard" -> ((s, d) => {
      val sh = docShingles(s, d)
        .join(Tables.load(s, d, "documents").select("doc_id", "n_chars"), "doc_id")
        .withColumn("blk", (col("n_chars") / 50).cast("bigint"))
        .withColumn("n_sh", size(col("sh")))
      val postings = sh.select(col("doc_id"), col("blk"), col("n_sh"), explode(col("sh")).as("t"))
      postings.as("x")
        .join(postings.as("y"),
          col("x.blk") === col("y.blk") && col("x.t") === col("y.t") &&
            col("x.doc_id") < col("y.doc_id"))
        .groupBy(
          col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jac", round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
        .select("a", "b", "jac")
        .orderBy(col("jac").desc, col("a"), col("b"))
        .limit(20)
    }))

  val oracleSql: Map[String, String] = Map(
    "q50_dedup_exact" ->
      s"""SELECT md5(${TextOps.normTextSql}) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
         |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,

    "q53_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents),
         | sh AS (SELECT doc_id, CAST(floor(n_chars / 50) AS BIGINT) AS blk,
         |        ${TextOps.shinglesSql} AS s FROM t)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         | round(len(list_intersect(a.s, b.s)) / len(list_distinct(list_concat(a.s, b.s))), 4) AS jac
         |FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |ORDER BY jac DESC, a, b LIMIT 20""".stripMargin)
}
