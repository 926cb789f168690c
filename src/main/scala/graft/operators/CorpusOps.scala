package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-evolution analytics over `documents`: the questions a
  * training-data curator asks about a corpus AS IT GROWS — how much genuinely
  * new content each arriving document contributes (novelty), and how the
  * vocabulary accumulates over arrival order (Heaps'-law growth curve).
  *
  * Both are arrival-order cumulative metrics, which is exactly where naive
  * Spark plans go single-task: a global `ORDER BY` window funnels the whole
  * corpus through one partition. The operators here keep every corpus-sized
  * stage key-partitioned (shingle / token / doc bucket) and reserve
  * single-task work for frames already reduced by ≥ the bucket width.
  */
object CorpusOps {

  /** Per-document n-gram novelty: the share of a doc's distinct 3-gram
    * shingles whose FIRST occurrence (min doc_id) in the whole corpus is
    * this doc. The per-batch novelty curve of an ingest pipeline — a
    * near-zero-novelty doc is a rephrasing of earlier content even when no
    * single earlier doc crosses a pair-dedup threshold (novelty is
    * corpus-cumulative, not pairwise like q51/q53).
    *
    * Shape: explode shingles → groupBy(shingle).min(doc_id) (map-side
    * partial min, one shuffle on the shingle key) → join first-seen back to
    * the exploded postings (same key, same partitioning — AQE reuses the
    * exchange) → groupBy(doc_id). Output is |postings| rows into the last
    * shuffle, never |postings|² — no pair materialization anywhere.
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val sh = TextOps.withShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val first = sh.groupBy("g").agg(min("doc_id").as("first_doc"))
    sh.join(first, "g")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_shingles"), 4))
  }

  /** Vocabulary growth curve: per doc_id (arrival order), the number of
    * whitespace tokens first seen at that doc and the cumulative distinct
    * vocabulary up to and including it (Heaps'-law curve; its flattening is
    * the classic signal a crawl has started re-collecting itself).
    *
    * The cumulative sum is a DISTRIBUTED TWO-LEVEL PREFIX SUM, not a global
    * `ORDER BY` window: docs bucket by `doc_id / bucketWidth`, the running
    * sum within each bucket is a window PARTITIONED by bucket (parallel),
    * and each bucket's offset is an exclusive prefix over the per-bucket
    * totals — a frame already reduced bucketWidth-fold before it crosses
    * the one single-task window in the plan. At 10⁹+ docs, recurse the same
    * trick on the bucket frame; one level is ample below that.
    */
  def vocabGrowth(docs: DataFrame, bucketWidth: Int = 64): DataFrame = {
    require(bucketWidth >= 2, s"vocabGrowth: bucketWidth $bucketWidth")
    val firstSeen = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(min("doc_id").as("doc_id"))
    val perDoc = firstSeen.groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val base = docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("new_tokens", coalesce(col("nt"), lit(0L)))
      .withColumn("bkt", floor(col("doc_id") / bucketWidth))
    val intra = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive prefix of per-bucket totals; coalesce covers the first bucket
    val offsets = base.groupBy("bkt").agg(sum("new_tokens").as("bt"))
      .withColumn("off", coalesce(
        sum("bt").over(Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "off")
    base.join(offsets, "bkt")
      .withColumn("cum_vocab", col("off") + sum("new_tokens").over(intra))
      .select("doc_id", "new_tokens", "cum_vocab")
  }

  /** (g, first_doc) — one row per distinct corpus shingle with the doc that
    * introduced it. The reusable state behind [[ngramNovelty]]: novelty of
    * any later batch is O(batch) against this frame instead of O(corpus)
    * re-shingling. */
  def firstSeenOf(docs: DataFrame): DataFrame =
    TextOps.withShingles(docs)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .groupBy("g").agg(min("doc_id").as("first_doc"))

  /** Persist a first-seen index AT REST, bucketed on the shingle — the
    * batch novelty join's key — so [[noveltyVsIndex]] against the loaded
    * table is corpus-stationary (the scan's HashPartitioning covers the
    * join's clustering requirement; zero corpus-side shuffle). */
  def saveFirstSeenIndex(docs: DataFrame, namePrefix: String,
                         nBuckets: Int = 32): Unit =
    firstSeenOf(docs).write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "g")
      .saveAsTable(s"${namePrefix}_firstseen")

  def loadFirstSeenIndex(s: SparkSession, namePrefix: String): DataFrame =
    s.table(s"${namePrefix}_firstseen")

  /** O(batch) novelty of a NEW batch against an existing first-seen index:
    * [[ngramNovelty]]'s output for exactly the batch docs, without touching
    * corpus text. A shingle absent from the index but shared by two batch
    * docs is novel only for the smaller doc_id (within-batch first-seen).
    * CONTRACT: equality with a full [[ngramNovelty]] over corpus ∪ batch
    * (the q115 oracle) requires batch doc_ids above all corpus ids —
    * arrival order IS id order, the append-only ingest invariant; a stored
    * first_doc always wins over any batch id regardless. */
  def noveltyVsIndex(index: DataFrame, batch: DataFrame): DataFrame = {
    val bsh = TextOps.withShingles(batch)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val bmin = bsh.groupBy("g").agg(min("doc_id").as("bfirst"))
    bsh.join(bmin, "g")
      .join(index.select(col("g"), col("first_doc").as("idx_first")), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("idx_first").isNull && col("bfirst") === col("doc_id"), 1L)
          .otherwise(0L)).as("n_novel"))
      .withColumn("novelty", round(col("n_novel") / col("n_shingles"), 4))
  }

  /** Admit a batch into an at-rest first-seen index: append one (g,
    * first_doc = within-batch min) row per shingle the index has never
    * seen — later batches then measure novelty against earlier admissions.
    * O(batch) work; appended files land in the existing bucket layout.
    *
    * CRASH PROTOCOL: single table, and the anti-join re-derives exactly
    * the not-yet-admitted shingles — so a crashed append is healed by
    * simply RE-RUNNING it (the committed files' shingles are skipped, the
    * missing ones admitted; duplicates are impossible). Simpler than the
    * MinHash index's two-table repair because first-seen state has no
    * cross-table invariant. Single writer assumed, as with every graft
    * index writer. */
  def appendToFirstSeenIndex(s: SparkSession, namePrefix: String,
                             batch: DataFrame): Unit = {
    val bmin = TextOps.withShingles(batch)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .groupBy("g").agg(min("doc_id").as("first_doc"))
    val nBuckets = DedupOps.bucketCountOf(s, s"${namePrefix}_firstseen")
    bmin.join(s.table(s"${namePrefix}_firstseen").select("g"), Seq("g"), "left_anti")
      .write.mode("append").format("parquet")
      .bucketBy(nBuckets, "g")
      .saveAsTable(s"${namePrefix}_firstseen")
  }

  /** Session cache for q115's corpus-side index (the q87PrefixIndex
    * warm-state pattern): built once per (session, dir), localCheckpointed
    * so benched trials pay the BATCH cost the incremental operator exists
    * to isolate, not the corpus build. */
  private val firstSeenCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (Long, DataFrame)]()

  private def q115State(s: SparkSession, d: String): (Long, DataFrame) =
    firstSeenCache.computeIfAbsent(
      (s, try java.nio.file.Paths.get(d).toRealPath().toString
          catch { case _: java.io.IOException => d }), _ => {
      val docs = Tables.load(s, d, "documents")
      // 1-row aggregate: the order-respecting corpus/batch split point
      val thr = math.floor(
        docs.agg(max("doc_id")).collect()(0).getLong(0) * 0.9).toLong
      (thr, firstSeenOf(docs.filter(col("doc_id") <= thr))
        .localCheckpoint(true))
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q112_ngram_novelty" -> ((s, d) =>
      ngramNovelty(Tables.load(s, d, "documents")).orderBy("doc_id")),
    "q113_vocab_growth" -> ((s, d) =>
      vocabGrowth(Tables.load(s, d, "documents")).orderBy("doc_id")),

    // INCREMENTAL novelty: the last-arrived 10% of docs audited against the
    // warm corpus first-seen index — answer-checked against the full q112
    // computation restricted to the batch (the oracle replays it), proving
    // the O(batch) path ≡ the O(corpus) recompute.
    "q115_incremental_novelty" -> ((s, d) => {
      val (thr, index) = q115State(s, d)
      noveltyVsIndex(index,
        Tables.load(s, d, "documents").filter(col("doc_id") > thr))
        .orderBy("doc_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q112_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         | sh AS (SELECT doc_id, unnest(${TextOps.shinglesSql.replace("\n", " ")}) AS g FROM t),
         | f AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g)
         |SELECT sh.doc_id AS doc_id, count(*) AS n_shingles,
         | CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         | round(CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |   / count(*), 4) AS novelty
         |FROM sh JOIN f USING (g) GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin,
    // The incremental path must equal the full novelty pass BY
    // CONSTRUCTION, so its oracle IS q112's computation restricted to the
    // batch — a green row means O(batch) maintenance and O(corpus)
    // recompute agree exactly.
    "q115_incremental_novelty" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         | sh AS (SELECT doc_id, unnest(${TextOps.shinglesSql.replace("\n", " ")}) AS g FROM t),
         | f AS (SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g),
         | thr AS (SELECT CAST(floor(max(doc_id) * 0.9) AS BIGINT) AS mx FROM documents)
         |SELECT sh.doc_id AS doc_id, count(*) AS n_shingles,
         | CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         | round(CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |   / count(*), 4) AS novelty
         |FROM sh JOIN f USING (g), thr WHERE sh.doc_id > thr.mx
         |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin,

    "q113_vocab_growth" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
        |   FROM documents),
        | f AS (SELECT tok, min(doc_id) AS doc_id FROM tok GROUP BY tok),
        | pd AS (SELECT doc_id, count(*) AS nt FROM f GROUP BY doc_id)
        |SELECT d.doc_id AS doc_id,
        | CAST(coalesce(pd.nt, 0) AS BIGINT) AS new_tokens,
        | CAST(sum(coalesce(pd.nt, 0)) OVER (ORDER BY d.doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
        |FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin)
}
