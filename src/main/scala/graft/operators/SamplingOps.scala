package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.Md5Lower64

/** Corpus sampling and data-mixing operators over `documents` — the
  * selection stage of a training-data pipeline (after cleaning/dedup, decide
  * WHICH documents feed the tokenizer and HOW MUCH of each slice).
  *
  * Everything is hash-deterministic: sampling keys are the engine-neutral
  * [[Md5Lower64]] (= DuckDB `md5_number_lower`), so runs are reproducible
  * across retries/engines and every query here is hash-checked by the SQL
  * oracle end to end — no `rand()` anywhere.
  *
  * Scale design (100 TB):
  *  - the sampling key is a narrow map-side projection; stratified top-N is
  *    one shuffle on the stratum key (window rank), identical in shape to
  *    any groupBy — no driver-side sampling state;
  *  - mixture allocation aggregates per-stratum token totals (tiny), derives
  *    budgets with exact integer arithmetic (no cross-engine FP summation
  *    hazards), broadcasts them back, and takes documents in hash order
  *    until each stratum's budget is filled — one window pass over the
  *    corpus, one broadcast join.
  */
object SamplingOps {

  /** Order-preserving non-negative sampling key: md5 lower-64 of
    * (tag ‖ doc_id), logical-shift-right 1 so SIGNED long ordering in Spark
    * equals DuckDB's UNSIGNED ordering of `md5_number_lower(...) >> 1`.
    * The tag decorrelates keys across operators (a doc sampled by one query
    * is not automatically favored by another). */
  private def sampleKey(tag: String): Column =
    shiftrightunsigned(Md5Lower64.of(concat(lit(tag), col("doc_id").cast("string"))), 1)

  private def sampleKeySql(tag: String): String =
    s"CAST(md5_number_lower('$tag' || CAST(doc_id AS VARCHAR)) >> 1 AS BIGINT)"

  /** (lang, doc_id, n_tok, h) projection shared by the mixture/packing
    * queries: per-doc token count + the tag-decorrelated sampling key. */
  private def docsWithTokens(s: SparkSession, d: String, tag: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("lang"), col("doc_id"),
        TextOps.tokenCountOf(col("text")).cast("long").as("n_tok"),
        sampleKey(tag).as("h"))

  /** Per-stratum deterministic layout order, with the running-token frame
    * the mixture/packing queries accumulate over. */
  private def langHashOrder = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
  private def cumTokens: Column =
    sum("n_tok").over(langHashOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic stratified sampling: top-50 documents per language in
    // hash order — a reproducible uniform sample per stratum (hash order is
    // uncorrelated with any document property). Rank is one window over the
    // stratum key; ties impossible (doc_id is unique and last in the order).
    "q59_stratified_sample" -> ((s, d) => {
      val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      Tables.load(s, d, "documents")
        .select(col("lang"), col("doc_id"), sampleKey("sample:").as("h"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 50)
        .select("lang", "doc_id", "h")
        .orderBy("lang", "doc_id")
    }),

    // WEIGHTED sampling without replacement (Efraimidis–Spirakis): per
    // stratum, keep the 30 docs with the largest ln(u)/w where u is a
    // deterministic uniform from the md5 key and w the doc's weight (here
    // n_chars — inclusion probability rises with size; swap in a quality
    // score for importance sampling). Same one-window shuffle shape as q59.
    // PARITY NOTE: unlike the integer-exact siblings (q59/q69/q75/q76/q79),
    // the selection boundary here is a double `ln` ordering — a 1-ulp libm
    // divergence could in principle swap the rank-30/31 pair. Measured
    // boundary gaps at the tested SFs are ≥7.6e-7 vs ~1e-16 ulp error
    // (9 orders of margin); E-S keys have no integer-exact form.
    "q80_weighted_sample" -> ((s, d) => {
      val keyed = Tables.load(s, d, "documents")
        .select(col("lang"), col("doc_id"), col("n_chars"), sampleKey("wsample:").as("h"))
        // u in (0, 1]: cast h to double BEFORE the +1 — h can be exactly
        // 2^63-1, where a BIGINT h+1 overflows (DuckDB errors, ANSI Spark
        // throws); the double path rounds identically on both engines
        .withColumn("es_key",
          log((col("h").cast("double") + 1) / lit(math.pow(2, 63))) / col("n_chars"))
      val w = Window.partitionBy("lang").orderBy(col("es_key").desc, col("doc_id"))
      keyed.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 30)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    }),

    // Sequence-packing statistics (the tokenizer-side "concat then chunk
    // into fixed-length training sequences" step): documents are laid out
    // in deterministic hash order WITHIN each language shard (a global
    // order would need a single-partition window — per-shard packing is
    // the scale shape), then chunked into 2048-token sequences. Reports
    // per shard: full sequences produced, tail waste, and how many docs
    // straddle a sequence boundary (what attention-masking or document-
    // boundary loss handling has to deal with). All integer arithmetic.
    "q79_sequence_packing" -> ((s, d) => {
      val seqLen = 2048L
      docsWithTokens(s, d, "pack:")
        .withColumn("cum", cumTokens)
        .withColumn("crosses",
          expr(s"(cum - n_tok) DIV $seqLen") =!= expr(s"(cum - 1) DIV $seqLen"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").as("total_tokens"),
          expr(s"sum(n_tok) DIV $seqLen").as("n_full_seqs"),
          expr(s"sum(n_tok) % $seqLen").as("tail_waste"),
          sum(when(col("crosses"), 1L).otherwise(0L)).as("n_docs_crossing"))
        .transform(df => Tables.sortSmall(df, "lang"))
    }),

    // Corpus mixture ("data mixing"): allocate a global token budget across
    // language strata by sqrt-smoothed weight (alpha = 0.5 temperature — the
    // standard multilingual rebalancing curve: down-weights head languages,
    // up-weights tail ones), then keep documents per stratum in hash order
    // until the stratum budget fills. All budget arithmetic is INTEGER
    // (floor(sqrt()) weights, integer DIV allocation): bit-identical across
    // engines, no FP summation-order dependence.
    "q69_corpus_mixture" -> ((s, d) => {
      val docs = docsWithTokens(s, d, "mix:")
      val weights = docs.groupBy("lang")
        .agg(sum("n_tok").as("lang_tokens"))
        .withColumn("w", floor(sqrt(col("lang_tokens").cast("double"))).cast("bigint"))
      // single-row broadcast join (scalar-subquery shape, as in q38)
      val sumW = weights.agg(sum("w").as("sum_w"))
      val budgets = weights.join(broadcast(sumW))
        .select(col("lang"), expr("50000 * w DIV sum_w").as("budget"))
      docs.withColumn("cum", cumTokens)
        .join(broadcast(budgets), "lang")
        .filter(col("cum") <= col("budget"))
        .groupBy("lang")
        .agg(max("budget").as("budget"),
          count(lit(1)).as("n_docs_kept"),
          sum("n_tok").as("tokens_kept"))
        .orderBy("lang") // sortSmall A/B'd +0.07 here (r19) — kept global
    }),

    // DSIR-style data selection (Data Selection via Importance Resampling,
    // arXiv:2302.03169): score every raw document by how target-like its
    // token distribution is — per-token log-likelihood ratio between an
    // add-1-smoothed unigram LM of the TARGET slice (here sources
    // src1/src2, the "domain we want more of") and of the RAW corpus —
    // then Gumbel-softmax-select the top 50 (log-space sampling ∝ exp of
    // the score, so no exp() overflow; the Gumbel uniform comes from the
    // deterministic md5 sample key, so selection is reproducible and
    // oracle-replayable). LLR terms reuse q75's integer-millionths log
    // scaling: the per-doc sum is shuffle-order-independent and
    // engine-exact; only the final key addition is FP, and it is the same
    // two-double sum on both engines.
    // Scale: two vocab-sized aggregations; the LLR table joins back onto
    // the token stream — broadcast when the vocab fits (it does here), and
    // at web scale (vocab in the 10⁸ range) a shuffle join whose stopword
    // hot keys are exactly the splittable-equi-join case AQE skew handling
    // covers (tiny payload per key, no aggregation on the hot side). The
    // top-50 is a TakeOrdered, never a global sort.
    "q89_dsir_selection" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "source", "text")
      val toks = docs.select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      val raw = toks.groupBy("tok").agg(count(lit(1)).as("cr"))
      val tgt = toks.filter(col("source").isin("src1", "src2"))
        .groupBy("tok").agg(count(lit(1)).as("ct"))
      val tot = raw.agg(sum("cr").as("nr"), count(lit(1)).as("v"))
      val tt = tgt.agg(sum("ct").as("nt"))
      val llr = raw.join(tgt, Seq("tok"), "left")
        .join(broadcast(tot)).join(broadcast(tt))
        .select(col("tok"), round(
          (log((coalesce(col("ct"), lit(0L)) + 1) / (col("nt") + col("v"))) -
            log((col("cr") + 1) / (col("nr") + col("v")))) * 1e6).cast("long").as("llr"))
      val scored = toks.join(llr, "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), sum("llr").as("sllr"))
      val keyed = docs.select(col("doc_id"), col("source"), sampleKey("dsir:").as("h"))
        .join(scored, "doc_id")
        // u strictly inside (0,1): h is 63-bit, (h + 0.5)/2^63 never hits
        // 0 or 1, so the Gumbel −ln(−ln(u)) is always finite
        .withColumn("g", -log(-log((col("h").cast("double") + 0.5) / lit(math.pow(2, 63)))))
        .withColumn("sel_key", col("sllr") / (col("n_tok") * 1e6) + col("g"))
      keyed
        .orderBy(col("sel_key").desc, col("doc_id"))
        .limit(50) // TakeOrdered — per-partition heaps, no global sort
        .select(col("doc_id"), col("source"), col("n_tok"),
          round(col("sllr") / (col("n_tok") * 1e6), 6).as("avg_llr"),
          round(col("sel_key"), 6).as("sel_key"))
        .orderBy("doc_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q59_stratified_sample" ->
      s"""WITH h AS (SELECT lang, doc_id, ${sampleKeySql("sample:")} AS h FROM documents),
         | r AS (SELECT lang, doc_id, h,
         |       row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk FROM h)
         |SELECT lang, doc_id, h FROM r WHERE rk <= 50 ORDER BY lang, doc_id""".stripMargin,

    "q80_weighted_sample" ->
      s"""WITH h AS (SELECT lang, doc_id, n_chars, ${sampleKeySql("wsample:")} AS h FROM documents),
         | k AS (SELECT lang, doc_id, n_chars,
         |       ln((CAST(h AS DOUBLE) + 1) / 9223372036854775808.0) / n_chars AS es_key FROM h),
         | r AS (SELECT lang, doc_id, n_chars,
         |       row_number() OVER (PARTITION BY lang ORDER BY es_key DESC, doc_id) AS rk FROM k)
         |SELECT lang, doc_id, n_chars FROM r WHERE rk <= 30 ORDER BY lang, doc_id""".stripMargin,

    "q79_sequence_packing" ->
      s"""WITH docs AS (SELECT lang, doc_id,
         |   CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok,
         |   ${sampleKeySql("pack:")} AS h FROM documents),
         | cum AS (SELECT lang, doc_id, n_tok,
         |        sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |        FROM docs)
         |SELECT lang, count(*) AS n_docs,
         | CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         | CAST(sum(n_tok) // 2048 AS BIGINT) AS n_full_seqs,
         | CAST(sum(n_tok) % 2048 AS BIGINT) AS tail_waste,
         | CAST(sum(CASE WHEN (cum - n_tok) // 2048 <> (cum - 1) // 2048 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_docs_crossing
         |FROM cum GROUP BY lang ORDER BY lang""".stripMargin,

    "q69_corpus_mixture" ->
      s"""WITH docs AS (SELECT lang, doc_id,
         |   CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok,
         |   ${sampleKeySql("mix:")} AS h FROM documents),
         | wt AS (SELECT lang, CAST(floor(sqrt(CAST(sum(n_tok) AS DOUBLE))) AS BIGINT) AS w
         |        FROM docs GROUP BY lang),
         | sw AS (SELECT sum(w) AS sum_w FROM wt),
         | b AS (SELECT lang, 50000 * w // sum_w AS budget FROM wt, sw),
         | ranked AS (SELECT lang, doc_id, n_tok,
         |        sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |        FROM docs)
         |SELECT r.lang AS lang, CAST(b.budget AS BIGINT) AS budget,
         | count(*) AS n_docs_kept, CAST(sum(r.n_tok) AS BIGINT) AS tokens_kept
         |FROM ranked r JOIN b ON r.lang = b.lang
         |WHERE r.cum <= b.budget
         |GROUP BY r.lang, b.budget ORDER BY r.lang""".stripMargin,

    // Replays the full DSIR pipeline: smoothed unigram LLR per token
    // (integer-millionths, same round/cast as q75), per-doc sums, the
    // md5-derived Gumbel key, global top-50.
    "q89_dsir_selection" ->
      s"""WITH toks AS (SELECT doc_id, source,
         |   unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents),
         | raw AS (SELECT tok, count(*) AS cr FROM toks GROUP BY tok),
         | tgt AS (SELECT tok, count(*) AS ct FROM toks
         |         WHERE source IN ('src1', 'src2') GROUP BY tok),
         | tot AS (SELECT sum(cr) AS nr, count(*) AS v FROM raw),
         | tt AS (SELECT sum(ct) AS nt FROM tgt),
         | llr AS (SELECT r.tok,
         |   CAST(round((ln((COALESCE(t.ct, 0) + 1) / CAST(tt.nt + tot.v AS DOUBLE))
         |             - ln((r.cr + 1) / CAST(tot.nr + tot.v AS DOUBLE))) * 1e6) AS BIGINT) AS llr
         |   FROM raw r LEFT JOIN tgt t ON r.tok = t.tok, tot, tt),
         | scored AS (SELECT k.doc_id, count(*) AS n_tok, sum(l.llr) AS sllr
         |   FROM toks k JOIN llr l ON k.tok = l.tok GROUP BY k.doc_id),
         | hk AS (SELECT doc_id, source, ${sampleKeySql("dsir:")} AS h FROM documents),
         | keyed AS (SELECT d.doc_id, d.source, s.n_tok, s.sllr,
         |   s.sllr / (s.n_tok * 1e6)
         |     + -ln(-ln((CAST(d.h AS DOUBLE) + 0.5)
         |               / 9223372036854775808.0)) AS sel_key
         |   FROM hk d JOIN scored s ON d.doc_id = s.doc_id),
         | top AS (SELECT * FROM keyed ORDER BY sel_key DESC, doc_id LIMIT 50)
         |SELECT doc_id, source, n_tok, round(sllr / (n_tok * 1e6), 6) AS avg_llr,
         | round(sel_key, 6) AS sel_key
         |FROM top ORDER BY doc_id""".stripMargin)
}
