package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over `embeddings` (ArrayType(FloatType), dim=64).
  *
  * Scale design (100 TB):
  *  - brute-force top-k broadcasts the (small) query set and streams the
  *    corpus once — a single narrow pass, no shuffle of vectors; the per-
  *    query top-k is a TakeOrdered over (query, score);
  *  - the LSH path buckets vectors by random-hyperplane sign bits: bucket
  *    assignment is a map-side projection, candidate generation an equi-join
  *    on the bucket id — corpus is never paired quadratically. Recall is
  *    tuned by bits/tables; the exact-cosine re-rank happens only inside
  *    buckets;
  *  - all arithmetic is done on array<double> (cast once) with sequential
  *    higher-order folds so results match the DuckDB oracle bit-for-bit
  *    before rounding.
  */
object SimilarityOps {

  /** Cosine similarity: the native fused [[graft.plans.CosineSimilarity]]
    * expression (single pass, zero allocation, codegen'd). Numerically
    * identical to [[cosineComposed]] — each accumulator folds in the same
    * element order — so oracle parity is preserved. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    GraftBridge.column(graft.plans.CosineSimilarity(
      Cast(GraftBridge.expression(a), ArrayType(DoubleType)),
      Cast(GraftBridge.expression(b), ArrayType(DoubleType))))
  }

  /** Reference implementation from composed built-ins (zip_with/aggregate);
    * kept for the equivalence spec and as the no-extensions fallback. */
  def cosineComposed(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  // spread: every query here does per-row vector math (64-dim cosine /
  // quantize / sketch) straight off the scan — a single-row-group
  // embeddings file would serialize the whole family (see Tables.spread)
  private def vectors(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.load(s, d, "embeddings"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"), col("label"))

  /** Deterministic random hyperplanes (seeded) for sign-LSH. */
  private def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Dot product via the native fused [[graft.plans.DotProduct]] expression
    * — same accumulation order as [[cosine]]'s dot leg and DuckDB's
    * `list_dot_product`. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    GraftBridge.column(graft.plans.DotProduct(
      Cast(GraftBridge.expression(a), ArrayType(DoubleType)),
      Cast(GraftBridge.expression(b), ArrayType(DoubleType))))
  }

  /** A constant plane as an UNBOXED array literal: `typedlit(Seq[Double])`
    * lands as a GenericArrayData over java.lang.Double — every getDouble in
    * the hot projection loop dereferences + unboxes an object. Wrapping the
    * primitive array in UnsafeArrayData gives flat 8-byte reads (measured
    * on the r15 q66 profile as part of the 36-plane projection cost). */
  private def planeLit(p: Seq[Double]): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{Literal, UnsafeArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    GraftBridge.column(Literal(
      UnsafeArrayData.fromPrimitiveArray(p.toArray),
      ArrayType(DoubleType, containsNull = false)))
  }

  /** Sign bit per hyperplane via the NATIVE dot-product expression —
    * sign(dot) == sign(cos) (norms are positive) and the DuckDB oracle
    * replays exactly `list_dot_product(emb, pl) >= 0`, so this drops the
    * two per-plane norm accumulations [[cosine]] paid without moving a
    * single bit. One fused codegen'd pass per plane instead of an
    * interpreted zip_with/aggregate lambda (measured ~5× on the
    * bucket-assignment stage; the dot+unboxed-literal form is another ~3×
    * on the r15 profile). */
  private def signBits(emb: Column, planes: Seq[Seq[Double]]): Seq[Column] =
    planes.map(p => when(dot(emb, planeLit(p)) >= 0, lit(1L)).otherwise(lit(0L)))

  /** Max bits/table the ORACLE can replay (48 plane constants in the SQL);
    * 2^12 = 4096 buckets covers corpora to ~256k vectors at the target
    * bucket size. The operator API accepts larger b (API-only territory —
    * plane stride grows with b, leaving the SQL-replayable prefix). */
  private[graft] val LshMaxSqlBits = 12
  private[graft] val LshTables = 4
  private[graft] val LshTargetBucket = 64L

  /** Bits/table so the EXPECTED bucket size stays ~[[LshTargetBucket]]:
    * the smallest b with 2^b ≥ ⌈n/64⌉, integer-exact (no float log2 — the
    * oracle computes the identical value as `LENGTH(BIN(⌈n/64⌉ − 1))`, and
    * `ln(n)/ln(2)` lands on 5.0000000000000009-style off-by-one ulps at
    * exact powers). Clamped to [4, maxBits]. */
  private[graft] def lshAdaptiveBits(n: Long, maxBits: Int = LshMaxSqlBits): Int = {
    val m = (n + LshTargetBucket - 1) / LshTargetBucket
    val b = 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    b.max(4).min(maxBits)
  }

  /** Per-table sign-LSH bucket signatures: (vec_id, t, code) with adaptive
    * bit width (see [[lshSimilarPairs]]). Factored out so ScaleProbe can
    * audit the candidate count (Σ per-bucket C(m,2)) WITHOUT paying the
    * candidate join itself — the direct measurement that the adaptive width
    * holds candidates ∝ n at sweep scale.
    *
    * `bitsPerTable` ≤ 0 (the default) sizes buckets to the corpus: a FIXED
    * bit width is quadratic in disguise — at 4 bits a random pair collides
    * in some table with p ≈ 4/16, so candidates grow as n²/4 no matter how
    * sparse the true-pair set is (measured: 2k vecs → 0.5M candidates fine,
    * 20k → 50M candidates pinned one core for 10+ min). Adaptive b keeps
    * E[bucket] ≈ 64 and candidate count ≈ n·64·4/2 — linear in n — at a
    * recall cost only for pairs far below the dedup band (sign-LSH
    * collision odds rise with cosine; extra bits prune the noise floor
    * first). Plane indexing is strided so the first [[LshMaxSqlBits]] bits
    * of each table are the same plane constants at every b — the oracle
    * replays any b in [4, 12] from one 48-plane VALUES list. */
  private[graft] def lshSignatures(vecs: DataFrame,
                                   tables: Int = LshTables,
                                   bitsPerTable: Int = 0): DataFrame = {
    val b = if (bitsPerTable > 0) bitsPerTable
            else lshAdaptiveBits(vecs.count()) // one count() — an
            // index-build-time parameter, same discipline as IvfIndex's k
    val stride = b.max(LshMaxSqlBits)
    val planes = hyperplanes(tables * stride, 64)
    // All table codes in ONE fused native expression (graft.plans.LshCodes):
    // the composed per-plane form (tables×b dot+CASE-WHEN columns) generated
    // a method too large to JIT — measured ~190 µs/row vs ~2 µs of real FMA
    // work on the r15 q66 profile. Bit/accumulation order is identical, so
    // the codes (and the DuckDB oracle replay) are unchanged.
    vecs
      .select(col("vec_id"),
        posexplode(graft.plans.LshCodes.codesFor(col("emb"), planes, tables, b, stride)))
      .select(col("vec_id"), col("pos").as("t"), col("col").as("code"))
  }

  /** All-similar-pairs over a (vec_id, emb: array<double>) frame via
    * multi-table sign-LSH (4 tables, OR-amplified, [[lshSignatures]]
    * buckets). Candidate pairs are deduped on IDs ONLY, then vectors
    * re-attach — the shuffle carries (a, b) longs, never embeddings.
    * Returns (a, b, sim) with a < b; feeds q66 and
    * [[DedupPipeline.dedupByEmbedding]]. */
  private[graft] def lshSimilarPairs(vecs: DataFrame,
                                     tables: Int = LshTables,
                                     bitsPerTable: Int = 0): DataFrame = {
    // Pin the signatures before the self-join: un-pinned, BOTH join sides
    // re-run the tables×b plane projection over the corpus (Spark reuses
    // no exchange across self-join branches — the same trap the media
    // pipeline hit in r14), which the r15 profile measured as ~80% of q66's
    // sf1 wall (9 of 11 s). 24 B/vector — the same order as the media
    // sig pin (16 B/asset).
    val v = lshSignatures(vecs, tables, bitsPerTable).localCheckpoint()
    val candidates = v.as("x")
      .join(v.as("y"),
        col("x.t") === col("y.t") && col("x.code") === col("y.code") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .dropDuplicates("a", "b")
    // Re-attach embeddings WITHOUT a forced broadcast: at test scale Spark
    // auto-broadcasts the sub-threshold corpus (the measured r01 win); at
    // 100 TB the corpus exceeds any broadcast budget — forcing broadcast()
    // here would OOM the driver on exactly the workloads dedupByEmbedding
    // exists for. ABOVE the broadcast threshold the corpus sides carry a
    // shuffle_hash hint: the default sort-merge plan must SORT the pair
    // stream, and after the first join every pair row drags a dim-sized
    // embedding array through that sort (measured at sf10: 30.3M candidate
    // pairs × 512 B arrays = 23.7 GB spill in one stage, the whole query's
    // wall — 42.6 s → 12.9 s with the hint). Hash-building on the corpus
    // side streams the pair rows straight through both joins — zero sort,
    // zero spill; the build is corpus/partitions-sized, which is exactly
    // what partition count scales with. BELOW the threshold the hint is
    // omitted (an unconditional hint would override the planner's cheaper
    // broadcast pick — measured 2× on the small corpus).
    val preferHash = vecs.queryExecution.optimizedPlan.stats.sizeInBytes >
      vecs.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    def corpusSide(df: DataFrame): DataFrame =
      if (preferHash) df.hint("shuffle_hash") else df
    candidates
      .join(corpusSide(vecs.select(col("vec_id").as("a"), col("emb").as("ea"))), "a")
      .join(corpusSide(vecs.select(col("vec_id").as("b"), col("emb").as("eb"))), "b")
      .withColumn("sim", round(cosine(col("ea"), col("eb")), 6))
      .select("a", "b", "sim")
  }

  /** IVF search with a configurable probe width, through the reusable
    * [[IvfIndex]] build/search API (same plan, same oracle: build is
    * centroid agg + one broadcast-join assignment pass; search probes
    * nprobe cells per query). At nprobe = #cells this degrades gracefully
    * to exact brute force (recall 1.0 by construction — asserted in
    * SimilaritySpec); recall is monotone in nprobe. NOTE the test
    * embeddings are isotropic gaussians (no cluster structure — the
    * adversarial worst case for any sublinear ANN), so measured recall at
    * small nprobe is data-limited, not a defect; q67 reports it honestly. */
  private[graft] def ivfTopK(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    val v = vectors(s, d)
    IvfIndex.build(v).search(
      v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb")),
      k = 5, nprobe = nprobe)
  }

  /** Within-cell nearest neighbor + duplicate flag over an IVF `assigned`
    * frame — the SemDeDup core shared by q83 and [[semanticDedup]]. */
  private def cellNearestNeighbor(assigned: DataFrame, tau: Double): DataFrame = {
    val scored = assigned.select(col("cell"), col("vec_id"), col("emb")).as("x")
      .join(assigned.select(col("cell"), col("vec_id").as("nn_id"), col("emb").as("nn_emb")).as("y"),
        Seq("cell"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("sim", round(cosine(col("emb"), col("nn_emb")), 6))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("nn_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cell"), col("nn_id"), col("sim"),
        when(col("sim") >= tau, lit(1L)).otherwise(lit(0L)).as("is_dup"))
  }

  /** Corpus row count for the k = ⌈√n⌉ default (VERDICT r16: don't burn a
    * corpus pass on a parameter default). Catalyst's plan statistics when
    * they carry an EXACT row count (ANALYZEd catalog tables, cached
    * relations, LocalRelations) — zero jobs; otherwise one count job whose
    * column pruning leaves an empty read schema, so over a pure parquet
    * lineage it reads row-group FOOTERS only (O(#files) metadata I/O, not
    * O(data)). A filtered/joined lineage does re-execute — at 100 TB pass
    * `k` explicitly: cell count is a capacity decision (k = √n ⇒ assignment
    * work O(n·k) = O(n^1.5); see the q102 scale adjudication), not a value
    * to re-derive per run. */
  private def corpusSize(vecs: DataFrame): Long = {
    val stats = vecs.queryExecution.optimizedPlan.stats
    stats.rowCount match {
      case Some(n) if n.isValidLong => n.toLong
      case _ => vecs.count()
    }
  }

  /** Production semantic dedup (SemDeDup, arXiv:2303.09540) over a
    * (vec_id, emb) corpus: IVF-cluster into `k` cells (defaults to ⌈√n⌉ so
    * the within-cell all-pairs work grows ~n^1.5 instead of n² — the fixed-k
    * failure VERDICT r4 flagged), then flag every vector whose within-cell
    * nearest neighbor has cosine ≥ `tau`. Returns one row per vector in a
    * cell of ≥ 2: (vec_id, cell, nn_id, sim, is_dup); drop policy is
    * "is_dup = 1 and nn_id < vec_id" (senior survives). `nRefine` Lloyd
    * iterations tighten cell balance after the sampled k-means++ seeding. */
  def semanticDedup(vecs: DataFrame, tau: Double, k: Option[Int] = None,
                    nRefine: Int = 0): DataFrame = {
    val kk = k.getOrElse(math.ceil(math.sqrt(corpusSize(vecs).toDouble)).toInt.max(1))
    val base = IvfIndex.build(vecs.select("vec_id", "emb"), kk)
    val index = if (nRefine > 0) IvfIndex.refine(base, nRefine) else base
    cellNearestNeighbor(index.assigned, tau)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-k: queries (vec_id < 10) broadcast against the
    // full corpus; rank by rounded similarity with vec_id tie-break so the
    // ordering is identical across engines.
    "q60_knn_brute" -> ((s, d) => {
      val v = vectors(s, d)
      val queries = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      val scored = v.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(cosine(col("q_emb"), col("emb")), 6))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
      scored
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("sim"))
        .orderBy("q_id", "rank")
    }),

    // Sign-LSH ANN: 8 random hyperplanes → 256 buckets; candidates share a
    // bucket with the query, exact cosine re-ranks inside the bucket.
    "q61_ann_lsh" -> ((s, d) => {
      val bits = signBits(col("emb"), hyperplanes(8, 64))
      val bucket = bits.zipWithIndex.map { case (b, i) => b * (1L << i) }.reduce(_ + _)
      val v = vectors(s, d)
        .withColumn("bucket", bucket)
        .select("vec_id", "emb", "bucket")
      val queries = v.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("bucket"))
      val scored = v.join(broadcast(queries), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(cosine(col("q_emb"), col("emb")), 6))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
      scored
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("sim"))
        .orderBy("q_id", "rank")
    }),

    // Per-vector statistics: L2 norm, mean, min, max — narrow map over the
    // array column, oracle-checked against DuckDB list lambdas.
    "q62_vector_stats" -> ((s, d) => {
      // sortOnce: narrow map + global sort would run the map twice
      // (range sampler + sort exchange) — see Tables.sortOnce scaladoc
      graft.Tables.sortOnce(vectors(s, d)
        .withColumn("l2_norm",
          round(sqrt(aggregate(transform(col("emb"), x => x * x), lit(0.0), (a, x) => a + x)), 6))
        .withColumn("mean",
          round(aggregate(col("emb"), lit(0.0), (a, x) => a + x) / size(col("emb")), 6))
        .withColumn("vmin", round(array_min(col("emb")), 6))
        .withColumn("vmax", round(array_max(col("emb")), 6))
        .select("vec_id", "label", "l2_norm", "mean", "vmin", "vmax"),
        "vec_id")
    }),

    // Embedding-cosine near-duplicate detection: same-label blocking, top-20
    // most similar pairs (the embedding analog of q51/q53).
    // SCALE CAVEAT: same-label blocking is all-pairs WITHIN a block —
    // O(n²/labels). This is the documented exact BASELINE for comparison;
    // at 100 TB (or with few labels) use q66's OR-amplified LSH self-join,
    // which materializes only colliding pairs.
    "q63_embedding_neardup" -> ((s, d) => {
      val v = vectors(s, d)
      v.select(col("vec_id").as("a"), col("emb").as("emb_a"), col("label")).as("x")
        .join(v.select(col("vec_id").as("b"), col("emb").as("emb_b"), col("label")).as("y"), "label")
        .filter(col("a") < col("b"))
        .withColumn("sim", round(cosine(col("emb_a"), col("emb_b")), 6))
        .select("label", "a", "b", "sim")
        .orderBy(col("sim").desc, col("a"), col("b"))
        .limit(20)
    }),

    // IVF (inverted-file) ANN: coarse-quantize the corpus into cells around
    // k centroids (derived here by element-wise mean per label block — a
    // stand-in for a k-means pass, which is just this same aggregation
    // iterated); assign every vector to its nearest centroid; probe the
    // nprobe=3 cells nearest the query and re-rank exactly inside them.
    // Scale path: centroids broadcast (k×dim is KBs); cell assignment is one
    // narrow pass; the probe join touches nprobe/k of the corpus.
    "q65_ann_ivf" -> ((s, d) => ivfTopK(s, d, nprobe = 3)),

    // Incremental index ingest — build the IVF index on the 90% corpus,
    // append() the 10% batch against FROZEN centroids (O(batch): one
    // broadcast join, corpus assignment untouched), then report per-cell
    // occupancy split by origin: the drift audit an appending pipeline
    // runs after every batch to decide when to re-seed. The oracle replays
    // corpus-only centroids + nearest-centroid assignment of ALL vectors,
    // so a green row proves append() lands every batch vector exactly
    // where a full rebuild with the same centroids would.
    "q102_ivf_append" -> ((s, d) => {
      val v = vectors(s, d)
      val idx = IvfIndex.build(v.filter(col("vec_id") % 10 =!= 0))
        .append(v.filter(col("vec_id") % 10 === 0))
      idx.assigned
        .withColumn("is_new", (col("vec_id") % 10 === 0).cast("long"))
        .groupBy("cell")
        .agg(
          sum(lit(1L) - col("is_new")).as("n_corpus"),
          sum(col("is_new")).as("n_new"),
          count(lit(1)).as("n_total"))
        .orderBy("cell")
    }),

    // Similarity SELF-join via multi-table sign-LSH: 4 independent tables,
    // corpus-adaptive bits per table (E[bucket] ≈ 64); a pair is a
    // candidate if it collides in ANY table (OR-amplification), then exact
    // cosine re-ranks. This is the corpus×corpus "all similar pairs"
    // operator — linear-candidate at 100 TB since only same-bucket pairs
    // materialize and bucket count tracks corpus size.
    "q66_sim_join_lsh" -> ((s, d) => {
      lshSimilarPairs(vectors(s, d).select("vec_id", "emb"))
        .orderBy(col("sim").desc, col("a"), col("b"))
        .limit(20)
    }),

    // ANN recall against exact ground truth — the first number a user of an
    // ANN operator asks for: per query, |ANN top-5 ∩ brute top-5| / 5 for
    // both the sign-LSH (q61) and IVF (q65) paths. Fully oracle-checked
    // since all three sides are SQL-replayable.
    "q67_ann_recall" -> ((s, d) => {
      val brute = queries("q60_knn_brute")(s, d).select("q_id", "n_id")
      recallAt5(brute, queries("q61_ann_lsh")(s, d))
        .withColumn("method", lit("lsh"))
        .unionByName(recallAt5(brute, queries("q65_ann_ivf")(s, d))
          .withColumn("method", lit("ivf")))
        .select("method", "q_id", "hits", "recall")
        .orderBy("method", "q_id")
    }),

    // Per-label centroids (posexplode → element-wise mean → re-assemble),
    // then the full label×label centroid cosine matrix. Oracle: per-position
    // unnest + avg + ordered list() in DuckDB.
    "q64_label_centroids" -> ((s, d) => {
      val centroids = IvfIndex.centroidsOf(vectors(s, d), "label", "label")
      centroids.select(col("label").as("la"), col("centroid").as("ca")).as("x")
        .join(centroids.select(col("label").as("lb"), col("centroid").as("cb")).as("y"),
          col("la") < col("lb"))
        .withColumn("sim", round(cosine(col("ca"), col("cb")), 6))
        .select("la", "lb", "sim")
        .orderBy("la", "lb")
    }),

    // Semantic dedup (the SemDeDup shape: arXiv:2303.09540): coarse-cluster
    // the corpus into IVF cells, then WITHIN each cell find every vector's
    // nearest neighbor and flag it as a semantic duplicate when cosine ≥ τ.
    // Per-vector output (vec_id, cell, nn_id, sim, is_dup) — the keep/drop
    // decision is "drop if is_dup and nn_id < vec_id" (smallest id is
    // canonical), exactly the DedupPipeline convention.
    // Scale: the quadratic work is confined to cells, so k MUST grow with
    // the corpus — the production entry point is [[semanticDedup]], which
    // defaults k = ⌈√n⌉ (within-cell work then grows ~n^1.5, not n²;
    // SemDeDup uses k≈10⁵ for 10⁹ docs). THIS query keeps the label-seeded
    // build because its per-position-mean centroids are replayable in the
    // DuckDB oracle SQL, which a sampled k-means++ seeding is not; the
    // k-scaling path is spec-checked (IvfSpec) and probed (ScaleProbe).
    "q83_semantic_dedup" -> ((s, d) => {
      cellNearestNeighbor(IvfIndex.build(vectors(s, d)).assigned, tau = 0.3)
        .orderBy("vec_id")
    }),

    // Int8 vector quantization (the storage/serving compression step of an
    // embedding pipeline): per-vector symmetric scale = 127 / max|x|,
    // q_i = floor(x_i * scale + 0.5) — floor(+0.5) instead of round() so
    // the quantizer is bit-identical across engines (round() half-up vs
    // half-even semantics differ per engine/type; floor on IEEE doubles
    // does not). Pure narrow map: one pass, no shuffle, reports per-vector
    // reconstruction error.
    "q68_vector_quantize" -> ((s, d) => {
      Tables.sortOnce(vectors(s, d)
        .withColumn("scale", lit(127.0) / array_max(transform(col("emb"), x => abs(x))))
        .withColumn("q", transform(col("emb"),
          x => floor(x * col("scale") + lit(0.5)).cast("long")))
        .select(
          col("vec_id"),
          round(col("scale"), 6).as("scale"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("sum_q"),
          array_max(col("q")).as("max_q"),
          round(
            aggregate(zip_with(col("emb"), col("q"), (x, q) => abs(x - q / col("scale"))),
              lit(0.0), (a, e) => a + e) / size(col("emb")), 6).as("mean_abs_err")),
        "vec_id")
    }),

    // Quantization-quality QA: recall@5 of brute-force top-k computed on
    // the INT8-quantized vectors (q68's floor quantizer) against the
    // float-vector ground truth (q60) — the accept/reject number a serving
    // team reads before switching storage to int8. The quantized values
    // are small exact integers carried as doubles, so the same fused
    // cosine kernel (and DuckDB's list_cosine_similarity) evaluates them
    // with zero representation error — cross-engine parity is inherited
    // from q60 rather than re-argued. Scale: two narrow scoring passes
    // (query set broadcast) + a key-sized recall join; the quantized pass
    // is the one that would run at full corpus width, at 1/4 the scan
    // bytes of float32.
    "q95_quantized_recall" -> ((s, d) => {
      val v = vectors(s, d)
      val qz = v
        .withColumn("scale", lit(127.0) / array_max(transform(col("emb"), x => abs(x))))
        .select(col("vec_id"),
          transform(col("emb"),
            x => floor(x * col("scale") + lit(0.5)).cast("double")).as("emb"))
      val queries8 = qz.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
      val int8Top = qz.join(broadcast(queries8), col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(cosine(col("q_emb"), col("emb")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("n_id"))
      val brute = queries("q60_knn_brute")(s, d).select("q_id", "n_id")
      recallAt5(brute, int8Top).orderBy("q_id")
    }))

  /** Per-query recall@5 of `ann` (q_id, n_id) against `brute` ground truth —
    * the ONE recall-join shape shared by q67 (LSH/IVF) and q95 (int8).
    * Queries the ANN path missed entirely still appear, with recall 0. */
  private def recallAt5(brute: DataFrame, ann: DataFrame): DataFrame = {
    val hits = brute.join(ann.select("q_id", "n_id"), Seq("q_id", "n_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    brute.select("q_id").distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)) / 5.0, 4).as("recall"))
  }

  /** The seeded hyperplanes as a DuckDB VALUES list `(p, [64 doubles])` —
    * the same constants [[signBits]] uses, so the oracle replays bucket
    * assignment exactly (Double.toString round-trips through the SQL
    * parser bit-for-bit). */
  private def planesValuesSql(nPlanes: Int): String =
    hyperplanes(nPlanes, 64).zipWithIndex.map { case (p, i) =>
      s"($i, [${p.map(_.toString).mkString(", ")}])"
    }.mkString(", ")

  /** Shared oracle CTE bodies (embeddings cast + per-label centroids).
    *
    * Centroid determinism note: `avg` over doubles is summation-order
    * dependent in general, but at oracle scales the embeddings table is ONE
    * parquet split on both engines, so both sum sequentially in file order
    * and the centroids are bit-identical. The residual risk class (a
    * round-6 cosine boundary or a near-tied argmax flipped by a last-ulp
    * difference) needs two values within ~1e-15 of each other AND of a
    * boundary — for continuous gaussian data that is ~1e-8 per round,
    * unlike the money sums Num.scala hardens (which sat ON boundaries). */
  private val vCte = "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings"
  private val centroidsCte =
    """SELECT label AS cell, list(cx ORDER BY pos) AS centroid FROM (
      |   SELECT label, i AS pos, avg(emb[i+1]) AS cx
      |   FROM v CROSS JOIN range(64) t(i) GROUP BY label, i) GROUP BY cell""".stripMargin

  private def annLshSql: String =
    s"""WITH v AS ($vCte),
       | planes(p, pl) AS (VALUES ${planesValuesSql(8)}),
       | bits AS (SELECT vec_id, p,
       |   CASE WHEN list_dot_product(emb, pl) >= 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
       |   FROM v CROSS JOIN planes),
       | bk AS (SELECT vec_id, CAST(sum(bit * (1::BIGINT << p)) AS BIGINT) AS bucket
       |        FROM bits GROUP BY vec_id),
       | vb AS (SELECT v.vec_id, v.emb, bk.bucket FROM v JOIN bk USING (vec_id)),
       | q AS (SELECT vec_id AS q_id, emb AS q_emb, bucket FROM vb WHERE vec_id < 10),
       | scored AS (SELECT q.q_id, vb.vec_id AS n_id,
       |   round(list_cosine_similarity(q.q_emb, vb.emb), 6) AS sim
       |   FROM vb JOIN q USING (bucket) WHERE vb.vec_id <> q.q_id),
       | ranked AS (SELECT q_id, n_id, sim,
       |   row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM scored)
       |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  private def annIvfSql: String =
    s"""WITH v AS ($vCte),
       | cents AS ($centroidsCte),
       | assigned AS (SELECT vec_id, emb, cell FROM (
       |   SELECT v.vec_id, v.emb, c.cell,
       |     row_number() OVER (PARTITION BY v.vec_id
       |       ORDER BY list_cosine_similarity(v.emb, c.centroid) DESC, c.cell) AS rk
       |   FROM v CROSS JOIN cents c) WHERE rk = 1),
       | probes AS (SELECT q_id, q_emb, cell FROM (
       |   SELECT v.vec_id AS q_id, v.emb AS q_emb, c.cell,
       |     row_number() OVER (PARTITION BY v.vec_id
       |       ORDER BY list_cosine_similarity(v.emb, c.centroid) DESC, c.cell) AS rk
       |   FROM v CROSS JOIN cents c WHERE v.vec_id < 10) WHERE rk <= 3),
       | scored AS (SELECT p.q_id, a.vec_id AS n_id,
       |   round(list_cosine_similarity(p.q_emb, a.emb), 6) AS sim
       |   FROM assigned a JOIN probes p USING (cell) WHERE a.vec_id <> p.q_id),
       | ranked AS (SELECT q_id, n_id, sim,
       |   row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank FROM scored)
       |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  private def bruteSql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      | q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < 10),
      | scored AS (
      |  SELECT q.q_id, v.vec_id AS n_id,
      |   round(list_cosine_similarity(q.q_emb, v.emb), 6) AS sim
      |  FROM v CROSS JOIN q WHERE v.vec_id <> q.q_id),
      | ranked AS (
      |  SELECT q_id, n_id, sim,
      |   row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
      |  FROM scored)
      |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q61_ann_lsh" -> annLshSql,

    "q65_ann_ivf" -> annIvfSql,

    "q102_ivf_append" ->
      s"""WITH v AS ($vCte),
         | corpus AS (SELECT * FROM v WHERE vec_id % 10 <> 0),
         | cents AS (SELECT label AS cell, list(cx ORDER BY pos) AS centroid FROM (
         |   SELECT label, i AS pos, avg(emb[i+1]) AS cx
         |   FROM corpus CROSS JOIN range(64) t(i) GROUP BY label, i) GROUP BY cell),
         | assigned AS (SELECT vec_id, cell FROM (
         |   SELECT v.vec_id, c.cell,
         |     row_number() OVER (PARTITION BY v.vec_id
         |       ORDER BY list_cosine_similarity(v.emb, c.centroid) DESC, c.cell) AS rk
         |   FROM v CROSS JOIN cents c) WHERE rk = 1)
         |SELECT cell,
         |  CAST(sum(CASE WHEN vec_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus,
         |  CAST(sum(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         |  count(*) AS n_total
         |FROM assigned GROUP BY cell ORDER BY cell""".stripMargin,

    "q64_label_centroids" ->
      s"""WITH v AS ($vCte),
         | c AS ($centroidsCte)
         |SELECT x.cell AS la, y.cell AS lb,
         | round(list_cosine_similarity(x.centroid, y.centroid), 6) AS sim
         |FROM c x JOIN c y ON x.cell < y.cell ORDER BY la, lb""".stripMargin,

    // Adaptive bits/table b = max(4, min(12, ceil(log2(ceil(n/64))))) —
    // INTEGER-exact via binary-digit count, mirroring lshAdaptiveBits
    // (LENGTH(BIN(m-1)) = 64 - numberOfLeadingZeros(m-1) for m > 1).
    // Plane p belongs to table p // 12, bit position p % 12; only
    // positions < b participate — the same strided indexing the Spark
    // side uses, so one 48-plane list replays every b in [4, 12].
    "q66_sim_join_lsh" ->
      s"""WITH v AS ($vCte),
         | planes(p, pl) AS (VALUES ${planesValuesSql(4 * 12)}),
         | params AS (SELECT GREATEST(4, LEAST(12,
         |   LENGTH(BIN((count(*) + 63) // 64 - 1)))) AS b FROM v),
         | bits AS (SELECT vec_id, p,
         |   CASE WHEN list_dot_product(emb, pl) >= 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
         |   FROM v CROSS JOIN planes, params WHERE p % 12 < b),
         | codes AS (SELECT vec_id,
         |   CAST(sum(CASE WHEN p // 12 = 0 THEN bit * (1::BIGINT << (p % 12)) ELSE 0 END) AS BIGINT) AS c0,
         |   CAST(sum(CASE WHEN p // 12 = 1 THEN bit * (1::BIGINT << (p % 12)) ELSE 0 END) AS BIGINT) AS c1,
         |   CAST(sum(CASE WHEN p // 12 = 2 THEN bit * (1::BIGINT << (p % 12)) ELSE 0 END) AS BIGINT) AS c2,
         |   CAST(sum(CASE WHEN p // 12 = 3 THEN bit * (1::BIGINT << (p % 12)) ELSE 0 END) AS BIGINT) AS c3
         |   FROM bits GROUP BY vec_id),
         | cand AS (SELECT x.vec_id AS a, y.vec_id AS b FROM codes x JOIN codes y
         |   ON x.vec_id < y.vec_id AND
         |      (x.c0 = y.c0 OR x.c1 = y.c1 OR x.c2 = y.c2 OR x.c3 = y.c3))
         |SELECT c.a, c.b, round(list_cosine_similarity(va.emb, vb.emb), 6) AS sim
         |FROM cand c JOIN v va ON c.a = va.vec_id JOIN v vb ON c.b = vb.vec_id
         |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin,

    "q67_ann_recall" ->
      s"""WITH brute AS ($bruteSql),
         | lsh AS ($annLshSql),
         | ivf AS ($annIvfSql),
         | qs AS (SELECT DISTINCT q_id FROM brute),
         | lh AS (SELECT b.q_id, count(*) AS hits FROM brute b
         |   JOIN lsh a ON b.q_id = a.q_id AND b.n_id = a.n_id GROUP BY b.q_id),
         | ih AS (SELECT b.q_id, count(*) AS hits FROM brute b
         |   JOIN ivf a ON b.q_id = a.q_id AND b.n_id = a.n_id GROUP BY b.q_id)
         |SELECT 'lsh' AS method, q_id, coalesce(hits, 0) AS hits,
         |  round(coalesce(hits, 0) / 5.0, 4) AS recall FROM qs LEFT JOIN lh USING (q_id)
         |UNION ALL
         |SELECT 'ivf' AS method, q_id, coalesce(hits, 0) AS hits,
         |  round(coalesce(hits, 0) / 5.0, 4) AS recall FROM qs LEFT JOIN ih USING (q_id)
         |ORDER BY method, q_id""".stripMargin,

    "q60_knn_brute" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < 10),
        | scored AS (
        |  SELECT q.q_id, v.vec_id AS n_id,
        |   round(list_cosine_similarity(q.q_emb, v.emb), 6) AS sim
        |  FROM v CROSS JOIN q WHERE v.vec_id <> q.q_id),
        | ranked AS (
        |  SELECT q_id, n_id, sim,
        |   row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
        |  FROM scored)
        |SELECT q_id, rank, n_id, sim FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q62_vector_stats" ->
      """SELECT vec_id, label,
        | round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
        | round(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6) AS mean,
        | round(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
        | round(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q63_embedding_neardup" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT x.label, x.vec_id AS a, y.vec_id AS b,
        | round(list_cosine_similarity(x.emb, y.emb), 6) AS sim
        |FROM v x JOIN v y ON x.label = y.label AND x.vec_id < y.vec_id
        |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin,

    "q83_semantic_dedup" ->
      s"""WITH v AS ($vCte),
         | cents AS ($centroidsCte),
         | assigned AS (SELECT vec_id, emb, cell FROM (
         |   SELECT v.vec_id, v.emb, c.cell,
         |     row_number() OVER (PARTITION BY v.vec_id
         |       ORDER BY list_cosine_similarity(v.emb, c.centroid) DESC, c.cell) AS rk
         |   FROM v CROSS JOIN cents c) WHERE rk = 1),
         | scored AS (SELECT x.vec_id, x.cell, y.vec_id AS nn_id,
         |   round(list_cosine_similarity(x.emb, y.emb), 6) AS sim
         |   FROM assigned x JOIN assigned y
         |   ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         | ranked AS (SELECT vec_id, cell, nn_id, sim,
         |   row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rk
         |   FROM scored)
         |SELECT vec_id, cell, nn_id, sim,
         | CASE WHEN sim >= 0.3 THEN 1::BIGINT ELSE 0::BIGINT END AS is_dup
         |FROM ranked WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    "q68_vector_quantize" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | m AS (SELECT vec_id, emb, 127.0 / list_max(list_transform(emb, x -> abs(x))) AS scale FROM v),
        | qv AS (SELECT vec_id, emb, scale,
        |        [CAST(floor(emb[i] * scale + 0.5) AS BIGINT) for i in range(1, len(emb) + 1)] AS q
        |        FROM m)
        |SELECT vec_id, round(scale, 6) AS scale,
        | CAST(list_sum(q) AS BIGINT) AS sum_q,
        | CAST(list_max(q) AS BIGINT) AS max_q,
        | round(list_sum([abs(emb[i] - q[i] / scale) for i in range(1, len(emb) + 1)]) / len(emb), 6) AS mean_abs_err
        |FROM qv ORDER BY vec_id""".stripMargin,

    "q95_quantized_recall" ->
      s"""WITH brute AS ($bruteSql),
         | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         | qz AS (SELECT vec_id,
         |   list_transform(emb, x -> CAST(CAST(floor(
         |     x * (127.0 / list_max(list_transform(emb, y -> abs(y)))) + 0.5)
         |     AS BIGINT) AS DOUBLE)) AS emb
         |  FROM v),
         | q AS (SELECT vec_id AS q_id, emb AS q_emb FROM qz WHERE vec_id < 10),
         | scored AS (SELECT q.q_id, qz.vec_id AS n_id,
         |   round(list_cosine_similarity(q.q_emb, qz.emb), 6) AS sim
         |   FROM qz CROSS JOIN q WHERE qz.vec_id <> q.q_id),
         | int8top AS (SELECT q_id, n_id FROM (
         |   SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |   FROM scored) WHERE rank <= 5),
         | h AS (SELECT b.q_id, count(*) AS hits FROM brute b
         |   JOIN int8top a ON b.q_id = a.q_id AND b.n_id = a.n_id GROUP BY b.q_id)
         |SELECT q_id, coalesce(hits, 0) AS hits,
         | round(coalesce(hits, 0) / 5.0, 4) AS recall
         |FROM (SELECT DISTINCT q_id FROM brute) qs LEFT JOIN h USING (q_id)
         |ORDER BY q_id""".stripMargin)
}
