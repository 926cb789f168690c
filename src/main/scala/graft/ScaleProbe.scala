package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: replicate the sf0.1 corpus k× and measure how the
  * near-dup / ANN operators scale with input size — the committed evidence
  * that candidate generation is join-bound (LSH buckets), not
  * pairwise-bound. Run: `SPARK_GRAFT_SCALE=8 sbt "runMain graft.ScaleProbe"`;
  * results are recorded in BUILDLOG.md per round.
  */
object ScaleProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** INCREMENTAL cluster DELETION at scale (r9): a FIXED takedown of 500
    * nodes against a growing persisted ClusterState (labels +
    * label-annotated edges, the at-rest form). remove() reads only the
    * affected components' edges via the label annotation, so its cost must
    * stay ~flat as the corpus grows kx — the q110 shape without the
    * session cache. Removing each chain's SECOND node makes every affected
    * component SPLIT (the expensive repair path, not the easy all-gone
    * one); the full recluster of the remainder is the O(corpus)
    * alternative it beats. Standalone: SPARK_GRAFT_DELETE_PROBE=1. */
  private def deletionProbe(spark: SparkSession): Unit = {
    import graft.operators.{ClusterState, DedupPipeline}
    def chainEdges(m: Long) =
      spark.range(m).toDF("c").selectExpr(
        "stack(3, c*4, c*4+1, c*4+1, c*4+2, c*4+2, c*4+3) AS (a, b)")
    val takedown = spark.range(500).selectExpr("id * 4 + 1 AS node")
    for (m <- Seq(25000L, 100000L, 400000L)) {
      val st = ClusterState.build(chainEdges(m), maxIter = 10).cached()
      time(s"ClusterState.remove takedown=500 corpus=${m * 4}")(
        st.remove(takedown, maxIter = 10).labels.count())
      val remainder = chainEdges(m)
        .join(takedown.selectExpr("node AS a"), Seq("a"), "left_anti")
        .join(takedown.selectExpr("node AS b"), Seq("b"), "left_anti")
      time(s"full recluster of remainder corpus=${m * 4}")(
        DedupPipeline.clusters(remainder, maxIter = 10).count())
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", Bench.defaultSfDir)
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-probe-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q66 candidate-count probe (r6 verdict item 3): SPARK_GRAFT_Q66_DIRS=
    // <dirA,dirB,...> audits the adaptive-LSH candidate count on REAL
    // corpora (e.g. sf0.1's 20k vs scratch/sf1's 200k vectors) instead of
    // synthetic replicas. Candidates = Σ per-(t,code)-bucket C(m,2) —
    // computed from the signature histogram, no pair join. The q66 spec
    // proves candidates ∝ n at 4×; this measures it at sweep scale, where
    // the old fixed-4-bit width produced n²/16 (50M pairs at 20k vectors).
    sys.env.get("SPARK_GRAFT_Q66_DIRS").foreach { dirs =>
      for (dir <- dirs.split(",")) {
        val vecs = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
          .persist() // scanned twice: n below + the adaptive-bits count inside lshSignatures
        val n = vecs.count()
        // coalesce: sum over zero groups is null (empty/typo'd dir), which
        // should report 0 candidates, not NPE
        val cand = time(s"q66 candidate audit $dir")(
          graft.operators.SimilarityOps.lshSignatures(vecs)
            .groupBy("t", "code").count()
            .agg(coalesce(sum(expr("count * (count - 1) / 2")), lit(0)).cast("long"))
            .head().getLong(0))
        println(f"[probe] q66 $dir: n=$n candidates=$cand cand/n=${cand.toDouble / math.max(n, 1)}%.1f")
        vecs.unpersist()
      }
      spark.stop()
      return
    }

    // q106 payload-width probe: the asofBackward scaladoc claims per-key
    // cost is linear "regardless of payload width" because the payload
    // rides the ONE timeline sort packed in a struct. Measure it: same
    // as-of join with 0, 2 and 4 payload columns (+ tieBreak), 3 runs
    // each after warmup, minima printed. SPARK_GRAFT_ASOF_PROBE=1.
    if (sys.env.contains("SPARK_GRAFT_DELETE_PROBE")) {
      deletionProbe(spark)
      spark.stop()
      return
    }

    // recordPairs per-batch cost probe (r13, the verdict's O(batch)
    // assertion for the sixth artifact): a FIXED 5k-pair batch appended
    // to a growing at-rest `_pairs` table. The only table-sized read on
    // the path is the crashed-orphan probe (`seq === next`), which
    // parquet row-group stats prune to zero data pages on committed
    // files (each file holds one seq), so the cost must stay ~flat as
    // the table grows 16×. SPARK_GRAFT_PAIRS_PROBE=1; results → BUILDLOG.
    if (sys.env.contains("SPARK_GRAFT_PAIRS_PROBE")) {
      import graft.operators.SplitState
      import spark.implicits._
      for (m <- Seq(100000L, 400000L, 1600000L)) {
        val p = s"probe_pairs_$m"
        // a RERUN against a reused warehouse would otherwise throw on
        // init's already-has-committed-state guard (ADVICE r13)
        graft.operators.DedupOps.dropSplitTables(spark, p)
        SplitState.init(spark, p, spark.range(1, 1001).toDF("doc_id"),
          Seq.empty[(Long, Long)].toDF("node", "label"))
        val seed = spark.range(m).selectExpr(
          "id + 2000 AS a", "id + 3000000 AS b", "0.75 AS jac")
        SplitState.recordPairs(spark, p, seed, 1L, 1000L)
        val batch = spark.range(5000).selectExpr(
          "id + 8000000 AS a", "id + 9000000 AS b", "0.8 AS jac")
        time(f"recordPairs batch=5k table=$m%,d")(
          SplitState.recordPairs(spark, p, batch, 2000L, 3000L))
      }
      spark.stop()
      return
    }

    // media flag+admit per-batch cost vs at-rest index size (r14): a
    // FIXED 2k-asset batch (1k fresh + 1k perturbed copies of corpus
    // assets) flagged (mediaNearDupVsIndex) and admitted
    // (appendToMediaPhashIndex) against a phash index grown 16×. The
    // corpus side reaches the candidate join shuffle-free off its
    // (c, ch) bucketing, so per-batch cost = a FLAT part (batch
    // fingerprint + 548×-enumeration + output) plus ONE sequential
    // columnar scan of the ~40-byte/asset chunk table — linear in corpus
    // with a small constant. This probe MEASURES the slope instead of
    // claiming it away; the honest 100 TB posture is scan-bound per
    // batch, amortized by batching the drain (BUILDLOG r14).
    // SPARK_GRAFT_MEDIA_PROBE=1; results → BUILDLOG.
    if (sys.env.contains("SPARK_GRAFT_MEDIA_PROBE")) {
      import graft.operators.MultimodalOps
      def synth(ids: DataFrame): DataFrame = ids.selectExpr(
        "id AS doc_id", "'image' AS kind",
        "CAST(concat_ws(' ', transform(sequence(0, 24), " +
          "j -> concat('t', CAST(pmod(xxhash64(id, j), 1000000) AS STRING)))) AS BINARY) AS payload")
      for (m <- Seq(100000L, 400000L, 1600000L)) {
        val p = s"probe_media_$m"
        for (t <- Seq("_chunks", "_chunks_compact", "_meta", "_tombstones")) {
          spark.sql(s"DROP TABLE IF EXISTS $p$t")
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), s"$p$t".toLowerCase)
          val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(loc)) fs.delete(loc, true)
        }
        time(s"media index build corpus=$m")(
          MultimodalOps.saveMediaPhashIndex(synth(spark.range(m).toDF("id")), p))
        val fresh = synth(spark.range(m + 1000000L, m + 1001000L).toDF("id"))
        val copies = synth(spark.range(1000).toDF("id"))
          .selectExpr("doc_id + " + (m + 2000000L) + " AS doc_id", "kind",
            "CAST(concat(CAST(payload AS STRING), ' zz') AS BINARY) AS payload")
        val batch = fresh.unionByName(copies).localCheckpoint(eager = true)
        for (trial <- 1 to 2)
          time(s"media flag batch=2k corpus=$m trial=$trial")(
            MultimodalOps.mediaNearDupVsIndex(batch, spark, p, 10).count())
        time(s"media admit batch=2k corpus=$m")(
          MultimodalOps.appendToMediaPhashIndex(spark, p, batch))
        for (t <- Seq("_chunks", "_meta", "_tombstones"))
          spark.sql(s"DROP TABLE IF EXISTS $p$t")
      }
      spark.stop()
      return
    }

    // q114 hot-key probe (r10 verdict "what's wrong" #4): the containment
    // operator keeps the prefix filter although the exhaustive count-join
    // is ~1.5× faster on the synthetic near-uniform dfs (max df 25 at
    // sf0.1) — the argued reason is the exhaustive join's Σ_t df(t)²
    // candidate blow-up on boilerplate hot shingles. MEASURE it: plant one
    // fixed 16-token boilerplate line into 30% of docs (14 identical hot
    // shingles, df ≈ 0.3·n — the header/footer/license-line shape real
    // corpora have) and time both pipelines on the planted and unplanted
    // corpus. SPARK_GRAFT_CONTAIN_PROBE=1; results → BUILDLOG.
    if (sys.env.contains("SPARK_GRAFT_CONTAIN_PROBE")) {
      import graft.operators.{DedupOps, TextOps}
      val boiler = (1 to 16).map(i => f"boilerhot$i%02d").mkString(" ")
      val base = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      def planted = base.withColumn("text",
        when(col("doc_id") % 10 < 3, concat(col("text"), lit(" " + boiler)))
          .otherwise(col("text")))
      // the exhaustive twin: shared-shingle count-join, no prefix filter —
      // exactly the q114 oracle's DuckDB shape as DataFrame ops
      def exhaustive(docs: DataFrame, minC: Double): DataFrame = {
        val sh = TextOps.withShingles(docs.select("doc_id", "text"))
          .select("doc_id", "sh")
          .withColumn("n_sh", size(col("sh"))).filter(col("n_sh") > 0)
        val p = sh.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("g"))
        p.as("x").join(p.as("y"),
            col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
            col("x.n_sh").as("na"), col("y.n_sh").as("nb"))
          .agg(count(lit(1)).as("shared"))
          .withColumn("c_raw", col("shared") / least(col("na"), col("nb")))
          .filter(col("c_raw") >= minC)
          .select(col("a"), col("b"), round(col("c_raw"), 4).as("containment"))
      }
      val trials = sys.env.getOrElse("SPARK_GRAFT_CONTAIN_TRIALS", "3").toInt
      def bench(label: String, docs: => DataFrame,
                f: DataFrame => DataFrame): Long = {
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = f(docs).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        once() // warmup: footers + codegen
        val runs = (1 to trials).map(_ => once())
        println(f"[probe] contain $label%-34s ${runs.map(_._1).min}%8.2f s  " +
          s"pairs=${runs.head._2} (min of $trials)")
        runs.head._2
      }
      for ((tag, corpus) <- Seq(("unplanted", () => base), ("planted", () => planted))) {
        val nPrefix = bench(s"$tag prefix-filtered", corpus(),
          DedupOps.ngramContainmentPairs(_, 0.8))
        val nExh = bench(s"$tag exhaustive count-join", corpus(),
          exhaustive(_, 0.8))
        require(nPrefix == nExh,
          s"contain probe $tag: prefix=$nPrefix exhaustive=$nExh — outputs diverge")
      }
      spark.stop()
      return
    }

    if (sys.env.contains("SPARK_GRAFT_ASOF_PROBE")) {
      val ev = Tables.load(spark, sfDir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      def clicks(width: Int) = {
        val payload = Seq(
          col("event_id").as("c_eid"), col("value").as("c_val"),
          col("props").as("c_props"), col("event_type").as("c_type"))
        ev.filter(col("event_type") === "click")
          .select((col("user_id") +: col("ts") +: payload.take(width)): _*)
      }
      def run(width: Int, tie: Boolean): Double = {
        val names = Seq("c_eid", "c_val", "c_props", "c_type").take(width)
        val df = graft.operators.EventOps.asofBackward(
          purchases, clicks(width), "user_id", "ts", "click_ts",
          payload = names, tieBreak = if (tie) Some("c_eid") else None)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(0, tie = false) // warmup: footers + codegen
      for ((w, tie) <- Seq((0, false), (2, false), (4, false), (4, true))) {
        val best = (1 to 3).map(_ => run(w, tie)).min
        println(f"[probe] asof payload width=$w tieBreak=$tie: $best%6.2f s (min of 3)")
      }
      spark.stop()
      return
    }

    def replicate(df: DataFrame, idCol: String, n: Int): DataFrame = {
      val span = df.agg(max(col(idCol))).head().getLong(0) + 1
      df.crossJoin(spark.range(n).toDF("__rep"))
        .withColumn(idCol, col(idCol) + col("__rep") * span)
        .drop("__rep")
    }

    val docs1 = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val docsK = replicate(docs1, "doc_id", k)
    println(s"[probe] documents: ${docs1.count()} -> ${docsK.count()} (${k}x, every doc has ${k - 1} exact twins)")

    val p1 = time("minhash pairs 1x")(
      graft.operators.DedupOps.minHashNearDupPairs(docs1).filter(col("jac") >= 0.8).count())
    val pK = time(s"minhash pairs ${k}x")(
      graft.operators.DedupOps.minHashNearDupPairs(docsK).filter(col("jac") >= 0.8).count())
    println(s"[probe] minhash verified pairs: $p1 -> $pK")

    val s1 = time("simhash pairs 1x")(
      graft.operators.DedupOps.simHashNearDupPairs(docs1).filter(col("hamming") <= 3).count())
    val sK = time(s"simhash pairs ${k}x")(
      graft.operators.DedupOps.simHashNearDupPairs(docsK).filter(col("hamming") <= 3).count())
    println(s"[probe] simhash verified pairs: $s1 -> $sK")

    // SKEW probe: boilerplate text (10% of docs byte-identical) makes ONE
    // band bucket hot — candidate generation inside that bucket is
    // quadratic, which no banding scheme avoids for identical text. The
    // pipeline answer is ORDER: exact dedup FIRST (hash-groupBy, cheap)
    // collapses the boilerplate to one representative, and near-dedup gets
    // its join-bound shape back. Measured here so the lesson has numbers.
    val boiler = "this page is intentionally left blank see the index for details " * 8
    val skewed = docs1.withColumn("text",
      when(col("doc_id") % 10 === 0, lit(boiler)).otherwise(col("text")))
    val sk = time("minhash skewed (10% boilerplate)")(
      graft.operators.DedupOps.minHashNearDupPairs(skewed).filter(col("jac") >= 0.8).count())
    val exactFirst = graft.operators.DedupPipeline.dedup(skewed, "doc_id", "text",
      graft.operators.DedupPipeline.Exact)
    val skE = time("minhash skewed, exact-dedup first")(
      graft.operators.DedupOps.minHashNearDupPairs(exactFirst).filter(col("jac") >= 0.8).count())
    println(s"[probe] skew: pairs $sk raw vs $skE after exact dedup")

    // INCREMENTAL dedup at scale: a 1x batch against the kx corpus through
    // the bucketed at-rest index — index build is the one-time cost, the
    // per-batch join stays corpus-stationary (no corpus-side shuffle).
    time(s"corpus index build+save ${k}x")(
      graft.operators.DedupOps.indexCorpus(docsK).saveAsTables("probe_mh_idx"))
    val loadedIdx = graft.operators.DedupOps.loadCorpusIndex(spark, "probe_mh_idx")
    val incr = time(s"incremental batch 1x vs corpus ${k}x")(
      graft.operators.DedupOps.minHashCrossDupPairs(
        docs1.withColumn("doc_id", col("doc_id") + 100000000L), loadedIdx)
        .filter(col("jac") >= 0.8).count())
    println(s"[probe] incremental pairs (every batch doc has $k corpus twins): $incr")

    // APPEND at scale (r5): admitting a 1x batch into the kx at-rest index
    // touches only the batch's shingles/bands (corpus files untouched), so
    // append cost must track the BATCH size, not the corpus — compare with
    // the full index build+save above, which grows kx.
    time(s"appendToCorpusIndex batch 1x into ${k}x index")(
      graft.operators.DedupOps.appendToCorpusIndex(
        "probe_mh_idx", docs1.withColumn("doc_id", col("doc_id") + 200000000L)))

    // INCREMENTAL clustering at scale (r5): a FIXED batch of new edges
    // against a growing persisted (node, label) table. updateClusters
    // contracts components to reps and propagates only the batch-incident
    // contracted graph, so its cost must stay ~flat as the corpus grows kx
    // while a full recluster grows with the corpus.
    {
      import graft.operators.DedupPipeline
      // synthetic dup graph: m chains of 4 docs each (labels = chain min);
      // batch = 500 new edges, half attaching to existing components
      def chainEdges(m: Long): DataFrame =
        spark.range(m).toDF("c").selectExpr(
          "stack(3, c*4, c*4+1, c*4+1, c*4+2, c*4+2, c*4+3) AS (a, b)")
      val batch = spark.range(500).toDF("i").selectExpr(
        "CASE WHEN i % 2 = 0 THEN i * 4 ELSE 1000000000 + i END AS a",
        "1000000000 + 500 + i AS b")
      for (m <- Seq(25000L, 100000L, 400000L)) {
        val existing = DedupPipeline.clusters(chainEdges(m), maxIter = 10)
          .localCheckpoint(eager = true) // the persisted-table stand-in
        time(s"updateClusters batch=500 corpus=${m * 4}")(
          DedupPipeline.updateClusters(existing, batch).count())
        time(s"full recluster corpus=${m * 4}")(
          DedupPipeline.clusters(chainEdges(m).unionByName(batch), maxIter = 10).count())
      }
    }

    deletionProbe(spark)

    // HOT-SHINGLE probe (r5): boilerplate-heavy corpus (10% of docs share
    // one injected sentence → its shingles are in >n/10 docs). The
    // exhaustive inverted-index join sees an F² hot (blk, shingle) key; the
    // prefix-filtered path (minJac) orders postings by document frequency
    // and the boilerplate shingles fall outside every prefix — measured as
    // max postings per join key entering each candidate join.
    {
      val boiler2 = "terms of service apply to all content on this site "
      val docsB = docs1.withColumn("text",
        when(col("doc_id") % 10 === 0, concat(lit(boiler2), col("text")))
          .otherwise(col("text")))
      val root = java.nio.file.Files.createTempDirectory("graft-probe-boiler").toString
      Tables.load(spark, sfDir, "documents").drop("text")
        .join(docsB, "doc_id").write.mode("overwrite").parquet(s"$root/documents.parquet")
      val sh = graft.operators.TextOps.withShingles(
        Tables.load(spark, root, "documents"))
        .withColumn("blk", (col("n_chars") / 50).cast("bigint"))
        .select(col("doc_id"), col("blk"), size(col("sh")).as("n_sh"),
          explode(col("sh")).as("t"))
      val maxKeyFull = sh.groupBy("blk", "t").count().agg(max("count")).head().getLong(0)
      // replicate the prefix construction (df-ordered, length n−⌈t·n⌉+1)
      val t0 = 0.5
      val dfq = sh.groupBy("blk", "t").agg(count(lit(1)).as("df"))
      val prefix = sh.join(dfq, Seq("blk", "t"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("blk", "doc_id").orderBy(col("df"), col("t"))))
        .filter(col("pos") <= col("n_sh") - ceil(lit(t0) * col("n_sh")).cast("bigint") + 1)
      val maxKeyPrefix = prefix.groupBy("blk", "t").count().agg(max("count")).head().getLong(0)
      println(s"[probe] hot-shingle max (blk,shingle) postings: full=$maxKeyFull " +
        s"prefix(t=$t0)=$maxKeyPrefix (candidate pairs per key are the square)")
      val nB = time("ngram pairs prefix t=0.5 (boilerplate corpus)")(
        graft.operators.DedupOps.ngramJaccardPairs(spark, root, Some(t0)).count())
      println(s"[probe] boilerplate-corpus thresholded pairs: $nB")
    }

    // ANN: brute-force corpus pass vs LSH bucketed candidates, same queries,
    // replicated corpus — the gap should WIDEN with corpus size since LSH
    // probes touch only same-bucket vectors.
    val emb1 = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding", "label")
    val embK = replicate(emb1, "vec_id", k)
    // stage replicated corpora under the table layout Tables.load expects
    def writeTmp(df: DataFrame, name: String): String = {
      val root = java.nio.file.Files.createTempDirectory(s"graft-probe-$name").toString
      df.write.mode("overwrite").parquet(s"$root/embeddings.parquet")
      root
    }
    val dir1 = writeTmp(emb1, "emb1")
    val dirK = writeTmp(embK, "embK")
    for ((lbl, dir) <- Seq("1x" -> dir1, s"${k}x" -> dirK)) {
      val n1 = time(s"knn brute $lbl")(
        graft.operators.SimilarityOps.queries("q60_knn_brute")(spark, dir).count())
      val n2 = time(s"ann lsh $lbl")(
        graft.operators.SimilarityOps.queries("q61_ann_lsh")(spark, dir).count())
      println(s"[probe] ann $lbl: brute rows $n1, lsh rows $n2")
    }

    // IVF APPEND at scale (r7): a FIXED 1x batch absorbed into indexes
    // built over growing corpora. append() is one broadcast assignment
    // join over the batch — its cost must stay ~flat as the indexed corpus
    // grows kx, while the full rebuild (the thing append avoids) grows
    // with the corpus. Occupancy/imbalance telemetry is read after each
    // append (part of the production loop, so it is timed with it).
    {
      import graft.operators.IvfIndex
      def vecsOf(dir: String): DataFrame =
        Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"), col("label"))
      val batch = vecsOf(dir1).select(
        (col("vec_id") + 300000000L).as("vec_id"), col("emb"))
      for ((lbl, dir) <- Seq("1x" -> dir1, s"${k}x" -> dirK)) {
        val built = time(s"ivf build $lbl")(
          { val i = IvfIndex.build(vecsOf(dir)); i.assigned.count(); i })
        // loaded-index stand-in: both tables materialized, as after load()
        val idx = IvfIndex(built.centroids.localCheckpoint(eager = true),
          built.assigned.localCheckpoint(eager = true))
        // the append MARGINAL: one broadcast assignment join over the batch
        // — the only new work append() does; must stay flat as the corpus
        // (and the build above) grows kx
        time(s"ivf append marginal batch=1x vs $lbl")(
          IvfIndex.assignTo(batch, idx.centroids).count())
        // the full production step: append + drift telemetry (occupancy
        // reads the corpus-sized assignment — a scan, not a rebuild)
        val imb = time(s"ivf append+imbalance $lbl")(
          idx.append(batch).imbalanceFactor)
        println(f"[probe] ivf append $lbl: imbalance=$imb%.2f")
      }
    }
    spark.stop()
  }
}
