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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.stop()
  }
}
