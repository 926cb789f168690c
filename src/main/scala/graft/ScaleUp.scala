package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaled-dataset generator: writes a k× replica of a test-data directory
  * (default 10× of sf0.1 ≈ an "sf1-equivalent") so the full query suite can
  * be correctness-checked and benchmarked above the driver-provided scale —
  * the round-5 verdict's top gap ("every green number is from ≤ sf0.1").
  *
  * Run: `SPARK_GRAFT_SCALE=10 sbt "runMain graft.ScaleUp <srcDir> <dstDir>"`
  *
  * Replication design — every replica must add WORK, not degenerate
  * structure, so each query's cost scales ~k× and super-linear behavior is
  * visible as such:
  *
  *  - Keys (PKs and the FKs that reference them) shift per replica by the
  *    source table's key span, so referential integrity and per-replica
  *    join selectivity are preserved exactly. Dimension-geography tables
  *    (region/nation) are NOT replicated — dims stay, facts grow, as in a
  *    real scale-up — and nationkey FKs are left unshifted accordingly.
  *  - `documents.text` gets a per-replica token suffix (every whitespace
  *    token `t` becomes `t~r`): within a replica all token/shingle/n-gram
  *    structure (dedup pairs, TF-IDF, quality scores) is preserved, across
  *    replicas Jaccard is 0 — so near-dup pair counts, cluster counts and
  *    vocabulary all scale ×k instead of exploding quadratically the way
  *    byte-identical replicas would (every doc gaining k−1 exact twins is
  *    a skew stress, probed separately in ScaleProbe, not a scale-up).
  *    n_chars is recomputed (the suffix changes it); replica 0 stays
  *    byte-identical to the source corpus.
  *  - `embeddings.embedding` gets a per-replica deterministic sign flip
  *    per dimension (an orthogonal transform): within-replica geometry —
  *    every pairwise cosine — is EXACTLY preserved, cross-replica cosines
  *    scatter to ≈0 (random ±1 dot products), so ANN/near-dup neighbor
  *    structure scales ×k. Labels shift per replica, so label-seeded IVF
  *    cell counts scale with the corpus (the k = √n discipline).
  *  - `events` shift event_id and user_id: k× users over the same time
  *    range — sessionization/retention cohorts grow by users, per-user
  *    session structure unchanged.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse(Bench.defaultSfDir)
    val dst = args.lift(1).getOrElse("/root/repo/scratch/sf1")
    // optional 3rd arg: comma-separated table subset (e.g. "documents" for
    // the sf10 clustering-family run — no need to write 100x lineitem to
    // scale-test operators that never read it)
    val tables = args.lift(2).map(_.split(",").toSet)
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, src, dst, k, tables) finally spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, k: Int,
          tables: Option[Set[String]] = None): Unit = {
    def load(t: String): DataFrame = Tables.load(spark, src, t)
    /** Write the scaled table SPREAD over max(32, k) files. The old
      * single-file writer capped every downstream scan's parallelism at
      * the file's ROW-GROUP count — and a 500k-row text table compresses
      * under the 128 MB parquet block size, i.e. ONE row group, so the
      * whole per-row text family (regex, md5, shingles) ran serial at
      * sf10 (measured 1.06 effective cores over a 1143 s chunk; VERDICT
      * r16 defect 1). Real scaled datasets arrive in many files; the
      * replica must too. Round-robin repartition is safe here — every
      * engine operator is content-keyed (no rand()/partition-id
      * dependence, grep-verified), so file layout can't change results. */
    def save(df: => DataFrame, t: String, spread: Boolean = true): Unit =
      if (tables.forall(_.contains(t))) {
        val out = if (spread) df.repartition(math.max(32, k)) else df
        out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
        println(s"[scaleup] $t -> $dst/$t.parquet")
      }
    /** Key span of the SOURCE table (max+1) — the per-replica shift unit,
      * shared by the PK table and every FK that references it. */
    def span(t: String, c: String): Long =
      load(t).agg(max(col(c))).head().get(0).asInstanceOf[Number].longValue + 1
    /** Largest value a shifted key column reaches: replica k−1 of the max
      * source key = (k−1)·span + (span−1) = k·span − 1. The shift runs in
      * long arithmetic and casts BACK to the column's source type, so a
      * value past that type's range would wrap silently and corrupt
      * referential integrity — fail fast instead. */
    def requireFits(dt: org.apache.spark.sql.types.DataType, c: String, s: Long): Unit = {
      require(s <= Long.MaxValue / k,
        s"replicate(): span $s x k=$k overflows long for '$c'")
      val maxShifted = k * s - 1
      val limit: Long = dt match {
        case org.apache.spark.sql.types.ByteType    => Byte.MaxValue
        case org.apache.spark.sql.types.ShortType   => Short.MaxValue
        case org.apache.spark.sql.types.IntegerType => Int.MaxValue
        case _                                      => Long.MaxValue
      }
      require(maxShifted <= limit,
        s"replicate(): shifted '$c' reaches $maxShifted which overflows $dt; " +
          "widen the column to long in the source or lower k")
    }
    /** k replicas with each listed key column shifted by rep × its span;
      * non-key columns pass through. Column order and types preserved. */
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      shifts.foreach { case (c, s) => requireFits(df.schema(c).dataType, c, s) }
      val shifted = df.crossJoin(spark.range(k).toDF("__rep"))
      val out = shifts.foldLeft(shifted) { case (d, (c, s)) =>
        d.withColumn(c, (col(c).cast("long") + col("__rep") * s)
          .cast(df.schema(c).dataType))
      }
      out.drop("__rep").select(df.columns.map(col).toIndexedSeq: _*)
    }

    val custSpan = span("customer", "c_custkey")
    val suppSpan = span("supplier", "s_suppkey")
    val partSpan = span("part", "p_partkey")
    val orderSpan = span("orders", "o_orderkey")

    // geography dims stay fixed; facts grow around them (dims stay
    // single-file — spreading 5 rows over 32 files is pure overhead)
    save(load("region"), "region", spread = false)
    save(load("nation"), "nation", spread = false)
    save(replicate(load("customer"), "c_custkey" -> custSpan), "customer")
    save(replicate(load("supplier"), "s_suppkey" -> suppSpan), "supplier")
    save(replicate(load("part"), "p_partkey" -> partSpan), "part")
    save(replicate(load("orders"),
      "o_orderkey" -> orderSpan, "o_custkey" -> custSpan), "orders")
    save(replicate(load("lineitem"),
      "l_orderkey" -> orderSpan, "l_partkey" -> partSpan,
      "l_suppkey" -> suppSpan), "lineitem")

    save(replicate(load("events"),
      "event_id" -> span("events", "event_id"),
      "user_id" -> span("events", "user_id")), "events")

    // documents: shifted ids + per-replica token suffix (see scaladoc)
    val docs = load("documents")
    val docSpan = span("documents", "doc_id")
    val docsK = docs.crossJoin(spark.range(k).toDF("__rep"))
      .withColumn("doc_id", col("doc_id") + col("__rep") * docSpan)
      .withColumn("text",
        when(col("__rep") === 0, col("text"))
          .otherwise(concat_ws(" ",
            transform(split(col("text"), "\\s+"),
              t => concat(t, lit("~"), col("__rep"))))))
      .withColumn("n_chars", length(col("text")))
      .drop("__rep")
      .select(docs.columns.map(col).toIndexedSeq: _*)
    save(docsK, "documents")

    // embeddings: shifted ids/labels + per-replica orthogonal sign flip
    val emb = load("embeddings")
    val vecSpan = span("embeddings", "vec_id")
    val labelSpan = span("embeddings", "label")
    // validate against the CAST TARGET (the column's own type, which the
    // shift casts back to) — checking the source type alone would pass a
    // long column while the int cast below wrapped
    val labelType = emb.schema("label").dataType
    requireFits(labelType, "label", labelSpan)
    val embK = emb.crossJoin(spark.range(k).toDF("__rep"))
      .withColumn("vec_id", col("vec_id") + col("__rep") * vecSpan)
      .withColumn("label",
        (col("label").cast("long") + col("__rep") * labelSpan).cast(labelType))
      .withColumn("embedding",
        when(col("__rep") === 0, col("embedding"))
          .otherwise(zip_with(
            col("embedding"),
            transform(sequence(lit(0), size(col("embedding")) - 1),
              i => when(pmod(xxhash64(col("__rep"), i), lit(2)) === 0, lit(1.0f))
                .otherwise(lit(-1.0f))),
            (x, f) => x * f)))
      .drop("__rep")
      .select(emb.columns.map(col).toIndexedSeq: _*)
    save(embK, "embeddings")

    println(s"[scaleup] done: $k x $src -> $dst")
  }
}
