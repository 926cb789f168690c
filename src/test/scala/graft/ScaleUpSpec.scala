package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleUp's r18 power-law clique profile (VERDICT r17 item 2): the
  * per-replica document transform must (a) keep replica 0 byte-identical,
  * (b) give FULL (out-of-clique) replicas token-bijective, near-disjoint
  * vocabularies with NO constant suffix grams (the pre-r18 `~r` suffix
  * correlated unrelated docs' SimHash fingerprints — measured 92× organic
  * pair-density inflation for 2-digit replicas, the real source of the
  * "104×/decade" media pair growth), and (c) plant a Zipf-ish clique
  * profile — MILD replicas r < c(base) within Hamming 10 of the base and
  * of each other via 1–2 appended junk tokens — so true near-dup pair
  * mass grows LINEARLY with dataset size and a super-linear wall measured
  * on the scaled data indicts the algorithm, not the artifact. */
class ScaleUpSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val k = 8
  private val src = "/root/testdata/sf0.01" // 500 docs — enough for profile stats
  private lazy val docSpan: Long = Tables.load(spark, src, "documents")
    .agg(max("doc_id")).head().getLong(0) + 1

  private lazy val scaled = {
    val dst = java.nio.file.Files.createTempDirectory("graft-scaleup").toString
    ScaleUp.run(spark, src, dst, k, Some(Set("documents")))
    spark.read.parquet(s"$dst/documents.parquet")
      .localCheckpoint(eager = true) // reused by every test below
  }

  /** c(base), recomputed by the same id arithmetic ScaleUp documents —
    * the "ground truth stays id-arithmetic" contract. */
  private def cliqueOf(): org.apache.spark.sql.Column = {
    val u = (pmod(xxhash64(col("base")), lit(1000000L)) + 1.0) / 1000000.0
    least(lit(k.toLong), (floor(lit(0.5) / u) + 1).cast("long"))
  }

  private lazy val withGeom = scaled
    .withColumn("base", col("doc_id") % docSpan)
    .withColumn("rep", (col("doc_id") / docSpan).cast("long"))
    .withColumn("c", cliqueOf())
    .withColumn("phash", graft.plans.SimHashGrams.of(col("text")))

  test("replica 0 is byte-identical to the source corpus") {
    val orig = Tables.load(spark, src, "documents").select("doc_id", "text")
    val mismatches = scaled.filter(col("doc_id") < docSpan)
      .select("doc_id", "text").as("a")
      .join(orig.as("b"), "doc_id")
      .filter($"a.text" =!= $"b.text")
      .count()
    assert(mismatches == 0)
    assert(scaled.count() == k * orig.count())
  }

  test("FULL replicas: every token hash-suffixed, vocab near-disjoint across replicas") {
    val fullToks = withGeom.filter(col("rep") >= col("c"))
      .select(col("rep"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    // shape: base token + "~" + 3 lowercase hex of xxhash64(base, rep)
    val badShape = fullToks
      .filter(!col("tok").rlike("^.+~[0-9a-f]{3}$")).count()
    assert(badShape == 0)
    val recomputed = fullToks
      .withColumn("baseTok", expr("substring(tok, 1, length(tok) - 4)"))
      .withColumn("want",
        lpad(lower(conv(pmod(xxhash64(col("baseTok"), col("rep")), lit(4096))
          .cast("string"), 10, 16)), 3, "0"))
      .filter(!col("tok").endsWith(concat(lit("~"), col("want"))))
      .count()
    assert(recomputed == 0, "suffix must be the documented xxhash64(token, rep) hex")
    // vocab across two full replicas overlaps only by 1/4096 hash collisions
    val v1 = fullToks.filter(col("rep") === k - 1).select("tok").distinct()
    val v2 = fullToks.filter(col("rep") === k - 2).select("tok").distinct()
    val inter = v1.join(v2, "tok").count().toDouble
    val n1 = v1.count().toDouble
    assert(n1 > 0 && inter / n1 < 0.01, s"cross-replica vocab overlap ${inter / n1}")
  }

  test("MILD replicas: original text preserved, 1-2 appended junk tokens") {
    val mild = withGeom.filter(col("rep") > 0 && col("rep") < col("c"))
      .join(scaled.select(col("doc_id").as("base"), col("text").as("base_text")), "base")
    val bad = mild
      .filter(!col("text").startsWith(col("base_text")) ||
        !expr("substring(text, length(base_text) + 1)")
          .rlike("^( pv[0-9a-f]{3}){1,2}$"))
      .count()
    assert(bad == 0)
    assert(mild.count() > 0)
  }

  test("clique-size profile: ~half singletons, Zipf tail to k, linear pair mass") {
    val sizes = withGeom.filter(col("rep") === 0)
      .groupBy("c").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keys.min == 1L && sizes.keys.max == k.toLong)
    val nBase = sizes.values.sum.toDouble
    // P(c = 1) ≈ 0.5
    assert(sizes(1L) / nBase > 0.35 && sizes(1L) / nBase < 0.65)
    // Zipf-ish: size-2 cliques outnumber the capped-at-k bucket
    assert(sizes(2L) > sizes(k.toLong))
    // E[C(c,2)] ≈ (k−1)/2 per base doc (linear growth in dataset size);
    // generous band for the 500-doc sample
    val pairMass = sizes.map { case (c, n) => n * c * (c - 1) / 2.0 }.sum
    assert(pairMass / nBase > 0.2 * (k - 1) && pairMass / nBase < 1.5 * (k - 1),
      s"planted pairs/doc = ${pairMass / nBase}, expected ≈ ${(k - 1) / 2.0}")
  }

  test("mild replicas are phash near-dups of base; full replicas are far") {
    val basePh = withGeom.filter(col("rep") === 0)
      .select(col("base"), col("phash").as("ph0"))
    val dists = withGeom.filter(col("rep") > 0)
      .join(basePh, "base")
      .select(col("base"), col("rep"), col("c"),
        bit_count(col("phash").bitwiseXOR(col("ph0"))).as("d"))
      .localCheckpoint(eager = true)
    val mild = dists.filter(col("rep") < col("c"))
    val full = dists.filter(col("rep") >= col("c"))
    val mildN = mild.count().toDouble
    val mildClose = mild.filter(col("d") <= 10).count()
    val fullN = full.count().toDouble
    val fullClose = full.filter(col("d") <= 10).count()
    assert(mildN > 0 && fullN > 0)
    // planted clique members must sit within the engine's q122 verify
    // threshold; out-of-clique replicas must not leak into it
    assert(mildClose / mildN >= 0.9, s"in-clique recall ${mildClose / mildN}")
    assert(fullClose / fullN <= 0.01,
      s"out-of-clique leakage ${fullClose / fullN}")
  }

  test("mild replicas are near-dups of EACH OTHER (true cliques, not stars)") {
    val mildPh = withGeom.filter(col("rep") > 0 && col("rep") < col("c"))
      .select(col("base"), col("rep"), col("phash"))
    val pairs = mildPh.as("a")
      .join(mildPh.as("b"), $"a.base" === $"b.base" && $"a.rep" < $"b.rep")
      .select(bit_count($"a.phash".bitwiseXOR($"b.phash")).as("d"))
    val n = pairs.count().toDouble
    val close = pairs.filter(col("d") <= 10).count()
    assert(n > 0)
    assert(close / n >= 0.9, s"mild-mild in-clique recall ${close / n}")
  }

  test("FULL replicas do not inflate within-replica phash pair density") {
    // the pre-r18 constant suffix made unrelated docs' fingerprints
    // correlate (92× density at 2-digit replicas); the hash suffix must
    // keep each replica's organic Hamming<=10 pair count at the source
    // corpus's order of magnitude
    def density(rep: Long): Long = {
      val ph = withGeom.filter(col("rep") === rep)
        .select(col("doc_id"), col("phash")).localCheckpoint(eager = true)
      ph.as("a").join(ph.as("b"), $"a.doc_id" < $"b.doc_id")
        .filter(bit_count($"a.phash".bitwiseXOR($"b.phash")) <= 10)
        .count()
    }
    val d0 = density(0)
    val dTail = density(k - 1) // c(base) ≥ k is rare → almost all FULL
    assert(dTail < math.max(50L, 3 * d0),
      s"replica ${k - 1} density $dTail vs organic $d0 — suffix correlation is back")
  }
}
