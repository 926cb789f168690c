package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{SamplingOps, SimilarityOps}

class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("q59 stratified sample: at most 50 docs per stratum, deterministic across runs") {
    val a = SamplingOps.queries("q59_stratified_sample")(spark, TestSpark.sf)
    val perLang = a.groupBy("lang").count().collect()
    assert(perLang.nonEmpty)
    perLang.foreach(r => assert(r.getLong(1) <= 50))
    val b = SamplingOps.queries("q59_stratified_sample")(spark, TestSpark.sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q59 sample is a subset of the corpus, one row per sampled doc") {
    val s = SamplingOps.queries("q59_stratified_sample")(spark, TestSpark.sf)
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id", "lang")
    assert(s.join(docs, Seq("doc_id", "lang"), "left_anti").isEmpty)
    assert(s.select("doc_id").distinct().count() == s.count())
  }

  test("q69 corpus mixture: kept tokens never exceed the stratum budget") {
    val m = SamplingOps.queries("q69_corpus_mixture")(spark, TestSpark.sf).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val budget = r.getAs[Long]("budget")
      val kept = r.getAs[Long]("tokens_kept")
      assert(kept <= budget, s"lang=${r.getAs[String]("lang")} kept=$kept budget=$budget")
    }
  }

  test("q69 budgets allocate no more than the global 50k target") {
    val m = SamplingOps.queries("q69_corpus_mixture")(spark, TestSpark.sf)
    val total = m.agg(sum("budget")).as[Long].head()
    assert(total <= 50000L)
  }

  test("q80 weighted sample is size-biased and deterministic") {
    val corpusMean = Tables.load(spark, TestSpark.sf, "documents")
      .agg(avg("n_chars")).as[Double].head()
    val a = SamplingOps.queries("q80_weighted_sample")(spark, TestSpark.sf)
    val sampleMean = a.agg(avg("n_chars")).as[Double].head()
    // weight = n_chars → inclusion probability rises with size, so the
    // sample mean must sit clearly above the corpus mean
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
    val b = SamplingOps.queries("q80_weighted_sample")(spark, TestSpark.sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q79 packing: sequences + tail exactly account for every token") {
    val p = SamplingOps.queries("q79_sequence_packing")(spark, TestSpark.sf).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      assert(r.getAs[Long]("n_full_seqs") * 2048 + r.getAs[Long]("tail_waste")
        == r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("n_docs_crossing") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q68 int8 quantization stays in [-127, 127] and reconstructs within half a step") {
    val q = SimilarityOps.queries("q68_vector_quantize")(spark, TestSpark.sf)
    val bad = q.filter(col("max_q") > 127).count()
    assert(bad == 0)
    // mean |x - q/scale| is bounded by half a quantization step = 0.5/scale
    val overs = q.filter(col("mean_abs_err") > lit(0.5) / col("scale") + lit(1e-9)).count()
    assert(overs == 0)
  }
}
