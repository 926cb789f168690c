package graft

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TextProfile

/** Parity of the native one-pass [[TextProfile]] expression against the
  * composed built-in pipeline it replaced (`split`/`array_distinct`/
  * higher-order `filter`): same n_tokens / n_unique / n_nonws / per-dict hit
  * counts on real documents AND on adversarial whitespace edge cases
  * (java `split("\\s+", -1)` keeps leading/trailing empty tokens; "" -> [""]).
  */
class TextProfileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dicts = Seq(
    Seq("the", "and", "of", "to"),
    Seq("der", "die", "und"))

  private def profile(c: Column): Column =
    GraftBridge.column(TextProfile(GraftBridge.expression(c), dicts))

  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val toks = split(col("text"), "\\s+")
    def hits(words: Seq[String]): Column = {
      val arr = words.map(w => s"'$w'").mkString(",")
      expr(s"size(filter(split(lower(text), '\\\\s+'), t -> array_contains(array($arr), t)))")
        .cast("bigint")
    }
    df.select(
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_unique"),
      length(regexp_replace(col("text"), "\\s", "")).cast("bigint").as("n_nonws"),
      hits(dicts.head).as("h0"),
      hits(dicts(1)).as("h1"))
  }

  private def native(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("tp", profile(col("text")))
      .select(
        col("tp.n_tokens").as("n_tokens"),
        col("tp.n_unique").as("n_unique"),
        col("tp.n_nonws").as("n_nonws"),
        element_at(col("tp.hits"), 1).as("h0"),
        element_at(col("tp.hits"), 2).as("h1"))

  test("matches composed built-ins on the documents table") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("text")
    assert(native(docs).except(composed(docs)).isEmpty)
    assert(composed(docs).except(native(docs)).isEmpty)
  }

  test("whitespace edge cases match java split semantics") {
    val cases = Seq(
      "", " ", "  ", "a", " a", "a ", " a ", "a  b", "\ta\nb\r ",
      "the The THE the", "und der die", "ab", "one two  three   ")
    val df = cases.toDF("text")
    val n = native(df).collect().toSeq.map(_.toSeq)
    val c = composed(df).collect().toSeq.map(_.toSeq)
    assert(n == c)
  }

  test("null text yields null profile") {
    val df = Seq[String](null).toDF("text")
    assert(df.select(profile(col("text"))).collect().head.isNullAt(0))
  }

  test("unigram LM scores every doc, bounded, and favors common-token docs") {
    import org.apache.spark.sql.functions.col
    val scores = graft.operators.TextOps.queries("q75_unigram_lm")(spark, TestSpark.sf)
    val nDocs = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(scores.count() == nDocs)
    // log-probs of p in (0, 1]: strictly negative, and bounded below by
    // ln(1/total_tokens) which for this corpus is far above -30
    assert(scores.filter(col("avg_logp") >= 0 || col("avg_logp") < -30).count() == 0)
  }
}
