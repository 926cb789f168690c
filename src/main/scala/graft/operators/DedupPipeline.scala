package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-facing corpus deduplication API — the operator a training-data
  * pipeline actually calls: hand it a corpus, get back the kept rows.
  *
  * Keeper policy is deterministic (smallest id survives). For near-dedup
  * the drop set is "any doc with a more-senior near-duplicate" — the
  * standard greedy policy; it over-drops only on chains (a~b, b~c, a!~c),
  * which for high thresholds (>= 0.8) is rare and safe-side for training
  * data (dropping a borderline duplicate costs less than keeping one).
  */
object DedupPipeline {

  sealed trait Strategy
  /** Byte-identical after canonical normalization (lowercase, strip
    * punctuation, collapse whitespace). */
  case object Exact extends Strategy
  /** MinHash+LSH candidate generation, exact-Jaccard verification at
    * `threshold`. */
  final case class MinHashLsh(threshold: Double = 0.8) extends Strategy

  /** Rows of `docs` that survive deduplication (all columns preserved). */
  def dedup(docs: DataFrame, idCol: String, textCol: String, strategy: Strategy): DataFrame =
    strategy match {
      case Exact =>
        val norm = trim(regexp_replace(
          regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), "\\s+", " "))
        val keepers = docs
          .select(col(idCol), md5(norm).as("__fp"))
          .groupBy("__fp").agg(min(col(idCol)).as(idCol))
          .select(idCol)
        docs.join(keepers, idCol)
      case MinHashLsh(threshold) =>
        val dropped = nearDupPairs(docs, idCol, textCol, threshold)
          .select(col("b").as(idCol)).distinct()
        docs.join(dropped, Seq(idCol), "left_anti")
    }

  /** Verified near-duplicate pairs (a < b, exact Jaccard >= threshold) via
    * the MinHash-LSH path — exposed for auditing what dedup() would drop. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame =
    DedupOps.minHashNearDupPairs(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .filter(col("jac") >= threshold)
}
