package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming document-ingest gates: the text-hygiene operators applied as
  * documents ARRIVE rather than in a nightly batch. The quality filter is a
  * stateless narrow map ([[EventStream.qualityFiltered]]); near-dedup
  * against the existing corpus runs here.
  *
  * Scale posture: each micro-batch of incoming docs is near-deduped against
  * the corpus via the SAME batch operator the oracle verifies
  * ([[graft.operators.DedupOps.minHashCrossDupPairs]] — batch bands ×
  * corpus bands, never corpus × corpus). foreachBatch is the right
  * altitude: Structured Streaming forbids a join AFTER a streaming
  * aggregation in append mode (the signature groupBy), and the dedup
  * decision is per-batch-vs-corpus anyway — there is no cross-batch state
  * beyond the corpus itself. At 100 TB the corpus band table is a bucketed
  * static table refreshed by the compaction job; accepted docs are appended
  * to it downstream.
  */
object DocStream {

  /** Drain a (doc_id, text) document stream, flagging each doc's best
    * verified corpus near-duplicate (`dup_of`, `dup_jac` — null when none
    * at `threshold`), writing results under `root` partitioned by batch_id.
    *
    * Effectively-once: foreachBatch is at-least-once, so a batch REPLAYED
    * after a crash re-derives the same batch_id and dynamic partition
    * overwrite replaces exactly that partition — a plain append would
    * duplicate the batch's rows (same idempotency scheme as
    * [[EventStream.toPartitionedParquet]]). The corpus is indexed ONCE and
    * persisted across micro-batches — per-batch recompute of the corpus
    * shingle/sketch/band pipeline (the side that dwarfs each batch) is the
    * expensive mistake here. Re-invoking on a schedule with the same
    * checkpoint drains only new arrivals. */
  def incrementalDedupDrain(docsStream: DataFrame, corpus: DataFrame,
                            threshold: Double, root: String, checkpoint: String): Unit = {
    val index = graft.operators.DedupOps.indexCorpus(corpus).persist()
    try {
      val q = docsStream.writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val pairs = graft.operators.DedupOps
            .minHashCrossDupPairs(batch.toDF(), index)
            .filter(col("jac") >= threshold)
          val best = pairs
            .groupBy("new_id")
            .agg(max_by(col("corpus_id"), struct(col("jac"), -col("corpus_id"))).as("dup_of"),
              max("jac").as("dup_jac"))
          batch.toDF()
            .join(best, batch("doc_id") === best("new_id"), "left")
            .drop("new_id")
            .withColumn("batch_id", lit(batchId))
            .write
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .mode("overwrite")
            .parquet(root)
        }
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally index.unpersist()
  }
}
