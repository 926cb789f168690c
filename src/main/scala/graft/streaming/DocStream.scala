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
  /** Streaming ADMISSION CONTROL against the AT-REST corpus index — the
    * production ingest gate [[incrementalDedupDrain]] only flags: each
    * micro-batch of (doc_id, text) docs is near-deduped against the
    * DURABLE index ([[graft.operators.DedupOps.loadCorpusIndex]],
    * tombstone-aware) AND within itself, rejects are recorded, and the
    * surviving novel docs are ADMITTED — appended to the index with
    * [[graft.operators.DedupOps.appendToCorpusIndex]] — so LATER
    * micro-batches dedup against EARLIER admissions, not just the
    * day-0 corpus. This closes the loop a nightly pipeline runs in
    * batch, at arrival latency.
    *
    * Per batch: corpus rejects = best verified index match at
    * `threshold` (the [[incrementalDedupDrain]] contract); within-batch
    * rejects = non-representatives of the batch's own near-dup clusters
    * (smallest doc_id survives — [[graft.operators.DedupPipeline]]'s
    * senior-keeper policy). The audit row (`admitted`, `dup_of`,
    * `dup_jac`; within-batch rejects carry their surviving senior as
    * `dup_of`) lands under `root` partitioned by batch_id with dynamic
    * partition overwrite — a replayed batch rewrites exactly its own
    * partition.
    *
    * REPLAY safety for the index side: foreachBatch is at-least-once and
    * [[graft.operators.DedupOps.appendToCorpusIndex]] is not idempotent,
    * so survivors are anti-joined against the index's existing doc_ids
    * before the append — a replayed batch (or a doc re-sent in a later
    * file) can never double-admit. The id probe reads one pruned column
    * of the shingle table per batch; at 100 TB keep it cheap with the
    * compaction cadence, or swap in a transactional table format and
    * drop the probe. A batch doc whose id has a PENDING TOMBSTONE fails
    * the drain fast (the [[graft.operators.DedupOps.appendToCorpusIndex]]
    * data-loss guard): compact the index, then re-run — the checkpoint
    * resumes at the failed batch. */
  def admissionDrain(docsStream: DataFrame, namePrefix: String,
                     threshold: Double, root: String, checkpoint: String): Unit = {
    require(threshold >= 0.7,
      f"admissionDrain: LSH candidate recall at jaccard $threshold%.2f is too " +
        "low — same floor as DedupPipeline.dedupAgainstCorpus")
    val q = docsStream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.toDF().select("doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // loaded PER BATCH deliberately: the catalog read is footer-cheap
          // and must see the appends earlier batches committed
          val index = graft.operators.DedupOps.loadCorpusIndex(spark, namePrefix)
          val corpusBest = graft.operators.DedupOps
            .minHashCrossDupPairs(b, index)
            .filter(col("jac") >= threshold)
            .groupBy("new_id")
            .agg(max_by(col("corpus_id"), struct(col("jac"), -col("corpus_id"))).as("dup_of"),
              max("jac").as("dup_jac"))
          val batchPairs = graft.operators.DedupOps.minHashNearDupPairs(b)
            .filter(col("jac") >= threshold)
          val juniors = graft.operators.DedupPipeline
            .clusters(batchPairs.select("a", "b"), maxIter = 100)
            .toDF().filter(col("node") =!= col("label"))
            .select(col("node").as("new_id"), col("label").as("dup_of"))
          val rejects = corpusBest.select("new_id", "dup_of", "dup_jac")
            .unionByName(juniors.withColumn("dup_jac", lit(null).cast("double")))
            // a doc can be both a corpus dup and a within-batch junior;
            // keep the corpus verdict (it carries the verified jac)
            .groupBy("new_id")
            .agg(max_by(struct(col("dup_of"), col("dup_jac")), col("dup_jac").isNotNull).as("r"))
            .select(col("new_id"), col("r.dup_of").as("dup_of"), col("r.dup_jac").as("dup_jac"))
          b.join(rejects, b("doc_id") === rejects("new_id"), "left")
            .withColumn("admitted", col("new_id").isNull)
            .drop("new_id")
            .withColumn("batch_id", lit(batchId))
            .write
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .mode("overwrite")
            .parquet(root)
          val survivors = b.join(rejects.select("new_id"),
            b("doc_id") === rejects("new_id"), "left_anti")
          // EAGER localCheckpoint, not persist: `fresh` reads the shingle
          // table it is about to extend, and appendToCorpusIndex's FIRST
          // write (shingles) invalidates any cached plan over that table —
          // its second write (bands) would then re-evaluate the anti-join
          // against the UPDATED table and silently append ZERO band rows.
          // Severing the lineage pins the batch's row set across both
          // writes. (Batch-sized frame — checkpoint cost is the batch.)
          val fresh = survivors.join(
            spark.table(s"${namePrefix}_shingles").select("doc_id").distinct(),
            Seq("doc_id"), "left_anti")
            .localCheckpoint(eager = true)
          if (fresh.limit(1).collect().nonEmpty)
            graft.operators.DedupOps.appendToCorpusIndex(namePrefix, fresh)
        } finally b.unpersist()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the appends ran on foreachBatch's CLONED sessions; the caller's
    // session may hold a stale cached relation (file list) for the index
    // tables from a pre-drain read — invalidate so post-drain reads see
    // every admitted batch
    val caller = docsStream.sparkSession
    for (t <- Seq("shingles", "bands", "tombstones"))
      if (caller.catalog.tableExists(s"${namePrefix}_$t"))
        caller.catalog.refreshTable(s"${namePrefix}_$t")
  }

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
