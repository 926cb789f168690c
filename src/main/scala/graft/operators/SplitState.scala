package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DURABLE train/valid/test split assignment — the FIFTH at-rest artifact
  * (after the MinHash, prefix, first-seen and containment indexes plus
  * ClusterState), and the one whose entire contract is that assignments
  * NEVER move silently (VERDICT r11 demand 1).
  *
  * Why it must be at rest: [[DedupOps.splitApply]]'s leakage guarantee
  * hashes the near-dup CLUSTER representative, and representatives CHURN —
  * a committed cross-cluster merge (the q87 insert path) or a deletion
  * that removes a component's minimum member (the q110 path) changes the
  * rep, so re-hashing on the next read silently moves an entire cluster
  * across the train/test wall between snapshots. The recorded assignment,
  * consulted BEFORE any hash, is the only thing that makes "sticky" a
  * durable property rather than a per-call accident.
  *
  * STORAGE (log-structured, catalog tables, one family per `namePrefix` —
  * the first-seen index's spelling):
  *
  *  - `{p}_assign(doc_id, split, seq)` — APPEND-ONLY; a doc's effective
  *    split is its row with the highest COMMITTED seq. One row per doc at
  *    init, one more per explicit re-adjudication ([[resolve]] — rare),
  *    so the table stays ~corpus-sized; [[compact]] collapses history.
  *    Bucketed by `doc_id`: the load's latest-per-doc aggregate and every
  *    doc-keyed consumer join shuffle-free off the scan.
  *  - `{p}_meta(seq, lo, hi, kind)` — ONE row per committed operation,
  *    written LAST. Commit fence and crash protocol in one: assign/move
  *    rows land first, the meta row last, and readers ignore rows whose
  *    seq never committed — a crashed operation is invisible until its
  *    deterministic re-run commits it ([[ClusterState.save]]'s versioning
  *    idea, without rewriting the corpus-sized table per batch). `lo`/`hi`
  *    is the id span of init/apply batches — the append-only id WATERMARK
  *    — and doubles as the crash-replay exemption key.
  *  - `{p}_moves(doc_id, from_split, to_split, reason, seq)` — the AUDIT
  *    trail. Stickiness here means no SILENT movement: the one operation
  *    allowed to move a doc ([[resolve]]) records every move with its
  *    reason (`realign` / `quarantine_drain`). Never compacted.
  *  - `{p}_tombstones(doc_id)` — takedown, O(batch) append; [[load]]
  *    filters, [[compact]] folds into the files.
  *
  * QUARANTINE RESOLUTION (VERDICT r11 demand 2): [[assign]] emits
  * `quarantine` for a batch doc whose component spans clusters recorded
  * under DIFFERENT splits (picking a side would move corpus docs over the
  * wall mid-snapshot). [[resolve]], run after the disputed merge is
  * COMMITTED to ClusterState, drains the pool: the merged component's
  * canonical split is the recorded split of its SENIOR member (smallest
  * doc_id among non-quarantine recorded members — ids are arrival-ordered,
  * so the senior side is the one whose assignment has been in force
  * longest and is most likely already consumed downstream); quarantined
  * members inherit it and junior-side members are REALIGNED to it, each
  * with an audit row. Why this cannot leak: corpus~corpus near-dup edges
  * are complete at init (both endpoints got the same cluster hash), so a
  * cross-split edge can only enter through a NEW doc — which [[assign]]
  * quarantines (neither train nor test) for as long as the dispute is
  * open; after [[resolve]], every component is homogeneous again. At no
  * snapshot does a near-dup edge read train on one end and test on the
  * other. A component with ONLY quarantined members (its assigned
  * neighbours were all taken down) hashes its current rep — recorded from
  * then on, so later churn cannot move it.
  *
  * Scale: [[assign]] is O(batch + touched-component members) — the
  * component-verdict aggregate is pruned to the batch's own comps, never
  * a state-wide pass (the admissionDrain lesson); [[load]] is one
  * zero-exchange latest-per-doc aggregate off the bucketed scan;
  * [[resolve]] and [[compact]] are deliberately O(state) maintenance-
  * cadence passes. No pairwise work anywhere. Single writer assumed,
  * like every graft index family; a transactional table format subsumes
  * `_meta` fencing at cluster scale. */
object SplitState {

  /** Deterministic 80/10/10 split bucket of a cluster representative:
    * md5-keyed (engine-neutral, replayed by the DuckDB oracle),
    * tag-decorrelated from the sampling keys. Hashing the REP is the
    * q117/q118 leakage guarantee — every member of a cluster gets the
    * same bucket. Consulted ONLY for never-recorded docs; recorded
    * assignments always win. */
  def splitOf(rep: Column): Column = {
    val bkt = shiftrightunsigned(
      graft.plans.Md5Lower64.of(concat(lit("split:"), rep.cast("string"))), 1) % 100
    when(bkt < 80, "train").when(bkt < 90, "valid").otherwise("test")
  }

  private def assignT(p: String) = s"${p}_assign"
  private def metaT(p: String) = s"${p}_meta"
  private def movesT(p: String) = s"${p}_moves"
  private def tombT(p: String) = s"${p}_tombstones"

  /** Highest committed operation seq, -1 for a virgin prefix. */
  def committedSeq(s: SparkSession, namePrefix: String): Long =
    if (!s.catalog.tableExists(metaT(namePrefix))) -1L
    else s.table(metaT(namePrefix)).agg(max("seq")).head() match {
      case r if r.isNullAt(0) => -1L
      case r                  => r.getLong(0)
    }

  /** Highest doc_id ever admitted (max `hi` over init/apply spans) — the
    * append-only id fence, O(1) off `_meta`. */
  def watermark(s: SparkSession, namePrefix: String): Option[Long] =
    if (!s.catalog.tableExists(metaT(namePrefix))) None
    else s.table(metaT(namePrefix)).agg(max("hi")).head() match {
      case r if r.isNullAt(0) => None
      case r                  => Some(r.getLong(0))
    }

  /** The effective at-rest assignment: (doc_id, split), latest COMMITTED
    * row per doc, pending tombstones dropped at read. This is the frame
    * every consumer joins BEFORE any hash is considered. */
  def load(s: SparkSession, namePrefix: String): DataFrame = {
    val committed = committedSeq(s, namePrefix)
    val latest = s.table(assignT(namePrefix))
      .filter(col("seq") <= committed)
      .groupBy("doc_id")
      .agg(max_by(col("split"), col("seq")).as("split"))
    if (!s.catalog.tableExists(tombT(namePrefix))) latest
    else latest.join(
      s.table(tombT(namePrefix)).select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** Bootstrap the family: the q117 assignment (hash of each doc's cluster
    * rep, singletons self-representing) recorded for EVERY doc, seq 0.
    * `docs` = (doc_id), `labels` = (node, label) cluster assignment the
    * reps derive from. Refuses a prefix that already has committed state —
    * init is not an upsert. */
  def init(s: SparkSession, namePrefix: String, docs: DataFrame,
           labels: DataFrame, nBuckets: Int = 32): Unit = {
    require(committedSeq(s, namePrefix) < 0L,
      s"SplitState.init: $namePrefix already has committed state — " +
        "use assign/resolve/remove to maintain it")
    val span = docs.agg(min("doc_id"), max("doc_id")).head()
    if (span.isNullAt(0)) return
    val rows = docs.select("doc_id")
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .withColumn("split", splitOf(coalesce(col("label"), col("doc_id"))))
      .select(col("doc_id"), col("split"), lit(0L).as("seq"))
    rows.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "doc_id")
      .saveAsTable(assignT(namePrefix))
    commitMeta(s, namePrefix, 0L, Some((span.getLong(0), span.getLong(1))), "init")
  }

  /** Record splits for a NEW batch of docs, consulting the state FIRST —
    * the at-rest form of [[DedupOps.splitApply]]. `labels` is the UPDATED
    * cluster assignment (after the batch's pairs were contracted in, the
    * q87 shape); `batch` = (doc_id) of the new docs. Per batch doc's
    * component, among RECORDED members:
    *
    *  - ≥2 distinct non-quarantine splits → `quarantine` (a cross-split
    *    bridge: the cluster's identity is in dispute until [[resolve]]);
    *  - exactly 1 → inherit it (any quarantined members will drain to the
    *    same split, so inheriting now cannot diverge);
    *  - none, but quarantined members present → `quarantine` (the dispute
    *    owns the component until resolve picks its canonical);
    *  - no recorded members at all → [[splitOf]] the component rep,
    *    recorded from here on.
    *
    * GUARDS: batch ids must be ABOVE the `_meta` watermark (ids are
    * arrival-ordered and never reused; this also makes "already recorded"
    * impossible). Replay of a COMMITTED batch (same (lo, hi) span in
    * `_meta`) is a recorded no-op; a crashed attempt's orphan rows are
    * adopted by the deterministic re-run. Orphan rows at the next seq
    * belonging to a DIFFERENT batch fail fast — run [[compact]] to purge
    * an abandoned attempt. */
  def assign(s: SparkSession, namePrefix: String, batch: DataFrame,
             labels: DataFrame): Unit = {
    require(s.catalog.tableExists(metaT(namePrefix)),
      s"SplitState.assign: $namePrefix has no committed state — init first")
    val span = batch.agg(min("doc_id"), max("doc_id")).head()
    if (span.isNullAt(0)) return
    val (bLo, bHi) = (span.getLong(0), span.getLong(1))
    val replayed = s.table(metaT(namePrefix))
      .filter(col("lo") === bLo && col("hi") === bHi && col("kind") === "apply")
      .limit(1).collect().nonEmpty
    if (replayed) return // committed batch: recorded no-op
    watermark(s, namePrefix).foreach { wm =>
      require(bLo > wm,
        s"SplitState.assign: batch doc_id $bLo is not above the watermark " +
          s"$wm — ids are append-only and never reused (re-running a " +
          "crashed assign of the SAME batch is the one sanctioned overlap)")
    }
    val next = committedSeq(s, namePrefix) + 1
    val lab = labels.withColumnRenamed("node", "doc_id")
    val bc = batch.select("doc_id")
      .join(lab, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("label"), col("doc_id")))
    // O(batch + touched members), NOT O(state): only the batch's own
    // components can contribute recorded splits, and every recorded
    // member of a touched component appears in `labels` (a batch doc
    // adjacent to a state doc forces both into the contracted label
    // set), so the component-verdict aggregate reads exactly the touched
    // comps' members — the batch-sized frames broadcast, and the state
    // scan stays a pruned bucketed read, never a corpus-wide shuffle.
    val touched = bc.select("comp").distinct()
    val memberIds = lab
      .join(touched, lab("label") === touched("comp"), "left_semi")
      .select("doc_id")
    val stComp = load(s, namePrefix)
      .join(memberIds, Seq("doc_id"), "left_semi")
      .join(lab, Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("label"), col("doc_id")))
    val perComp = stComp.groupBy("comp").agg(
      countDistinct(when(col("split") =!= "quarantine", col("split"))).as("nq"),
      max((col("split") === "quarantine").cast("int")).as("hasq"),
      min(when(col("split") =!= "quarantine", col("split"))).as("sp"))
    val rows = bc
      .join(perComp, Seq("comp"), "left")
      .withColumn("split",
        when(col("nq") >= 2, lit("quarantine"))
          .when(col("nq") === 1, col("sp"))
          .when(coalesce(col("hasq"), lit(0)) === 1, lit("quarantine"))
          .otherwise(splitOf(col("comp"))))
      .select(col("doc_id"), col("split"), lit(next).as("seq"))
    appendRows(s, namePrefix, rows, next)
    commitMeta(s, namePrefix, next, Some((bLo, bHi)), "apply")
  }

  /** Re-adjudicate after cluster maintenance COMMITTED (a q87 merge or a
    * q110 deletion): drain the quarantine pool and restore the
    * one-split-per-component invariant, with every movement AUDITED.
    * `labels` is the current committed cluster assignment. Per component
    * of recorded docs, the canonical split is the recorded split of the
    * SENIOR (smallest doc_id) non-quarantine member — or [[splitOf]] the
    * component rep when only quarantined members remain. Members whose
    * recorded split differs get a new assign row plus a `_moves` row
    * (`quarantine_drain` when leaving quarantine, `realign` otherwise —
    * the junior side of a committed cross-split merge). A resolve that
    * changes nothing writes nothing. Idempotent: re-running against the
    * same labels finds zero differences. */
  def resolve(s: SparkSession, namePrefix: String, labels: DataFrame): Unit = {
    val next = committedSeq(s, namePrefix) + 1
    val state = load(s, namePrefix)
    val stComp = state
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("label"), col("doc_id")))
    val perComp = stComp.groupBy("comp").agg(
      min(when(col("split") =!= "quarantine",
        struct(col("doc_id"), col("split")))).as("senior"))
    val changes = stComp.join(perComp, Seq("comp"))
      .withColumn("canon",
        coalesce(col("senior.split"), splitOf(col("comp"))))
      .filter(col("split") =!= col("canon"))
      .select(col("doc_id"), col("split").as("from_split"),
        col("canon").as("to_split"))
      .localCheckpoint(eager = true) // one derivation; reused across writes
    if (changes.limit(1).collect().isEmpty) return
    appendRows(s, namePrefix,
      changes.select(col("doc_id"), col("to_split").as("split"),
        lit(next).as("seq")), next)
    val movesNew = changes
      .withColumn("reason",
        when(col("from_split") === "quarantine", lit("quarantine_drain"))
          .otherwise(lit("realign")))
      .withColumn("seq", lit(next))
    val movesDedup = if (!s.catalog.tableExists(movesT(namePrefix))) movesNew
      else movesNew.join(
        s.table(movesT(namePrefix)).filter(col("seq") === next).select("doc_id"),
        Seq("doc_id"), "left_anti")
    movesDedup.write.mode("append").format("parquet")
      .saveAsTable(movesT(namePrefix))
    commitMeta(s, namePrefix, next, None, "resolve")
  }

  /** Artifact-consistency audit across the cluster/split pair: every
    * clustered doc (a `labels` node) must hold a recorded split. A
    * nonzero result means a maintenance cycle died after its cluster
    * commit but before its split commit AND was never replayed — the
    * [[graft.streaming.DocStream.splitDrain]] fence makes that
    * unreachable under checkpoint replay; this is the independent
    * nightly proof (q121's wall audit checks assignment QUALITY, this
    * checks assignment COVERAGE). One anti-join, labels-sized. */
  def unassigned(s: SparkSession, namePrefix: String,
                 labels: DataFrame): DataFrame =
    labels.select(col("node").as("doc_id")).distinct()
      .join(load(s, namePrefix), Seq("doc_id"), "left_anti")

  /** TAKEDOWN: append to the tombstone side-table, O(batch), never a
    * rewrite. [[load]] drops the rows at read; [[compact]] folds the
    * removal into the files. A removed doc's id is never reused; if it
    * was its component's senior, the next [[resolve]] re-adjudicates from
    * the surviving members' RECORDED splits — survivors never re-hash. */
  def remove(namePrefix: String, docIds: DataFrame): Unit =
    docIds.select("doc_id").write.mode("append").format("parquet")
      .saveAsTable(tombT(namePrefix))

  /** Collapse assignment history to one row per surviving doc (its latest
    * committed split), purge uncommitted orphan rows from crashed or
    * abandoned attempts, fold tombstones into the files, and drop the
    * tombstone table LAST. Crash protocol mirrors
    * [[CorpusOps.compactFirstSeenIndex]]: staging write, drop + rename, a
    * dangling `_compact` from a previous crash healed first. `_meta` (the
    * watermark and commit fence) and `_moves` (the audit trail) are
    * deliberately untouched. */
  def compact(s: SparkSession, namePrefix: String): Unit = {
    val live = assignT(namePrefix)
    if (!s.catalog.tableExists(live) &&
        s.catalog.tableExists(s"${live}_compact"))
      s.sql(s"ALTER TABLE ${live}_compact RENAME TO $live")
    val nBuckets = DedupOps.bucketCountOf(s, live)
    val committed = committedSeq(s, namePrefix)
    val collapsed = s.table(live)
      .filter(col("seq") <= committed)
      .groupBy("doc_id")
      .agg(max_by(col("split"), col("seq")).as("split"), max("seq").as("seq"))
    val surviving = if (!s.catalog.tableExists(tombT(namePrefix))) collapsed
      else collapsed.join(
        s.table(tombT(namePrefix)).select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
    surviving.select("doc_id", "split", "seq")
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "doc_id")
      .saveAsTable(s"${live}_compact")
    s.sql(s"DROP TABLE IF EXISTS $live")
    s.sql(s"ALTER TABLE ${live}_compact RENAME TO $live")
    s.sql(s"DROP TABLE IF EXISTS ${tombT(namePrefix)}")
    // purge ORPHAN AUDIT rows too: a crashed resolve writes `_moves`
    // before its meta fence, and if the pool is purged (this method)
    // instead of the resolve being re-run, a LATER operation committing
    // the same seq would silently legitimize the phantom moves. The
    // audit table is rewritten without them (audit-sized, rare cadence).
    if (s.catalog.tableExists(movesT(namePrefix))) {
      val keep = s.table(movesT(namePrefix))
        .filter(col("seq") <= committed)
        .localCheckpoint(eager = true) // sever before overwriting the source
      keep.write.mode("overwrite").format("parquet")
        .saveAsTable(movesT(namePrefix))
    }
  }

  /** Append `rows` (doc_id, split, seq=`next`) into the assign table,
    * adopting a crashed attempt's orphans: rows already present at `next`
    * for the same docs are skipped (the deterministic re-run recomputes
    * identical content — single writer); orphans at `next` for docs
    * OUTSIDE this write are a different abandoned operation and fail
    * fast. */
  private def appendRows(s: SparkSession, namePrefix: String,
                         rows: DataFrame, next: Long): Unit = {
    val orphans = s.table(assignT(namePrefix))
      .filter(col("seq") === next).select("doc_id")
    val stray = orphans.join(rows.select("doc_id"), Seq("doc_id"), "left_anti")
      .limit(1).collect()
    require(stray.isEmpty,
      s"SplitState: uncommitted rows at seq $next for doc_id " +
        s"${stray.headOption.map(_.get(0))} belong to a different abandoned " +
        "operation — run SplitState.compact to purge them, then retry")
    val nBuckets = DedupOps.bucketCountOf(s, assignT(namePrefix))
    // EAGER checkpoint: `rows` (and the orphan anti-join) reads the very
    // table this write appends to — sever the lineage so the append never
    // re-lists its own source (batch-sized frame)
    rows.join(orphans, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = true)
      .write.mode("append").format("parquet")
      .bucketBy(nBuckets, "doc_id")
      .saveAsTable(assignT(namePrefix))
  }

  /** The commit fence: the `_meta` row lands only after every data write
    * of operation `seq` succeeded. */
  private def commitMeta(s: SparkSession, namePrefix: String, seq: Long,
                         span: Option[(Long, Long)], kind: String): Unit = {
    import s.implicits._
    Seq((seq, span.map(_._1), span.map(_._2), kind))
      .toDF("seq", "lo", "hi", "kind")
      .write.mode("append").format("parquet")
      .saveAsTable(metaT(namePrefix))
  }
}
