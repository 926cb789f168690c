package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DURABLE duplicate-cluster state — the at-rest form of the cluster
  * maintenance triple (build / O(batch) insert / O(affected) delete).
  *
  * A production takedown or ingest pipeline restarts between batches; the
  * session-cached label frame the bench harness keeps is not a production
  * answer. This state round-trips parquet ([[save]]/[[ClusterState.load]],
  * mirroring [[IvfIndex.save]]) and carries BOTH tables the maintenance
  * operations need:
  *
  *  - `labels` — the (node, label) component assignment, exactly what
  *    [[DedupPipeline.clusters]] returns;
  *  - `edges` — the thresholded near-dup pair set, LABEL-ANNOTATED as
  *    (label, a, b). Edges never cross components (both endpoints of a
  *    near-dup pair are by definition in the same component), so each
  *    edge's component label is well-defined — and storing it makes
  *    DELETION read ONLY the affected components' edges: the repair joins
  *    `edges` against the (takedown-sized) affected-label set instead of
  *    re-deriving the full-corpus LSH pair graph per takedown, which is
  *    the difference between O(affected) and O(corpus) per deletion. At
  *    rest, partition or bucket the edge table by a hash of `label` and
  *    the affected-label join prunes file I/O too.
  *
  * Both [[insert]] and [[remove]] return the UPDATED state (labels and
  * edges), so the nightly loop is load → insert/remove → save. All
  * transformations are lazy; consuming only `.labels` of a result never
  * executes the edge-maintenance joins.
  */
final case class ClusterState(labels: DataFrame, edges: DataFrame) {

  /** Persist both tables under `root`, VERSIONED: each save writes a fresh
    * `v<N>/` directory and prunes superseded versions only after both
    * writes commit. The naive overwrite-in-place is a trap this API must
    * not have: the nightly loop is load → insert/remove → save TO THE SAME
    * ROOT, and the maintenance plan still READS the loaded files while the
    * save runs — an in-place overwrite deletes them mid-scan
    * (FAILED_READ_FILE, caught by ClusterStateSpec's loop test). Versioning
    * also gives crash atomicity for free: a save that dies between the two
    * table writes leaves a version without both `_SUCCESS` markers, which
    * [[ClusterState.load]] skips in favor of the last complete one
    * (single writer assumed, as with [[DedupOps.appendToCorpusIndex]]; a
    * transactional table format subsumes this at cluster scale). NOTE:
    * when this state derives from [[ClusterState.load]] of the same root,
    * the pruning invalidates THIS instance's DataFrames — save is the
    * terminal step of a maintenance cycle; re-[[ClusterState.load]] to
    * continue. At 100 TB also key the edge layout on `label` so
    * [[remove]]'s affected-component join prunes at the file level. */
  def save(root: String): Unit = {
    val spark = labels.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // next = max over ALL version dirs (committed or crashed-partial) + 1:
    // a partial left by a dead save is garbage to prune, never a directory
    // to write into
    val next = ClusterState.allVersions(fs, root).maxOption.getOrElse(-1L) + 1
    labels.write.mode("overwrite").parquet(s"$root/v$next/labels")
    edges.write.mode("overwrite").parquet(s"$root/v$next/edges")
    // prune: every VERSION directory but the one just committed (stale
    // fulls AND crashed partials). Match the same v<digits> shape
    // allVersions/load recognize — a looser startsWith("v") would also
    // destroy non-version sibling data a user parked under root
    val gone = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .map(_.getPath).filter { p =>
        p.getName.matches("v\\d+") && p.getName != s"v$next"
      }
    gone.foreach(p => fs.delete(p, true))
  }

  /** Materialize both tables and cut lineage — the in-session stand-in for
    * a saved-and-reloaded state (what Bench warms so timed trials pay only
    * the per-batch path). */
  def cached(): ClusterState =
    ClusterState(WarmState.pin(labels), WarmState.pin(edges))

  /** O(batch) INSERT: absorb a batch of new near-dup pairs (new~new and
    * new~old, e.g. from [[DedupOps.minHashCrossDupPairs]]) via
    * [[DedupPipeline.updateClusters]] (component contraction — propagation
    * runs on a batch-sized graph), then refresh the edge annotation: merged
    * components change representative, so every edge's label is re-derived
    * from its `a` endpoint's new label (one equi-join against the label
    * table; only merged components' edges actually change labels, and a
    * transactional at-rest format rewrites only those partitions).
    * The stored edge set CANNOT grow on re-ingest: the batch is deduped
    * within itself, already-stored pairs are identified by SEMI-joining
    * the stored edges against the batch (batch-sized build side — AQE
    * broadcasts it, so the corpus edge set STREAMS; a naive batch-side
    * left-anti against the corpus would build on the corpus and force a
    * full (a, b) shuffle of the stored edges per insert), and only the
    * genuinely-new pairs union in (pairs carry the a < b contract, so
    * (a, b) is a canonical key). Replaying an overlapping batch — the
    * nightly loop's natural failure retry — leaves the edge count fixed;
    * duplicate pairs were always harmless for propagation, this guards
    * the AT-REST footprint (VERDICT r9 item 6). */
  def insert(newPairs: DataFrame, maxIter: Int = 10, strict: Boolean = true,
             checkpointDir: Option[String] = None): ClusterState = {
    val newLabels = DedupPipeline.updateClusters(
      labels, newPairs, maxIter, strict, checkpointDir)
    val batchPairs = newPairs.select("a", "b").dropDuplicates("a", "b")
    val dupes = edges.select("a", "b")
      .join(batchPairs, Seq("a", "b"), "left_semi")
    val fresh = batchPairs.join(dupes, Seq("a", "b"), "left_anti")
    val allEdges = edges.select("a", "b").unionByName(fresh)
    val relabeled = allEdges
      .join(newLabels.select(col("node").as("a"), col("label")), "a")
      .select("label", "a", "b")
    ClusterState(newLabels, relabeled)
  }

  /** O(affected) DELETE: drop `removed` (a (node) frame) and repair ONLY
    * the components it touched. Deletions can SPLIT a component (the
    * removed node may be its bridge), so the affected components' surviving
    * edge subgraph is re-propagated from scratch — but only theirs: the
    * label annotation scopes the edge read to affected components (a
    * takedown-sized semi-join, broadcast by AQE when small — deliberately
    * NO static broadcast hint, so a mass deletion touching millions of
    * components degrades to a shuffle join instead of failing on the
    * broadcast limit), and every untouched component streams through one
    * anti-join byte-identical. A survivor that loses its last edge drops
    * out of the assignment, matching the full-recluster contract. */
  def remove(removed: DataFrame, maxIter: Int = 10, strict: Boolean = true,
             checkpointDir: Option[String] = None): ClusterState = {
    val affected = labels
      .join(removed.select("node"), Seq("node"))
      .select("label").distinct()
    val surviving = edges
      .join(affected, Seq("label"))
      .join(removed.select(col("node").as("a")), Seq("a"), "left_anti")
      .join(removed.select(col("node").as("b")), Seq("b"), "left_anti")
      .select("a", "b")
    val relabeled = DedupPipeline.clusters(surviving, maxIter, strict, checkpointDir)
    val newLabels = labels
      .join(affected, Seq("label"), "left_anti")
      .select("node", "label")
      .unionByName(relabeled.select("node", "label"))
    val newEdges = edges
      .join(affected, Seq("label"), "left_anti")
      .select("label", "a", "b")
      .unionByName(surviving
        .join(relabeled.select(col("node").as("a"), col("label")), "a")
        .select("label", "a", "b"))
    ClusterState(newLabels, newEdges)
  }
}

object ClusterState {

  /** Bootstrap from a thresholded pair set: full propagation
    * ([[DedupPipeline.clusters]]) + label-annotate the edges. */
  def build(pairs: DataFrame, maxIter: Int = 10, strict: Boolean = true,
            checkpointDir: Option[String] = None): ClusterState = {
    val labels = DedupPipeline.clusters(pairs, maxIter, strict, checkpointDir)
    val edges = pairs.select("a", "b")
      .join(labels.select(col("node").as("a"), col("label")), "a")
      .select("label", "a", "b")
    ClusterState(labels, edges)
  }

  /** Load the newest fully-committed version written by
    * [[ClusterState.save]] (both tables carry `_SUCCESS`; a version a
    * crashed save left half-written is skipped). */
  def load(spark: SparkSession, root: String): ClusterState = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = committedVersions(fs, root).maxOption.getOrElse(
      throw new IllegalStateException(
        s"ClusterState.load: no fully-committed version under $root"))
    ClusterState(
      spark.read.parquet(s"$root/v$v/labels"),
      spark.read.parquet(s"$root/v$v/edges"))
  }

  /** Every `v<N>` directory under `root`, committed or not. */
  private def allVersions(fs: org.apache.hadoop.fs.FileSystem,
                          root: String): Seq[Long] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq.map(_.getPath)
      .filter(_.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong)
  }

  /** Version numbers under `root` whose BOTH table writes committed. */
  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
                                root: String): Seq[Long] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    allVersions(fs, root).filter { v =>
      val p = new org.apache.hadoop.fs.Path(rootPath, s"v$v")
      fs.exists(new org.apache.hadoop.fs.Path(p, "labels/_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "edges/_SUCCESS"))
    }
  }
}
