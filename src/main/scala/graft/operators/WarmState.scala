package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session warm-state policy for the bench/test harness's per-(session,
  * dataset) corpus caches (q87 cluster labels + prefix index, q110
  * ClusterState, q108/q111 SCD-2 dimensions, q115 first-seen frame, q116
  * containment index). These are the in-memory stand-ins for state a
  * production pipeline keeps AT REST and loads per batch; caching them
  * lets benched trials pay only the per-batch cost each incremental
  * operator exists to isolate.
  *
  * [[pin]] severs lineage like `localCheckpoint(eager = true)` but stores
  * the blocks MEMORY_AND_DISK_SER instead of the deserialized default:
  * serialized blocks are per-partition byte arrays the block manager can
  * EVICT TO DISK under execution pressure, so a session holding every
  * clustering family's warm state at once degrades to disk reads instead
  * of an OOM — the r10 sf10 sweep had to run as 2+2 chunks because the
  * deserialized states accumulated past the 8 GB cap (BUILDLOG r10
  * "session-state ceiling"). When memory is ample the blocks stay
  * memory-resident and trial times are unchanged (spec'd against the r10
  * sf0.1 record).
  *
  * [[releaseAll]] is the explicit end-of-phase hatch: clears every
  * registered cache map (states rebuild lazily on next use) and drops all
  * persisted RDD blocks of the shared SparkContext. Context-wide by
  * design — the caches are keyed by session but their blocks live in the
  * one context — so call it only at a phase boundary where no other
  * session's persisted state must survive (the single-tenant bench/driver
  * assumption every graft warm cache already makes). */
object WarmState {
  val level: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER

  /** Eagerly materialize `df` as session warm state: lineage severed (the
    * table-append invalidation trap cannot re-evaluate it), blocks
    * serialized + disk-evictable. */
  def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = true, level)

  private val clearers =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  /** Register a cache-map clearer; called once per cache object. */
  private[graft] def registerCache(clear: () => Unit): Unit =
    clearers.add(clear)

  /** Clear every registered warm cache and unpersist all of the context's
    * persisted RDD blocks (including pinned checkpoints, whose blocks
    * would otherwise be released only when GC collects the dropped
    * frames). See the object scaladoc for the context-wide caveat. */
  def releaseAll(spark: SparkSession): Unit = {
    clearers.forEach(c => c())
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
