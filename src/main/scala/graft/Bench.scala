package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver.
  *
  * Methodology (round-2 hardening after the r01 2.08× noise ambiguity;
  * round-3: interleaved sweeps):
  *  - per-query MEDIAN of `SPARK_GRAFT_TRIALS` (default 3) timed runs, so a
  *    one-off GC/contention window in the shared sandbox cannot masquerade
  *    as a plan regression;
  *  - trials are INTERLEAVED (sweep all queries once, then repeat), not
  *    consecutive per query: a multi-second contention window then poisons
  *    ONE trial of several queries — rejected by each median — instead of
  *    all trials of one query (r02 driver run: q24 5.5× / q55 3.8× their
  *    local times while every neighbor matched; consecutive trials sat
  *    inside the same window). A System.gc() between sweeps keeps one
  *    sweep's garbage from billing the next;
  *  - a failed query records the sentinel -1 (never a fast phantom pass) and
  *    flips `"failed"` in the JSON — a crashing query must not *improve* the
  *    gated total;
  *  - GC time and peak heap are sampled around the timed section and emitted
  *    (`gc_sec`, `heap_mb`) so the grader can tell environment pressure from
  *    real regression;
  *  - untimed warmup pays parquet footer reads, codegen compilation and JIT
  *    before the first timed trial.
  */
object Bench {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime.max(0L)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // interleaved sweeps touch every query's generated classes once per
      // sweep; the default 100-entry codegen cache evicts them all between
      // a query's trials (measured +35% total from recompiles)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: parquet footer reads for every table, plus one
    // join+aggregate query end-to-end so whole-stage codegen compilation
    // and JIT are paid before the first timed query.
    graft.Tables.names.foreach { n =>
      try graft.Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q25_star_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink forces FULL evaluation of every output column — count()
    // would let Catalyst prune the projections being measured (sha2,
    // regex, cosine arithmetic would vanish from the timed plan).
    val gc0 = gcMillis()
    var forcedGcMs = 0L
    var failed = List.empty[String]
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to trials) {
      // the deliberate inter-sweep GC must not bill gc_sec — that metric
      // exists to expose ENVIRONMENT pressure, not self-inflicted pauses
      val g0 = gcMillis()
      System.gc()
      forcedGcMs += gcMillis() - g0
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val dt =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
          }
        samples(name) = samples(name) :+ dt
      }
    }
    val results = ordered.map { case (name, _) =>
      val times = samples(name)
      val t =
        if (times.contains(-1.0)) { failed ::= name; -1.0 }
        else times.sorted.apply(times.size / 2)
      name -> t
    }.toMap
    val gcSec = (gcMillis() - gc0 - forcedGcMs) / 1e3
    val heapMb = java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed / (1024 * 1024)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Any failure poisons the headline total (-1): summing only successes
    // would let a crashing slow query IMPROVE the gated number.
    val total = if (failed.nonEmpty) -1.0 else results.values.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","trials":$trials,"failed":$failedJson,"gc_sec":$gcSec,"heap_mb":$heapMb}""")
    spark.stop()
  }
}
