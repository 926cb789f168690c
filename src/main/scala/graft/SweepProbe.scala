package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Fixed-cost profiler for the whole sweep (optimization r18, guide §1):
  * runs EVERY declared query once (after an untimed warmup pass) and prints
  * one row per query — wall seconds, Spark job count, stage count, task
  * count, summed executor task seconds, shuffle bytes written — so the
  * sweep's fixed-cost outliers (a query paying eager construction-time
  * jobs, a range sampler re-executing its child, an exchange that should
  * not exist) surface as #jobs / #stages anomalies instead of being argued
  * from wall time alone.
  *
  * Per-query attribution relies on queries running one at a time on the
  * driver thread (true in this probe). Usage:
  *   sbt "runMain graft.SweepProbe [sfDir] [prefix,prefix,...]"
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(Bench.defaultSfDir)
    val only = args.lift(1).map(_.split(",").toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // A/B knob for the round-18 CPU-dense-small-shuffle experiment
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MINPART", "64KB"))
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val shWB = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks.toLong)
        taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        shWB.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // untimed warmup: codegen + JIT + session state caches, same as Bench
    graft.Tables.names.foreach { n =>
      try graft.Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-28s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"task_s"}%7s ${"shW_MB"}%8s")
    var rows = List.empty[(String, Double, Long, Long, Long, Double, Double)]
    ordered.foreach { case (name, fn) =>
      // settle listener events from the previous query before zeroing
      Thread.sleep(50)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); shWB.set(0)
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}"); false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // drain completion events
      val row = (name, if (ok) dt else -1.0, jobs.get, stages.get, tasks.get,
        taskMs.get / 1e3, shWB.get / 1e6)
      rows ::= row
      println(f"${row._1}%-28s ${row._2}%7.3f ${row._3}%5d ${row._4}%6d " +
        f"${row._5}%6d ${row._6}%7.1f ${row._7}%8.2f")
    }
    val r = rows.reverse
    println(f"%nTOTALS wall=${r.map(_._2).filter(_ > 0).sum}%.1f s " +
      f"jobs=${r.map(_._3).sum} stages=${r.map(_._4).sum} tasks=${r.map(_._5).sum} " +
      f"task_s=${r.map(_._6).sum}%.1f shW_MB=${r.map(_._7).sum}%.1f")
    spark.stop()
  }
}
