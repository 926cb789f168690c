package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WarmState

class WarmStateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pin severs lineage, stores serialized+disk-evictable, and releaseAll frees the blocks") {
    val pinned = WarmState.pin(spark.range(1000).toDF("id")
      .withColumn("x", col("id") * 2))
    assert(pinned.count() == 1000L)
    // the blocks exist and carry the serialized, disk-evictable level
    val rdds = spark.sparkContext.getPersistentRDDs.values
      .filter(_.getStorageLevel == WarmState.level)
    assert(rdds.nonEmpty, "pinned frame left no block at WarmState.level")
    // lineage severed: the physical plan scans an RDD, not the range
    val plan = pinned.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD")
      || !plan.contains("Range"), s"lineage not severed:\n$plan")
    WarmState.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "persisted blocks survived releaseAll")
  }

  test("releaseAll clears the query warm caches; queries rebuild and answer identically") {
    val d = TestSpark.sf
    def run() = graft.SparkEntry.queries("q87_incremental_clusters")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    WarmState.releaseAll(spark)
    // the corpus state and prefix index were dropped with the cache maps —
    // the query must rebuild them lazily and produce the same assignment
    assert(run() == first)
  }
}
