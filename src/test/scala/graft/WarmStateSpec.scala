package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WarmState

class WarmStateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pin severs lineage, stores serialized+disk-evictable, and releaseAll frees ONLY its own pins") {
    val pinned = WarmState.pin(spark.range(1000).toDF("id")
      .withColumn("x", col("id") * 2))
    assert(pinned.count() == 1000L)
    // the blocks exist and carry the serialized, disk-evictable level
    val before = spark.sparkContext.getPersistentRDDs
    val rdds = before.values.filter(_.getStorageLevel == WarmState.level)
    assert(rdds.nonEmpty, "pinned frame left no block at WarmState.level")
    // lineage severed: the physical plan scans an RDD, not the range
    val plan = pinned.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LogicalRDD")
      || !plan.contains("Range"), s"lineage not severed:\n$plan")
    def ckptId(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }.head
    val pinnedId = ckptId(pinned)
    val hot = WarmState.pinHot(spark.range(10).toDF("id"))
    assert(hot.count() == 10L)
    val hotId = ckptId(hot)
    // a WRITER-internal persist outside the warm caches must SURVIVE the
    // hatch — sweeping it mid-write would silently re-evaluate the
    // writer's frame (ADVICE r11): releaseAll only touches its own pins
    val preBystander = spark.sparkContext.getPersistentRDDs.keySet
    val bystander = spark.range(50).toDF("id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bystander.count()
    // df.rdd would mint a NEW lineage — the persisted block's id is
    // whatever key materializing the cache added to the context map
    val bystanderIds = spark.sparkContext.getPersistentRDDs.keySet -- preBystander
    assert(bystanderIds.nonEmpty, "bystander persist left no block")
    WarmState.releaseAll(spark)
    val after = spark.sparkContext.getPersistentRDDs
    assert(!after.contains(pinnedId), "pinned warm-state blocks survived releaseAll")
    assert(!after.contains(hotId), "hot-pinned warm-state blocks survived releaseAll")
    assert(bystanderIds.subsetOf(after.keySet),
      "releaseAll swept a persist it did not create")
    bystander.unpersist(blocking = false)
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
