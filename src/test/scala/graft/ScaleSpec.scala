package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewOps
import graft.sources.PartitionedSink

/** Plan-level proof of the scale claims: bucketed joins avoid the shuffle,
  * partition pruning reaches the scan, skew salting preserves semantics. */
class ScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed tables join without any exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, TestSpark.sf, "orders")
      val customer = Tables.load(spark, TestSpark.sf, "customer")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
      customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // same join on the raw (unbucketed) parquet DOES shuffle
      val unbucketed = orders.join(customer, col("o_custkey") === col("c_custkey"))
      unbucketed.collect()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partition pruning reaches the scan for load_date filters") {
    val root = Files.createTempDirectory("graft-pp").toString
    import spark.implicits._
    val d1 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val d2 = Seq((3, "c"), (4, "d"), (5, "e")).toDF("id", "v")
    PartitionedSink.writeDaily(PartitionedSink.stamped(d1, Some("20260801")), root)
    PartitionedSink.writeDaily(PartitionedSink.stamped(d2, Some("20260802")), root)
    val pruned = spark.read.parquet(root).filter(col("load_date") === "20260802")
    assert(pruned.count() == 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("20260802"),
      s"partition filter not pushed:\n$plan")
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // one hot key (90% of rows) + long tail
    val big = ((1 to 900).map(i => (1L, s"row$i")) ++ (1 to 100).map(i => (i.toLong % 7 + 2, s"tail$i")))
      .toDF("k", "payload")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = big.join(small, "k").orderBy("k", "payload").collect()
    val salted = SkewOps.saltedJoin(big, small, "k", salts = 8).orderBy("k", "payload").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted aggregation equals plain aggregation") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    val salted = SkewOps.saltedAgg(li, Seq("l_returnflag"), salts = 16,
      phase1 = Seq(sum("l_quantity").as("pq"), count(lit(1)).as("pn")),
      phase2 = Seq(sum("pq").as("q"), sum("pn").as("n")))
      .orderBy("l_returnflag").collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
