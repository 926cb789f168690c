package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerGroup

class TopKSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def orders = Tables.load(spark, TestSpark.sf, "orders")
    .select("o_custkey", "o_orderkey", "o_totalprice")

  test("custom top-k matches the window formulation exactly") {
    val custom = TopKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(custom.toSeq == windowed.toSeq)
  }

  test("physical plan uses TopKPerGroupExec and no per-partition Sort") {
    val df = TopKPerGroup(orders, Seq("o_custkey"), Seq(("o_totalprice", true)), k = 2)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerGroup"), s"custom exec missing:\n$physical")
    assert(!physical.contains("Sort "), s"unexpected sort in plan:\n$physical")
    assert(physical.contains("Exchange hashpartitioning"), s"expected cluster-by-group shuffle:\n$physical")
  }

  test("k larger than any group returns all rows") {
    val n = orders.count()
    assert(TopKPerGroup(orders, Seq("o_custkey"), Seq(("o_orderkey", false)), k = 100000).count() == n)
  }

  test("spill path: tiny memory bound + high-cardinality groups == window result") {
    // every row its own group except a few heavy keys; bound forces many
    // spill chunks per partition, exercising the merge loop end to end
    val custom = TopKPerGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3,
      maxRowsInMemory = 64)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(custom.toSeq == windowed.toSeq)
  }

  test("spill path: two giant groups where groups*k exceeds the memory bound") {
    // G*k = 10 > maxRows = 8: every merge pass re-spills and retention
    // bottoms out at the output size, forcing the no-shrink floor branch
    // (one final unbounded pass) — the result must still be the exact
    // per-group top-k
    val two = orders.withColumn("g", pmod(col("o_orderkey"), lit(2)))
    val custom = TopKPerGroup(two, Seq("g"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 5,
      maxRowsInMemory = 8)
      .select("g", "o_orderkey", "o_totalprice")
      .orderBy(col("g"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    val w = Window.partitionBy("g").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = two
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("g", "o_orderkey", "o_totalprice")
      .orderBy(col("g"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(custom.toSeq == expected.toSeq)
  }

  test("unknown column fails fast") {
    intercept[IllegalArgumentException] {
      TopKPerGroup(orders, Seq("nope"), Seq(("o_orderkey", false)), k = 1)
    }
  }
}
