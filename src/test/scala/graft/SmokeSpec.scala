package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5.1): every declared query runs end-to-end on
  * sf0.001 and every oracle-checked query is non-degenerate. */
class SmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val df = fn(spark, TestSpark.sf)
      val n = df.count()
      // near-dup/ANN candidate queries may legitimately be small, never negative;
      // oracle-checked queries must produce rows at smoke scale.
      if (SparkEntry.oracleSql.contains(name) && name != "q06_anti_join")
        assert(n > 0, s"$name returned no rows")
      else assert(n >= 0)
    }
  }
}
