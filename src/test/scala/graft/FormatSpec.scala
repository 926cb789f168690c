package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth: the engine round-trips parquet (primary),
  * ORC, CSV, JSON, and text through the same DataFrame surface. */
class FormatSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def sample = Tables.load(spark, TestSpark.sf, "customer")
    .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")

  test("orc round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    sample.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assert(back.orderBy("c_custkey").collect().toSeq == sample.orderBy("c_custkey").collect().toSeq)
  }

  test("csv round-trip with header and explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/t"
    sample.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(sample.schema).csv(dir)
    assert(back.orderBy("c_custkey").collect().toSeq == sample.orderBy("c_custkey").collect().toSeq)
  }

  test("json lines round-trip") {
    val dir = Files.createTempDirectory("graft-json").toString + "/t"
    sample.write.json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.orderBy("c_custkey").collect().toSeq == sample.orderBy("c_custkey").collect().toSeq)
  }

  test("text + binaryFile sources read raw payloads") {
    val dir = Files.createTempDirectory("graft-txt")
    Files.writeString(dir.resolve("a.txt"), "line one\nline two\n")
    assert(spark.read.text(dir.toString).count() == 2)
    val bin = spark.read.format("binaryFile").load(dir.toString)
    assert(bin.select("length").head().getLong(0) == 18L)
  }
}
