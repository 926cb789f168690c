package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilarityOps

/** The custom Catalyst surface: graft_cosine expression (interpreted +
  * codegen paths) and the SelfCosineToOne optimizer rule. */
class ExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("graft_cosine matches the composed built-in cosine") {
    val df = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .limit(50)
    val pairs = df.select(col("vec_id").as("a"), col("emb").as("ea")).as("x")
      .crossJoin(df.select(col("vec_id").as("b"), col("emb").as("eb")).as("y"))
      .filter(col("a") < col("b"))
    val diffs = pairs
      .withColumn("native", expr("graft_cosine(ea, eb)"))
      .withColumn("composed", SimilarityOps.cosineComposed(col("ea"), col("eb")))
      .select(max(abs(col("native") - col("composed"))).as("d"))
      .as[Double].head()
    assert(diffs < 1e-12, s"native vs composed cosine diverged by $diffs")
  }

  test("graft_cosine casts float arrays via the registered builder") {
    val sim = Tables.load(spark, TestSpark.sf, "embeddings").limit(1)
      .select(expr("graft_cosine(embedding, embedding)").as("s")).as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("graft_intersect_count matches size(array_intersect(..)) exactly") {
    import spark.implicits._
    // corpus pairs
    val sh = graft.operators.TextOps.withShingles(
      Tables.load(spark, TestSpark.sf, "documents").limit(60)).select("doc_id", "sh")
    val pairs = sh.select(col("doc_id").as("a"), col("sh").as("sa")).as("x")
      .crossJoin(sh.select(col("doc_id").as("b"), col("sh").as("sb")).as("y"))
      .filter(col("a") < col("b"))
      .withColumn("native", expr("graft_intersect_count(sa, sb)"))
      .withColumn("composed", size(array_intersect(col("sa"), col("sb"))).cast("long"))
    assert(pairs.filter(!(col("native") <=> col("composed"))).count() == 0)
    // edge semantics: duplicates count once, null-in-both counts once,
    // NULL array → NULL, empty → 0 — all byte-for-byte array_intersect
    val edges = Seq(
      (Seq("x", "x", "y"), Seq("x", "z")),
      (Seq[String]("x", null, "y"), Seq[String](null, "y")),
      (Seq[String](null), Seq("x")),
      (null.asInstanceOf[Seq[String]], Seq("x")),
      (Seq.empty[String], Seq.empty[String])
    ).toDF("sa", "sb")
      .withColumn("native", expr("graft_intersect_count(sa, sb)"))
      .withColumn("composed", size(array_intersect(col("sa"), col("sb"))).cast("long"))
    assert(edges.filter(!(col("native") <=> col("composed"))).count() == 0)
  }

  test("graft_jaccard matches the composed intersect/union form on shingles") {
    val sh = graft.operators.TextOps.withShingles(
      Tables.load(spark, TestSpark.sf, "documents").limit(60)).select("doc_id", "sh")
    val pairs = sh.select(col("doc_id").as("a"), col("sh").as("sa")).as("x")
      .crossJoin(sh.select(col("doc_id").as("b"), col("sh").as("sb")).as("y"))
      .filter(col("a") < col("b"))
      .withColumn("native", expr("graft_jaccard(sa, sb)"))
      .withColumn("composed",
        size(array_intersect(col("sa"), col("sb"))) / size(array_union(col("sa"), col("sb"))))
    assert(pairs.filter(col("native") =!= col("composed")).count() == 0)
    // edge semantics: identical → 1.0, disjoint → 0.0, both empty → NULL
    // (0/0: Spark Divide yields NULL on a zero divisor, and NULL — unlike
    // NaN — never passes a >= threshold filter)
    val edges = Seq(
      (Seq("a b", "b c"), Seq("a b", "b c")),
      (Seq("a b"), Seq("c d")),
      (Seq.empty[String], Seq.empty[String]))
      .toDF("sa", "sb")
      .select(expr("graft_jaccard(sa, sb)").as("j"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(edges(0).contains(1.0) && edges(1).contains(0.0) && edges(2).isEmpty)
    // null ELEMENTS are distinct set members, never conflated with ""
    val withNull = Seq((Seq("a", null), Seq("a")))
      .toDF("sa", "sb")
      .select(expr("graft_jaccard(sa, sb)").as("j")).as[Double].head()
    assert(withNull == 0.5, s"null element mishandled: $withNull")
  }

  test("SelfCosineToOne rewrites to single-pass SelfCosine, preserving semantics") {
    val df = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
      .withColumn("s", expr("graft_cosine(e, e)"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_self_cosine"), s"rule did not rewrite:\n$optimized")
    assert(df.filter(abs(col("s") - 1.0) > 1e-12).count() == 0)
    // NULL input stays NULL; zero vector stays NaN — a literal fold would break both
    val edge = Seq(Tuple1(Seq(0.0, 0.0)), Tuple1(null.asInstanceOf[Seq[Double]]))
      .toDF("e").withColumn("s", expr("graft_cosine(e, e)"))
    val vals = edge.select("s").collect().map(r => if (r.isNullAt(0)) "null"
      else if (r.getDouble(0).isNaN) "nan" else r.getDouble(0).toString)
    assert(vals.toSet == Set("null", "nan"), s"edge semantics changed: ${vals.toSeq}")
  }

  test("graft_cosine returns NULL on length mismatch (oracle errors there)") {
    val r = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b").select(expr("graft_cosine(a, b)").as("s")).collect()
    assert(r.head.isNullAt(0))
  }

  test("minhash sketch: containment and sensitivity of signatures") {
    import graft.plans.MinHashSketchAgg
    val docs = Seq(
      (1L, (1 to 50).map(i => s"sh$i")),          // base
      (2L, (1 to 50).map(i => s"sh$i")),          // identical
      (3L, (1 to 50).map(i => if (i == 25) "CHANGED" else s"sh$i")), // near
      (4L, (1 to 50).map(i => s"other$i")))       // disjoint
      .toDF("doc_id", "sh")
    val sigs = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("doc_id")
      .agg(MinHashSketchAgg.sketch(col("s"), 32).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L), "identical sets must have identical signatures")
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(1L), sigs(3L)) > agree(sigs(1L), sigs(4L)),
      "near-identical sets must agree on more minhashes than disjoint sets")
    assert(sigs(1L).length == 32)
    // SQL surface
    val viaSql = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("doc_id").agg(expr("graft_minhash(s, 32)").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql(1L) == sigs(1L))
  }

  test("graft_shingles SQL function matches the Column-API shingler") {
    val viaSql = Tables.load(spark, TestSpark.sf, "documents").limit(20)
      .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val viaApi = graft.operators.TextOps
      .withShingles(Tables.load(spark, TestSpark.sf, "documents").limit(20))
      .select(col("doc_id"), col("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaSql == viaApi)
    assert(viaSql.values.forall(_.nonEmpty))
  }

  test("WordShingles matches a reference implementation on arbitrary texts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.unsafe.types.UTF8String
    def reference(text: String, n: Int): Seq[String] =
      text.split(" ", -1).toSeq.sliding(n).filter(_.size == n).map(_.mkString(" ")).distinct.toSeq
    val genText = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "the", "x1", "", "ünïcødé"))
      .map(_.mkString(" "))
    val prop = Prop.forAll(genText) { text =>
      val got = graft.plans.WordShingles(
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType), 3)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).toSeq.map(_.toString)
      got == reference(text, 3)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.toString)
  }

  test("graft_md5_64 SQL function matches md5_number_lower test vectors") {
    val out = spark.sql("SELECT graft_md5_64('abc') AS h, graft_md5_64('') AS e").head()
    assert(out.getLong(0) == 8250560606382298838L)
    assert(out.getLong(1) == 9098107892288553193L)
  }

  test("integer arguments accept BIGINT literals and reject non-foldable ones") {
    // CAST(3 AS BIGINT) used to throw ClassCastException (r01 advice)
    val sigs = spark.sql(
      "SELECT graft_shingles('a b c d', CAST(3 AS BIGINT)) AS sh").head().getSeq[String](0)
    assert(sigs == Seq("a b c", "b c d"))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b c', id) FROM range(1)").collect()
    }
    assert(err.getMessage.contains("foldable") || err.getMessage.contains("integer"))
  }

  test("type check rejects non-array arguments") {
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(expr("graft_cosine(a, b)")).collect()
    }
  }

  test("graft_cosine: a NULL element yields NULL, not a fabricated similarity") {
    // ArrayData.getDouble reads a null slot as 0.0 — the expression must
    // propagate NULL like the composed zip_with/aggregate form instead
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0, CAST(NULL AS DOUBLE)), array(1.0, 2.0)) AS c").head()
    assert(r.isNullAt(0), s"expected NULL, got ${r.get(0)}")
    // the SelfCosineToOne rewrite target honors the same contract
    val self = spark.sql(
      "SELECT graft_cosine(a, a) AS c FROM (SELECT array(1.0, CAST(NULL AS DOUBLE)) AS a)").head()
    assert(self.isNullAt(0), s"expected NULL from self-cosine, got ${self.get(0)}")
  }

  test("wrong arity fails analysis with the function named") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0))").collect()
    }
    assert(err.getMessage.contains("graft_cosine"))
  }

  test("minhash_perm rejects inputs outside the 31-bit domain") {
    import graft.plans.MinHashPermAgg
    val agg = MinHashPermAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false), 4)
    val err = intercept[IllegalArgumentException] {
      agg.update(agg.createAggregationBuffer(),
        org.apache.spark.sql.catalyst.InternalRow(-1L))
    }
    assert(err.getMessage.contains("shiftrightunsigned"))
  }
}
