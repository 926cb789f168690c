package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventOps, SimilarityOps, TextOps}

/** Invariant specs for the round-5 audit/maintenance operators (q91–q95).
  * The hard cross-engine check is the DuckDB oracle (Verify); these
  * re-derive each answer INDEPENDENTLY in plain Scala on the collected
  * sf0.001 slice, so a shared mistake in the Spark plan and its oracle SQL
  * (the one failure mode the hash check can't see) would still surface.
  */
class AuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs: Map[Long, String] =
    Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap

  private def tok(t: String): Array[String] = t.toLowerCase.split("\\s+")

  // ---- q91 Gopher rules ---------------------------------------------------

  test("q91: flags match a plain-Scala re-derivation of the rules") {
    val got = TextOps.queries("q91_gopher_rules")(spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("r_wc"), r.getAs[Long]("r_mwl"),
          r.getAs[Long]("r_stop"), r.getAs[Long]("r_ttr"),
          r.getAs[Long]("keep"))).toMap
    val stops = Set("the", "a", "of", "to", "in")
    docs.foreach { case (id, text) =>
      val raw = text.split("\\s+")
      val w = tok(text)
      val nonws = text.replaceAll("\\s", "").length
      val rwc = if (w.length >= 30 && w.length <= 10000) 1L else 0L
      val rmwl = if (nonws >= 4 * w.length && nonws <= 10 * w.length) 1L else 0L
      val rstop = if (w.toSet.count(stops) >= 2) 1L else 0L
      val rttr = if (raw.distinct.length * 2 >= raw.length) 1L else 0L
      val keep = if (rwc + rmwl + rstop + rttr == 4) 1L else 0L
      assert(got(id) == ((rwc, rmwl, rstop, rttr, keep)), s"doc $id")
    }
    // the rules must be discriminative on this corpus, not vacuous
    val keeps = got.values.map(_._5).toSeq
    assert(keeps.contains(0L) && keeps.contains(1L))
  }

  // ---- q92 dimension upsert -----------------------------------------------

  test("q92: MERGE branches match an event-log replay") {
    // session TZ is UTC, so the naive literal in the query is this instant
    val cutoff = java.time.Instant.parse("2024-01-20T00:00:00Z").toEpochMilli
    val ev = Tables.load(spark, TestSpark.sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .as[(Long, Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val got = EventOps.queries("q92_dim_upsert")(spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("last_type"), r.getAs[Long]("last_event_id"),
          r.getAs[String]("status"))).toMap
    assert(got.size == byUser.size) // every user exactly once
    byUser.foreach { case (u, rows) =>
      val base = rows.filter(_._4 < cutoff)
      val delta = rows.filter(_._4 >= cutoff)
      val expStatus =
        if (base.nonEmpty && delta.nonEmpty) "updated"
        else if (base.isEmpty) "inserted" else "unchanged"
      val latest = (if (delta.nonEmpty) delta else base).maxBy(_._2)
      assert(got(u) == ((latest._3, latest._2, expStatus)), s"user $u")
    }
  }

  // ---- q93 duplicated-span audit -------------------------------------------

  test("q93: span counts match a sliding-window re-derivation") {
    val C = 16
    val windows = docs.toSeq.flatMap { case (id, text) =>
      val w = tok(text)
      if (w.length < C) Seq.empty
      else w.sliding(C).map(s => id -> s.mkString(" ")).toSeq
    }
    val docsPerSpan = windows.groupBy(_._2).map { case (s, xs) =>
      s -> xs.map(_._1).distinct.size
    }
    val exp = windows.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.size.toLong, xs.count(x => docsPerSpan(x._2) >= 2).toLong)
    }
    val got = TextOps.queries("q93_dup_span_audit")(spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))).toMap
    assert(got == exp)
    // every doc with >= 16 tokens emits exactly len-15 spans
    got.foreach { case (id, (n, _)) =>
      assert(n == tok(docs(id)).length - C + 1, s"doc $id")
    }
  }

  // ---- q94 Zipf fit ---------------------------------------------------------

  test("q94: slope matches a least-squares re-derivation and is negative") {
    val rows = TextOps.queries("q94_zipf_curve")(spark, TestSpark.sf).collect()
    val bySource = Tables.load(spark, TestSpark.sf, "documents")
      .select("source", "text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.flatMap(d => tok(d._2)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val counts = bySource(src).groupBy(identity).view.mapValues(_.length)
        .toSeq.sortBy { case (t, c) => (-c, t) }
      val xy = counts.zipWithIndex.map { case ((_, c), i) =>
        (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(c.toDouble) * 1e6))
      }
      val n = xy.size.toDouble
      val sx = xy.map(_._1.toDouble).sum; val sy = xy.map(_._2.toDouble).sum
      val sxy = xy.map(p => p._1.toDouble * p._2).sum
      val sxx = xy.map(p => p._1.toDouble * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(r.getAs[Long]("n_types") == xy.size)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-4, src)
      assert(r.getAs[Double]("slope") < 0.0, s"$src: rank-frequency must decay")
    }
  }

  // ---- q95 quantized recall --------------------------------------------------

  test("q95: one row per query, recall = hits/5 within [0,1], int8 is not garbage") {
    val rows = SimilarityOps.queries("q95_quantized_recall")(spark, TestSpark.sf)
      .collect()
    assert(rows.length == 10) // vec_id < 10 query set
    rows.foreach { r =>
      val h = r.getAs[Long]("hits")
      assert(h >= 0 && h <= 5)
      assert(math.abs(r.getAs[Double]("recall") - h / 5.0) < 1e-9)
    }
    // int8 with per-vector scaling barely perturbs ranking on gaussian
    // vectors — mean recall must be well above chance (5/499)
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.5, s"mean int8 recall@5 = $mean")
  }

  // ---- q97 cross-source duplication matrix --------------------------------

  test("q97: pair counts sum to the verified pair total and keys are ordered") {
    val srcOf = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    // the UNLIMITED verified pair set — q51 itself applies .limit(50), so
    // comparing against it would silently depend on the fixture yielding
    // fewer than 50 pairs and falsely fail the day the corpus grows
    val pairs = graft.operators.DedupOps
      .minHashNearDupPairs(Tables.load(spark, TestSpark.sf, "documents")
        .select("doc_id", "text"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("jac").desc, col("a"), col("b"))
      .collect()
    val matrix = graft.operators.DedupOps
      .queries("q97_cross_source_dups")(spark, TestSpark.sf).collect()
    assert(matrix.nonEmpty, "no cross-source near-dups in the test corpus")
    matrix.foreach { r =>
      assert(r.getAs[String]("source_x") <= r.getAs[String]("source_y"))
      assert(r.getAs[Double]("max_jac") >= 0.5 && r.getAs[Double]("max_jac") <= 1.0)
      assert(r.getAs[Double]("avg_jac") <= r.getAs[Double]("max_jac") + 1e-9)
    }
    // every q51 pair lands in exactly one matrix cell → counts sum to total
    val total = matrix.map(_.getAs[Long]("n_pairs")).sum
    assert(total == pairs.length,
      s"matrix covers $total pairs, q51 found ${pairs.length}")
    // one cell re-derived: the (source_x, source_y) of the top q51 pair
    val top = pairs.head
    val (sx, sy) = {
      val (a, b) = (srcOf(top.getAs[Long]("a")), srcOf(top.getAs[Long]("b")))
      (if (a <= b) a else b, if (a <= b) b else a)
    }
    assert(matrix.exists(r => r.getAs[String]("source_x") == sx &&
      r.getAs[String]("source_y") == sy))
  }

  // ---- q98 retention cohorts ----------------------------------------------

  test("q98: day-offset-0 cells cover every user exactly once") {
    val rows = graft.operators.EventOps
      .queries("q98_retention_cohorts")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("day_offset") >= 0L,
      "an activity day precedes its user's cohort day"))
    // every user is active on their own first day, so the offset-0 cells
    // partition the user population
    val usersAt0 = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    val totalUsers = Tables.load(spark, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    assert(usersAt0 == totalUsers, s"offset-0 covers $usersAt0 of $totalUsers")
    // and no cell can exceed its cohort's size
    val cohortSize = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(r => r.getAs[String]("cohort") -> r.getAs[Long]("n_users")).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("n_users") <= cohortSize(r.getAs[String]("cohort"))))
  }

  // ---- q100 vocabulary overlap --------------------------------------------

  test("q100: one cell matches a plain-Scala set computation, bounds hold") {
    val rows = graft.operators.TextOps
      .queries("q100_vocab_overlap")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vx, vy, inter, jac) = (r.getAs[Long]("vocab_x"), r.getAs[Long]("vocab_y"),
        r.getAs[Long]("inter"), r.getAs[Double]("jac"))
      assert(r.getAs[String]("source_x") < r.getAs[String]("source_y"))
      assert(inter <= math.min(vx, vy) && jac > 0.0 && jac <= 1.0)
    }
    // re-derive the first cell independently with Scala sets
    val r0 = rows.head
    val bySource = Tables.load(spark, TestSpark.sf, "documents")
      .select("source", "text").as[(String, String)].collect()
      .groupBy(_._1).map { case (src, ds) =>
        src -> ds.flatMap(d => tok(d._2)).toSet }
    val (va, vb) = (bySource(r0.getAs[String]("source_x")),
      bySource(r0.getAs[String]("source_y")))
    assert(r0.getAs[Long]("vocab_x") == va.size && r0.getAs[Long]("vocab_y") == vb.size)
    assert(r0.getAs[Long]("inter") == (va & vb).size)
    val expect = math.rint((va & vb).size.toDouble / (va | vb).size * 1e4) / 1e4
    assert(math.abs(r0.getAs[Double]("jac") - expect) < 1e-9)
  }

  test("q101: vocab sketch estimates track exact Jaccard; dispatcher switches tiers") {
    import graft.operators.TextOps
    val rows = TextOps
      .queries("q101_vocab_overlap_sketch")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("est_ok")),
      "a MinHash vocab estimate fell outside the 0.15 contract bound")
    // the estimates themselves (not just the boolean): mean |err| over the
    // matrix should be well inside the per-pair bound
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val est = TextOps.vocabOverlapSketch(docs)
      .as[(String, String, Double)].collect()
      .map { case (x, y, e) => (x, y) -> e }.toMap
    val errs = rows.map(r => math.abs(
      est(r.getAs[String]("source_x") -> r.getAs[String]("source_y"))
        - r.getAs[Double]("jac")))
    assert(errs.sum / errs.length < 0.06,
      s"mean |est - exact| = ${errs.sum / errs.length}")
    // dispatcher: few sources -> exact schema; forced low bound -> sketch
    assert(TextOps.vocabOverlap(docs).columns.contains("jac"))
    assert(TextOps.vocabOverlap(docs, maxExactSources = 1)
      .columns.contains("jac_est"))
  }

  // ---- q99 token histogram ------------------------------------------------

  test("q99: buckets partition the corpus and bound their token counts") {
    val rows = graft.operators.TextOps
      .queries("q99_token_histogram")(spark, TestSpark.sf).collect()
    val nDocs = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket_bits").toInt
      val lo = 1L << (b - 1)
      val hi = (1L << b) - 1
      assert(r.getAs[Long]("min_tokens") >= lo && r.getAs[Long]("max_tokens") <= hi,
        s"bucket $b holds tokens outside [$lo,$hi]")
    }
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 0.001, s"shares sum to $shareSum")
  }

  // ---- q105 run-collapse transform ----------------------------------------

  test("q105: cleaned text matches a plain-Scala run-length collapse") {
    val got = graft.operators.TextOps.queries("q105_collapse_runs")(spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed")))
      .toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1) // -1 keeps trailing empties like the engine
      val kept = toks.headOption.toSeq ++
        toks.sliding(2).collect { case Array(a, b) if a != b => b }
      val expect = (kept.mkString(" "), kept.length.toLong, (toks.length - kept.length).toLong)
      assert(got(id) == expect, s"doc $id")
    }
    // the transform must DO something on this corpus, not be vacuous
    assert(got.values.map(_._3).sum > 0)
  }

  // ---- q104 backward as-of join -------------------------------------------

  test("asofBackward: equal-ts match, no-prior null, latest wins, key isolation") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (1L, 10L, ts(100)), // click at exactly 100 → equal ts matches
      (2L, 10L, ts(250)), // clicks at 100 and 200 → latest (200) wins
      (3L, 10L, ts(50)),  // before any click → NULL
      (4L, 20L, ts(500))  // key 20 never clicks; key 30's clicks must not leak
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts(100)), (10L, ts(200)), (30L, ts(400)))
      .toDF("user_id", "ts")
    val got = EventOps.asofBackward(left, right, "user_id", "ts", "click_ts")
      .select("event_id", "click_ts")
      .as[(Long, Option[Timestamp])].collect().toMap
    assert(got.size == 4) // every left row survives exactly once
    assert(got(1L).contains(ts(100)))
    assert(got(2L).contains(ts(200)))
    assert(got(3L).isEmpty)
    assert(got(4L).isEmpty)
  }

  // ---- q103 SCD type-2 history --------------------------------------------

  test("scd2History: runs collapse, value recurrence reopens, boundaries link") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    val orders = Seq(
      (100L, 1L, d(1), "A"),
      (100L, 2L, d(2), "A"), // same run → one segment of 2
      (100L, 3L, d(3), "B"), // change point
      (100L, 4L, d(4), "A"), // A again → a NEW segment, never merged back
      (200L, 5L, d(1), "C")  // single-observation customer
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val segs = graft.operators.Relational
      .scd2History(orders, "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
      .orderBy("o_custkey", "valid_from")
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[String]("priority"),
        r.getAs[Timestamp]("valid_from"), Option(r.getAs[Timestamp]("valid_to")),
        r.getAs[Long]("n_orders")))
    assert(segs.toSeq == Seq(
      (100L, "A", d(1), Some(d(3)), 2L),
      (100L, "B", d(3), Some(d(4)), 1L),
      (100L, "A", d(4), None, 1L),
      (200L, "C", d(1), None, 1L)))
  }

  test("asofBackward: agrees with a naive per-row reference on random timelines") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // small key/time domains force collisions: equal-ts ties, multi-click
    // users, clickless users all occur across 60 generated cases
    val genCase = for {
      nL <- Gen.choose(0, 12); nR <- Gen.choose(0, 12)
      lks <- Gen.listOfN(nL, Gen.choose(1L, 4L))
      lts <- Gen.listOfN(nL, Gen.choose(0L, 20L))
      rks <- Gen.listOfN(nR, Gen.choose(1L, 4L))
      rts <- Gen.listOfN(nR, Gen.choose(0L, 20L))
    } yield (lks.zip(lts).zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
             rks.zip(rts))
    val prop = Prop.forAll(genCase) { case (lrows, rrows) =>
      val left = lrows.map { case (id, k, t) => (id, k, ts(t)) }
        .toDF("event_id", "user_id", "ts")
      val right = rrows.map { case (k, t) => (k, ts(t)) }.toDF("user_id", "ts")
      val got = EventOps.asofBackward(left, right, "user_id", "ts", "click_ts")
        .select("event_id", "click_ts")
        .as[(Long, Option[Timestamp])].collect().toMap
      // reference: per left row, max right ts <= left ts for the key
      lrows.forall { case (id, k, t) =>
        val expect = rrows.filter(r => r._1 == k && r._2 <= t)
          .map(_._2).maxOption.map(ts)
        got.get(id).contains(expect)
      } && got.size == lrows.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("asofBackward/scd2History plans: ONE hash exchange, keyed on the grouping key") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq((1L, 10L, ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts(50))).toDF("user_id", "ts")
    val asofPlan = EventOps.asofBackward(left, right, "user_id", "ts", "click_ts")
      .queryExecution.executedPlan.toString
    // the one-shuffle claim in the q104 scaladoc, held by the planner:
    // a single hashpartitioning exchange on user_id, no join operator
    assert("hashpartitioning".r.findAllIn(asofPlan).size == 1, asofPlan)
    assert(!asofPlan.contains("Join"), asofPlan)
    val scd = Seq((1L, 1L, ts(1), "A")).toDF(
      "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val scdPlan = graft.operators.Relational
      .scd2History(scd, "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
      .queryExecution.executedPlan.toString
    // windows + segment agg all hash on o_custkey-prefixed keys; nothing
    // may shuffle on a non-key column
    val parts = "hashpartitioning\\(([a-z_#0-9L]+)".r
      .findAllMatchIn(scdPlan).map(_.group(1)).toSeq
    assert(parts.nonEmpty && parts.forall(_.startsWith("o_custkey")), scdPlan)
  }

  test("scd2History: NULL attr observations are change points (IS DISTINCT FROM parity)") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    // A, NULL, A: the NULL row must open its own island exactly like the
    // oracle's IS DISTINCT FROM — a null-unsafe compare would fuse islands
    // and make the segment linkage nondeterministic
    val rows = Seq((1L, 1L, d(1), Some("A")), (1L, 2L, d(2), None),
                   (1L, 3L, d(3), Some("A")))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val segs = graft.operators.Relational
      .scd2History(rows, "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
      .orderBy("valid_from")
      .collect().map(r => (Option(r.getAs[String]("priority")),
        r.getAs[Timestamp]("valid_from"), Option(r.getAs[Timestamp]("valid_to"))))
    assert(segs.toSeq == Seq(
      (Some("A"), d(1), Some(d(2))),
      (None, d(2), Some(d(3))),
      (Some("A"), d(3), None)))
  }

  test("scd2History: same-time tie is broken by the unique key, deterministically") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    val tied = Seq((1L, 1L, d(1), "X"), (1L, 2L, d(1), "Y"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val segs = graft.operators.Relational
      .scd2History(tied, "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
      .orderBy("priority")
      .collect().map(r => (r.getAs[String]("priority"),
        Option(r.getAs[Timestamp]("valid_to"))))
    // o_orderkey 1 ("X") observes first: closed by "Y" at the same instant
    assert(segs.toSeq == Seq(("X", Some(d(1))), ("Y", None)))
  }

  // ---- q106 as-of join with payload ---------------------------------------

  test("asofBackward payload: matched right ROW's columns ride along; no-match rows all-NULL") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (1L, 10L, ts(100)), // equal-ts click matches, payload comes with it
      (2L, 10L, ts(250)), // latest click (200, payload "b") wins
      (3L, 10L, ts(50)),  // no prior click → ts AND payload NULL
      (4L, 20L, ts(500))  // clickless key → all NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts(100), 7L, "a"), (10L, ts(200), 8L, "b"),
        (30L, ts(400), 9L, "c"))
      .toDF("user_id", "ts", "rid", "tag")
    val got = EventOps.asofBackward(left, right, "user_id", "ts", "click_ts",
        payload = Seq("rid", "tag"))
      .select("event_id", "click_ts", "rid", "tag")
      .as[(Long, Option[Timestamp], Option[Long], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == 4)
    assert(got(1L) == ((Some(ts(100)), Some(7L), Some("a"))))
    assert(got(2L) == ((Some(ts(200)), Some(8L), Some("b"))))
    assert(got(3L) == ((None, None, None)))
    assert(got(4L) == ((None, None, None)))
  }

  test("asofBackward tieBreak: same-(key,ts) right ties resolve to max tie id, in ONE shuffle") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq((1L, 10L, ts(200))).toDF("event_id", "user_id", "ts")
    // three clicks at the SAME (user, ts) — rid 9 must win, its payload too
    val right = Seq((10L, ts(100), 3L, "lo"), (10L, ts(100), 9L, "hi"),
        (10L, ts(100), 5L, "mid"))
      .toDF("user_id", "ts", "rid", "tag")
    val df = EventOps.asofBackward(left, right, "user_id", "ts", "m_ts",
      payload = Seq("rid", "tag"), tieBreak = Some("rid"))
    val got = df.select("event_id", "rid", "tag")
      .as[(Long, Option[Long], Option[String])].collect().toSeq
    assert(got == Seq((1L, Some(9L), Some("hi"))))
    // the tie-break must NOT cost a pre-aggregation shuffle: still one
    // hashpartitioning exchange, keyed on user_id, no join
    val plan = df.queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("NULL tieBreak among equal-ts right rows LOSES to any non-null tie, both directions") {
    // pins the r9 contract (ADVICE r9): NULL ties sort FIRST in traversal
    // order for BOTH directions (asc_nulls_first backward,
    // desc_nulls_first forward), so running last() always prefers a
    // non-null tie; a NULL-tie row wins only when every tied row is NULL
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq((1L, 10L, ts(200)), (2L, 20L, ts(200))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      // user 10: a NULL-tie and a non-null-tie row at the SAME ts
      (Some(10L), Some(ts(100)), None, "null-tie"),
      (Some(10L), Some(ts(100)), Some(3L), "non-null"),
      (Some(10L), Some(ts(300)), None, "null-tie-fwd"),
      (Some(10L), Some(ts(300)), Some(4L), "non-null-fwd"),
      // user 20: ONLY NULL-tie rows at the tied ts — still a valid match
      (Some(20L), Some(ts(100)), None, "only-null"),
      (Some(20L), Some(ts(300)), None, "only-null-fwd"))
      .toDF("user_id", "ts", "rid", "tag")
    val back = EventOps.asofBackward(left, right, "user_id", "ts", "m_ts",
        payload = Seq("tag"), tieBreak = Some("rid"))
      .select("event_id", "tag").as[(Long, String)].collect().toMap
    assert(back(1L) == "non-null", s"backward NULL tie must lose: $back")
    assert(back(2L) == "only-null")
    val fwd = EventOps.asofForward(left, right, "user_id", "ts", "m_ts",
        payload = Seq("tag"), tieBreak = Some("rid"))
      .select("event_id", "tag").as[(Long, String)].collect().toMap
    assert(fwd(1L) == "non-null-fwd", s"forward NULL tie must lose: $fwd")
    assert(fwd(2L) == "only-null-fwd")
  }

  test("asofBackward: NULL-key/NULL-ts rows never match (SQL equi-ASOF parity)") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (1L, Some(10L), Some(ts(100))), // normal match
      (2L, None, Some(ts(100))),      // NULL-key left: oracle equi-join → no match
      (3L, Some(10L), None)           // NULL-ts left: range predicate never true
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), Some(ts(50)), 1L),
      (None, Some(ts(10)), 2L),  // NULL-key right must not land on NULL-key left
      (Some(10L), None, 3L)      // NULL-ts right must never win (sorts first raw)
    ).toDF("user_id", "ts", "rid")
    val got = EventOps.asofBackward(left, right, "user_id", "ts", "m_ts",
        payload = Seq("rid"))
      .select("event_id", "m_ts", "rid")
      .as[(Long, Option[Timestamp], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 3)
    assert(got(1L) == ((Some(ts(50)), Some(1L))))
    assert(got(2L) == ((None, None)))
    assert(got(3L) == ((None, None)))
  }

  test("asofBackward: reserved/colliding column names fail fast") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val right = Seq((10L, ts(50), 1L)).toDF("user_id", "ts", "rid")
    val withSide = Seq((1L, 10L, ts(100), 0)).toDF("event_id", "user_id", "ts", "__side")
    intercept[IllegalArgumentException] {
      EventOps.asofBackward(withSide, right, "user_id", "ts", "m_ts")
    }
    val withOut = Seq((1L, 10L, ts(100), ts(0))).toDF("event_id", "user_id", "ts", "m_ts")
    intercept[IllegalArgumentException] {
      EventOps.asofBackward(withOut, right, "user_id", "ts", "m_ts")
    }
    val withRid = Seq((1L, 10L, ts(100), 5L)).toDF("event_id", "user_id", "ts", "rid")
    intercept[IllegalArgumentException] {
      EventOps.asofBackward(withRid, right, "user_id", "ts", "m_ts", payload = Seq("rid"))
    }
    val noSuchPayload = Seq((1L, 10L, ts(100))).toDF("event_id", "user_id", "ts")
    intercept[IllegalArgumentException] {
      EventOps.asofBackward(noSuchPayload, right, "user_id", "ts", "m_ts", payload = Seq("nope"))
    }
  }

  test("asofBackward payload: agrees with a naive per-row reference on random timelines") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // right rows deduped to one per (key, ts) — the determinism contract —
    // keeping the max payload id, mirroring q106's max_by pre-aggregation
    val genCase = for {
      nL <- Gen.choose(0, 12); nR <- Gen.choose(0, 12)
      lks <- Gen.listOfN(nL, Gen.choose(1L, 4L))
      lts <- Gen.listOfN(nL, Gen.choose(0L, 20L))
      rks <- Gen.listOfN(nR, Gen.choose(1L, 4L))
      rts <- Gen.listOfN(nR, Gen.choose(0L, 20L))
    } yield (lks.zip(lts).zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
             rks.zip(rts).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
               .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toList)
    val prop = Prop.forAll(genCase) { case (lrows, rrows) =>
      val left = lrows.map { case (id, k, t) => (id, k, ts(t)) }
        .toDF("event_id", "user_id", "ts")
      val right = rrows.map { case (k, t, rid) => (k, ts(t), rid) }
        .toDF("user_id", "ts", "rid")
      val got = EventOps.asofBackward(left, right, "user_id", "ts", "click_ts",
          payload = Seq("rid"))
        .select("event_id", "click_ts", "rid")
        .as[(Long, Option[Timestamp], Option[Long])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      lrows.forall { case (id, k, t) =>
        val expect = rrows.filter(r => r._1 == k && r._2 <= t)
          .maxByOption(_._2).map(r => (ts(r._2), r._3))
        got.get(id).contains((expect.map(_._1), expect.map(_._2)))
      } && got.size == lrows.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("asofForward: agrees with a naive per-row reference on random timelines") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // right rows deduped to one per (key, ts) keeping the MIN payload id —
    // forward's arg-min tie-break, mirroring q109's arg_min pre-dedup
    val genCase = for {
      nL <- Gen.choose(0, 12); nR <- Gen.choose(0, 12)
      lks <- Gen.listOfN(nL, Gen.choose(1L, 4L))
      lts <- Gen.listOfN(nL, Gen.choose(0L, 20L))
      rks <- Gen.listOfN(nR, Gen.choose(1L, 4L))
      rts <- Gen.listOfN(nR, Gen.choose(0L, 20L))
    } yield (lks.zip(lts).zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
             rks.zip(rts).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
               .groupBy(r => (r._1, r._2)).values.map(_.minBy(_._3)).toList)
    val prop = Prop.forAll(genCase) { case (lrows, rrows) =>
      val left = lrows.map { case (id, k, t) => (id, k, ts(t)) }
        .toDF("event_id", "user_id", "ts")
      val right = rrows.map { case (k, t, rid) => (k, ts(t), rid) }
        .toDF("user_id", "ts", "rid")
      val got = EventOps.asofForward(left, right, "user_id", "ts", "next_ts",
          payload = Seq("rid"), tieBreak = Some("rid"))
        .select("event_id", "next_ts", "rid")
        .as[(Long, Option[Timestamp], Option[Long])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      lrows.forall { case (id, k, t) =>
        val expect = rrows.filter(r => r._1 == k && r._2 >= t)
          .minByOption(_._2).map(r => (ts(r._2), r._3))
        got.get(id).contains((expect.map(_._1), expect.map(_._2)))
      } && got.size == lrows.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("asofForward: NULL-key/NULL-ts never match; one shuffle, no join") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (1L, Some(10L), Some(ts(100))), // next right at 150
      (2L, None, Some(ts(100))),      // NULL key → no match
      (3L, Some(10L), None)           // NULL ts → no match (nulls-first in desc order: right-free frame)
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), Some(ts(150)), 1L),
      (None, Some(ts(160)), 2L),
      (Some(10L), None, 3L)
    ).toDF("user_id", "ts", "rid")
    val df = EventOps.asofForward(left, right, "user_id", "ts", "m_ts",
      payload = Seq("rid"))
    val got = df.select("event_id", "m_ts", "rid")
      .as[(Long, Option[Timestamp], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(ts(150)), Some(1L))))
    assert(got(2L) == ((None, None)))
    assert(got(3L) == ((None, None)))
    val plan = df.queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
    // forward MUST run on the incrementally-evaluated growing frame
    // (unboundedpreceding → currentrow over the reversed ordering); an
    // unbounded-FOLLOWING frame re-scans to partition end from every row —
    // O(n²) on a hot key — and must never reappear here
    val lower = plan.toLowerCase
    assert(!lower.contains("unboundedfollowing"), plan)
    assert(lower.contains("unboundedpreceding"), plan)
  }

  // ---- q107 multi-attribute SCD-2 -----------------------------------------

  test("scd2History multi-attr: either field flipping opens a segment; versions are ordinals") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    val orders = Seq(
      (100L, 1L, d(1), "A", "O"), // v1 opens
      (100L, 2L, d(2), "A", "O"), // same composite → still v1
      (100L, 3L, d(3), "A", "F"), // STATUS flips alone → v2
      (100L, 4L, d(4), "B", "F"), // PRIORITY flips alone → v3
      (100L, 5L, d(5), "A", "O")  // both flip back → v4, never merged with v1
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "p", "st")
    val segs = graft.operators.Relational
      .scd2History(orders, "o_custkey", "o_orderdate", "o_orderkey", Seq("p", "st"))
      .orderBy("version")
      .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("p"),
        r.getAs[String]("st"), r.getAs[Timestamp]("valid_from"),
        Option(r.getAs[Timestamp]("valid_to")), r.getAs[Long]("n_orders")))
    assert(segs.toSeq == Seq(
      (1L, "A", "O", d(1), Some(d(3)), 2L),
      (2L, "A", "F", d(3), Some(d(4)), 1L),
      (3L, "B", "F", d(4), Some(d(5)), 1L),
      (4L, "A", "O", d(5), None, 1L)))
  }

  test("scd2History multi-attr: NULL fields compare null-safely (IS DISTINCT FROM parity)") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    // (NULL,"O") → (NULL,"O") is NOT a change; (NULL,"O") → ("A","O") is
    val rows = Seq(
      (1L, 1L, d(1), Option.empty[String], "O"),
      (1L, 2L, d(2), Option.empty[String], "O"),
      (1L, 3L, d(3), Some("A"), "O"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "p", "st")
    val segs = graft.operators.Relational
      .scd2History(rows, "o_custkey", "o_orderdate", "o_orderkey", Seq("p", "st"))
      .orderBy("version")
      .collect().map(r => (Option(r.getAs[String]("p")), r.getAs[Long]("n_orders")))
    assert(segs.toSeq == Seq((None, 2L), (Some("A"), 1L)))
  }

  test("scd2History multi-attr: ALL-NULL first observation still opens version 1") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    // versions must be 1-based even when every tracked field of the first
    // row is NULL — the oracle SQL mirrors this with a first-row marker on
    // the non-null tie-break key (per-field IS DISTINCT FROM alone would
    // read the all-NULL first row as chg=0 and number from 0)
    val rows = Seq(
      (1L, 1L, d(1), Option.empty[String], Option.empty[String]),
      (1L, 2L, d(2), Some("A"), Some("O")))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "p", "st")
    val segs = graft.operators.Relational
      .scd2History(rows, "o_custkey", "o_orderdate", "o_orderkey", Seq("p", "st"))
      .orderBy("version")
      .collect().map(r => (r.getAs[Long]("version"), Option(r.getAs[String]("p"))))
    assert(segs.toSeq == Seq((1L, None), (2L, Some("A"))))
  }

  test("scd2History multi-attr: agrees with a naive re-derivation on random NULL-heavy histories") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    // small domains force the hard cases the real data lacks: NULL fields,
    // all-NULL first observations, same-day ties, value recurrence
    val attrGen = Gen.oneOf(Option.empty[String], Some("A"), Some("B"))
    val genCase = for {
      n <- Gen.choose(0, 14)
      ks <- Gen.listOfN(n, Gen.choose(1L, 3L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 6L))
      ps <- Gen.listOfN(n, attrGen)
      ss <- Gen.listOfN(n, attrGen)
    } yield ks.indices.map(i => (ks(i), i.toLong, ts(i), ps(i), ss(i)))
    val prop = Prop.forAll(genCase) { rows =>
      rows.isEmpty || {
        val df = rows.map { case (k, id, t, p, st) => (k, id, d(t), p, st) }
          .toDF("k", "id", "t", "p", "st")
        val got = graft.operators.Relational
          .scd2History(df, "k", "t", "id", Seq("p", "st"))
          .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("version"),
            Option(r.getAs[String]("p")), Option(r.getAs[String]("st")),
            r.getAs[Timestamp]("valid_from"), Option(r.getAs[Timestamp]("valid_to")),
            r.getAs[Long]("n_orders"))).toSet
        // independent reference: per key, sort by (time, id), fold runs of
        // equal (p, st) — Option equality IS the null-safe compare — then
        // link valid_to = next run's first time
        val expect = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
          val sorted = rs.sortBy(r => (r._3, r._2))
          val runs = sorted.foldLeft(Vector.empty[((Option[String], Option[String]), Vector[Long])]) {
            case (acc, (_, _, t, p, st)) =>
              if (acc.nonEmpty && acc.last._1 == ((p, st)))
                acc.init :+ (acc.last._1, acc.last._2 :+ t)
              else acc :+ (((p, st)), Vector(t))
          }
          runs.zipWithIndex.map { case (((p, st), times), i) =>
            val next = if (i + 1 < runs.size) Some(d(runs(i + 1)._2.head)) else None
            (k, (i + 1).toLong, p, st, d(times.head), next, times.size.toLong)
          }
        }.toSet
        got == expect
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("scd2Apply: extend, close, new-key and untouched-key branches") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    val before = Seq(
      (1L, 1L, d(1), "A", "O"), (1L, 2L, d(2), "A", "O"), // key 1 open (A,O) n=2
      (2L, 3L, d(1), "B", "F"),                           // key 2 open (B,F)
      (3L, 4L, d(1), "C", "O"))                           // key 3: untouched
      .toDF("k", "id", "t", "p", "st")
    val delta = Seq(
      (1L, 10L, d(5), "A", "O"), (1L, 11L, d(6), "B", "O"), // extend then flip
      (2L, 12L, d(5), "X", "F"),                            // immediate close
      (9L, 13L, d(5), "N", "N"))                            // brand-new key
      .toDF("k", "id", "t", "p", "st")
    val existing = graft.operators.Relational
      .scd2History(before, "k", "t", "id", Seq("p", "st"))
    val got = graft.operators.Relational
      .scd2Apply(existing, delta, "k", "t", "id", Seq("p", "st"))
      .orderBy("k", "version")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("version"),
        r.getAs[String]("p"), r.getAs[Timestamp]("valid_from"),
        Option(r.getAs[Timestamp]("valid_to")), r.getAs[Long]("n_orders")))
    assert(got.toSeq == Seq(
      (1L, 1L, "A", d(1), Some(d(6)), 3L), // merged: 2 existing + 1 delta
      (1L, 2L, "B", d(6), None, 1L),       // renumbered delta segment
      (2L, 1L, "B", d(1), Some(d(5)), 1L), // closed at the delta boundary
      (2L, 2L, "X", d(5), None, 1L),
      (3L, 1L, "C", d(1), None, 1L),       // untouched: still open
      (9L, 1L, "N", d(5), None, 1L)))      // new key: batch-local history
  }

  test("scd2Apply: equals the full rebuild on random NULL-heavy histories") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    val attrGen = Gen.oneOf(Option.empty[String], Some("A"), Some("B"))
    val genCase = for {
      n <- Gen.choose(0, 14)
      ks <- Gen.listOfN(n, Gen.choose(1L, 3L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 6L))
      ps <- Gen.listOfN(n, attrGen)
      ss <- Gen.listOfN(n, attrGen)
    } yield ks.indices.map(i => (ks(i), i.toLong, ts(i), ps(i), ss(i)))
    val prop = Prop.forAll(genCase) { rows =>
      // global time-threshold split satisfies the per-key monotone contract;
      // degenerate splits (empty existing or empty delta side) are skipped —
      // scd2History over an empty frame is not the operator's input contract
      val existing = rows.filter(_._3 < 3); val delta = rows.filter(_._3 >= 3)
      existing.isEmpty || delta.isEmpty || {
        def df(rs: Seq[(Long, Long, Long, Option[String], Option[String])]) =
          rs.map { case (k, id, t, p, st) => (k, id, d(t), p, st) }
            .toDF("k", "id", "t", "p", "st")
        def canon(x: org.apache.spark.sql.DataFrame) =
          x.collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("version"),
            Option(r.getAs[String]("p")), Option(r.getAs[String]("st")),
            r.getAs[Timestamp]("valid_from"), Option(r.getAs[Timestamp]("valid_to")),
            r.getAs[Long]("n_orders"))).toSet
        val applied = graft.operators.Relational.scd2Apply(
          graft.operators.Relational.scd2History(df(existing), "k", "t", "id", Seq("p", "st")),
          df(delta), "k", "t", "id", Seq("p", "st"))
        val full = graft.operators.Relational
          .scd2History(df(rows), "k", "t", "id", Seq("p", "st"))
        canon(applied) == canon(full)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("scd2Apply: EQUAL-timestamp boundary (delta tieBreaks above existing) equals rebuild") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    // existing ends at t=3 (ids 1,2 value A); the delta arrives AT t=3 with
    // HIGHER tieBreaks (ids 5,6 value B) and continues at t=4 — the exact
    // boundary the contract permits: (time, tieBreak) ordering still places
    // every delta row after every existing row
    val existing = Seq((1L, 1L, d(2), "A", "O"), (1L, 2L, d(3), "A", "O"))
      .toDF("k", "id", "t", "p", "st")
    val delta = Seq((1L, 5L, d(3), "B", "O"), (1L, 6L, d(3), "B", "O"),
      (1L, 7L, d(4), "A", "F")).toDF("k", "id", "t", "p", "st")
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("version"),
        r.getAs[String]("p"), r.getAs[String]("st"),
        r.getAs[Timestamp]("valid_from"), Option(r.getAs[Timestamp]("valid_to")),
        r.getAs[Long]("n_orders"))).toSet
    val applied = graft.operators.Relational.scd2Apply(
      graft.operators.Relational.scd2History(existing, "k", "t", "id", Seq("p", "st")),
      delta, "k", "t", "id", Seq("p", "st"))
    val full = graft.operators.Relational.scd2History(
      existing.unionByName(delta), "k", "t", "id", Seq("p", "st"))
    assert(canon(applied) == canon(full))
    // the closed A segment's valid_to is the SAME date the B segment opens
    assert(canon(applied).exists(s => s._3 == "A" && s._6.contains(d(3))))
  }

  test("scd2Repair: backdated mid-run split equals the full rebuild; untouched keys pass through") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    // key 1: one long A run (t=1..5); a BACKDATED B observation lands at
    // t=3 and must SPLIT it into A[1,3) B[3,4) A[4,_) — the interior case
    // scd2Apply cannot express. Key 2 is untouched.
    val onTime = Seq(
      (1L, 1L, d(1), "A", "O"), (1L, 2L, d(2), "A", "O"),
      (1L, 4L, d(4), "A", "O"), (1L, 5L, d(5), "A", "O"),
      (2L, 10L, d(1), "X", "O"), (2L, 11L, d(2), "X", "O"))
      .toDF("k", "id", "t", "p", "st")
    val late = Seq((1L, 3L, d(3), "B", "O")).toDF("k", "id", "t", "p", "st")
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("version"),
        r.getAs[String]("p"),
        r.getAs[Timestamp]("valid_from"), Option(r.getAs[Timestamp]("valid_to")),
        r.getAs[Long]("n_orders"))).toSet
    val existing = graft.operators.Relational
      .scd2History(onTime, "k", "t", "id", Seq("p", "st"))
    val repaired = graft.operators.Relational
      .scd2Repair(existing, onTime, late, "k", "t", "id", Seq("p", "st"))
    val full = graft.operators.Relational.scd2History(
      onTime.unionByName(late), "k", "t", "id", Seq("p", "st"))
    assert(canon(repaired) == canon(full))
    // the split is real: key 1 now has THREE segments, A/B/A
    assert(canon(repaired).count(_._1 == 1L) == 3)
  }

  test("scd2Repair: equals the full rebuild on random out-of-order late batches") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    val attrGen = Gen.oneOf(Option.empty[String], Some("A"), Some("B"))
    val genCase = for {
      n <- Gen.choose(1, 14)
      ks <- Gen.listOfN(n, Gen.choose(1L, 3L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 6L))
      ps <- Gen.listOfN(n, attrGen)
      ss <- Gen.listOfN(n, attrGen)
      lateMod <- Gen.choose(2, 4)
    } yield (ks.indices.map(i => (ks(i), i.toLong, ts(i), ps(i), ss(i))), lateMod)
    val prop = Prop.forAll(genCase) { case (rows, lateMod) =>
      // the late set is chosen by ID, not time — backdated rows land
      // ANYWHERE in each key's timeline (the contract scd2Apply excludes)
      val late = rows.filter(_._2 % lateMod == 0)
      val onTime = rows.filter(_._2 % lateMod != 0)
      onTime.isEmpty || late.isEmpty || {
        def df(rs: Seq[(Long, Long, Long, Option[String], Option[String])]) =
          rs.map { case (k, id, t, p, st) => (k, id, d(t), p, st) }
            .toDF("k", "id", "t", "p", "st")
        def canon(x: org.apache.spark.sql.DataFrame) =
          x.collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("version"),
            Option(r.getAs[String]("p")), Option(r.getAs[String]("st")),
            r.getAs[Timestamp]("valid_from"), Option(r.getAs[Timestamp]("valid_to")),
            r.getAs[Long]("n_orders"))).toSet
        val repaired = graft.operators.Relational.scd2Repair(
          graft.operators.Relational.scd2History(df(onTime), "k", "t", "id", Seq("p", "st")),
          df(onTime), df(late), "k", "t", "id", Seq("p", "st"))
        val full = graft.operators.Relational
          .scd2History(df(rows), "k", "t", "id", Seq("p", "st"))
        canon(repaired) == canon(full)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("scd2History multi-attr plan: every exchange hashes on the key") {
    import java.sql.Timestamp
    def d(n: Long) = new Timestamp(n * 86400000L)
    val rows = Seq((1L, 1L, d(1), "A", "O"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "p", "st")
    val plan = graft.operators.Relational
      .scd2History(rows, "o_custkey", "o_orderdate", "o_orderkey", Seq("p", "st"))
      .queryExecution.executedPlan.toString
    val parts = "hashpartitioning\\(([a-z_#0-9L]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(parts.nonEmpty && parts.forall(_.startsWith("o_custkey")), plan)
  }
}
