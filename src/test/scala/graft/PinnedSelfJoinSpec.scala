package graft

import org.scalatest.funsuite.AnyFunSuite

/** The EXCHANGE-REUSE invariant (VERDICT r15 item 6), as a plan assertion.
  *
  * Spark does not reuse an exchange across the two branches of a
  * self-join: an un-pinned signature projection (gram explode + hash +
  * sketch aggregate over the whole corpus) is recomputed on BOTH sides —
  * a second full corpus pass for zero benefit. This trap has bitten three
  * rounds running (media r14, q66 + q101 r15), each time costing a
  * super-linear bench flag before being found by measurement. The rule:
  * **any self-join over a computed signature pins the signature**
  * (localCheckpoint — at-rest size is rows × a few longs: always
  * pinnable).
  *
  * The assertion: a PINNED signature is computed at DataFrame-construction
  * time and enters the plan as a LogicalRDD scan, so the signature
  * expression's prettyName must appear ZERO times in the optimized plan of
  * every declared signature-self-join query. Removing a pin makes the
  * marker reappear (twice) and fails the spec — the fourth occurrence of
  * the trap is now a red test, not a bench regression.
  */
class PinnedSelfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** query -> the signature expression that must NOT appear in its plan
    * (it should have been executed once, under the pin). */
  private val pinned: Seq[(String, String)] = Seq(
    "q66_sim_join_lsh"          -> "graft_lsh_codes",    // SimilarityOps.lshSimilarPairs
    "q101_vocab_overlap_sketch" -> "graft_minhash_perm", // TextOps.vocabOverlapSketch
    "q122_media_neardup"        -> "graft_simhash",      // MultimodalOps.mediaNearDupPairs
    "q127_media_neardup_h7"     -> "graft_simhash",
    "q125_media_vs_index"       -> "graft_simhash",      // batch sigs pinned; index at rest
    "q126_media_lsh_recall"     -> "graft_simhash",
    "q128_media_dedup_reps"     -> "graft_simhash")

  for ((name, marker) <- pinned)
    test(s"$name: signature '$marker' is pinned out of the lazy plan") {
      val df = SparkEntry.queries(name)(spark, TestSpark.sf)
      val plan = df.queryExecution.optimizedPlan.toString.toLowerCase
      val hits = marker.r.findAllIn(plan).size
      assert(hits == 0,
        s"$name recomputes '$marker' $hits time(s) in its lazy plan — the " +
          "signature self-join lost its localCheckpoint pin (exchange-reuse " +
          "trap, VERDICT r15 item 6)")
    }

  test("q52_simhash (radius 0) keeps its single-subtree unpinned plan") {
    // the COUNTEREXAMPLE leg: radius-0 simhash pairs join chunk rows from
    // ONE subtree (no enumerated side), so the sketch legitimately appears
    // in the lazy plan — exactly once per self-join branch is expected and
    // cheap there because the broadcast plan shares the scan. This leg
    // pins the spec's meaning: the invariant is about PINNED queries, not
    // a blanket ban on the expression.
    val plan = SparkEntry.queries("q52_simhash")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert("graft_simhash".r.findAllIn(plan).nonEmpty)
  }
}
