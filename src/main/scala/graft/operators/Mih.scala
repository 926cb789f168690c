package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared multi-index-hashing (MIH) chunk geometry for the 64-bit signature
  * self-join families — simhash over documents ([[DedupOps]]) and phash over
  * media assets ([[MultimodalOps]]). Both split the signature into
  * [[ChunkCount]] × [[ChunkBits]]-bit chunks (pigeonhole: any pair within
  * Hamming radius ≤ ChunkCount−1 agrees on ≥1 chunk, and the radius-r
  * variant enumeration extends that to larger radii), so the chunk layout
  * and the first-matching-chunk dedup predicate MUST stay in lockstep —
  * one shared definition instead of two hard-coded copies (ADVICE r16).
  */
object Mih {

  /** Number of signature chunks (index tables). */
  val ChunkCount = 4

  /** Bits per chunk: ChunkCount × ChunkBits = 64, the signature width. */
  val ChunkBits = 16

  private val ChunkMask = (1L << ChunkBits) - 1

  /** Chunk `c` of a 64-bit signature column, as an unsigned [[ChunkBits]]-bit
    * long. */
  def chunk(sig: Column, c: Int): Column =
    shiftrightunsigned(sig, c * ChunkBits).bitwiseAND(lit(ChunkMask))

  /** `array(struct(c, ch), …)` over all chunks of `sig` — the explode input
    * that fans one signature row into its ChunkCount index postings. */
  def chunkStructs(sig: Column): Column =
    array((0 until ChunkCount).map(c =>
      struct(lit(c).as("c"), chunk(sig, c).as("ch"))): _*)

  /** FIRST-MATCHING-CHUNK dedup (standard MIH duplicate elimination): a
    * candidate (x, y) surfaced via chunk `x.c` is kept only when NO earlier
    * chunk also matched within `radius` — both signatures are in the joined
    * row, so "would chunk c' have produced this pair?" is per-row
    * arithmetic. A pair matching in k chunks previously emitted k verified
    * rows into a corpus-sized `.distinct()` exchange; under ScaleUp clique
    * geometry that shuffle carries 2–4× the verified pair mass — the r15
    * sf10 media wall. With this predicate each pair exits the join exactly
    * once and the distinct disappears from the plan.
    *
    * Expects the join aliases `x`/`y`, the chunk ordinal in `x.c`, and the
    * signature under `sigCol` on both sides.
    */
  def firstMatchingChunk(sigCol: String, radius: Int): Column = {
    val xor = col(s"x.$sigCol").bitwiseXOR(col(s"y.$sigCol"))
    (0 until ChunkCount - 1).map(cp =>
      col("x.c") <= cp ||
        bit_count(shiftrightunsigned(xor, cp * ChunkBits).bitwiseAND(lit(ChunkMask))) > radius)
      .reduce(_ && _)
  }
}
