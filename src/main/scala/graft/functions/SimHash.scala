package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 64-bit SimHash over hashed tokens/shingles, plus Hamming distance —
  * no shuffle, no UDF. The signature itself is the codegen-adjacent
  * native expression [[graft.functions.expr.SimHash64]] (one tight loop
  * per row); the original HOF fold stays as [[simhash64Hof]] for the
  * bit-equality pin in DedupSpec.
  */
object SimHash {

  /** SimHash of an array<long> of feature hashes: for each of the 64 bits,
    * sum +1/-1 across features by bit value; the sign vector is the hash.
    * Returned as a signed 64-bit long. */
  def simhash64(hashed: Column): Column =
    graft.functions.expr.SimHash64(hashed)

  /** The HOF formulation simhash64 replaced — O(features × 64) interpreted
    * dispatches per row, ~4 s of the sf0.1 d3 pass. Kept (test scope) so
    * the native loop stays pinned bit-identical to the declarative
    * definition. */
  private[graft] def simhash64Hof(hashed: Column): Column = {
    // counters[i] += (feature >> i) & 1 == 1 ? 1 : -1, one pass over
    // features; bit positions unrolled statically (shiftright needs a
    // literal shift amount).
    val counters = aggregate(
      hashed,
      array_repeat(lit(0), 64),
      (acc, h) =>
        array((0 until 64).map { i =>
          element_at(acc, i + 1) +
            when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1)
        }: _*))
    // bits → long via OR of 2^i for positive counters (bit 63 is the sign
    // bit: 1L << 63 wraps to Long.MinValue, i.e. two's complement).
    val powers = typedLit((0 until 64).map(i => 1L << i))
    aggregate(
      zip_with(counters, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two simhashes (popcount of xor). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Band key for bucketed near-dup search: the i-th 16-bit chunk. Docs
    * within Hamming distance 3 share at least one of 4 chunks exactly
    * (pigeonhole), so a 4-band bucket join finds all close pairs without a
    * cross join. */
  def band16(h: Column, i: Int): Column =
    shiftright(h, i * 16).bitwiseAND(0xFFFFL)
}
