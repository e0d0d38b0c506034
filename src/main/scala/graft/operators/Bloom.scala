package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom filter over portable md5 hashes.
  *
  * The scale story of sketch-based membership: the probe side (e.g. a
  * benchmark's n-grams during decontamination) is compressed into an
  * `m`-bit array that ships to every executor as ONE literal — the
  * corpus is scanned once, never shuffled, and membership is k codegen
  * bit-tests per row (no join, no HOF lambda). False positives are
  * possible by design (and measurable against the exact join — q93);
  * false negatives are not.
  *
  * Hashing is the portable double-hashing family `(h1 + i·h2) mod m`
  * over the repo's 60-bit md5 hashes, so an oracle can replay the
  * EXACT bit positions: the bitset is semantically the set of inserted
  * positions, and `mightContain(g) ⟺ every position of g ∈ that set`
  * — expressible as plain SQL joins (no bit arithmetic needed on the
  * oracle side).
  *
  * Overflow-safe: h1, h2 < 2^60 and i ≤ k−1 (small), so h1 + i·h2 fits
  * a long for k ≤ 7.
  */
object Bloom {

  /** The k bit positions of one value, as an array column. */
  def positionsArray(h1: Column, h2: Column, k: Int, m: Int): Column =
    array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % m): _*)

  /** Materialize the bitset words on the driver. The collect is bounded
    * BY CONTRACT: positions are distinct values in [0, m), so at most
    * m rows (m/8 bytes of filter — e.g. 8 KiB at m = 2^16) ever reach
    * the driver, exactly the artifact a Bloom build must centralize
    * before broadcasting (Spark's own `DataFrameStatFunctions
    * .bloomFilter` aggregates the same way). */
  def bitsetWords(positionRows: DataFrame, posCol: String,
      m: Int): Array[Long] = {
    require(m % 64 == 0, s"m must be a multiple of 64, got $m")
    val words = new Array[Long](m / 64)
    positionRows.select(col(posCol)).distinct().collect().foreach { r =>
      val p = r.getLong(0)
      words((p / 64).toInt) |= 1L << (p % 64).toInt
    }
    words
  }

  /** Membership test: all k positions of `(h1, h2)` are set in `words`.
    * Pure codegen built-ins — element_at on the literal word array +
    * variable-distance shiftright — so the corpus-side scan stays
    * inside whole-stage codegen. */
  def mightContain(words: Array[Long], h1: Column, h2: Column, k: Int,
      m: Int): Column = {
    val bits = typedlit(words.toSeq)
    def bitSet(p: Column): Column =
      call_function("shiftright",
        element_at(bits, (p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    (0 until k)
      .map(i => bitSet((h1 + lit(i.toLong) * h2) % m))
      .reduce(_ && _)
  }
}
