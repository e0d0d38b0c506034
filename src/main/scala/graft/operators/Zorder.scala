package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two quantized
  * dimensions so that sorting by ONE integer co-locates rows that are
  * close in BOTH — the multi-column data-skipping layout (Delta/Iceberg
  * `ZORDER BY`) that single-column sorting cannot give. Rows clustered
  * by z-value land in files whose per-column min/max ranges are tight
  * RECTANGLES in (x, y) space, so a predicate on either dimension (or
  * both) prunes files at listing time — the lever that turns a 100 TB
  * scan with a two-column filter into a few-file read.
  *
  * Everything is integer bit arithmetic on BIGINT (codegen'd in Spark,
  * bit-identical in any SQL engine), so z-values themselves are
  * oracle-checkable. */
object Zorder {

  /** Morton interleave of two `bits`-bit non-negative longs: bit `b`
    * of `x` lands at position `2b`, bit `b` of `y` at `2b+1`. The
    * caller quantizes/clamps each dimension into `[0, 2^bits)`. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftrightunsigned(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** Clamp a long column into the `[0, 2^bits)` quantization domain. */
  def clampBits(c: Column, bits: Int = 16): Column =
    greatest(lit(0L), least(c, lit((1L << bits) - 1)))

  /** Range-partition + sort rows by their z-value — the physical
    * clustering pass before a write. The z column is dropped from the
    * result; its ordering survives in the row layout. */
  def clusterBy(df: DataFrame, z: Column, partitions: Int): DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
