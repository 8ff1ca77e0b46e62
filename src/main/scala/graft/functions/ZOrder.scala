package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding as pure Column arithmetic — stays
  * inside whole-stage codegen, no UDF. Interleaving the bits of two
  * scaled dimensions gives a 1-D sort key whose contiguous ranges are
  * 2-D-local: sorting a table by it clusters BOTH columns at once, so
  * per-file min/max footers prune scans filtered on either dimension.
  * This is the standard multi-dimensional data-layout technique for
  * large scans (Delta/Iceberg expose the same idea as OPTIMIZE
  * ZORDER); here it is a plain write-time transform on the sink.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * x supplies odd bit positions, y even. */
  def interleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Z-value of two numeric columns scaled into [0, 2^bits) by their
    * global [min, max] ranges (passed in — one bounded aggregate at the
    * call site, never recomputed per row beyond the scale constants). */
  def zValue(x: Column, xMin: Double, xMax: Double,
             y: Column, yMin: Double, yMax: Double, bits: Int = 16): Column = {
    interleave(scale(x, xMin, xMax, bits), scale(y, yMin, yMax, bits), bits)
  }

  /** Hilbert index of two numeric columns under the same scaling
    * contract as [[zValue]]. Same write-time cost (one codegen'd
    * kernel per row, [[graft.functions.HilbertIndex]]); strictly
    * better read-time locality — the curve never teleports, so a 2-D
    * predicate box maps to fewer, longer runs of the 1-D sort key
    * than Morton order (ZOrderSpec measures the file-footer overlap
    * of both layouts on the same box). */
  def hilbertValue(x: Column, xMin: Double, xMax: Double,
                   y: Column, yMin: Double, yMax: Double, bits: Int = 16): Column =
    F.hilbertIndex(scale(x, xMin, xMax, bits), scale(y, yMin, yMax, bits), bits)

  private def scale(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cap = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(cap), floor((c.cast("double") - lit(lo)) / lit(hi - lo) * cap).cast("long"))
  }
}
