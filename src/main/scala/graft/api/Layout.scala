package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout primitives — multi-dimensional clustering keys for
  * write-time organization (the lakehouse data-skipping toolkit).
  *
  * A table sorted on ONE key prunes scans only on that key's predicates;
  * a Z-ORDER (Morton) layout interleaves the bits of several bucketed
  * dimensions so that range-partitioning on the interleaved value keeps
  * every partition's bounding box narrow in EVERY dimension — file-level
  * min/max zone maps then skip files for predicates on any participating
  * column (Morton 1966; the technique behind Delta/Iceberg Z-ordering).
  *
  * Everything here is codegen'd integer bit arithmetic — per-row work,
  * no shuffle; the one shuffle of a Z-order rewrite is the
  * `repartitionByRange(n, zValue)` that physically clusters the data
  * before the sink. The DuckDB oracle replays the identical bits.
  */
object Layout {

  /** Map `v` into one of `buckets` equal-width integer buckets of
    * [mn, mx] — ((v − mn) · buckets) div (mx − mn + 1), integer-exact in
    * both engines. The pmod form is a pure-Column integer division: the
    * numerator is reduced to an exact multiple of the width first, so
    * the double division is exact (both operands < 2^53). Degenerate
    * ranges (mx = mn) land everything in bucket 0. */
  def rangeBucket(v: Column, mn: Column, mx: Column, buckets: Int): Column = {
    val num = (v - mn) * buckets
    val w = mx - mn + lit(1L)
    ((num - pmod(num, w)) / w).cast("long")
  }

  /** DuckDB fragment matching [[rangeBucket]]. */
  def rangeBucketSql(v: String, mn: String, mx: String, buckets: Int): String =
    s"(($v - $mn) * $buckets) // ($mx - $mn + 1)"

  /** Z-order (Morton) value of two `bits`-bit bucket columns: bit i of
    * `b1` lands at position 2i+1 and bit i of `b2` at position 2i, so
    * nearby (b1, b2) cells share z-value prefixes. 16 codegen'd
    * shift/mask terms for the default bits = 8 — constant per-row work. */
  def zValue(b1: Column, b2: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** DuckDB fragment matching [[zValue]]. */
  def zValueSql(b1: String, b2: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"(((($b1) >> $i) & 1) << ${2 * i + 1}) + (((($b2) >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")
}
