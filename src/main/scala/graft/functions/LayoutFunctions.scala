package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout functions: space-filling-curve keys for multi-dimensional
  * clustering. Sorting (or range-partitioning) a 100 TB table by a Z-value
  * over its two hottest filter columns gives file-level min/max zone maps
  * locality in BOTH dimensions at once — the classic lakehouse trick for
  * making `WHERE x BETWEEN ... AND y BETWEEN ...` prune files when neither
  * column alone is selective enough. The key computation itself is a
  * stateless row-local map; the one shuffle is the final range
  * repartition, which replaces the shuffle a one-column sort would spend
  * anyway.
  */
object LayoutFunctions {

  /** Morton (Z-order) value of two non-negative ints: interleaves the low
    * `bits` bits, x on even positions and y on odd. Pure exact integer
    * arithmetic (powers of two up to 2^(2·bits−1) — keep bits <= 20 so
    * every intermediate stays double-exact inside the fold), identical in
    * any engine with integer division. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 20, "bits must be in [1, 20]")
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) => {
      val p = pow(lit(2.0), i).cast("long")
      acc + (x.cast("long").divide(p).cast("long") % 2L) * (p * p) +
        (y.cast("long").divide(p).cast("long") % 2L) * (p * p * 2L)
    })
  }
}
