package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: pair rows whose [start, end] intervals intersect,
  * per key — `l.start <= r.end && r.start <= l.end` with VARIABLE interval
  * lengths (the fixed-width case is [[RangeJoin]]'s band).
  *
  * A raw inequality pair predicate plans as a nested-loop / cartesian —
  * a non-starter at 100 TB. Instead each side explodes its interval onto
  * the `bucket`-wide grid cells it covers (`sequence(start div w, end div
  * w)`), the join is a plain (key, cell) equi-join AQE can re-plan, the
  * exact overlap predicate runs as a residual filter, and duplicate pair
  * emissions (two intervals can share many cells) are eliminated WITHOUT a
  * distinct-shuffle: a pair is kept only in the canonical cell — the one
  * containing `greatest(l.start, r.start)` — so every overlapping pair
  * surfaces exactly once. Shuffle volume is O(rows · span/bucket); size
  * `bucket` near the median interval length.
  *
  * Fan-out is data-dependent, so it is CAPPED, not open-ended: intervals
  * spanning more than `maxSpanBuckets` grid cells are EXCLUDED from the
  * join (explicit, deterministic semantics — the LshBlocking.cappedBands
  * rule) and reportable via [[droppedIntervals]]; no silent caps.
  */
object IntervalJoin {

  private def spanOk(pfx: String, s: String, e: String, bucket: Long, cap: Int) =
    expr(s"(`$pfx$e` div ${bucket}L) - (`$pfx$s` div ${bucket}L)") < cap

  /** `left`/`right` must both have `keys` plus `startCol`/`endCol`
    * (non-negative longs, end >= start). Output: every overlapping
    * (left, right) pair with equal keys, each exactly once. Column name
    * collisions are the caller's to resolve via the prefixes. */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            startCol: String, endCol: String, bucket: Long,
            maxSpanBuckets: Int = 4096,
            leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    val lren = left.columns.foldLeft(left) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, leftPrefix + c) }
    val rren = right.columns.foldLeft(right) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, rightPrefix + c) }
    def cells(d: DataFrame, pfx: String) = d
      .where(spanOk(pfx, startCol, endCol, bucket, maxSpanBuckets))
      .withColumn("_cell", explode(sequence(
        expr(s"`$pfx$startCol` div ${bucket}L"),
        expr(s"`$pfx$endCol` div ${bucket}L"))))
    val ls = col(leftPrefix + startCol)
    val le = col(leftPrefix + endCol)
    val rs = col(rightPrefix + startCol)
    val re = col(rightPrefix + endCol)
    cells(lren, leftPrefix).join(cells(rren, rightPrefix), keys :+ "_cell")
      .where(ls <= re && rs <= le)
      .where(col("_cell") === expr(
        s"greatest(`$leftPrefix$startCol`, `$rightPrefix$startCol`) div ${bucket}L"))
      .drop("_cell")
  }

  /** The rows a given cap excludes from [[apply]]'s join, per side — count
    * or collect this next to a capped run (no silent caps). */
  def droppedIntervals(side: DataFrame, startCol: String, endCol: String,
                       bucket: Long, maxSpanBuckets: Int): DataFrame =
    side.where(!spanOk("", startCol, endCol, bucket, maxSpanBuckets))
}
