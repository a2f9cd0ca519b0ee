package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pair rows whose numeric ordinates lie within a fixed
  * window of each other, optionally per key — `|t_left - t_right| <= w`.
  *
  * A naive inequality join is a nested-loop (O(n²) comparisons, and Spark
  * plans it as BroadcastNestedLoopJoin or a cartesian product — both
  * non-starters at 100 TB). Bucketing each side by `floor(t / w)` and
  * equi-joining on (key, bucket) with the LEFT side exploded to its three
  * candidate buckets {b-1, b, b+1} turns it into a hash/sort-merge shuffle
  * join whose cost is O(matches + input), then a cheap residual filter
  * applies the exact band. The same shape Spark itself uses for interval
  * joins in AQE-era engines and streaming interval joins.
  */
object RangeJoin {

  /** `left`/`right` must both have the columns in `keys` plus `tCol`;
    * output is every (left row, right row) pair with equal keys and
    * |left.tCol - right.tCol| <= window. Column name collisions are the
    * caller's to resolve (alias before calling). `window` > 0. */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            tCol: String, window: Long,
            leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    require(window > 0, s"range-join window must be positive, got $window")
    val lren = left.columns.foldLeft(left) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, leftPrefix + c) }
    val rren = right.columns.foldLeft(right) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, rightPrefix + c) }
    val lt = col(leftPrefix + tCol)
    val rt = col(rightPrefix + tCol)
    // integer floor-division to the band width (epoch-ns ordinates exceed
    // double's 2^53 exact range, so `div`, not floor(x / w); non-negative
    // ordinates assumed); explode left to adjacent buckets so every
    // in-band pair shares at least one (key, bucket) coordinate
    val lbkt = expr(s"`$leftPrefix$tCol` div ${window}L")
    val lb = lren.withColumn("_bucket",
      explode(array(lbkt - 1, lbkt, lbkt + 1)))
    val rb = rren.withColumn("_bucket", expr(s"`$rightPrefix$tCol` div ${window}L"))
    lb.join(rb, keys :+ "_bucket")
      .where(abs(lt - rt) <= window)
      .drop("_bucket")
  }
}
