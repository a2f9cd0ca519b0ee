package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 1-D linear interpolation: the tabular form of the reference's
  * `interp1d` (/root/reference/imops/interp1d.py:14-207,
  * /root/reference/imops/src/_zoom.pyx:30-120).
  *
  * The function grid (xs, ys) is turned into half-open segments
  * [x0, x1) via `lead`, plus two open extrapolation segments carrying the
  * first/last two-point slopes (pyx:65-93). Query points are then
  * broadcast-range-joined against the segments and lerped:
  * yq = y0 + (y1-y0) * (xq-x0)/(x1-x0).
  *
  * Scale notes: the grid is assumed small (it is one call argument in the
  * reference — an in-memory vector), so segments broadcast; queries can be
  * arbitrarily large (the 100 TB side) and the join is a broadcast hash/NL
  * join with no shuffle of the query side. For a huge grid, swap the
  * broadcast for a range-partitioned sort-merge join on xq.
  */
object Interp1dJoin {

  /** Returns `queries` with an extra `yqCol` column. Out-of-range behavior:
    * extrapolate=true → 2-point linear extrapolation, else `fillValue`. */
  def apply(grid: DataFrame, xCol: String, yCol: String,
            queries: DataFrame, xqCol: String, yqCol: String,
            extrapolate: Boolean = false, fillValue: Double = Double.NaN): DataFrame = {
    val base = grid.select(col(xCol).cast("double").as("x0"), col(yCol).cast("double").as("y0"))
    val w = Window.orderBy(col("x0")) // grid is small; single-partition window is fine
    val seg = base
      .withColumn("x1", lead(col("x0"), 1).over(w))
      .withColumn("y1", lead(col("y0"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    val interior = seg.where(col("x1").isNotNull)
      .withColumn("is_last", col("rn") === col("n") - 1)
      .select(col("x0"), col("y0"), col("x1"), col("y1"), col("is_last"))
    val first2 = seg.where(col("rn") <= 2)
    val last2 = seg.where(col("rn") >= col("n") - 1)
    // two rows (x,y) -> one (slope, bias); min/max over struct(rn, v) picks
    // the value at the smallest/largest rn deterministically
    val leftLine = first2.agg(
      ((max(struct(col("rn"), col("y0"))).getField("y0") - min(struct(col("rn"), col("y0"))).getField("y0")) /
        (max(struct(col("rn"), col("x0"))).getField("x0") - min(struct(col("rn"), col("x0"))).getField("x0"))).as("slope"),
      min(struct(col("rn"), col("x0"))).getField("x0").as("xa"),
      min(struct(col("rn"), col("y0"))).getField("y0").as("ya"))
      .select(col("slope"), (col("ya") - col("slope") * col("xa")).as("bias"))
    val rightLine = last2.agg(
      ((max(struct(col("rn"), col("y0"))).getField("y0") - min(struct(col("rn"), col("y0"))).getField("y0")) /
        (max(struct(col("rn"), col("x0"))).getField("x0") - min(struct(col("rn"), col("x0"))).getField("x0"))).as("slope"),
      max(struct(col("rn"), col("x0"))).getField("x0").as("xb"),
      max(struct(col("rn"), col("y0"))).getField("y0").as("yb"))
      .select(col("slope"), (col("yb") - col("slope") * col("xb")).as("bias"))
    val bounds = seg.agg(min(col("x0")).as("xmin"), max(col("x0")).as("xmax"))

    val xq = col(xqCol).cast("double")
    val joined = queries
      .join(broadcast(interior),
        xq >= col("x0") && (xq < col("x1") || (col("is_last") && xq <= col("x1"))), "left")
      .join(broadcast(bounds))
      .join(broadcast(leftLine.select(col("slope").as("lslope"), col("bias").as("lbias"))))
      .join(broadcast(rightLine.select(col("slope").as("rslope"), col("bias").as("rbias"))))
    val dd = (xq - col("x0")) / (col("x1") - col("x0"))
    val interp = col("y0") * (lit(1) - dd) + col("y1") * dd
    val res = when(col("x0").isNotNull, interp)
      .when(xq < col("xmin"), if (extrapolate) col("lslope") * xq + col("lbias") else lit(fillValue))
      .when(xq > col("xmax"), if (extrapolate) col("rslope") * xq + col("rbias") else lit(fillValue))
      .otherwise(lit(fillValue))
    joined.withColumn(yqCol, res)
      .select(queries.columns.map(col) :+ col(yqCol): _*)
  }
}
