package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.kernels.Interp2dKernel

/** Distributed form of the reference's `Linear2DInterpolator`
  * (/root/reference/imops/interp2d.py:12-121): the sample set is one call
  * argument in the reference (an in-memory array), so it is collected,
  * triangulated once, and broadcast; the query side — the 100 TB side —
  * is a narrow per-row map with no shuffle.
  */
object ScatteredInterp {

  /** Hard cap on the collected sample-point set: the triangulation is a
    * driver-side build (mirroring the reference, where the sample set is an
    * in-memory call argument). Beyond this, the operator would silently
    * become a driver bottleneck — fail fast instead of OOMing an executor
    * fleet's driver. */
  val MaxDriverPoints: Int = 2000000

  /** Adds `outCol` = linear interpolation of (xCol,yCol) over the sampled
    * surface; `fill` outside the convex hull. */
  def apply(points: DataFrame, pxCol: String, pyCol: String, pvCol: String,
            queries: DataFrame, qxCol: String, qyCol: String, outCol: String,
            fill: Double): DataFrame = {
    // guard folded into the collect itself (take N+1, check length): one
    // job instead of a separate limit-probe count per call, still no full
    // scan of an oversized table
    val rows = points.select(col(pxCol).cast("double"), col(pyCol).cast("double"),
      col(pvCol).cast("double")).limit(MaxDriverPoints + 1).collect()
    require(rows.length <= MaxDriverPoints,
      s"ScatteredInterp collects the sample points to the driver; got more than " +
        s"$MaxDriverPoints rows — pre-aggregate the surface or use " +
        "TiledScatteredInterp (per-tile executor triangulation, no driver cap)")
    val px = rows.map(_.getDouble(0))
    val py = rows.map(_.getDouble(1))
    val pv = rows.map(_.getDouble(2))
    val tr = Interp2dKernel.triangulate(px, py)
    val grid = Interp2dKernel.buildGrid(tr)
    val sc = points.sparkSession.sparkContext
    val bcTr = sc.broadcast(tr)
    val bcGrid = sc.broadcast(grid)
    val bcV = sc.broadcast(pv)
    val u = udf { (x: Double, y: Double) =>
      Interp2dKernel.interpolateFast(bcTr.value, bcGrid.value, bcV.value, x, y, fill)
    }
    queries.withColumn(outCol, u(col(qxCol).cast("double"), col(qyCol).cast("double")))
  }
}
