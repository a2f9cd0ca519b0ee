package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernels.Interp2dKernel

/** Tiled form of [[ScatteredInterp]] for sample sets past the driver
  * triangulation cap (`ScatteredInterp.MaxDriverPoints`): the plane is cut
  * into `tileSize`-square tiles, every sample point is replicated to each
  * tile whose halo-expanded box contains it, and each tile triangulates its
  * local point set in an executor — no driver collect, no broadcast of a
  * global triangulation, so the sample set can be arbitrarily large.
  *
  * Shuffle shape (the 100 TB story): points shuffle once by tile key with a
  * bounded replication factor of `(1 + 2·halo/tileSize)²`; queries shuffle
  * once to their owning tile; one cogroup computes every tile
  * independently; a final narrow join returns values to the query rows.
  *
  * Seam contract: linear interpolation at a query is identical to the
  * global-triangulation answer whenever the containing Delaunay triangle's
  * circumcircle is empty in the GLOBAL point set — guaranteed when `halo`
  * exceeds the circumradius of every triangle touching the tile (all
  * circumcircle witnesses are then present locally). `halo` is therefore
  * the accuracy-vs-replication dial, the tiled analog of
  * ScatteredInterp's exactness; TiledScatteredInterpSpec cross-checks
  * tile/global agreement away from hull-boundary ties, and the
  * q_interp2d_tiled gate holds the tiled plan to the same global-Delaunay
  * DuckDB oracle as q_interp2d. Reference: Linear2DInterpolator
  * (/root/reference/imops/interp2d.py:12-121) — single-machine there, so
  * the tiling itself has no reference analog.
  */
object TiledScatteredInterp {

  def apply(points: DataFrame, pxCol: String, pyCol: String, pvCol: String,
            queries: DataFrame, qIdCol: String, qxCol: String, qyCol: String,
            outCol: String, fill: Double, tileSize: Double, halo: Double)
           (implicit spark: SparkSession): DataFrame = {
    require(tileSize > 0 && halo >= 0, "tileSize must be > 0 and halo >= 0")
    import spark.implicits._
    val pts = points.select(col(pxCol).cast("double"), col(pyCol).cast("double"),
      col(pvCol).cast("double")).as[(Double, Double, Double)]
    val tiledPts = pts.flatMap { case (x, y, v) =>
      val tx0 = math.floor((x - halo) / tileSize).toLong
      val tx1 = math.floor((x + halo) / tileSize).toLong
      val ty0 = math.floor((y - halo) / tileSize).toLong
      val ty1 = math.floor((y + halo) / tileSize).toLong
      for (tx <- tx0 to tx1; ty <- ty0 to ty1) yield (tx, ty, x, y, v)
    }
    val tiledQs = queries.select(col(qIdCol).cast("long"), col(qxCol).cast("double"),
      col(qyCol).cast("double")).as[(Long, Double, Double)]
      .map { case (id, x, y) =>
        (math.floor(x / tileSize).toLong, math.floor(y / tileSize).toLong, id, x, y)
      }
    val interp = tiledPts.groupByKey(t => (t._1, t._2))
      .cogroup(tiledQs.groupByKey(t => (t._1, t._2))) { (_, ps, qIt) =>
        val qArr = qIt.toArray
        if (qArr.isEmpty) Iterator.empty
        else {
          val pArr = ps.toArray
          if (pArr.length < 3) qArr.iterator.map(q => (q._3, fill))
          else {
            val px = pArr.map(_._3); val py = pArr.map(_._4); val pv = pArr.map(_._5)
            // a degenerate local set (all collinear) has no containing
            // triangle for any query — every local answer is the fill,
            // matching what the global triangulation would return there
            val built = scala.util.Try {
              val tr = Interp2dKernel.triangulate(px, py)
              (tr, Interp2dKernel.buildGrid(tr))
            }.toOption
            built match {
              case Some((tr, grid)) => qArr.iterator.map(q =>
                (q._3, Interp2dKernel.interpolateFast(tr, grid, pv, q._4, q._5, fill)))
              case None => qArr.iterator.map(q => (q._3, fill))
            }
          }
        }
      }
    queries.join(interp.toDF("_tiled_qid", outCol),
        col(qIdCol).cast("long") === col("_tiled_qid"), "left")
      .drop("_tiled_qid")
      .na.fill(fill, Seq(outCol))
  }
}
