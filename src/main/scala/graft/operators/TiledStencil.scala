package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.kernels.StencilKernel

/** Tiled-tensor morphology: the 100 TB execution path for stencil ops.
  *
  * A 512^3 reference benchmark volume is >=1 GB per tensor
  * (/root/reference/imops/benchmarks/benchmark_morphology.py) — too big for
  * one Spark row. Tensors are stored as tile rows `(id, ti, tj, data)` and a
  * stencil op becomes: emit halo strips to neighbors -> one shuffle
  * (groupByKey on tile coordinate) -> assemble padded tile -> run the same
  * per-tile kernel -> crop. Work and shuffle volume are O(surface), not
  * O(volume): each tile ships only its r-wide border slabs.
  *
  * Border semantics match the reference kernel: out-of-image reads `true`
  * for erosion and `false` for dilation
  * (/root/reference/imops/src/_morphology.pyx:313-329); a missing neighbor
  * tile is outside the image, so its halo defaults to that border value.
  */
object TiledStencil {

  final case class Tile(id: Long, ti: Int, tj: Int, data: Array[Boolean])
  // not private: Spark's encoder codegen needs public accessors
  final case class Piece(id: Long, ti: Int, tj: Int, di: Int, dj: Int, strip: Array[Boolean])

  /** Split a full 2-D mask into tiles (test/ingest helper). */
  def tile(mask: Array[Boolean], rows: Int, cols: Int, ts: Int, id: Long = 0L): Seq[Tile] = {
    require(rows % ts == 0 && cols % ts == 0, "grid must divide evenly into tiles")
    for (ti <- 0 until rows / ts; tj <- 0 until cols / ts) yield {
      val data = new Array[Boolean](ts * ts)
      for (i <- 0 until ts; j <- 0 until ts)
        data(i * ts + j) = mask((ti * ts + i) * cols + tj * ts + j)
      Tile(id, ti, tj, data)
    }
  }

  /** Reassemble a full mask from tiles (test/egress helper). */
  def untile(tiles: Seq[Tile], rows: Int, cols: Int, ts: Int): Array[Boolean] = {
    val out = new Array[Boolean](rows * cols)
    tiles.foreach { t =>
      for (i <- 0 until ts; j <- 0 until ts)
        out((t.ti * ts + i) * cols + t.tj * ts + j) = t.data(i * ts + j)
    }
    out
  }

  /** Extract the slab of `t` that a neighbor in direction (di,dj) needs:
    * the r-wide edge nearest to that neighbor, as a row-major array of shape
    * (rows(di) x cols(dj)) where rows/cols are r or ts. */
  private def slab(data: Array[Boolean], ts: Int, r: Int, di: Int, dj: Int): Array[Boolean] = {
    val is = if (di < 0) 0 until r else if (di > 0) ts - r until ts else 0 until ts
    val js = if (dj < 0) 0 until r else if (dj > 0) ts - r until ts else 0 until ts
    val out = new Array[Boolean](is.length * js.length)
    var k = 0
    for (i <- is; j <- js) { out(k) = data(i * ts + j); k += 1 }
    out
  }

  /** One stencil op over tiles. `footprint` rank-2 with radius
    * fshape/2 <= r on both axes. Returns tiles of the result. */
  def apply(tiles: Dataset[Tile], ts: Int, gridRows: Int, gridCols: Int,
            fp: Array[Boolean], fshape: Array[Int],
            isDilation: Boolean)(implicit spark: SparkSession): Dataset[Tile] = {
    import spark.implicits._
    val r = math.max(fshape(0) / 2, fshape(1) / 2).max(1)
    val borderValue = !isDilation
    val pieces = tiles.flatMap { t =>
      val center = Piece(t.id, t.ti, t.tj, 0, 0, t.data)
      val halos = for {
        di <- -1 to 1; dj <- -1 to 1
        if (di != 0 || dj != 0)
        nti = t.ti + di; ntj = t.tj + dj
        if nti >= 0 && nti < gridRows && ntj >= 0 && ntj < gridCols
      } yield
        // the neighbor sees this tile at relative direction (-di,-dj); ship
        // the edge slab of this tile nearest to the neighbor
        Piece(t.id, nti, ntj, -di, -dj, slab(t.data, ts, r, di, dj))
      center +: halos
    }
    pieces.groupByKey(p => (p.id, p.ti, p.tj)).mapGroups { (key: (Long, Int, Int), it: Iterator[Piece]) =>
      val (id, ti, tj) = key
      val pts = ts + 2 * r
      val padded = Array.fill(pts * pts)(borderValue)
      it.foreach { p =>
        val (rows, cols) = (if (p.di == 0) ts else r, if (p.dj == 0) ts else r)
        val (i0, j0) = (
          if (p.di < 0) 0 else if (p.di > 0) ts + r else r,
          if (p.dj < 0) 0 else if (p.dj > 0) ts + r else r)
        var k = 0
        for (i <- 0 until rows; j <- 0 until cols) {
          padded((i0 + i) * pts + (j0 + j)) = p.strip(k); k += 1
        }
      }
      val res =
        if (isDilation) StencilKernel.dilate(padded, Array(pts, pts), fp, fshape)
        else StencilKernel.erode(padded, Array(pts, pts), fp, fshape)
      val out = new Array[Boolean](ts * ts)
      for (i <- 0 until ts; j <- 0 until ts) out(i * ts + j) = res((i + r) * pts + (j + r))
      Tile(id, ti, tj, out)
    }
  }

  def erode(tiles: Dataset[Tile], ts: Int, gridRows: Int, gridCols: Int)
           (implicit spark: SparkSession): Dataset[Tile] = {
    val (fp, fs) = StencilKernel.crossFootprint(2)
    apply(tiles, ts, gridRows, gridCols, fp, fs, isDilation = false)
  }

  def dilate(tiles: Dataset[Tile], ts: Int, gridRows: Int, gridCols: Int)
            (implicit spark: SparkSession): Dataset[Tile] = {
    val (fp, fs) = StencilKernel.crossFootprint(2)
    apply(tiles, ts, gridRows, gridCols, fp, fs, isDilation = true)
  }

  // ---------- 3-D tiles (the reference's morphology rank cap is 3,
  // /root/reference/imops/morphology.py:74-82; 512^3 benchmark volumes are
  // the reason tensors tile at all) ----------

  final case class Tile3(id: Long, ti: Int, tj: Int, tk: Int, data: Array[Boolean])
  final case class Piece3(id: Long, ti: Int, tj: Int, tk: Int,
                          di: Int, dj: Int, dk: Int, strip: Array[Boolean])

  def tile3(mask: Array[Boolean], dims: Array[Int], ts: Int, id: Long = 0L): Seq[Tile3] = {
    require(dims.forall(_ % ts == 0), "volume must divide evenly into tiles")
    val (d0, d1, d2) = (dims(0), dims(1), dims(2))
    for (ti <- 0 until d0 / ts; tj <- 0 until d1 / ts; tk <- 0 until d2 / ts) yield {
      val data = new Array[Boolean](ts * ts * ts)
      for (i <- 0 until ts; j <- 0 until ts; k <- 0 until ts)
        data((i * ts + j) * ts + k) =
          mask(((ti * ts + i) * d1 + (tj * ts + j)) * d2 + (tk * ts + k))
      Tile3(id, ti, tj, tk, data)
    }
  }

  def untile3(tiles: Seq[Tile3], dims: Array[Int], ts: Int): Array[Boolean] = {
    val out = new Array[Boolean](dims(0) * dims(1) * dims(2))
    tiles.foreach { t =>
      for (i <- 0 until ts; j <- 0 until ts; k <- 0 until ts)
        out(((t.ti * ts + i) * dims(1) + (t.tj * ts + j)) * dims(2) + (t.tk * ts + k)) =
          t.data((i * ts + j) * ts + k)
    }
    out
  }

  private def slab3(data: Array[Boolean], ts: Int, r: Int,
                    di: Int, dj: Int, dk: Int): Array[Boolean] = {
    def rng(d: Int) = if (d < 0) 0 until r else if (d > 0) ts - r until ts else 0 until ts
    val (is, js, ks) = (rng(di), rng(dj), rng(dk))
    val out = new Array[Boolean](is.length * js.length * ks.length)
    var c = 0
    for (i <- is; j <- js; k <- ks) { out(c) = data((i * ts + j) * ts + k); c += 1 }
    out
  }

  /** 3-D stencil over tiles: same halo-exchange scheme, 26-neighbor strips. */
  def apply3(tiles: Dataset[Tile3], ts: Int, grid: Array[Int],
             fp: Array[Boolean], fshape: Array[Int],
             isDilation: Boolean)(implicit spark: SparkSession): Dataset[Tile3] = {
    import spark.implicits._
    val r = fshape.map(_ / 2).max.max(1)
    val borderValue = !isDilation
    val pieces = tiles.flatMap { t =>
      val center = Piece3(t.id, t.ti, t.tj, t.tk, 0, 0, 0, t.data)
      val halos = for {
        di <- -1 to 1; dj <- -1 to 1; dk <- -1 to 1
        if (di != 0 || dj != 0 || dk != 0)
        nti = t.ti + di; ntj = t.tj + dj; ntk = t.tk + dk
        if nti >= 0 && nti < grid(0) && ntj >= 0 && ntj < grid(1) && ntk >= 0 && ntk < grid(2)
      } yield Piece3(t.id, nti, ntj, ntk, -di, -dj, -dk, slab3(t.data, ts, r, di, dj, dk))
      center +: halos
    }
    pieces.groupByKey(p => (p.id, p.ti, p.tj, p.tk))
      .mapGroups { (key: (Long, Int, Int, Int), it: Iterator[Piece3]) =>
        val (id, ti, tj, tk) = key
        val pts = ts + 2 * r
        val padded = Array.fill(pts * pts * pts)(borderValue)
        it.foreach { p =>
          def ext(d: Int) = if (d == 0) ts else r
          def org(d: Int) = if (d < 0) 0 else if (d > 0) ts + r else r
          val (ri, rj, rk) = (ext(p.di), ext(p.dj), ext(p.dk))
          val (oi, oj, ok) = (org(p.di), org(p.dj), org(p.dk))
          var c = 0
          for (i <- 0 until ri; j <- 0 until rj; k <- 0 until rk) {
            padded(((oi + i) * pts + (oj + j)) * pts + (ok + k)) = p.strip(c); c += 1
          }
        }
        val res =
          if (isDilation) StencilKernel.dilate(padded, Array(pts, pts, pts), fp, fshape)
          else StencilKernel.erode(padded, Array(pts, pts, pts), fp, fshape)
        val out = new Array[Boolean](ts * ts * ts)
        for (i <- 0 until ts; j <- 0 until ts; k <- 0 until ts)
          out((i * ts + j) * ts + k) = res(((i + r) * pts + (j + r)) * pts + (k + r))
        Tile3(id, ti, tj, tk, out)
      }
  }

  def erode3(tiles: Dataset[Tile3], ts: Int, grid: Array[Int])
            (implicit spark: SparkSession): Dataset[Tile3] = {
    val (fp, fs) = StencilKernel.crossFootprint(3)
    apply3(tiles, ts, grid, fp, fs, isDilation = false)
  }

  def dilate3(tiles: Dataset[Tile3], ts: Int, grid: Array[Int])
             (implicit spark: SparkSession): Dataset[Tile3] = {
    val (fp, fs) = StencilKernel.crossFootprint(3)
    apply3(tiles, ts, grid, fp, fs, isDilation = true)
  }

  /** Volumes small enough that halo bookkeeping dominates: cells per
    * volume at or under this bound take the assembled path in the `auto`
    * router. 2^25 booleans = 32 MiB per assembled volume + one padded
    * copy — comfortably one task's heap at any executor size ≥ 1 GiB. */
  val AssembleCutoffCells: Long = 1L << 25

  /** Assembled per-volume path: ONE groupByKey on the volume id, the full
    * volume rebuilt in a single task, the single-tensor kernel run once,
    * result re-tiled. Shuffle is O(volume) instead of the halo path's
    * O(surface), but at sub-cutoff volumes that is megabytes — and the
    * 26-neighbor strip fan-out, per-tile pad/crop copies, and the
    * groupByKey of 27 pieces/tile cost far more than they save (measured
    * at the 256³ bench shape: halo 0.21-1.27 s vs single-kernel ~0.1 s).
    * Parallelism = the batch axis (one task per volume id), exactly the
    * reference's OpenMP-batch framing. Bit-equal to the halo path:
    * TiledStencilSpec pins assembled == halo == whole-mask kernel. */
  def apply3Assembled(tiles: Dataset[Tile3], ts: Int, grid: Array[Int],
                      fp: Array[Boolean], fshape: Array[Int],
                      isDilation: Boolean)(implicit spark: SparkSession): Dataset[Tile3] = {
    import spark.implicits._
    val dims = Array(grid(0) * ts, grid(1) * ts, grid(2) * ts)
    tiles.groupByKey(_.id).flatMapGroups { (id: Long, it: Iterator[Tile3]) =>
      val full = untile3(it.toSeq, dims, ts)
      val res =
        if (isDilation) StencilKernel.dilate(full, dims, fp, fshape)
        else StencilKernel.erode(full, dims, fp, fshape)
      tile3(res, dims, ts, id)
    }
  }

  /** Size-routed 3-D stencil (r9 verdict item 2, the `Graft.interp2d`
    * routing precedent): volumes at or under [[AssembleCutoffCells]] run
    * the assembled single-kernel path, larger ones the halo exchange. One
    * call shape for every scale, like the reference's own shape dispatch
    * (/root/reference/imops/radon.py:16-102). */
  def apply3Auto(tiles: Dataset[Tile3], ts: Int, grid: Array[Int],
                 fp: Array[Boolean], fshape: Array[Int],
                 isDilation: Boolean)(implicit spark: SparkSession): Dataset[Tile3] = {
    val cells = grid.map(_.toLong).product * ts.toLong * ts * ts
    if (cells <= AssembleCutoffCells) apply3Assembled(tiles, ts, grid, fp, fshape, isDilation)
    else apply3(tiles, ts, grid, fp, fshape, isDilation)
  }

  def erode3Auto(tiles: Dataset[Tile3], ts: Int, grid: Array[Int])
                (implicit spark: SparkSession): Dataset[Tile3] = {
    val (fp, fs) = StencilKernel.crossFootprint(3)
    apply3Auto(tiles, ts, grid, fp, fs, isDilation = false)
  }

  def dilate3Auto(tiles: Dataset[Tile3], ts: Int, grid: Array[Int])
                 (implicit spark: SparkSession): Dataset[Tile3] = {
    val (fp, fs) = StencilKernel.crossFootprint(3)
    apply3Auto(tiles, ts, grid, fp, fs, isDilation = true)
  }
}
