package graft.kernels

/** convex_hull_image for a 2-D mask, semantics of the reference
  * (/root/reference/imops/morphology.py:524-591 and
  * /root/reference/imops/src/_convex_hull.pyx):
  *
  *  1. candidate points = per-row leftmost/rightmost true pixels
  *     (`_left_right_bounds`, pyx:130-158)
  *  2. `offset_coordinates`: each bound pixel contributes its four
  *     half-pixel extent points (i±0.5, j), (i, j±0.5) (pyx:160-262 emits a
  *     deduplicated subset; the hull of the full set is identical)
  *  3. convex hull of the candidates (reference: Qhull; here: Andrew's
  *     monotone chain, oriented counterclockwise as Qhull returns)
  *  4. scanline rasterization `_grid_points_in_poly` (pyx:26-99): per
  *     integer row, min/max lerped column bounds over the CCW polygon edges,
  *     then fill [ceil(lb-0.2), floor(rb+0.2)] clamped
  *  5. degenerate hulls (QhullError in the reference, e.g. all candidates
  *     collinear) return an all-false mask (morphology.py:569-573)
  */
object HullKernel {

  final case class Pt(x: Double, y: Double)

  private def cross(o: Pt, a: Pt, b: Pt): Double =
    (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)

  /** Counterclockwise convex hull (monotone chain); returns distinct
    * vertices, no repeated endpoint. Null if degenerate (<3 vertices). */
  def convexHull(points: Array[Pt]): Array[Pt] = {
    val sorted = points.distinct.sortBy(p => (p.x, p.y))
    if (sorted.length < 3) return null
    val lower = scala.collection.mutable.ArrayBuffer.empty[Pt]
    for (p <- sorted) {
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer.empty[Pt]
    for (p <- sorted.reverseIterator) {
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toArray
    if (hull.length < 3) null else hull
  }

  /** Left/right bound pixels per row: Seq of (row, col). */
  def leftRightBounds(mask: Array[Boolean], m: Int, n: Int): Array[(Int, Int)] = {
    val buf = Array.newBuilder[(Int, Int)]
    var i = 0
    while (i < m) {
      var left = -1
      var j = 0
      while (j < n && left < 0) { if (mask(i * n + j)) left = j; j += 1 }
      if (left >= 0) {
        var right = n - 1
        while (!mask(i * n + right)) right -= 1
        buf += ((i, left))
        buf += ((i, right))
      }
      i += 1
    }
    buf.result()
  }

  /** Scanline fill of the CCW polygon over an (m x n) grid (pyx:26-99). */
  def gridPointsInPoly(verts: Array[Pt], m: Int, n: Int): Array[Boolean] = {
    val lb = Array.fill(m)(Double.PositiveInfinity)
    val rb = Array.fill(m)(-1.0)
    val assigned = new Array[Boolean](m)
    var i = 0
    val nv = verts.length
    while (i < nv) {
      val prev = verts((i + nv - 1) % nv)
      val curr = verts(i)
      if (prev.x == curr.x) {
        // orientation decides which integer row a vertical half-integer edge marks
        val xSet = (if (prev.y < curr.y) math.floor(prev.x) else math.ceil(prev.x)).toInt
        if (xSet >= 0 && xSet < m) {
          assigned(xSet) = true
          lb(xSet) = math.min(lb(xSet), math.min(prev.y, curr.y))
          rb(xSet) = math.max(rb(xSet), math.max(prev.y, curr.y))
        }
      } else {
        val (fx, fy, tx, ty) =
          if (prev.x < curr.x) (prev.x, prev.y, curr.x, curr.y)
          else (curr.x, curr.y, prev.x, prev.y)
        var xSet = math.ceil(fx).toInt
        val xStop = math.floor(tx + 1).toInt
        while (xSet < xStop) {
          if (xSet >= 0 && xSet < m) {
            val t = (xSet - fx) / (tx - fx)
            val by = fy * (1 - t) + ty * t
            assigned(xSet) = true
            lb(xSet) = math.min(lb(xSet), by)
            rb(xSet) = math.max(rb(xSet), by)
          }
          xSet += 1
        }
      }
      i += 1
    }
    val out = new Array[Boolean](m * n)
    var r = 0
    while (r < m) {
      if (assigned(r)) {
        val lo = math.max(0, math.ceil(lb(r) - 0.2).toInt)
        val hi = math.min(n - 1, math.floor(rb(r) + 0.2).toInt)
        var c = lo
        while (c <= hi) { out(r * n + c) = true; c += 1 }
      }
      r += 1
    }
    out
  }

  def convexHullImage(mask: Array[Boolean], shape: Array[Int],
                      offsetCoordinates: Boolean = true): Array[Boolean] = {
    require(shape.length == 2, s"convex_hull_image is 2-D only, got ${shape.length}-D") // morphology.py:551
    val m = shape(0); val n = shape(1)
    if (!mask.exists(identity)) return new Array[Boolean](m * n)
    val bounds = leftRightBounds(mask, m, n)
    val pts =
      if (offsetCoordinates)
        bounds.flatMap { case (i, j) =>
          Seq(Pt(i - 0.5, j), Pt(i + 0.5, j), Pt(i, j - 0.5), Pt(i, j + 0.5))
        }
      else bounds.map { case (i, j) => Pt(i.toDouble, j.toDouble) }
    val hull = convexHull(pts)
    if (hull == null) new Array[Boolean](m * n) // degenerate -> QhullError path
    else gridPointsInPoly(hull, m, n)
  }
}
