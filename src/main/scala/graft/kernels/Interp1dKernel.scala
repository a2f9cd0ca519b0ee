package graft.kernels

/** 1-D linear interpolation, semantics of the reference `_interp1d` kernel
  * (/root/reference/imops/src/_zoom.pyx:30-120) behind the `interp1d` class
  * (/root/reference/imops/interp1d.py:14-207):
  *
  *  - bracketing via left-searchsorted over (possibly argsorted) xs
  *  - query == xs[0] is treated as interior (max_idx bumped to 1, pyx:70-73)
  *  - out-of-range: error (`bounds_error`), 2-point linear extrapolation from
  *    the first/last pair (pyx:65-93), or constant `fill_value`
  */
object Interp1dKernel {

  final case class Opts(boundsError: Boolean = false, fillValue: Double = Double.NaN,
                        extrapolate: Boolean = false, assumeSorted: Boolean = false)

  /** left searchsorted: first index i with xs(i) >= v. */
  def searchLeft(xs: Array[Double], v: Double): Int = {
    var lo = 0; var hi = xs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def apply(xs0: Array[Double], ys0: Array[Double], xq: Array[Double], opts: Opts): Array[Double] = {
    require(xs0.length == ys0.length, "xs/ys length mismatch")
    require(xs0.length >= 2, "interp1d needs at least 2 points")
    // skip the argsort allocation when the grid is already sorted — the
    // common case for per-row batch execution
    var sorted = true
    var si = 1
    while (sorted && si < xs0.length) { sorted = xs0(si - 1) <= xs0(si); si += 1 }
    val (xs, ys) =
      if (opts.assumeSorted || sorted) (xs0, ys0)
      else {
        val perm = xs0.indices.sortBy(xs0)(Ordering.Double.TotalOrdering).toArray
        (perm.map(xs0), perm.map(ys0))
      }
    val n = xs.length
    val out = new Array[Double](xq.length)
    var k = 0
    while (k < xq.length) {
      val v = xq(k)
      var mi = searchLeft(xs, v)
      var extr = 0
      if (mi == 0) { if (v < xs(0)) extr = -1 else mi = 1 }
      if (mi >= n) extr = 1
      if (extr != 0 && opts.boundsError)
        throw new IllegalArgumentException("A value in x_new is out of the interpolation range.")
      out(k) =
        if (extr == 0) {
          val dd = (v - xs(mi - 1)) / (xs(mi) - xs(mi - 1))
          ys(mi - 1) * (1 - dd) + ys(mi) * dd
        } else if (opts.extrapolate) {
          if (extr == 1) {
            val slope = (ys(n - 2) - ys(n - 1)) / (xs(n - 2) - xs(n - 1))
            val bias = ys(n - 1) - slope * xs(n - 1)
            slope * v + bias
          } else {
            val slope = (ys(1) - ys(0)) / (xs(1) - xs(0))
            val bias = ys(0) - slope * xs(0)
            slope * v + bias
          }
        } else opts.fillValue
      k += 1
    }
    nanPolicy(out)
  }

  /** Plain-JVM entry point for generated-code call sites (static forwarder
    * callable from Janino as `graft.kernels.Interp1dKernel.interp`). */
  def interp(xs: Array[Double], ys: Array[Double], xq: Array[Double],
             extrapolate: Boolean, fillValue: Double): Array[Double] =
    apply(xs, ys, xq, Opts(extrapolate = extrapolate, fillValue = fillValue))

  /** The reference's output NaN/inf policy (interp1d.py:191-205): NaNs in
    * the output (e.g. from inf*0 in the lerp, or a NaN fill_value) are only
    * resolvable when the output also contains infinities of exactly one
    * sign — then NaNs collapse to that infinity; otherwise it refuses. */
  private def nanPolicy(out: Array[Double]): Array[Double] = {
    var hasNan = false
    var hasPos = false
    var hasNeg = false
    var i = 0
    while (i < out.length) {
      val v = out(i)
      if (v.isNaN) hasNan = true
      else if (v == Double.PositiveInfinity) hasPos = true
      else if (v == Double.NegativeInfinity) hasNeg = true
      i += 1
    }
    if (!hasNan) return out
    if ((hasPos && hasNeg) || (!hasPos && !hasNeg))
      throw new RuntimeException("Can't decide how to handle nans in the output.")
    val repl = if (hasPos) Double.PositiveInfinity else Double.NegativeInfinity
    i = 0
    while (i < out.length) { if (out(i).isNaN) out(i) = repl; i += 1 }
    out
  }
}
