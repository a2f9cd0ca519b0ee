package graft.kernels

import graft.core.NdTensor

/** n-d zoom (rescale) kernel, semantics of the reference's Cython kernels:
  *
  *  - output shape per axis = round(old * scale)
  *    (/root/reference/imops/src/_zoom.pyx:378)
  *  - source coordinate of output cell i = i * adjusted_coef where
  *    adjusted_coef = (old-1)/(new-1), or `old` when new == 1
  *    (/root/reference/imops/src/_zoom.pyx:146-149)
  *  - order=1: n-linear interpolation over the 2^ndim floor/ceil corners,
  *    out-of-bounds corners read `cval` (/root/reference/imops/src/_zoom.pyx:162-199)
  *  - order=0: nearest corner by Euclidean distance with ties to the upper
  *    corner, out-of-bounds corners skipped (/root/reference/imops/src/_zoom.pyx:203-248)
  *
  * Runs per tensor row; cluster parallelism is the DataFrame row axis, the
  * Spark analog of the reference's OpenMP `prange` over slices.
  */
object ZoomKernel {

  /** `round(old * scale)` with python banker-free round-half-away semantics.
    * CPython round() is banker's rounding, but the kernel rounds a product of
    * a positive int and positive double; we follow python3 `round` =
    * round-half-to-even to match exactly. */
  def outDim(old: Int, scale: Double): Int = {
    val x = old * scale
    val r = math.rint(x) // rint = half-to-even, same as python round on halves
    math.max(1, r.toInt)
  }

  def adjustedCoef(oldN: Int, newN: Int): Double =
    if (newN == 1) oldN.toDouble else (oldN - 1).toDouble / (newN - 1).toDouble

  /** Per-axis sampling tables for one axis of a zoom: lower/upper source
    * indices (clamped — the clamped corner's weight is exactly 0), the
    * lerp fraction, and the nearest pick (ties to upper,
    * _zoom.pyx:203-248). Shared by the in-row kernel and the tiled path so
    * both produce bit-identical results. */
  final case class AxisTable(lo: Array[Int], hi: Array[Int], fr: Array[Double], nr: Array[Int])

  def axisTables(old: Int, newN: Int): AxisTable = {
    val coef = adjustedCoef(old, newN)
    val lo = new Array[Int](newN); val hi = new Array[Int](newN)
    val fr = new Array[Double](newN); val nr = new Array[Int](newN)
    var i = 0
    while (i < newN) {
      val c = i * coef
      val f = math.floor(c)
      val l = f.toInt
      val frac = c - f
      val upOk = l + 1 < old
      lo(i) = math.min(math.max(l, 0), old - 1)
      hi(i) = if (upOk) l + 1 else old - 1
      fr(i) = if (upOk) frac else 0.0
      nr(i) =
        if (frac >= 0.5 && upOk) l + 1
        else if (l >= 0 && l < old) l
        else if (upOk) l + 1 else 0
      i += 1
    }
    AxisTable(lo, hi, fr, nr)
  }

  /** General n-d zoom, rank 1..4. Returns (data, shape).
    *
    * Fast path: per-axis (floor index, fraction) tables are precomputed once
    * — the per-cell work is then pure lookups and lerp arithmetic with no
    * allocation, the JVM analog of the reference's tight Cython loops
    * (/root/reference/imops/src/_zoom.pyx:372-399). Source coordinates are
    * always within [0, old-1], so the upper corner can be clamped (its
    * weight is exactly 0 at the boundary) and `cval` is never read on this
    * path — matching the kernel's effective behavior. */
  def zoom(data: Array[Double], shape: Array[Int], scale: Array[Double],
           order: Int, cval: Double): (Array[Double], Array[Int]) = {
    require(shape.length == scale.length, "scale rank mismatch")
    require(shape.length >= 1 && shape.length <= NdTensor.MaxRank, s"rank ${shape.length} unsupported")
    require(order == 0 || order == 1, s"order $order unsupported (reference supports 0|1, zoom.py:230-236)")
    val n = shape.length
    val newShape = Array.tabulate(n)(d => outDim(shape(d), scale(d)))
    val coefs = Array.tabulate(n)(d => adjustedCoef(shape(d), newShape(d)))
    // per-axis tables: lo(d)(i), hi(d)(i) (clamped), frac(d)(i), and the
    // nearest-pick index nearIdx(d)(i)
    val tables = Array.tabulate(n)(d => axisTables(shape(d), newShape(d)))
    val lo = tables.map(_.lo)
    val hi = tables.map(_.hi)
    val fr = tables.map(_.fr)
    val nr = tables.map(_.nr)
    val out = new Array[Double](NdTensor.numel(newShape))
    n match {
      case 1 => zoom1(data, shape, newShape, lo(0), hi(0), fr(0), nr(0), order, out)
      case 2 => zoom2(data, shape, newShape, lo, hi, fr, nr, order, out)
      case 3 => zoom3(data, shape, newShape, lo, hi, fr, nr, order, out)
      case 4 => zoom4(data, shape, newShape, lo, hi, fr, nr, order, out)
    }
    (out, newShape)
  }

  private def zoom1(data: Array[Double], shape: Array[Int], ns: Array[Int],
                    lo: Array[Int], hi: Array[Int], fr: Array[Double], nr: Array[Int],
                    order: Int, out: Array[Double]): Unit = {
    var i = 0
    val m = ns(0)
    if (order == 0) while (i < m) { out(i) = data(nr(i)); i += 1 }
    else while (i < m) {
      val f = fr(i)
      out(i) = data(lo(i)) * (1 - f) + data(hi(i)) * f
      i += 1
    }
  }

  private def zoom2(data: Array[Double], shape: Array[Int], ns: Array[Int],
                    lo: Array[Array[Int]], hi: Array[Array[Int]], fr: Array[Array[Double]],
                    nr: Array[Array[Int]], order: Int, out: Array[Double]): Unit = {
    val s0 = shape(1)
    val (m0, m1) = (ns(0), ns(1))
    var p = 0
    var i = 0
    if (order == 0) {
      while (i < m0) {
        val base = nr(0)(i) * s0
        var j = 0
        while (j < m1) { out(p) = data(base + nr(1)(j)); p += 1; j += 1 }
        i += 1
      }
    } else {
      while (i < m0) {
        val l0 = lo(0)(i) * s0; val h0 = hi(0)(i) * s0; val f0 = fr(0)(i)
        var j = 0
        while (j < m1) {
          val l1 = lo(1)(j); val h1 = hi(1)(j); val f1 = fr(1)(j)
          // corner order and association match the generic kernel/oracle:
          // c00 + c10 + c01 + c11 with w = ((1*fa)*fb)
          out(p) = (1.0 * (1 - f0) * (1 - f1)) * data(l0 + l1) +
                   (1.0 * f0 * (1 - f1)) * data(h0 + l1) +
                   (1.0 * (1 - f0) * f1) * data(l0 + h1) +
                   (1.0 * f0 * f1) * data(h0 + h1)
          p += 1; j += 1
        }
        i += 1
      }
    }
  }

  private def zoom3(data: Array[Double], shape: Array[Int], ns: Array[Int],
                    lo: Array[Array[Int]], hi: Array[Array[Int]], fr: Array[Array[Double]],
                    nr: Array[Array[Int]], order: Int, out: Array[Double]): Unit = {
    val s1 = shape(2)
    val s0 = shape(1) * s1
    val (m0, m1, m2) = (ns(0), ns(1), ns(2))
    var p = 0
    var i = 0
    if (order == 0) {
      while (i < m0) {
        val b0 = nr(0)(i) * s0
        var j = 0
        while (j < m1) {
          val b1 = b0 + nr(1)(j) * s1
          var k = 0
          while (k < m2) { out(p) = data(b1 + nr(2)(k)); p += 1; k += 1 }
          j += 1
        }
        i += 1
      }
    } else {
      while (i < m0) {
        val l0 = lo(0)(i) * s0; val h0 = hi(0)(i) * s0; val f0 = fr(0)(i)
        var j = 0
        while (j < m1) {
          val l1 = lo(1)(j) * s1; val h1 = hi(1)(j) * s1; val f1 = fr(1)(j)
          var k = 0
          while (k < m2) {
            val l2 = lo(2)(k); val h2 = hi(2)(k); val f2 = fr(2)(k)
            out(p) = (1.0 * (1 - f0) * (1 - f1) * (1 - f2)) * data(l0 + l1 + l2) +
                     (1.0 * f0 * (1 - f1) * (1 - f2)) * data(h0 + l1 + l2) +
                     (1.0 * (1 - f0) * f1 * (1 - f2)) * data(l0 + h1 + l2) +
                     (1.0 * f0 * f1 * (1 - f2)) * data(h0 + h1 + l2) +
                     (1.0 * (1 - f0) * (1 - f1) * f2) * data(l0 + l1 + h2) +
                     (1.0 * f0 * (1 - f1) * f2) * data(h0 + l1 + h2) +
                     (1.0 * (1 - f0) * f1 * f2) * data(l0 + h1 + h2) +
                     (1.0 * f0 * f1 * f2) * data(h0 + h1 + h2)
            p += 1; k += 1
          }
          j += 1
        }
        i += 1
      }
    }
  }

  private def zoom4(data: Array[Double], shape: Array[Int], ns: Array[Int],
                    lo: Array[Array[Int]], hi: Array[Array[Int]], fr: Array[Array[Double]],
                    nr: Array[Array[Int]], order: Int, out: Array[Double]): Unit = {
    val strides = NdTensor.strides(shape)
    val (m0, m1, m2, m3) = (ns(0), ns(1), ns(2), ns(3))
    var p = 0
    var i = 0
    while (i < m0) {
      var j = 0
      while (j < m1) {
        var k = 0
        while (k < m2) {
          var l = 0
          while (l < m3) {
            if (order == 0) {
              out(p) = data(nr(0)(i) * strides(0) + nr(1)(j) * strides(1) +
                nr(2)(k) * strides(2) + nr(3)(l))
            } else {
              var acc = 0.0
              var corner = 0
              while (corner < 16) {
                var w = 1.0
                var idx = 0
                var dd = 0
                while (dd < 4) {
                  val oi = dd match { case 0 => i case 1 => j case 2 => k case _ => l }
                  val up = ((corner >> dd) & 1) == 1
                  w *= (if (up) fr(dd)(oi) else 1.0 - fr(dd)(oi))
                  idx += (if (up) hi(dd)(oi) else lo(dd)(oi)) * strides(dd)
                  dd += 1
                }
                acc += w * data(idx)
                corner += 1
              }
              out(p) = acc
            }
            p += 1; l += 1
          }
          k += 1
        }
        j += 1
      }
      i += 1
    }
  }

  /** n-linear interpolation at fractional coordinate. */
  def interpLinear(data: Array[Double], shape: Array[Int], strides: Array[Int],
                   coord: Array[Double], cval: Double): Double = {
    val n = shape.length
    val lo = new Array[Int](n)
    val frac = new Array[Double](n)
    var d = 0
    while (d < n) {
      val f = math.floor(coord(d))
      lo(d) = f.toInt
      frac(d) = coord(d) - f
      d += 1
    }
    // iterate the 2^n corners
    var acc = 0.0
    var corner = 0
    val corners = 1 << n
    while (corner < corners) {
      var w = 1.0
      var flatIdx = 0
      var oob = false
      var dd = 0
      while (dd < n) {
        val up = ((corner >> dd) & 1) == 1
        val c = lo(dd) + (if (up) 1 else 0)
        w *= (if (up) frac(dd) else 1.0 - frac(dd))
        if (c < 0 || c >= shape(dd)) oob = true else flatIdx += c * strides(dd)
        dd += 1
      }
      acc += w * (if (oob) cval else data(flatIdx))
      corner += 1
    }
    acc
  }

  /** Nearest-corner: per-axis pick upper when frac >= 0.5 (the kernel's
    * `distance <= min_distance` makes the later/upper candidate win ties);
    * when the nearest corner is out of bounds the reference returns cval —
    * it does not fall back to the other corner. Unreachable from zoom
    * (coords stay in [0, shape-1]) but the helper documents the reference's
    * interpolate3d_nearest contract. */
  def interpNearest(data: Array[Double], shape: Array[Int], strides: Array[Int],
                    coord: Array[Double], cval: Double): Double = {
    val n = shape.length
    var flatIdx = 0
    var d = 0
    while (d < n) {
      val f = math.floor(coord(d))
      val lo = f.toInt
      val frac = coord(d) - f
      val c = if (frac >= 0.5) lo + 1 else lo
      if (c < 0 || c >= shape(d)) return cval
      flatIdx += c * strides(d)
      d += 1
    }
    data(flatIdx)
  }

  /** `zoom_to_shape` — derive per-axis factors from a target shape
    * (/root/reference/imops/zoom.py:129-188): factor = target/old, then the
    * round(old*scale) rule reproduces `target` exactly. */
  def zoomToShape(data: Array[Double], shape: Array[Int], target: Array[Int],
                  order: Int, cval: Double): (Array[Double], Array[Int]) = {
    require(target.length == shape.length, "target rank mismatch")
    val scale = Array.tabulate(shape.length)(d => target(d).toDouble / shape(d).toDouble)
    val (out, got) = zoom(data, shape, scale, order, cval)
    require(got.sameElements(target), s"zoom_to_shape rounding mismatch: ${got.toSeq} vs ${target.toSeq}")
    (out, got)
  }
}
