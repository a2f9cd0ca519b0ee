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

  /** General n-d zoom, rank 1..4. Returns (data, shape). */
  def zoom(data: Array[Double], shape: Array[Int], scale: Array[Double],
           order: Int, cval: Double): (Array[Double], Array[Int]) = {
    require(shape.length == scale.length, "scale rank mismatch")
    require(shape.length >= 1 && shape.length <= NdTensor.MaxRank, s"rank ${shape.length} unsupported")
    require(order == 0 || order == 1, s"order $order unsupported (reference supports 0|1, zoom.py:230-236)")
    val n = shape.length
    val newShape = Array.tabulate(n)(d => outDim(shape(d), scale(d)))
    val coefs = Array.tabulate(n)(d => adjustedCoef(shape(d), newShape(d)))
    val inStrides = NdTensor.strides(shape)
    val outSize = NdTensor.numel(newShape)
    val out = new Array[Double](outSize)
    val outStrides = NdTensor.strides(newShape)
    val idx = new Array[Int](n)
    val coord = new Array[Double](n)
    var flat = 0
    while (flat < outSize) {
      var d = 0
      while (d < n) {
        idx(d) = (flat / outStrides(d)) % newShape(d)
        coord(d) = idx(d) * coefs(d)
        d += 1
      }
      out(flat) = if (order == 1) interpLinear(data, shape, inStrides, coord, cval)
                  else interpNearest(data, shape, inStrides, coord, cval)
      flat += 1
    }
    (out, newShape)
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
    * `distance <= min_distance` makes the later/upper candidate win ties),
    * falling back to the lower corner when the upper is out of bounds. */
  def interpNearest(data: Array[Double], shape: Array[Int], strides: Array[Int],
                    coord: Array[Double], cval: Double): Double = {
    val n = shape.length
    var flatIdx = 0
    var d = 0
    while (d < n) {
      val f = math.floor(coord(d))
      val lo = f.toInt
      val frac = coord(d) - f
      val upOk = lo + 1 < shape(d)
      val loOk = lo >= 0 && lo < shape(d)
      val c =
        if (frac >= 0.5 && upOk) lo + 1
        else if (loOk) lo
        else if (upOk) lo + 1
        else return cval
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
