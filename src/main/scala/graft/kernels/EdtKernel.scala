package graft.kernels

import graft.core.NdTensor

/** Exact Euclidean distance transform, semantics of the reference
  * `distance_transform_edt` (/root/reference/imops/morphology.py:372-521):
  * distance from each nonzero cell to the nearest zero cell, with optional
  * per-axis `sampling` scaling. The reference delegates to the multithreaded
  * `edt` library; we implement the separable Felzenszwalb–Huttenlocher
  * lower-envelope algorithm (public: "Distance Transforms of Sampled
  * Functions", Felzenszwalb & Huttenlocher, TOCS 2012) per axis — the same
  * separability that makes the op tile-parallelizable per axis at scale.
  */
object EdtKernel {

  /** 1-D squared-distance transform of f with grid spacing w (lower envelope). */
  def dt1d(f: Array[Double], w: Double): Array[Double] = {
    val n = f.length
    val d = new Array[Double](n)
    val v = new Array[Int](n)
    val z = new Array[Double](n + 1)
    var k = 0
    v(0) = 0; z(0) = Double.NegativeInfinity; z(1) = Double.PositiveInfinity
    val w2 = w * w
    var q = 1
    while (q < n) {
      var s = 0.0
      var cont = true
      while (cont) {
        val vk = v(k)
        s = ((f(q) + w2 * q * q) - (f(vk) + w2 * vk * vk)) / (2.0 * w2 * (q - vk))
        if (s <= z(k) && k > 0) k -= 1 else cont = false
      }
      k += 1
      v(k) = q
      z(k) = s
      z(k + 1) = Double.PositiveInfinity
      q += 1
    }
    k = 0
    q = 0
    while (q < n) {
      while (z(k + 1) < q) k += 1
      val vk = v(k)
      d(q) = w2 * (q - vk) * (q - vk) + f(vk)
      q += 1
    }
    d
  }

  /** As [[dt1d]] but also records the winning parabola vertex per output
    * cell — the 1-D feature (argmin) transform. On exact ties the envelope
    * keeps the earlier (lower-index) parabola: boundaries are stored as
    * `z(k+1)` and the query scan advances only while `z(k+1) < q`, so a
    * boundary exactly on a grid point resolves to the earlier vertex. */
  def dt1dArg(f: Array[Double], w: Double): (Array[Double], Array[Int]) = {
    val n = f.length
    val d = new Array[Double](n)
    val a = new Array[Int](n)
    val v = new Array[Int](n)
    val z = new Array[Double](n + 1)
    var k = 0
    v(0) = 0; z(0) = Double.NegativeInfinity; z(1) = Double.PositiveInfinity
    val w2 = w * w
    var q = 1
    while (q < n) {
      var s = 0.0
      var cont = true
      while (cont) {
        val vk = v(k)
        s = ((f(q) + w2 * q * q) - (f(vk) + w2 * vk * vk)) / (2.0 * w2 * (q - vk))
        if (s <= z(k) && k > 0) k -= 1 else cont = false
      }
      k += 1
      v(k) = q
      z(k) = s
      z(k + 1) = Double.PositiveInfinity
      q += 1
    }
    k = 0
    q = 0
    while (q < n) {
      while (z(k + 1) < q) k += 1
      val vk = v(k)
      d(q) = w2 * (q - vk) * (q - vk) + f(vk)
      a(q) = vk
      q += 1
    }
    (d, a)
  }

  /** EDT feature transform (`return_indices`,
    * /root/reference/imops/morphology.py:499-507): for every cell, the flat
    * index of the nearest zero cell (ties: lexicographically smallest
    * coordinate vector read last-axis-first, the tie rule the separable
    * envelope composition produces), alongside the distances. Cells with no
    * reachable zero (all-true mask) carry feature -1.
    *
    * Tie-rule caveat (round-2 advisory): the reference delegates to scipy's
    * `distance_transform_edt(return_indices=True)`, whose tie resolution is
    * an unspecified artifact of its own separable-pass order and was NOT
    * cross-checked here (scipy is unavailable in this environment). When
    * two zero cells are exactly equidistant, this kernel deterministically
    * picks the parabola the lower-envelope scan keeps — the lexicographic
    * rule above — which MAY differ from scipy's pick on tie-heavy masks.
    * The distances are identical either way; only the reported index of
    * the equidistant witness can differ. The q_edt2d_indices oracle encodes
    * this kernel's rule (both sides computed from the same definition), so
    * it verifies internal consistency, not scipy bit-parity on ties. */
  def edtFeature(mask: Array[Boolean], shape: Array[Int],
                 sampling: Array[Double]): (Array[Double], Array[Int]) = {
    val rank = shape.length
    require(sampling.length == rank, "sampling rank mismatch")
    val n = mask.length
    val inf = 1e100
    var f = new Array[Double](n)
    var feat = new Array[Int](n)
    var i = 0
    while (i < n) {
      f(i) = if (mask(i)) inf else 0.0
      feat(i) = if (mask(i)) -1 else i
      i += 1
    }
    val strides = NdTensor.strides(shape)
    var axis = 0
    while (axis < rank) {
      val len = shape(axis)
      if (len > 1) {
        val stride = strides(axis)
        val lineCount = n / len
        val outF = new Array[Double](n)
        val outFeat = new Array[Int](n)
        var line = 0
        while (line < lineCount) {
          var base = 0
          var rem = line
          var d = rank - 1
          while (d >= 0) {
            if (d != axis) {
              val sz = shape(d)
              base += (rem % sz) * strides(d)
              rem /= sz
            }
            d -= 1
          }
          val buf = new Array[Double](len)
          var j = 0
          while (j < len) { buf(j) = f(base + j * stride); j += 1 }
          val (dd, arg) = dt1dArg(buf, sampling(axis))
          j = 0
          while (j < len) {
            val p = base + j * stride
            outF(p) = dd(j)
            outFeat(p) = feat(base + arg(j) * stride)
            j += 1
          }
          line += 1
        }
        f = outF
        feat = outFeat
      }
      axis += 1
    }
    val res = new Array[Double](n)
    i = 0
    while (i < n) { res(i) = math.sqrt(f(i)); i += 1 }
    (res, feat)
  }

  /** n-d EDT over a boolean mask: returns Euclidean distances. */
  def edt(mask: Array[Boolean], shape: Array[Int], sampling: Array[Double]): Array[Double] = {
    val rank = shape.length
    require(sampling.length == rank, "sampling rank mismatch")
    val n = mask.length
    val inf = 1e100
    var f = new Array[Double](n)
    var i = 0
    while (i < n) { f(i) = if (mask(i)) inf else 0.0; i += 1 }
    val strides = NdTensor.strides(shape)
    var axis = 0
    while (axis < rank) {
      val len = shape(axis)
      if (len > 1) {
        val stride = strides(axis)
        val lineCount = n / len
        val out = new Array[Double](n)
        var line = 0
        while (line < lineCount) {
          // base index of this line: distribute `line` over the other axes
          var base = 0
          var rem = line
          var d = rank - 1
          while (d >= 0) {
            if (d != axis) {
              val sz = shape(d)
              base += (rem % sz) * strides(d)
              rem /= sz
            }
            d -= 1
          }
          val buf = new Array[Double](len)
          var j = 0
          while (j < len) { buf(j) = f(base + j * stride); j += 1 }
          val dd = dt1d(buf, sampling(axis))
          j = 0
          while (j < len) { out(base + j * stride) = dd(j); j += 1 }
          line += 1
        }
        f = out
      }
      axis += 1
    }
    i = 0
    val res = new Array[Double](n)
    while (i < n) { res(i) = math.sqrt(f(i)); i += 1 }
    res
  }

  def edt(mask: Array[Boolean], shape: Array[Int]): Array[Double] =
    edt(mask, shape, Array.fill(shape.length)(1.0))
}
