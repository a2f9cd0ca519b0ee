package graft.kernels

import graft.core.{Box, NdTensor}

/** Binary morphology stencil kernel, semantics of the reference's
  * `_binary_operation` (/root/reference/imops/src/_morphology.pyx:254-310):
  *
  *  - erosion: AND over footprint-covered cells, out-of-bounds reads `true`
  *    (border_value=True, pyx:313-319)
  *  - dilation: dual — footprint reflected, OR over covered cells,
  *    out-of-bounds reads `false` (pyx:322-329)
  *  - footprint origin per axis = fshape/2; dilation shifts the origin of
  *    even axes by -1 (pyx:62-64)
  *  - default footprint: connectivity-1 cross, `generate_binary_structure(ndim, 1)`
  *    (/root/reference/imops/morphology.py:48-49)
  */
object StencilKernel {

  def crossFootprint(rank: Int): (Array[Boolean], Array[Int]) = {
    val fshape = Array.fill(rank)(3)
    val size = NdTensor.numel(fshape)
    val fp = new Array[Boolean](size)
    val strides = NdTensor.strides(fshape)
    var flat = 0
    while (flat < size) {
      var manhattan = 0
      var d = 0
      while (d < rank) { manhattan += math.abs((flat / strides(d)) % 3 - 1); d += 1 }
      fp(flat) = manhattan <= 1
      flat += 1
    }
    (fp, fshape)
  }

  private def offsets(fp: Array[Boolean], fshape: Array[Int], origin: Array[Int]): Array[Array[Int]] = {
    val strides = NdTensor.strides(fshape)
    val rank = fshape.length
    val buf = Array.newBuilder[Array[Int]]
    var flat = 0
    while (flat < fp.length) {
      if (fp(flat)) {
        val off = new Array[Int](rank)
        var d = 0
        while (d < rank) { off(d) = (flat / strides(d)) % fshape(d) - origin(d); d += 1 }
        buf += off
      }
      flat += 1
    }
    buf.result()
  }

  /** Precomputed per-op geometry: per-offset coordinate deltas, flat deltas
    * for interior cells (no bounds checks), and per-dim offset extents
    * delimiting the interior region — the JVM analog of the reference's
    * precomputed offset table (/root/reference/imops/src/_morphology.pyx:73-165). */
  private final class Geom(val offs: Array[Array[Int]], val flatOff: Array[Int],
                           val minOff: Array[Int], val maxOff: Array[Int],
                           val strides: Array[Int])

  private def geometry(shape: Array[Int], fp: Array[Boolean], fshape: Array[Int],
                       isDilation: Boolean): Geom = {
    require(fshape.length == shape.length, "footprint rank mismatch") // morphology.py:84-85
    val rank = shape.length
    val (fpUsed, origin) =
      if (!isDilation) (fp, fshape.map(_ / 2))
      else {
        val reflected = fp.reverse // row-major reverse == reflect all axes ([::-1,::-1,::-1])
        val orig = fshape.map(s => if (s % 2 == 0) s / 2 - 1 else s / 2)
        (reflected, orig)
      }
    val offs = offsets(fpUsed, fshape, origin)
    val strides = NdTensor.strides(shape)
    val nOff = offs.length
    val flatOff = new Array[Int](nOff)
    val minOff = new Array[Int](rank)
    val maxOff = new Array[Int](rank)
    var k = 0
    while (k < nOff) {
      var dd = 0
      var fo = 0
      while (dd < rank) {
        val o = offs(k)(dd)
        fo += o * strides(dd)
        if (o < minOff(dd)) minOff(dd) = o
        if (o > maxOff(dd)) maxOff(dd) = o
        dd += 1
      }
      flatOff(k) = fo
      k += 1
    }
    new Geom(offs, flatOff, minOff, maxOff, strides)
  }

  // The erode/dilate hot loops are deliberately DUPLICATED rather than
  // parameterized on an `isDilation` flag: the r8 driver bench recorded a
  // ~100x bimodality on the shared-branch form (dilation 7.5 s vs the same
  // code measuring 0.07 s in other sessions) — once the JIT profiled the
  // shared `run` method's branches as erosion-dominant, the dilation path
  // ran in a deopt/profile-polluted mode. Two monomorphic methods give each
  // op its own JIT profile and inlining decisions.

  private def erodeCore(data: Array[Boolean], shape: Array[Int], g: Geom): Array[Boolean] = {
    val rank = shape.length
    val offs = g.offs; val flatOff = g.flatOff; val strides = g.strides
    val nOff = offs.length
    val out = new Array[Boolean](data.length)
    // border/general cell: per-offset bounds checks; erosion OOB reads true
    // (border_value=True, pyx:313-319)
    val idx = new Array[Int](rank)
    def slowCell(flat: Int): Boolean = {
      var d = 0
      while (d < rank) { idx(d) = (flat / strides(d)) % shape(d); d += 1 }
      var kk = 0
      while (kk < nOff) {
        val off = offs(kk)
        var oob = false
        var nFlat = 0
        var dd = 0
        while (dd < rank) {
          val c = idx(dd) + off(dd)
          if (c < 0 || c >= shape(dd)) oob = true else nFlat += c * strides(dd)
          dd += 1
        }
        if (!oob && !data(nFlat)) return false
        kk += 1
      }
      true
    }
    @inline def fastCell(flat: Int): Boolean = {
      var kk = 0
      while (kk < nOff) { if (!data(flat + flatOff(kk))) return false; kk += 1 }
      true
    }
    if (rank == 2) {
      val (s0, s1) = (shape(0), shape(1))
      val (iLo, iHi) = (-g.minOff(0), s0 - g.maxOff(0))
      // clamp the pre-interior bound to the row length: a footprint wider
      // than the image would otherwise drive the slow-path loop past the row
      // (transiently corrupting the next row, OOB on the last)
      val jLo = math.min(s1, math.max(0, -g.minOff(1)))
      val jHi = math.min(s1, s1 - g.maxOff(1))
      var i = 0
      while (i < s0) {
        val interiorRow = i >= iLo && i < iHi
        val base = i * s1
        var j = 0
        if (interiorRow) {
          while (j < jLo) { out(base + j) = slowCell(base + j); j += 1 }
          while (j < jHi) { out(base + j) = fastCell(base + j); j += 1 }
          while (j < s1) { out(base + j) = slowCell(base + j); j += 1 }
        } else {
          while (j < s1) { out(base + j) = slowCell(base + j); j += 1 }
        }
        i += 1
      }
    } else if (rank == 3) {
      val (s0, s1, s2) = (shape(0), shape(1), shape(2))
      val (iLo, iHi) = (-g.minOff(0), s0 - g.maxOff(0))
      val (jLo, jHi) = (-g.minOff(1), s1 - g.maxOff(1))
      // same clamp as rank 2: keep the pre-interior loop inside the line
      val kLo = math.min(s2, math.max(0, -g.minOff(2)))
      val kHi = math.min(s2, s2 - g.maxOff(2))
      var i = 0
      while (i < s0) {
        val ii = i >= iLo && i < iHi
        var j = 0
        while (j < s1) {
          val interior = ii && j >= jLo && j < jHi
          val base = (i * s1 + j) * s2
          var c = 0
          if (interior) {
            while (c < kLo) { out(base + c) = slowCell(base + c); c += 1 }
            while (c < kHi) { out(base + c) = fastCell(base + c); c += 1 }
            while (c < s2) { out(base + c) = slowCell(base + c); c += 1 }
          } else {
            while (c < s2) { out(base + c) = slowCell(base + c); c += 1 }
          }
          j += 1
        }
        i += 1
      }
    } else {
      var flat = 0
      while (flat < data.length) { out(flat) = slowCell(flat); flat += 1 }
    }
    out
  }

  private def dilateCore(data: Array[Boolean], shape: Array[Int], g: Geom): Array[Boolean] = {
    val rank = shape.length
    val offs = g.offs; val flatOff = g.flatOff; val strides = g.strides
    val nOff = offs.length
    val out = new Array[Boolean](data.length)
    // dilation OOB reads false (pyx:322-329)
    val idx = new Array[Int](rank)
    def slowCell(flat: Int): Boolean = {
      var d = 0
      while (d < rank) { idx(d) = (flat / strides(d)) % shape(d); d += 1 }
      var kk = 0
      while (kk < nOff) {
        val off = offs(kk)
        var oob = false
        var nFlat = 0
        var dd = 0
        while (dd < rank) {
          val c = idx(dd) + off(dd)
          if (c < 0 || c >= shape(dd)) oob = true else nFlat += c * strides(dd)
          dd += 1
        }
        if (!oob && data(nFlat)) return true
        kk += 1
      }
      false
    }
    @inline def fastCell(flat: Int): Boolean = {
      var kk = 0
      while (kk < nOff) { if (data(flat + flatOff(kk))) return true; kk += 1 }
      false
    }
    if (rank == 2) {
      val (s0, s1) = (shape(0), shape(1))
      val (iLo, iHi) = (-g.minOff(0), s0 - g.maxOff(0))
      val jLo = math.min(s1, math.max(0, -g.minOff(1)))
      val jHi = math.min(s1, s1 - g.maxOff(1))
      var i = 0
      while (i < s0) {
        val interiorRow = i >= iLo && i < iHi
        val base = i * s1
        var j = 0
        if (interiorRow) {
          while (j < jLo) { out(base + j) = slowCell(base + j); j += 1 }
          while (j < jHi) { out(base + j) = fastCell(base + j); j += 1 }
          while (j < s1) { out(base + j) = slowCell(base + j); j += 1 }
        } else {
          while (j < s1) { out(base + j) = slowCell(base + j); j += 1 }
        }
        i += 1
      }
    } else if (rank == 3) {
      val (s0, s1, s2) = (shape(0), shape(1), shape(2))
      val (iLo, iHi) = (-g.minOff(0), s0 - g.maxOff(0))
      val (jLo, jHi) = (-g.minOff(1), s1 - g.maxOff(1))
      val kLo = math.min(s2, math.max(0, -g.minOff(2)))
      val kHi = math.min(s2, s2 - g.maxOff(2))
      var i = 0
      while (i < s0) {
        val ii = i >= iLo && i < iHi
        var j = 0
        while (j < s1) {
          val interior = ii && j >= jLo && j < jHi
          val base = (i * s1 + j) * s2
          var c = 0
          if (interior) {
            while (c < kLo) { out(base + c) = slowCell(base + c); c += 1 }
            while (c < kHi) { out(base + c) = fastCell(base + c); c += 1 }
            while (c < s2) { out(base + c) = slowCell(base + c); c += 1 }
          } else {
            while (c < s2) { out(base + c) = slowCell(base + c); c += 1 }
          }
          j += 1
        }
        i += 1
      }
    } else {
      var flat = 0
      while (flat < data.length) { out(flat) = slowCell(flat); flat += 1 }
    }
    out
  }

  def erode(data: Array[Boolean], shape: Array[Int],
            fp: Array[Boolean], fshape: Array[Int]): Array[Boolean] =
    erodeCore(data, shape, geometry(shape, fp, fshape, isDilation = false))

  def dilate(data: Array[Boolean], shape: Array[Int],
             fp: Array[Boolean], fshape: Array[Int]): Array[Boolean] =
    dilateCore(data, shape, geometry(shape, fp, fshape, isDilation = true))

  /** closing = dilation then erosion (/root/reference/imops/morphology.py:262-314) */
  def close(data: Array[Boolean], shape: Array[Int],
            fp: Array[Boolean], fshape: Array[Int]): Array[Boolean] =
    erode(dilate(data, shape, fp, fshape), shape, fp, fshape)

  /** opening = erosion then dilation (/root/reference/imops/morphology.py:317-369) */
  def open(data: Array[Boolean], shape: Array[Int],
           fp: Array[Boolean], fshape: Array[Int]): Array[Boolean] =
    dilate(erode(data, shape, fp, fshape), shape, fp, fshape)

  def erodeDefault(data: Array[Boolean], shape: Array[Int]): Array[Boolean] = {
    val (fp, fs) = crossFootprint(shape.length); erode(data, shape, fp, fs)
  }
  def dilateDefault(data: Array[Boolean], shape: Array[Int]): Array[Boolean] = {
    val (fp, fs) = crossFootprint(shape.length); dilate(data, shape, fp, fs)
  }

  /** `boxed` rewrite: crop to the mask's bounding box + footprint margin, run
    * the op on the crop, paste back (/root/reference/imops/morphology.py:117-151).
    * Valid only when the dilated support fits strictly inside the image. */
  def boxed(data: Array[Boolean], shape: Array[Int],
            fp: Array[Boolean], fshape: Array[Int],
            op: (Array[Boolean], Array[Int], Array[Boolean], Array[Int]) => Array[Boolean]): Array[Boolean] = {
    if (!data.exists(identity)) return new Array[Boolean](data.length)
    val margin = fshape.map(_ / 2)
    val box = Box.fromMask(data, shape).addMargin(margin.toSeq)
    val full = Box.fromShape(shape.toSeq)
    require(full.contains(box), "boxed morphology: support touches the border") // morphology.py:134-135
    val bShape = box.shape.toArray
    val crop = new Array[Boolean](NdTensor.numel(bShape))
    copyRegion(data, shape, box.start.toArray, crop, bShape, isRead = true)
    val res = op(crop, bShape, fp, fshape)
    val out = new Array[Boolean](data.length)
    copyRegion(out, shape, box.start.toArray, res, bShape, isRead = false)
    out
  }

  private def copyRegion(big: Array[Boolean], bigShape: Array[Int], start: Array[Int],
                         small: Array[Boolean], smallShape: Array[Int], isRead: Boolean): Unit = {
    val rank = bigShape.length
    val bigStrides = NdTensor.strides(bigShape)
    val smallStrides = NdTensor.strides(smallShape)
    var flat = 0
    val total = small.length
    while (flat < total) {
      var bFlat = 0
      var d = 0
      while (d < rank) {
        val c = (flat / smallStrides(d)) % smallShape(d)
        bFlat += (start(d) + c) * bigStrides(d)
        d += 1
      }
      if (isRead) small(flat) = big(bFlat) else big(bFlat) = small(flat)
      flat += 1
    }
  }
}
