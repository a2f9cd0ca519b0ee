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

  private def run(data: Array[Boolean], shape: Array[Int],
                  fp: Array[Boolean], fshape: Array[Int],
                  isDilation: Boolean): Array[Boolean] = {
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
    val borderValue = !isDilation // erosion: OOB true; dilation: OOB false
    val identity = !isDilation    // erosion: AND starts true; dilation: OR starts false
    val strides = NdTensor.strides(shape)
    val out = new Array[Boolean](data.length)
    val idx = new Array[Int](rank)
    var flat = 0
    while (flat < data.length) {
      var d = 0
      while (d < rank) { idx(d) = (flat / strides(d)) % shape(d); d += 1 }
      var acc = identity
      var k = 0
      var break = false
      while (k < offs.length && !break) {
        val off = offs(k)
        var oob = false
        var nFlat = 0
        var dd = 0
        while (dd < rank) {
          val c = idx(dd) + off(dd)
          if (c < 0 || c >= shape(dd)) oob = true else nFlat += c * strides(dd)
          dd += 1
        }
        val v = if (oob) borderValue else data(nFlat)
        if (!isDilation) { if (!v) { acc = false; break = true } }
        else { if (v) { acc = true; break = true } }
        k += 1
      }
      out(flat) = acc
      flat += 1
    }
    out
  }

  def erode(data: Array[Boolean], shape: Array[Int],
            fp: Array[Boolean], fshape: Array[Int]): Array[Boolean] =
    run(data, shape, fp, fshape, isDilation = false)

  def dilate(data: Array[Boolean], shape: Array[Int],
             fp: Array[Boolean], fshape: Array[Int]): Array[Boolean] =
    run(data, shape, fp, fshape, isDilation = true)

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
