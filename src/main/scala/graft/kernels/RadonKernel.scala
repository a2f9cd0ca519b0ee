package graft.kernels

/** Forward Radon transform and filtered backprojection for one square 2-D
  * slice. Semantics follow the reference exactly:
  *
  *  - forward: /root/reference/imops/radon.py:16-102 (circle validation,
  *    integration `limits` from circle geometry at radius+2) and
  *    /root/reference/imops/src/_radon.pyx:28-91 (bilinear sampling along the
  *    rotated ray, shifts r_shift/c_shift = center*(cos+sin-1)/(cos-sin-1))
  *  - inverse: /root/reference/imops/radon.py:105-201 (pad sinogram to the
  *    sqrt(2) diagonal, FFT ramp*(1+a*ramp^b) filtering at the next power of
  *    two >= 64, backprojection with 1-D linear interpolation and pi/(2*n)
  *    scaling) and /root/reference/imops/src/_backprojection.pyx:22-79
  *
  * The batch axis (reference: leading ndarray axes flattened at
  * radon.py:213-216) is the DataFrame row axis in our engine; each row holds
  * one slice so a cluster-wide radon is a per-row map — no shuffle.
  */
object RadonKernel {

  def thetaLinspace(n: Int): Array[Double] =
    Array.tabulate(n)(i => 180.0 * i / n) // linspace(0, 180, endpoint=False)

  /** Validate constant-outside-circle (tolerance 0.1, radon.py:73-87) and
    * return the image with the outside zeroed. Returns (cleanImage, fill). */
  def validateCircle(image: Array[Double], size: Int): (Array[Double], Double) = {
    val radius = size / 2
    var min = Double.PositiveInfinity
    var max = Double.NegativeInfinity
    var i = 0
    while (i < size) {
      var j = 0
      while (j < size) {
        val xi = i - radius; val xj = j - radius
        if (xi * xi + xj * xj > radius * radius) {
          val v = image(i * size + j)
          if (v < min) min = v
          if (v > max) max = v
        }
        j += 1
      }
      i += 1
    }
    if (max - min > 0.1)
      throw new IllegalArgumentException(
        s"The image must be constant outside the circle. Got values ranging from $min to $max.")
    if (min != 0.0 || max != 0.0) {
      val out = image.clone()
      var ii = 0
      while (ii < size) {
        var jj = 0
        while (jj < size) {
          val xi = ii - radius; val xj = jj - radius
          if (xi * xi + xj * xj > radius * radius) out(ii * size + jj) = 0.0
          jj += 1
        }
        ii += 1
      }
      (out, min)
    } else (image, 0.0)
  }

  private def getPixel(img: Array[Double], size: Int, r: Long, c: Long): Double =
    if (r < 0 || r >= size || c < 0 || c >= size) 0.0 else img(r.toInt * size + c.toInt)

  /** Bilinear with floor/ceil corners (_radon.pyx:28-49). */
  def interpolate2d(img: Array[Double], size: Int, r: Double, c: Double): Double = {
    val minr = math.floor(r).toLong; val minc = math.floor(c).toLong
    val maxr = math.ceil(r).toLong; val maxc = math.ceil(c).toLong
    val dr = r - minr; val dc = c - minc
    val top = (1 - dc) * getPixel(img, size, minr, minc) + dc * getPixel(img, size, minr, maxc)
    val bottom = (1 - dc) * getPixel(img, size, maxr, minc) + dc * getPixel(img, size, maxr, maxc)
    (1 - dr) * top + dr * bottom
  }

  /** Integration limits from circle geometry (radon.py:90). */
  def limits(size: Int): Array[Int] = {
    val radius = size / 2
    val r2 = (radius + 2) * (radius + 2)
    Array.tabulate(size) { i =>
      val xi = i - radius
      var cnt = 0
      var j = 0
      while (j < size) { val xj = j - radius; if (xj * xj + xi * xi > r2) cnt += 1; j += 1 }
      cnt / 2
    }
  }

  /** Forward radon of one validated square slice. thetaDeg in degrees.
    * Returns row-major (size x nAngles) sinogram. */
  def radonSlice(image: Array[Double], size: Int, thetaDeg: Array[Double]): Array[Double] =
    radonSliceWithFill(image, size, thetaDeg)._1

  /** The `radon(..., return_fill=True)` surface
    * (/root/reference/imops/radon.py:16-102): the sinogram plus the
    * constant the image held outside the inscribed circle (the min of the
    * outside band when it varies inside the 0.1 tolerance, 0.0 when the
    * outside is already zero) — the value `inverse_radon(..., fill_value)`
    * restores. */
  def radonSliceWithFill(image: Array[Double], size: Int,
                         thetaDeg: Array[Double]): (Array[Double], Double) = {
    val (clean, fill) = validateCircle(image, size)
    (radonOfClean(clean, size, thetaDeg), fill)
  }

  private def radonOfClean(clean: Array[Double], size: Int, thetaDeg: Array[Double]): Array[Double] = {
    val lim = limits(size)
    val nA = thetaDeg.length
    val center = (size / 2).toDouble
    val out = new Array[Double](size * nA)
    var a = 0
    while (a < nA) {
      val th = math.toRadians(thetaDeg(a))
      val s = math.sin(th); val c = math.cos(th)
      val rShift = center * (c + s - 1)
      val cShift = center * (c - s - 1)
      var j = 0
      while (j < size) {
        var acc = 0.0
        var i = lim(j)
        val end = size - lim(j)
        // the ray advances linearly in i: step the two source coordinates
        // incrementally (2 adds) instead of recomputing the closed form
        // (4 mul + 4 add) per sample; accumulated FP drift over <= size
        // steps is ~size·eps·|coord| ≈ 1e-13 — far inside the gates'
        // round(_, 4) and the bilinear kernel's continuity
        var rr = j * (-s) + i * c - cShift
        var cc = j * c + i * s - rShift
        // Interior fast path: when the 2x2 bilinear stencil is fully
        // in-bounds (rr, cc ∈ [0, size-1)) the four fetches need no edge
        // checks and floor(x>=0) is (int)x — one branch per sample instead
        // of interpolate2d's two libm floors, two ceils and eight bound
        // compares. Bit-identical to the checked form: same corner fetch
        // order and weight association, and at integral coordinates the
        // ceil==floor degenerate corner differs only in a term multiplied
        // by exactly 0.0 (±0.0 never flips a running non-negative-zero
        // accumulator). Ray edges (the few samples whose stencil touches
        // the border) keep the checked interpolate2d verbatim.
        val inMax = (size - 1).toDouble
        while (i < end) {
          if (rr >= 0.0 && rr < inMax && cc >= 0.0 && cc < inMax) {
            val minr = rr.toInt; val minc = cc.toInt
            val dr = rr - minr; val dc = cc - minc
            val base = minr * size + minc
            val top = (1 - dc) * clean(base) + dc * clean(base + 1)
            val bottom = (1 - dc) * clean(base + size) + dc * clean(base + size + 1)
            acc += (1 - dr) * top + dr * bottom
          } else acc += interpolate2d(clean, size, rr, cc)
          rr += c
          cc += s
          i += 1
        }
        out(j * nA + a) = acc
        j += 1
      }
      a += 1
    }
    out
  }

  /** Ramp filter values (radon.py:225-232): 2*Re(FFT(f)). */
  def rampFilter(size: Int): Array[Double] = {
    val half = size / 2
    val ns = (1 to half by 2) ++ (half - 1 to 1 by -2)
    val f = new Array[Double](size)
    f(0) = 0.25
    var k = 1
    val it = ns.iterator
    while (k < size && it.hasNext) {
      val n = it.next()
      f(k) = -1.0 / math.pow(math.Pi * n, 2)
      k += 2
    }
    val (re, _) = Fft.fft(f)
    re.map(_ * 2.0)
  }

  /** Filtered backprojection of one sinogram slice (size x nAngles, row-major).
    * Returns (outputSize x outputSize) image. */
  def inverseRadonSlice(sinogram: Array[Double], size: Int, thetaDeg: Array[Double],
                        fillValue: Double = 0.0, a: Double = 0.0, b: Double = 1.0): Array[Double] = {
    val nA = thetaDeg.length
    val outputSize = size
    // pad to sqrt(2) diagonal (radon.py:240-248)
    val diagonal = math.ceil(math.sqrt(2.0) * size).toInt
    val padBefore = diagonal / 2 - size / 2
    val imgShape = diagonal
    val padded = math.max(64, math.pow(2, math.ceil(math.log(2.0 * imgShape) / math.log(2.0))).toInt)
    val ramp = rampFilter(padded)
    val filt = Array.tabulate(padded)(i => ramp(i) * (1 + a * math.pow(ramp(i), b)))
    // per-angle: embed column into padded buffer, FFT, multiply, IFFT, keep real
    val filtered = new Array[Double](imgShape * nA) // row-major (imgShape x nA)
    var ang = 0
    while (ang < nA) {
      val re = new Array[Double](padded)
      val im = new Array[Double](padded)
      var r = 0
      while (r < size) { re(padBefore + r) = sinogram(r * nA + ang); r += 1 }
      Fft.transform(re, im, inverse = false)
      var k = 0
      while (k < padded) { re(k) *= filt(k); im(k) *= filt(k); k += 1 }
      Fft.transform(re, im, inverse = true)
      r = 0
      while (r < imgShape) { filtered(r * nA + ang) = re(r); r += 1 }
      ang += 1
    }
    // backprojection (_backprojection.pyx:42-79)
    val radius = outputSize / 2
    val minVal = (imgShape / 2).toDouble
    val rightLim = (imgShape - 1).toDouble
    val sins = thetaDeg.map(t => math.sin(math.toRadians(t)))
    val coss = thetaDeg.map(t => math.cos(math.toRadians(t)))
    val mult = math.Pi / (2.0 * nA)
    val out = new Array[Double](outputSize * outputSize)
    var i = 0
    while (i < outputSize) {
      val x = (i - radius).toDouble
      var j = 0
      while (j < outputSize) {
        val y = (j - radius).toDouble
        if (x * x + y * y <= radius.toDouble * radius) {
          var acc = 0.0
          var k = 0
          while (k < nA) {
            val value = y * coss(k) - x * sins(k) + minVal
            if (value >= 0 && value <= rightLim) {
              val idx = math.floor(value).toInt
              acc += (if (idx == imgShape - 1) filtered(idx * nA + k)
                      else {
                        val y0 = filtered(idx * nA + k)
                        val y1 = filtered((idx + 1) * nA + k)
                        (y1 - y0) * (value - idx) + y0
                      })
            }
            k += 1
          }
          out(i * outputSize + j) = acc * mult
        } else out(i * outputSize + j) = fillValue
        j += 1
      }
      i += 1
    }
    out
  }
}
