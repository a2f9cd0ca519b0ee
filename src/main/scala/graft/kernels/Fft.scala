package graft.kernels

/** Iterative radix-2 complex FFT (Cooley–Tukey). The reference's only FFT use
  * is `inverse_radon`'s Fourier filtering (/root/reference/imops/radon.py:175-182)
  * where the padded size is always `max(64, 2^ceil(log2(2*n)))` — a power of
  * two — so radix-2 suffices.
  */
object Fft {

  /** In-place FFT of (re, im); inverse divides by n at the end. */
  def transform(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"FFT size $n must be a power of two")
    // bit reversal
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    if (inverse) {
      var t = 0
      while (t < n) { re(t) /= n; im(t) /= n; t += 1 }
    }
  }

  /** Real-input FFT returning (re, im). */
  def fft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val re = x.clone()
    val im = new Array[Double](x.length)
    transform(re, im, inverse = false)
    (re, im)
  }
}
