package graft.core

/** Dense n-d tensor as a Spark row: flat row-major `data` + explicit `shape`.
  *
  * The reference engine's single data type is a dense C-contiguous ndarray
  * (ndim <= 4) — see /root/reference/imops/zoom.py:40 (ndim cap) and
  * /root/reference/imops/utils.py:95-107 (contiguity handling). In Spark the
  * batch axis is the DataFrame row axis (/root/reference/imops/radon.py:213-216
  * reshapes leading axes into one batch axis), so one row = one tensor.
  *
  * `dtype` preserves the logical element type (the reference supports fp16 /
  * unsigned ints that the JVM lacks — /root/reference/imops/numeric.py:41-42);
  * data is physically Double, cast back on sink.
  */
final case class NdTensor(id: Long, shape: Seq[Int], dtype: String, data: Seq[Double]) {
  def rank: Int = shape.length
  def size: Long = shape.foldLeft(1L)(_ * _.toLong)
}

object NdTensor {
  val MaxRank = 4

  /** Row-major strides for a shape. */
  def strides(shape: Array[Int]): Array[Int] = {
    val n = shape.length
    val s = new Array[Int](n)
    var acc = 1
    var i = n - 1
    while (i >= 0) { s(i) = acc; acc *= shape(i); i -= 1 }
    s
  }

  def numel(shape: Array[Int]): Int = {
    var acc = 1; var i = 0
    while (i < shape.length) { acc *= shape(i); i += 1 }
    acc
  }

  /** Flat index of a multi-index under row-major layout. */
  def ravel(idx: Array[Int], strides: Array[Int]): Int = {
    var acc = 0; var i = 0
    while (i < idx.length) { acc += idx(i) * strides(i); i += 1 }
    acc
  }

  /** Prepend dummy axes of size 1 until `rank` — the reference's `n_dummy`
    * promotion (/root/reference/imops/zoom.py:264-268,
    * /root/reference/imops/morphology.py:99-110). */
  def promoteShape(shape: Array[Int], rank: Int): Array[Int] = {
    require(shape.length <= rank, s"rank ${shape.length} exceeds $rank")
    Array.fill(rank - shape.length)(1) ++ shape
  }

  /** Broadcast a scalar-or-sequence parameter against an axis list — the
    * reference's axis mini-language (`broadcast_axis`/`fill_by_indices`,
    * /root/reference/imops/utils.py:117-154): `param` given for `axis`
    * entries is expanded to a full per-axis vector with `default` elsewhere. */
  def fillByIndices(ndim: Int, param: Seq[Double], axis: Seq[Int], default: Double): Array[Double] = {
    val ax = if (axis.isEmpty) (0 until ndim) else axis.map(a => if (a < 0) a + ndim else a)
    require(param.length == ax.length, s"param length ${param.length} != axis length ${ax.length}")
    val out = Array.fill(ndim)(default)
    ax.zip(param).foreach { case (a, v) =>
      require(a >= 0 && a < ndim, s"axis $a out of range for ndim $ndim")
      out(a) = v
    }
    out
  }

  def broadcastParam(ndim: Int, param: Either[Double, Seq[Double]], axis: Seq[Int], default: Double): Array[Double] =
    param match {
      case Left(scalar) =>
        val ax = if (axis.isEmpty) (0 until ndim) else axis
        fillByIndices(ndim, Seq.fill(ax.length)(scalar), axis, default)
      case Right(seq) => fillByIndices(ndim, seq, axis, default)
    }

  /** Cast a physically-Double value back to its logical `dtype` on sink —
    * the other half of the dtype-tag scheme (§1.4 of SURVEY): Spark has no
    * fp16/unsigned primitives, so the tag preserves the logical type
    * (mirroring the reference's fp16-as-uint16 view, numeric.py:182-187)
    * and this applies the type's rounding/clamping semantics. */
  def castToDtype(v: Double, dtype: String): Double = dtype match {
    case "bool" => if (v != 0.0) 1.0 else 0.0
    case "int8" => v.toLong.max(Byte.MinValue).min(Byte.MaxValue).toDouble
    case "int16" => v.toLong.max(Short.MinValue).min(Short.MaxValue).toDouble
    case "int32" => v.toLong.max(Int.MinValue).min(Int.MaxValue).toDouble
    case "int64" => v.toLong.toDouble
    case "uint8" => v.toLong.max(0L).min(255L).toDouble
    case "uint16" => v.toLong.max(0L).min(65535L).toDouble
    case "uint32" => v.toLong.max(0L).min(4294967295L).toDouble
    case "float16" => halfRoundTrip(v)
    case "float32" => v.toFloat.toDouble
    case "float64" => v
    case other => throw new IllegalArgumentException(s"unknown dtype tag '$other'")
  }

  /** Round-trip through IEEE half precision (the reference's fp16 support,
    * numeric.py:41-42): round-to-nearest-even into a 10-bit significand,
    * overflow to infinity, subnormals preserved. */
  def halfRoundTrip(v: Double): Double = {
    val f = v.toFloat
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val absBits = bits & 0x7fffffff
    val half: Int =
      if (absBits >= 0x7f800000) sign | 0x7c00 | (if (absBits > 0x7f800000) 0x200 else 0) // inf/nan
      else if (absBits >= 0x47800000) sign | 0x7c00 // overflow -> inf
      else if (absBits >= 0x38800000) { // normal half
        val e = ((absBits >>> 23) - 112) << 10
        val m = (absBits >>> 13) & 0x3ff
        val rounded = sign | e | m
        // round to nearest even on the truncated 13 bits
        val rem = absBits & 0x1fff
        if (rem > 0x1000 || (rem == 0x1000 && (m & 1) == 1)) rounded + 1 else rounded
      } else if (absBits >= 0x33000000) { // subnormal half
        // value = m24 * 2^(e_f - 150); half mantissa unit is 2^-24, so
        // mantissa_h = m24 >> (126 - e_f), with 13 <= 126 - e_f <= 24
        val totalShift = 126 - (absBits >>> 23)
        val m = (absBits & 0x7fffff) | 0x800000
        val shifted = m >>> totalShift
        val rem = m & ((1 << totalShift) - 1)
        val halfPoint = 1 << (totalShift - 1)
        val r = if (rem > halfPoint || (rem == halfPoint && (shifted & 1) == 1)) shifted + 1 else shifted
        sign | r
      } else sign // underflow -> signed zero
    // expand back to float
    val s = (half & 0x8000) << 16
    val eh = (half >>> 10) & 0x1f
    val mh = half & 0x3ff
    val back =
      if (eh == 0x1f) s | 0x7f800000 | (mh << 13)
      else if (eh != 0) s | ((eh + 112) << 23) | (mh << 13)
      else if (mh != 0) {
        var e2 = 0
        var m2 = mh
        while ((m2 & 0x400) == 0) { m2 <<= 1; e2 -= 1 }
        s | ((113 + e2) << 23) | ((m2 & 0x3ff) << 13)
      } else s
    java.lang.Float.intBitsToFloat(back).toDouble
  }
}
