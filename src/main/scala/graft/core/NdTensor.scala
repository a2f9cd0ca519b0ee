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
}
