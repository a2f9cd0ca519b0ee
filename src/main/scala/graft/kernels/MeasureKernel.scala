package graft.kernels

import graft.core.NdTensor

/** center_of_mass kernels, semantics of the reference
  * (/root/reference/imops/measure.py:140-229,
  * /root/reference/imops/src/_measure.pyx:29-91):
  *
  *  - global: Σ(w·coord)/Σw per axis (masses may be negative)
  *  - labeled: restricted per label from `index`; validation —
  *    labels/index both-or-neither (measure.py:179-180), shape equality
  *    (:205-206), dtype equality is moot here (labels and index are both
  *    Long), unique index values required (:211-212)
  *  - per-label centers are returned in `index` order; labels absent from
  *    the data yield NaN coordinates (0/0), like the reference kernel
  */
object MeasureKernel {

  /** Global center of mass; returns one coordinate per axis. */
  def centerOfMass(data: Array[Double], shape: Array[Int]): Array[Double] = {
    val rank = shape.length
    val strides = NdTensor.strides(shape)
    val acc = new Array[Double](rank)
    var sw = 0.0
    var flat = 0
    while (flat < data.length) {
      val w = data(flat)
      if (w != 0.0) {
        sw += w
        var d = 0
        while (d < rank) { acc(d) += w * ((flat / strides(d)) % shape(d)); d += 1 }
      }
      flat += 1
    }
    Array.tabulate(rank)(d => acc(d) / sw)
  }

  /** Labeled center of mass for each label in `index` (unique, required). */
  def labeledCenterOfMass(data: Array[Double], shape: Array[Int],
                          labels: Array[Long], index: Array[Long]): Array[Array[Double]] = {
    require(labels.length == data.length,
      s"`array` and `labels` must be the same shape, got ${data.length} and ${labels.length}") // measure.py:205
    require(index.distinct.length == index.length,
      "`index` should consist of unique values.") // measure.py:211-212
    val rank = shape.length
    val strides = NdTensor.strides(shape)
    val pos = index.zipWithIndex.toMap
    val sw = new Array[Double](index.length)
    val acc = Array.ofDim[Double](index.length, rank)
    var flat = 0
    while (flat < data.length) {
      pos.get(labels(flat)) match {
        case Some(k) =>
          val w = data(flat)
          sw(k) += w
          var d = 0
          while (d < rank) { acc(k)(d) += w * ((flat / strides(d)) % shape(d)); d += 1 }
        case None =>
      }
      flat += 1
    }
    Array.tabulate(index.length)(k => Array.tabulate(rank)(d => acc(k)(d) / sw(k)))
  }
}
