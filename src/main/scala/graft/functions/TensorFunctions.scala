package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.kernels._

/** Public Column-returning API over tensor rows.
  *
  * Two execution paths, mirroring the reference's Backend dispatch
  * (/root/reference/imops/backend.py:29-64):
  *  - "builtin" — compositions of `org.apache.spark.sql.functions` array
  *    higher-order functions (codegen'd, stays inside WholeStageCodegen) for
  *    everything expressible: pointwise math, pad/crop/slice, fill/full.
  *  - "kernel" — Scala UDFs over the pure kernels in `graft.kernels` for the
  *    ops Spark genuinely can't express (zoom, stencil morphology, label,
  *    EDT, radon). These are the analog of the reference's Cython backend;
  *    parallelism is the DataFrame row axis.
  */
object TensorFunctions {

  // ---------- builtin path: pointwise numerics (/root/reference/imops/numeric.py) ----------

  /** pointwise_add with a scalar summand (numeric.py:99-192). */
  def pointwiseAdd(data: Column, summand: Double): Column =
    transform(data, x => x + lit(summand))

  /** pointwise_add with a same-shape array (strict same-length in the
    * reference, numeric.py:150-151). */
  def pointwiseAddArray(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x + y)

  /** fill_ — immutable analog: replace every element (numeric.py:195-253). */
  def fillArray(data: Column, value: Double): Column =
    transform(data, _ => lit(value))

  /** full — allocate a fresh array (numeric.py:256-300). */
  def fullArray(size: Column, value: Double): Column =
    array_repeat(lit(value), size.cast("int"))

  /** isin mask over an array column (/root/reference/imops/utils.py:213-251). */
  def isinArray(data: Column, testElements: Seq[Double]): Column =
    transform(data, x => x.isin(testElements: _*))

  // ---------- builtin path: pad / crop (/root/reference/imops/pad.py, crop.py) ----------

  /** pad a 1-D array column with constant values (pad.py:10-73). */
  def padArray(data: Column, before: Column, after: Column, value: Double): Column =
    concat(array_repeat(lit(value), before.cast("int")), data,
           array_repeat(lit(value), after.cast("int")))

  /** pad_to_shape with left/right ratio split (pad.py:76-132):
    * before = floor(delta * ratio), after = delta - before. */
  def padToShape(data: Column, target: Int, ratio: Double, value: Double): Column = {
    val delta = lit(target) - size(data)
    val before = floor(delta * lit(ratio)).cast("int")
    padArray(data, before, delta - before, value)
  }

  /** pad_to_divisible: append so that size % divisor == remainder (pad.py:135-192). */
  def padToDivisible(data: Column, divisor: Int, value: Double): Column = {
    val after = (lit(divisor) - size(data) % lit(divisor)) % lit(divisor)
    padArray(data, lit(0), after, value)
  }

  /** crop_to_shape, centered by ratio (crop.py:11-58): start = floor((old-new)*ratio). */
  def cropToShape(data: Column, target: Int, ratio: Double): Column = {
    val start = floor((size(data) - lit(target)) * lit(ratio)).cast("int")
    slice(data, start + 1, lit(target))
  }

  /** crop_to_box on a 1-D array (crop.py:61-124), in-bounds variant. */
  def cropToBox(data: Column, start: Column, stop: Column): Column =
    slice(data, start.cast("int") + 1, (stop - start).cast("int"))

  /** restore_crop: re-embed at `start` within an axis of length `total`,
    * filling with `value` (pad.py:195-253). */
  def restoreCrop(data: Column, start: Column, total: Column, value: Double): Column =
    padArray(data, start, total - start - size(data), value)

  // ---------- kernel path: UDFs over graft.kernels ----------

  /** zoom on an n-d tensor row; returns struct(data, shape).
    * Semantics: /root/reference/imops/src/_zoom.pyx via ZoomKernel. */
  val zoomUdf = udf { (data: Seq[Double], shape: Seq[Int], scale: Seq[Double], order: Int, cval: Double) =>
    val (d, s) = ZoomKernel.zoom(data.toArray, shape.toArray, scale.toArray, order, cval)
    (d.toSeq, s.toSeq)
  }

  val zoomToShapeUdf = udf { (data: Seq[Double], shape: Seq[Int], target: Seq[Int], order: Int) =>
    val (d, s) = ZoomKernel.zoomToShape(data.toArray, shape.toArray, target.toArray, order, 0.0)
    (d.toSeq, s.toSeq)
  }

  /** interp1d over per-row (xs, ys, xq) arrays — the whole-array form;
    * the distributed/tabular form is graft.operators.Interp1dJoin. */
  val interp1dUdf = udf { (xs: Seq[Double], ys: Seq[Double], xq: Seq[Double],
                           extrapolate: Boolean, fillValue: Double) =>
    Interp1dKernel(xs.toArray, ys.toArray, xq.toArray,
      Interp1dKernel.Opts(extrapolate = extrapolate, fillValue = fillValue)).toSeq
  }

  val erodeUdf = udf { (data: Seq[Boolean], shape: Seq[Int]) =>
    StencilKernel.erodeDefault(data.toArray, shape.toArray).toSeq
  }
  val dilateUdf = udf { (data: Seq[Boolean], shape: Seq[Int]) =>
    StencilKernel.dilateDefault(data.toArray, shape.toArray).toSeq
  }
  val closeUdf = udf { (data: Seq[Boolean], shape: Seq[Int]) =>
    val (fp, fs) = StencilKernel.crossFootprint(shape.length)
    StencilKernel.close(data.toArray, shape.toArray, fp, fs).toSeq
  }
  val openUdf = udf { (data: Seq[Boolean], shape: Seq[Int]) =>
    val (fp, fs) = StencilKernel.crossFootprint(shape.length)
    StencilKernel.open(data.toArray, shape.toArray, fp, fs).toSeq
  }

  /** connected components; returns struct(labels, num, sizes). */
  val labelUdf = udf { (data: Seq[Double], shape: Seq[Int], background: Double, connectivity: Int) =>
    val r = LabelKernel.label(data.toArray, shape.toArray, background, connectivity)
    (r.labels.toSeq, r.num, r.sizes.toSeq)
  }

  val edtUdf = udf { (mask: Seq[Boolean], shape: Seq[Int], sampling: Seq[Double]) =>
    EdtKernel.edt(mask.toArray, shape.toArray, sampling.toArray).toSeq
  }

  /** convex_hull_image of one 2-D mask row (morphology.py:524-591). */
  val hullUdf = udf { (mask: Seq[Boolean], shape: Seq[Int]) =>
    HullKernel.convexHullImage(mask.toArray, shape.toArray).toSeq
  }

  /** forward radon of one square slice (row-major size*size data);
    * returns row-major (size x nAngles) sinogram. */
  val radonUdf = udf { (data: Seq[Double], sizeN: Int, thetaDeg: Seq[Double]) =>
    RadonKernel.radonSlice(data.toArray, sizeN, thetaDeg.toArray).toSeq
  }

  val inverseRadonUdf = udf { (sino: Seq[Double], sizeN: Int, thetaDeg: Seq[Double], fillValue: Double) =>
    RadonKernel.inverseRadonSlice(sino.toArray, sizeN, thetaDeg.toArray, fillValue).toSeq
  }
}
