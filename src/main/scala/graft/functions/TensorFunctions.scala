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

  /** Sink-side dtype-tag cast (SURVEY §1.4): apply the logical dtype's
    * truncation/saturation (unsigned/int tags) or quantization (fp16) to a
    * physically-Double scalar column — the reference's fp16/uint support
    * (/root/reference/imops/numeric.py:41-42, 182-187) on the JVM. */
  private val castDtypeUdf =
    udf((v: Double, dtype: String) => graft.core.NdTensor.castToDtype(v, dtype))
  def castDtype(v: Column, dtype: String): Column = castDtypeUdf(v, lit(dtype))

  /** isin mask over an array column (/root/reference/imops/utils.py:213-251). */
  def isinArray(data: Column, testElements: Seq[Double]): Column =
    transform(data, x => x.isin(testElements: _*))

  // ---------- builtin path: pad / crop (/root/reference/imops/pad.py, crop.py) ----------

  /** pad a 1-D array column with constant values (pad.py:10-73). */
  def padArray(data: Column, before: Column, after: Column, value: Double): Column =
    padArrayWith(data, before, after, lit(value))

  /** pad with a per-row COMPUTED value — the reference's callable
    * `padding_values` (pad.py:33-35, 63-64: e.g. `padding_values=numpy.min`
    * pads with the array's own minimum). `value` is any scalar Column over
    * the row, evaluated once (array_repeat is not a lambda HOF). */
  def padArrayWith(data: Column, before: Column, after: Column, value: Column): Column =
    concat(array_repeat(value, before.cast("int")), data,
           array_repeat(value, after.cast("int")))

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
  val zoomUdf = udf { (data: Array[Double], shape: Array[Int], scale: Array[Double], order: Int, cval: Double) =>
    ZoomKernel.zoom(data, shape, scale, order, cval)
  }

  val zoomToShapeUdf = udf { (data: Array[Double], shape: Array[Int], target: Array[Int], order: Int) =>
    ZoomKernel.zoomToShape(data, shape, target, order, 0.0)
  }

  /** interp1d over per-row (xs, ys, xq) arrays — the whole-array form;
    * the distributed/tabular form is graft.operators.Interp1dJoin. */
  val interp1dUdf = udf { (xs: Array[Double], ys: Array[Double], xq: Array[Double],
                           extrapolate: Boolean, fillValue: Double) =>
    Interp1dKernel(xs, ys, xq,
      Interp1dKernel.Opts(extrapolate = extrapolate, fillValue = fillValue))
  }

  val erodeUdf = udf { (data: Array[Boolean], shape: Array[Int]) =>
    StencilKernel.erodeDefault(data, shape)
  }
  /** morphology with an explicit footprint (incl. even shapes with the
    * origin-shift rule, _morphology.pyx:62-64). */
  val morphUdf = udf { (data: Array[Boolean], shape: Array[Int],
                        fp: Array[Boolean], fshape: Array[Int], dilation: Boolean) =>
    if (dilation) StencilKernel.dilate(data, shape, fp, fshape)
    else StencilKernel.erode(data, shape, fp, fshape)
  }
  val dilateUdf = udf { (data: Array[Boolean], shape: Array[Int]) =>
    StencilKernel.dilateDefault(data, shape)
  }
  /** boxed morphology: crop to the support bounding box + margin, run the
    * op on the crop, paste back (/root/reference/imops/morphology.py:117-151). */
  val boxedMorphUdf = udf { (data: Array[Boolean], shape: Array[Int], dilation: Boolean) =>
    val (fp, fs) = StencilKernel.crossFootprint(shape.length)
    StencilKernel.boxed(data, shape, fp, fs,
      if (dilation) StencilKernel.dilate else StencilKernel.erode)
  }
  val closeUdf = udf { (data: Array[Boolean], shape: Array[Int]) =>
    val (fp, fs) = StencilKernel.crossFootprint(shape.length)
    StencilKernel.close(data, shape, fp, fs)
  }
  val openUdf = udf { (data: Array[Boolean], shape: Array[Int]) =>
    val (fp, fs) = StencilKernel.crossFootprint(shape.length)
    StencilKernel.open(data, shape, fp, fs)
  }

  /** connected components; returns struct(labels, num, sizes). */
  val labelUdf = udf { (data: Array[Double], shape: Array[Int], background: Double, connectivity: Int) =>
    val r = LabelKernel.label(data, shape, background, connectivity)
    (r.labels, r.num, r.sizes)
  }

  val edtUdf = udf { (mask: Array[Boolean], shape: Array[Int], sampling: Array[Double]) =>
    EdtKernel.edt(mask, shape, sampling)
  }

  /** EDT feature transform (`return_indices`): per cell, the flat index of
    * the nearest zero cell; -1 when the mask has no zero. */
  val edtFeatureUdf = udf { (mask: Array[Boolean], shape: Array[Int], sampling: Array[Double]) =>
    EdtKernel.edtFeature(mask, shape, sampling)._2
  }

  /** Per-row center-of-mass partials for a 2-D slice at batch index
    * `sliceIdx` of a stacked volume: (Σw, Σw·slice, Σw·row, Σw·col).
    * The reference's prange partial-sum reduction
    * (/root/reference/imops/src/_measure.pyx:73-91) maps to per-row partials
    * + a final hash-agg merge — map-side combine comes for free. */
  val comPartialsUdf = udf { (data: Array[Double], rows: Int, cols: Int, sliceIdx: Long) =>
    var sw = 0.0; var swi = 0.0; var swj = 0.0; var swk = 0.0
    var i = 0
    while (i < rows) {
      var rowW = 0.0; var rowWj = 0.0
      var j = 0
      val base = i * cols
      while (j < cols) {
        val w = data(base + j)
        rowW += w; rowWj += w * j
        j += 1
      }
      sw += rowW; swi += rowW * i; swj += rowWj
      i += 1
    }
    swk = sw * sliceIdx
    (sw, swk, swi, swj) // (Σw, Σw·slice, Σw·row, Σw·col)
  }

  /** convex_hull_image of one 2-D mask row (morphology.py:524-591). */
  val hullUdf = udf { (mask: Array[Boolean], shape: Array[Int]) =>
    HullKernel.convexHullImage(mask, shape)
  }

  /** forward radon of one square slice (row-major size*size data);
    * returns row-major (size x nAngles) sinogram. */
  val radonUdf = udf { (data: Array[Double], sizeN: Int, thetaDeg: Array[Double]) =>
    RadonKernel.radonSlice(data, sizeN, thetaDeg)
  }

  /** radon with `return_fill=True` (radon.py:99-101): also returns the
    * constant value found outside the inscribed circle. */
  val radonWithFillUdf = udf { (data: Array[Double], sizeN: Int, thetaDeg: Array[Double]) =>
    val (_, fill) = RadonKernel.validateCircle(data, sizeN)
    (RadonKernel.radonSlice(data, sizeN, thetaDeg), fill)
  }

  val inverseRadonUdf = udf { (sino: Array[Double], sizeN: Int, thetaDeg: Array[Double], fillValue: Double) =>
    RadonKernel.inverseRadonSlice(sino, sizeN, thetaDeg, fillValue)
  }
}
