package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Box, NdTensor}
import graft.kernels._

class ZoomKernelSpec extends AnyFunSuite {
  private def assertClose(a: Array[Double], b: Array[Double], tol: Double = 1e-9): Unit = {
    assert(a.length == b.length, s"length ${a.length} vs ${b.length}")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) <= tol, s"at $i: $x vs $y")
    }
  }

  test("identity scale returns input") {
    val data = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val (out, shape) = ZoomKernel.zoom(data, Array(2, 3), Array(1.0, 1.0), 1, 0.0)
    assert(shape.sameElements(Array(2, 3)))
    assertClose(out, data)
  }

  test("1-D linear hand case: [0,10] scale 2 -> [0, 10/3, 20/3, 10]") {
    val (out, shape) = ZoomKernel.zoom(Array(0.0, 10.0), Array(2), Array(2.0), 1, 0.0)
    assert(shape.sameElements(Array(4)))
    assertClose(out, Array(0.0, 10.0 / 3, 20.0 / 3, 10.0))
  }

  test("1-D nearest hand case: tie goes to upper corner") {
    // coords 0, 1/3, 2/3, 1 -> picks 0, 0, 1, 1
    val (out, _) = ZoomKernel.zoom(Array(0.0, 10.0), Array(2), Array(2.0), 0, 0.0)
    assertClose(out, Array(0.0, 0.0, 10.0, 10.0))
  }

  test("2-D golden, order 0 and 1") {
    for (order <- Seq(0, 1)) {
      val (out, shape) = ZoomKernel.zoom(Goldens.zoom2dIn, Array(4, 5), Array(1.5, 0.7), order, 0.0)
      val expShape = if (order == 0) Goldens.zoom2dOutShape0 else Goldens.zoom2dOutShape1
      val exp = if (order == 0) Goldens.zoom2dOut0 else Goldens.zoom2dOut1
      assert(shape.sameElements(expShape))
      assertClose(out, exp)
    }
  }

  test("3-D golden, order 0 and 1") {
    for (order <- Seq(0, 1)) {
      val (out, shape) = ZoomKernel.zoom(Goldens.zoom3dIn, Array(3, 4, 2), Array(2.0, 0.6, 1.5), order, 0.0)
      val expShape = if (order == 0) Goldens.zoom3dOutShape0 else Goldens.zoom3dOutShape1
      val exp = if (order == 0) Goldens.zoom3dOut0 else Goldens.zoom3dOut1
      assert(shape.sameElements(expShape))
      assertClose(out, exp)
    }
  }

  test("zoom_to_shape hits the target exactly") {
    val data = Array.tabulate(12)(_.toDouble)
    val (_, shape) = ZoomKernel.zoomToShape(data, Array(12), Array(5), 1, 0.0)
    assert(shape.sameElements(Array(5)))
  }

  test("output shape rule uses round-half-even like python round") {
    assert(ZoomKernel.outDim(3, 0.5) == 2)  // 1.5 -> 2
    assert(ZoomKernel.outDim(5, 0.5) == 2)  // 2.5 -> 2 (banker's)
    assert(ZoomKernel.outDim(7, 0.5) == 4)  // 3.5 -> 4
  }
}

class Interp1dKernelSpec extends AnyFunSuite {
  import Interp1dKernel.Opts

  test("interior lerp and grid-point queries") {
    val xs = Array(0.0, 1.0, 3.0)
    val ys = Array(0.0, 10.0, 30.0)
    val out = Interp1dKernel(xs, ys, Array(0.0, 0.5, 1.0, 2.0, 3.0), Opts(assumeSorted = true))
    assert(out.sameElements(Array(0.0, 5.0, 10.0, 20.0, 30.0)))
  }

  test("unsorted xs are argsorted like the reference") {
    val out = Interp1dKernel(Array(3.0, 0.0, 1.0), Array(30.0, 0.0, 10.0), Array(2.0), Opts())
    assert(out.sameElements(Array(20.0)))
  }

  test("extrapolation uses first/last two-point slopes") {
    val xs = Array(0.0, 1.0, 2.0)
    val ys = Array(0.0, 10.0, 40.0) // left slope 10, right slope 30
    val out = Interp1dKernel(xs, ys, Array(-1.0, 3.0), Opts(extrapolate = true))
    assert(out.sameElements(Array(-10.0, 70.0)))
  }

  test("NaN/inf output policy matches interp1d.py:191-205") {
    val xs = Array(0.0, 1.0, 2.0)
    // +inf in ys -> lerp produces inf and nan (inf*0); nans collapse to +inf
    val ys = Array(1.0, Double.PositiveInfinity, 3.0)
    val out = Interp1dKernel(xs, ys, Array(0.5, 1.0, 1.5), Opts(assumeSorted = true))
    assert(out.forall(v => v.isInfinity || !v.isNaN))
    assert(out(1) == Double.PositiveInfinity)
    // NaN fill with no infs anywhere -> refuses
    assertThrows[RuntimeException] {
      Interp1dKernel(Array(0.0, 1.0), Array(1.0, 2.0), Array(5.0), Opts())
    }
  }

  test("fill value outside range; bounds_error throws") {
    val xs = Array(0.0, 1.0)
    val ys = Array(0.0, 1.0)
    val out = Interp1dKernel(xs, ys, Array(-1.0, 2.0), Opts(fillValue = -99.0))
    assert(out.sameElements(Array(-99.0, -99.0)))
    assertThrows[IllegalArgumentException] {
      Interp1dKernel(xs, ys, Array(2.0), Opts(boundsError = true))
    }
  }
}

class StencilKernelSpec extends AnyFunSuite {
  private val T = true
  private val F = false

  test("1-D erosion/dilation with border semantics") {
    val m = Array(T, T, F, T, T)
    val (fp, fs) = StencilKernel.crossFootprint(1)
    // erosion: border true -> out = [T&T, T&F, F, F&T... ] = [T, F, F, F, T]
    assert(StencilKernel.erode(m, Array(5), fp, fs).sameElements(Array(T, F, F, F, T)))
    // dilation: border false -> [T, T, T, T, T]
    assert(StencilKernel.dilate(m, Array(5), fp, fs).sameElements(Array(T, T, T, T, T)))
  }

  test("2-D cross erosion hand case") {
    // 4x4, single interior 3x3 block of true minus center hole
    val m = Array(
      F, F, F, F,
      F, T, T, T,
      F, T, T, T,
      F, T, T, T)
    val e = StencilKernel.erodeDefault(m, Array(4, 4))
    // only (2,2) has all 4-neighbors true inside; border counts true:
    // (1,3): up=(0,3)F -> F; (2,3): neighbors (1,3)T,(3,3)T,(2,2)T,right=border T -> T
    // (3,2): down=border T, up(2,2)T, left(3,1)T, right(3,3)T -> T ... compute explicitly
    val exp = Array(
      F, F, F, F,
      F, F, F, F,
      F, F, T, T,
      F, F, T, T)
    assert(e.sameElements(exp), s"got ${e.toSeq}")
  }

  test("dilation is the dual of erosion on the complement") {
    val rng = new scala.util.Random(7)
    val shape = Array(5, 6)
    val m = Array.fill(30)(rng.nextBoolean())
    val (fp, fs) = StencilKernel.crossFootprint(2)
    val dil = StencilKernel.dilate(m, shape, fp, fs)
    val eroComp = StencilKernel.erode(m.map(!_), shape, fp, fs).map(!_)
    assert(dil.sameElements(eroComp))
  }

  test("closing and opening compositions") {
    val m = Array(T, F, T, T, F, F, T)
    val (fp, fs) = StencilKernel.crossFootprint(1)
    val closed = StencilKernel.close(m, Array(7), fp, fs)
    val opened = StencilKernel.open(m, Array(7), fp, fs)
    assert(closed.sameElements(StencilKernel.erode(StencilKernel.dilate(m, Array(7), fp, fs), Array(7), fp, fs)))
    assert(opened.sameElements(StencilKernel.dilate(StencilKernel.erode(m, Array(7), fp, fs), Array(7), fp, fs)))
  }

  test("boxed morphology equals full-image op when support is interior") {
    val shape = Array(8, 8)
    val m = new Array[Boolean](64)
    for (i <- 3 to 5; j <- 3 to 5) m(i * 8 + j) = true
    val (fp, fs) = StencilKernel.crossFootprint(2)
    val full = StencilKernel.dilate(m, shape, fp, fs)
    val boxed = StencilKernel.boxed(m, shape, fp, fs, StencilKernel.dilate)
    assert(full.sameElements(boxed))
  }
}

class LabelKernelSpec extends AnyFunSuite {
  test("1-D runs with scan-order labels and sizes") {
    val r = LabelKernel.label(Array(1, 1, 0, 1, 0, 1, 1, 1).map(_.toDouble), Array(8))
    assert(r.labels.sameElements(Array(1L, 1L, 0L, 2L, 0L, 3L, 3L, 3L)))
    assert(r.num == 3)
    assert(r.sizes.sameElements(Array(2L, 1L, 3L)))
  }

  test("connectivity 1 vs 2 on a diagonal") {
    val data = Array(1.0, 0.0, 0.0, 1.0)
    val c1 = LabelKernel.label(data, Array(2, 2), connectivity = 1)
    assert(c1.num == 2)
    val c2 = LabelKernel.label(data, Array(2, 2), connectivity = 2)
    assert(c2.num == 1)
  }

  test("equal-valued grouping: different values never merge") {
    val data = Array(1.0, 2.0, 2.0, 1.0)
    val r = LabelKernel.label(data, Array(4), connectivity = 1)
    assert(r.num == 3)
    assert(r.labels.sameElements(Array(1L, 2L, 2L, 3L)))
  }

  test("custom background swap (measure.py:106-113)") {
    val data = Array(5.0, 5.0, 1.0, 5.0)
    val r = LabelKernel.label(data, Array(4), background = 5.0)
    assert(r.labels.sameElements(Array(0L, 0L, 1L, 0L)))
    assert(r.num == 1)
  }
}

class EdtKernelSpec extends AnyFunSuite {
  test("matches brute force on random 2-D masks with sampling") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val shape = Array(2 + rng.nextInt(8), 2 + rng.nextInt(8))
      val n = shape(0) * shape(1)
      val mask = Array.fill(n)(rng.nextInt(3) > 0)
      if (mask.contains(false)) {
        val sampling = Array(1.0 + rng.nextInt(3), 1.0 + rng.nextInt(2))
        val got = EdtKernel.edt(mask, shape, sampling)
        val zeros = (0 until n).filter(!mask(_))
        for (f <- 0 until n) {
          val (fi, fj) = (f / shape(1), f % shape(1))
          val exp = if (!mask(f)) 0.0
            else zeros.map { z =>
              val (zi, zj) = (z / shape(1), z % shape(1))
              val di = (fi - zi) * sampling(0); val dj = (fj - zj) * sampling(1)
              math.sqrt(di * di + dj * dj)
            }.min
          assert(math.abs(got(f) - exp) < 1e-9, s"trial $trial at $f: ${got(f)} vs $exp")
        }
      }
    }
  }

  test("feature transform returns the nearest zero, ties to smallest (j, i)") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 8) {
      val shape = Array(2 + rng.nextInt(8), 2 + rng.nextInt(8))
      val n = shape(0) * shape(1)
      val mask = Array.fill(n)(rng.nextInt(3) > 0)
      if (mask.contains(false)) {
        val (dist, feat) = EdtKernel.edtFeature(mask, shape, Array(1.0, 1.0))
        val plain = EdtKernel.edt(mask, shape, Array(1.0, 1.0))
        val zeros = (0 until n).filter(!mask(_))
        for (f <- 0 until n) {
          assert(dist(f) == plain(f), "distances must match the plain edt")
          val (fi, fj) = (f / shape(1), f % shape(1))
          // brute-force argmin with the envelope tie rule: last axis first
          val exp = zeros.minBy { z =>
            val (zi, zj) = (z / shape(1), z % shape(1))
            ((fi - zi) * (fi - zi) + (fj - zj) * (fj - zj), zj, zi)
          }
          assert(feat(f) == exp, s"trial $trial at ($fi,$fj): ${feat(f)} vs $exp")
        }
      }
    }
  }

  test("feature transform on an all-true mask carries -1") {
    val (_, feat) = EdtKernel.edtFeature(Array(true, true, true, true), Array(2, 2), Array(1.0, 1.0))
    assert(feat.forall(_ == -1))
  }
}

class FftSpec extends AnyFunSuite {
  test("known DFT and roundtrip") {
    val (re, im) = Fft.fft(Array(1.0, 0.0, 0.0, 0.0))
    assert(re.forall(v => math.abs(v - 1.0) < 1e-12))
    assert(im.forall(v => math.abs(v) < 1e-12))
    val rng = new scala.util.Random(3)
    val x = Array.fill(64)(rng.nextDouble())
    val r = x.clone(); val i = new Array[Double](64)
    Fft.transform(r, i, inverse = false)
    Fft.transform(r, i, inverse = true)
    x.zip(r).foreach { case (a, b) => assert(math.abs(a - b) < 1e-10) }
  }
}

class RadonKernelSpec extends AnyFunSuite {
  test("matches numpy-golden sinogram at 4 angles") {
    val out = RadonKernel.radonSlice(Goldens.radonIn, 16, Goldens.radonTheta)
    assert(out.length == Goldens.radonOut.length)
    out.zip(Goldens.radonOut).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-9, s"at $i: $a vs $b")
    }
  }

  test("rejects non-constant outside circle (tolerance 0.1)") {
    val img = Array.fill(16 * 16)(0.0)
    img(0) = 1.0 // corner, outside circle
    assertThrows[IllegalArgumentException](RadonKernel.radonSlice(img, 16, Array(0.0)))
  }

  test("filtered backprojection roughly reconstructs a disk phantom") {
    val size = 32
    val img = Array.tabulate(size * size) { f =>
      val i = f / size - size / 2; val j = f % size - size / 2
      if (i * i + j * j <= 8 * 8) 1.0 else 0.0
    }
    val theta = RadonKernel.thetaLinspace(32)
    val sino = RadonKernel.radonSlice(img, size, theta)
    val rec = RadonKernel.inverseRadonSlice(sino, size, theta)
    // interior of the disk should reconstruct near 1, far outside near 0
    val errs = for (f <- 0 until size * size) yield {
      val i = f / size - size / 2; val j = f % size - size / 2
      val r2 = i * i + j * j
      if (r2 <= 5 * 5) math.abs(rec(f) - 1.0)
      else if (r2 >= 12 * 12 && r2 <= 15 * 15) math.abs(rec(f))
      else 0.0
    }
    val mean = errs.sum / errs.count(_ > 0).max(1)
    assert(mean < 0.15, s"mean reconstruction error $mean")
  }
}

class BoxSpec extends AnyFunSuite {
  test("algebra: shape, margin, contains, fromMask") {
    val b = Box(Seq(1, 2), Seq(4, 7))
    assert(b.shape == Seq(3, 5))
    assert(b.addMargin(1) == Box(Seq(0, 1), Seq(5, 8)))
    assert(Box.fromShape(Seq(10, 10)).contains(b))
    val mask = Array(false, false, false, false, true, true, false, true, false)
    assert(Box.fromMask(mask, Array(3, 3)) == Box(Seq(1, 1), Seq(3, 3)))
    assertThrows[IllegalArgumentException](Box.fromMask(Array(false, false), Array(2)))
    assertThrows[IllegalArgumentException](Box(Seq(2), Seq(1)))
  }

  test("NdTensor axis broadcast mini-language") {
    assert(NdTensor.broadcastParam(3, Left(2.0), Seq(), 1.0).sameElements(Array(2.0, 2.0, 2.0)))
    assert(NdTensor.broadcastParam(3, Right(Seq(2.0)), Seq(1), 1.0).sameElements(Array(1.0, 2.0, 1.0)))
    assert(NdTensor.broadcastParam(2, Right(Seq(3.0)), Seq(-1), 1.0).sameElements(Array(1.0, 3.0)))
    assert(NdTensor.promoteShape(Array(5), 3).sameElements(Array(1, 1, 5)))
  }
}

class ReturnFillSpec extends AnyFunSuite {
  test("radon return_fill surfaces the constant outside the circle") {
    val size = 16
    val img = Array.fill(size * size)(2.5) // constant everywhere incl. outside
    val (clean, fill) = RadonKernel.validateCircle(img, size)
    assert(fill == 2.5)
    // outside zeroed on the cleaned copy
    assert(clean(0) == 0.0 && img(0) == 2.5)
  }

  test("radonSliceWithFill = (radonSlice, fill); near-constant outside returns the min") {
    val size = 16
    val r = size / 2
    val img = Array.tabulate(size * size) { p =>
      val (i, j) = (p / size, p % size)
      val (di, dj) = (i - r, j - r)
      if (di * di + dj * dj > r * r) 5.0 + ((i + j) % 2) * 0.0625 // inside tolerance
      else (p % 7).toDouble
    }
    val theta = Array(0.0, 45.0, 90.0)
    val (sino, fill) = RadonKernel.radonSliceWithFill(img, size, theta)
    assert(fill == 5.0) // the outside MIN
    assert(java.util.Arrays.equals(sino, RadonKernel.radonSlice(img, size, theta)))
    // fill 0.0 when the outside is already zero
    val zeroOut = img.clone()
    (0 until size * size).foreach { p =>
      val (i, j) = (p / size, p % size)
      val (di, dj) = (i - r, j - r)
      if (di * di + dj * dj > r * r) zeroOut(p) = 0.0
    }
    assert(RadonKernel.radonSliceWithFill(zeroOut, size, theta)._2 == 0.0)
    // a >0.1 outside spread still throws through the WithFill surface
    val bad = img.clone(); bad(0) = 6.0
    assertThrows[IllegalArgumentException](RadonKernel.radonSliceWithFill(bad, size, theta))
  }

  test("Box.buildSlices zips starts/stops/steps") {
    val b = Box(Seq(1, 2), Seq(5, 9))
    assert(b.buildSlices == Seq((1, 5, 1), (2, 9, 1)))
    assert(b.buildSlices(Seq(2, 3)) == Seq((1, 5, 2), (2, 9, 3)))
  }
}

class DtypeTagSpec extends AnyFunSuite {
  import NdTensor.castToDtype

  test("logical dtype cast-back: ints clamp, bools binarize, halves round") {
    assert(castToDtype(300.0, "uint8") == 255.0)
    assert(castToDtype(-5.0, "uint16") == 0.0)
    assert(castToDtype(130.7, "int8") == 127.0)
    assert(castToDtype(2.5, "bool") == 1.0 && castToDtype(0.0, "bool") == 0.0)
    // fp16 has ~3 decimal digits: 0.1 is not representable exactly
    val h = castToDtype(0.1, "float16")
    assert(h != 0.1 && math.abs(h - 0.1) < 1e-3)
    assert(castToDtype(1.5, "float16") == 1.5) // exactly representable
    assert(castToDtype(1e9, "float16").isInfinity) // overflow -> inf
    assertThrows[IllegalArgumentException](castToDtype(1.0, "complex64"))
  }

  test("float16 round-trip matches numpy.float16 on pinned cases") {
    // generated with numpy: (input, float64(float16(input))) — covers
    // subnormals, round-to-even, max-normal boundary, overflow-to-inf
    val cases = Seq(
      (6.141106381442258e-07, 5.960464477539062e-07),
      (-3.1062095922673245e-08, -5.960464477539063e-08),
      (-2.965966465193401e-07, -2.980232238769531e-07),
      (0.1, 0.0999755859375),
      (65519.999, 65504.0),
      (65520.0, Double.PositiveInfinity),
      (2.980232238769531e-08, 0.0),
      (1.23456789, 1.234375))
    cases.foreach { case (in, exp) =>
      assert(NdTensor.halfRoundTrip(in) == exp, s"half($in)")
    }
  }
}
