package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.NdTensor
import graft.kernels._

/** Seeded random property checks from FIXTURES.md §2: the invariants the
  * reference checks by stress testing, plus a differential between the
  * table-based fast zoom path and the generic per-cell evaluators (our
  * analog of the reference's backend-matrix agreement tests).
  */
class PropertySpec extends AnyFunSuite {
  private val rng = new scala.util.Random(1337)

  private def randShape(maxRank: Int = 4): Array[Int] =
    Array.fill(1 + rng.nextInt(maxRank))(2 + rng.nextInt(7))

  test("round6 fast path is bit-equal to the BigDecimal reference") {
    def ref(v: Double): Double =
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
      else java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def check(v: Double): Unit = {
      val got = graft.exprs.NearestCentroid.round6(v)
      val want = ref(v)
      assert(java.lang.Double.compare(got, want) == 0, s"round6($v): $got != $want")
    }
    // cosine-range randoms (the hot-loop domain), wider randoms, and
    // adversarial near-tie values that must fall through to BigDecimal
    (0 until 200000).foreach(_ => check(rng.nextDouble() * 2 - 1))
    (0 until 50000).foreach(_ => check((rng.nextDouble() * 2 - 1) * math.pow(10, rng.nextInt(12) - 6)))
    (-20 to 20).foreach { i =>
      val base = i * 1e-6 + 5e-7 // exact .5 ties in decimal terms
      (-3 to 3).foreach(ulps => check(math.ulp(base) * ulps + base))
    }
    Seq(0.0, -0.0, 1.0, -1.0, 0.9999995, -0.9999995, 1234.5678995,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      4.9e15, -4.9e15, 1e300).foreach(check)
  }

  test("zoom fast path agrees with the generic per-cell evaluators") {
    for (_ <- 0 until 30) {
      val shape = randShape()
      val n = shape.length
      val data = Array.fill(NdTensor.numel(shape))(rng.nextDouble() * 10 - 5)
      val scale = Array.fill(n)(0.5 + rng.nextDouble() * 1.5)
      val order = rng.nextInt(2)
      val (out, newShape) = ZoomKernel.zoom(data, shape, scale, order, 0.0)
      val coefs = Array.tabulate(n)(d => ZoomKernel.adjustedCoef(shape(d), newShape(d)))
      val strides = NdTensor.strides(shape)
      val outStrides = NdTensor.strides(newShape)
      var flat = 0
      while (flat < out.length) {
        val coord = Array.tabulate(n)(d => ((flat / outStrides(d)) % newShape(d)) * coefs(d))
        val exp = if (order == 1) ZoomKernel.interpLinear(data, shape, strides, coord, 0.0)
                  else ZoomKernel.interpNearest(data, shape, strides, coord, 0.0)
        assert(math.abs(out(flat) - exp) < 1e-12,
          s"shape=${shape.toSeq} scale=${scale.toSeq} order=$order flat=$flat: ${out(flat)} vs $exp")
        flat += 1
      }
    }
  }

  test("identity zoom returns the input for any shape") {
    for (_ <- 0 until 20) {
      val shape = randShape()
      val data = Array.fill(NdTensor.numel(shape))(rng.nextDouble())
      for (order <- Seq(0, 1)) {
        val (out, newShape) = ZoomKernel.zoom(data, shape, Array.fill(shape.length)(1.0), order, 0.0)
        assert(newShape.sameElements(shape))
        data.zip(out).foreach { case (a, b) => assert(a == b) }
      }
    }
  }

  test("erosion is a subset of the mask, dilation a superset") {
    for (_ <- 0 until 20) {
      val shape = randShape(3)
      val m = Array.fill(NdTensor.numel(shape))(rng.nextInt(3) > 0)
      val ero = StencilKernel.erodeDefault(m, shape)
      val dil = StencilKernel.dilateDefault(m, shape)
      for (i <- m.indices) {
        assert(!ero(i) || m(i), s"erosion grew at $i")
        assert(!m(i) || dil(i), s"dilation shrank at $i")
      }
    }
  }

  test("label: background remap preserves the partition and count") {
    for (_ <- 0 until 15) {
      val shape = randShape(3)
      val data = Array.fill(NdTensor.numel(shape))(rng.nextInt(4).toDouble)
      val conn = 1 + rng.nextInt(shape.length)
      val base = LabelKernel.label(data, shape, background = 0.0, connectivity = conn)
      // swap values 0 <-> 3, then label with background=3: same partition
      val swapped = data.map(v => if (v == 0.0) 3.0 else if (v == 3.0) 0.0 else v)
      val remap = LabelKernel.label(swapped, shape, background = 3.0, connectivity = conn)
      assert(base.num == remap.num)
      assert(base.labels.sameElements(remap.labels))
    }
  }

  test("zoom_to_shape output always matches the requested shape") {
    for (_ <- 0 until 20) {
      val shape = randShape()
      val data = Array.fill(NdTensor.numel(shape))(rng.nextDouble())
      val target = shape.map(_ => 1 + rng.nextInt(12))
      val (_, got) = ZoomKernel.zoomToShape(data, shape, target, 1, 0.0)
      assert(got.sameElements(target))
    }
  }

  test("radon batch row == per-slice calls (batch-axis consistency)") {
    val theta = RadonKernel.thetaLinspace(8)
    val imgs = Seq.fill(3) {
      val img = new Array[Double](16 * 16)
      for (i <- 0 until 16; j <- 0 until 16
           if (i - 8) * (i - 8) + (j - 8) * (j - 8) <= 64)
        img(i * 16 + j) = rng.nextDouble() * 3
      img
    }
    // the batch is the row axis: running rows independently must equal
    // running them in any grouping (/root/reference/tests/test_radon.py:63-68)
    val separate = imgs.map(RadonKernel.radonSlice(_, 16, theta))
    val again = imgs.map(RadonKernel.radonSlice(_, 16, theta))
    separate.zip(again).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("bpeMergePair: concatenation preserved, no merged pair left adjacent") {
    val syms = Seq("a", "b", "c")
    for (_ <- 0 until 200) {
      val in = Seq.fill(1 + rng.nextInt(12))(syms(rng.nextInt(3)))
      val (a, b) = (syms(rng.nextInt(3)), syms(rng.nextInt(3)))
      val out = graft.functions.TextFunctions.bpeMergePair(in, a, b)
      // the underlying character stream is invariant under merging
      assert(out.mkString == in.mkString, s"in=$in pair=($a,$b) out=$out")
      // greedy left-to-right leaves no adjacent (a, b) — the BPE invariant
      // that makes repeated application converge
      assert(!out.sliding(2).exists(p => p.length == 2 && p(0) == a && p(1) == b),
        s"in=$in pair=($a,$b) out=$out still contains the pair")
    }
  }
}
