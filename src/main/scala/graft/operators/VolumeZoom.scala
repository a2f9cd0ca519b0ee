package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.kernels.ZoomKernel

/** Slice-distributed 3-D zoom — the 100 TB path for the reference's
  * headline op (trilinear volume zoom,
  * /root/reference/imops/src/_zoom.pyx:372-399) on volumes too large for
  * one DataFrame row. The volume is stored as axis-0 slices (one row per
  * slice, row-major D1×D2 array); output slice `o` needs only the one
  * (order 0) or two (order 1) input slices its axis-0 source coordinate
  * brackets, so each input slice ships to the few output slices that
  * reference it — shuffle O(scale · volume), never a driver collect.
  *
  * Within a gathered group the full 8-corner trilinear formula of
  * [[ZoomKernel.zoom3]] runs per cell with the same per-axis tables
  * ([[ZoomKernel.axisTables]]), corner order (axis-0 bit fastest), and
  * weight association `(1.0 * w0 * w1 * w2)` — results are bit-identical
  * to the single-row kernel (VolumeZoomSpec asserts exact equality), the
  * same contract the 2-D [[TiledZoom]] holds.
  *
  * Output-buffer reuse (r12, guide §5): both emitters write each output
  * row into a PER-GROUP reused buffer — valid because every SQL-surface
  * consumer (toDF, collect, groupByKey/stitch) copies the row into an
  * UnsafeRow before the producing iterator advances. A caller that chains
  * a TYPED operator which buffers raw `ZSlice`/`ZStrip` objects across
  * elements (e.g. `mapPartitions(_.toArray...)` fused directly onto this
  * Dataset) must copy `data` first.
  */
object VolumeZoom {

  final case class ZSlice(id: Long, sid: Int, data: Array[Double])
  final case class SlicePiece(id: Long, stripe: Int, sid: Int, data: Array[Double])

  /** One horizontal strip of an output slice: rows `[strip·stripRows,
    * min((strip+1)·stripRows, n1))` of slice `sid`, row-major. */
  final case class ZStrip(id: Long, sid: Int, strip: Int, data: Array[Double])

  /** Zoom a (D0 × D1 × D2) volume of axis-0 slices by `scale`; returns
    * output slices (newD1 × newD2 row-major).
    *
    * Output slices are produced in STRIPES of `stripeSize`: each stripe's
    * source slices form one contiguous range, so an input slice ships to
    * the ~1-2 stripes whose range contains it — shuffle duplication
    * ≈ 1 + 2·scale/stripeSize of the volume, vs 2·scale× for a naive
    * per-output-slice gather (measured 7.8× faster end-to-end at 256³×2:
    * 6.16 s → 0.79 s on 32 cores — fewer groups also means fewer
    * per-group map materializations, not just fewer shuffled bytes).
    *
    * `stripeSize` is an UPPER BOUND; the effective stripe adapts to the
    * volume so group count stays in the sweet spot measured by the r8
    * stripe sweep (7680×256×256 / x30, 32 cores, 24 g heap — the r7
    * superlinear time tail was a STRIPE-WIDTH story, not an inherent heap
    * wall): forced stripe 8 → 115.7 s (16.9× x10→x30 tail, 50 s GC —
    * group count explodes the shuffle-block fan-out), 16 → 27.9 s (5.7×
    * tail), 32 → 13.0 s with an exactly-linear 3.02× tail and −10%
    * shuffle, 64 → GC re-climbs (35.8 s) and small volumes starve (8
    * groups on 32 cores at the x1 shape). Outputs stream out of
    * flatMapGroups lazily, so a wider stripe does NOT widen the task live
    * set — it only cuts group-fixed costs and duplication. The adaptive
    * rule `clamp(n0_out / (2·cores), 1, stripeSize)` therefore takes the
    * widest stripe that still leaves ≥ 2 waves of groups per core: the
    * 512³ single-tensor shape picks 16 (64 groups — measured 1.5 s vs
    * 4.2 s when forced to 32's single unbalanced wave), the x30 soak
    * shape picks the full 32, and test-sized volumes degrade to
    * one-slice stripes (striping never changes results — only grouping;
    * VolumeZoomSpec pins bit-equality across stripe widths). */
  def apply(slices: Dataset[ZSlice], dims: Array[Int], scale: Array[Double], order: Int,
            stripeSize: Int = 32)
           (implicit spark: SparkSession): Dataset[ZSlice] = {
    import spark.implicits._
    require(dims.length == 3 && scale.length == 3, "VolumeZoom is rank-3")
    require(order == 0 || order == 1, s"order $order unsupported")
    require(stripeSize >= 1, "stripeSize must be >= 1")
    val Array(d0, d1, d2) = dims
    val n0 = ZoomKernel.outDim(d0, scale(0))
    val n1 = ZoomKernel.outDim(d1, scale(1))
    val n2 = ZoomKernel.outDim(d2, scale(2))
    val t0 = ZoomKernel.axisTables(d0, n0)
    val t1 = ZoomKernel.axisTables(d1, n1)
    val t2 = ZoomKernel.axisTables(d2, n2)
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    val effStripe = math.max(1, math.min(stripeSize, n0 / (2 * par)))
    val nStripes = (n0 + effStripe - 1) / effStripe

    // exact input-slice set needed by each output stripe (driver-side:
    // O(n0) ints total) — a set, not a [min,max] range, so an order-0
    // heavy downscale ships only the slices actually sampled
    def needOf(o: Int): Seq[Int] =
      if (order == 0) Seq(t0.nr(o)) else Seq(t0.lo(o), t0.hi(o))
    val needed: Array[Set[Int]] = Array.tabulate(nStripes) { st =>
      (st * effStripe until math.min((st + 1) * effStripe, n0)).flatMap(needOf).toSet
    }

    val pieces = slices.flatMap { sl =>
      (0 until nStripes).collect {
        case st if needed(st)(sl.sid) => SlicePiece(sl.id, st, sl.sid, sl.data)
      }
    }
    pieces.groupByKey(p => (p.id, p.stripe)).flatMapGroups {
      (key: (Long, Int), it: Iterator[SlicePiece]) =>
        val (id, st) = key
        val bySid = it.map(p => p.sid -> p.data).toMap
        val oLo = st * effStripe
        val oHi = math.min(oLo + effStripe, n0)
        // one reused output buffer per group (all slices are n1·n2) — see
        // fillRows' reuse contract: the downstream serializer copies each
        // slice into an UnsafeRow before the iterator advances.
        val buf = new Array[Double](n1 * n2)
        (oLo until oHi).iterator.map { os =>
          ZSlice(id, os, fillRows(bySid, os, 0, n1, n1, n2, d2, order, t0, t1, t2, buf))
        }
    }
  }

  /** Compute rows `[rLo, rHi)` of output slice `os` — the shared per-cell
    * math of the slice and strip emitters (exact corner order and weight
    * association of ZoomKernel.zoom3, axis 0 = the slice axis), so the
    * stitched strip output is bit-identical to the slice output
    * (VolumeZoomSpec pins this). */
  private def fillRows(bySid: Map[Int, Array[Double]], os: Int, rLo: Int, rHi: Int,
                       n1: Int, n2: Int, d2: Int, order: Int,
                       t0: ZoomKernel.AxisTable, t1: ZoomKernel.AxisTable,
                       t2: ZoomKernel.AxisTable,
                       buf: Array[Double] = null): Array[Double] = {
    // `buf` (when provided, exactly (rHi-rLo)*n2 long) is REUSED across
    // emissions: the strip emitter's output iterator is consumed by
    // SerializeFromObject, which copies the array into an UnsafeRow before
    // the next element is produced, so a shared buffer is never observed
    // twice. Cuts per-rep allocation at the 512³ bench shape from the full
    // 8.6 GiB output volume to O(strip) — the r11-verdict GC-debt fix.
    val out = if (buf != null) buf else new Array[Double]((rHi - rLo) * n2)
    var p = 0
    if (order == 0) {
      val src = bySid(t0.nr(os))
      var i = rLo
      while (i < rHi) {
        val base = t1.nr(i) * d2
        var j = 0
        while (j < n2) { out(p) = src(base + t2.nr(j)); p += 1; j += 1 }
        i += 1
      }
    } else {
      val lo0 = bySid(t0.lo(os)); val hi0 = bySid(t0.hi(os)); val f0 = t0.fr(os)
      var i = rLo
      while (i < rHi) {
        val l1 = t1.lo(i) * d2; val h1 = t1.hi(i) * d2; val f1 = t1.fr(i)
        var j = 0
        while (j < n2) {
          val l2 = t2.lo(j); val h2 = t2.hi(j); val f2 = t2.fr(j)
          out(p) = (1.0 * (1 - f0) * (1 - f1) * (1 - f2)) * lo0(l1 + l2) +
                   (1.0 * f0 * (1 - f1) * (1 - f2)) * hi0(l1 + l2) +
                   (1.0 * (1 - f0) * f1 * (1 - f2)) * lo0(h1 + l2) +
                   (1.0 * f0 * f1 * (1 - f2)) * hi0(h1 + l2) +
                   (1.0 * (1 - f0) * (1 - f1) * f2) * lo0(l1 + h2) +
                   (1.0 * f0 * (1 - f1) * f2) * hi0(l1 + h2) +
                   (1.0 * (1 - f0) * f1 * f2) * lo0(h1 + h2) +
                   (1.0 * f0 * f1 * f2) * hi0(h1 + h2)
          p += 1; j += 1
        }
        i += 1
      }
    }
    out
  }

  /** Strip-emitting variant of [[apply]] — the allocation-shaped 100 TB
    * path. Identical shuffle plan and per-cell math, but each output slice
    * is emitted as row strips of at most `maxRowBytes` (default 1 MiB —
    * below HALF the G1 region size for any heap ≥ 4 GiB, the humongous
    * threshold, with margin), so
    * no produced row is ever a G1 humongous object at the DEFAULT heap
    * region size: the r8 driver bench recorded the full-slice form at 512³
    * (8 MiB output rows) intermittently 6× slower purely from humongous-
    * region full-GC churn, and the soak's x30 tail ratio 7.4 had the same
    * GC signature. Strip boundaries never change values — only row
    * grouping (VolumeZoomSpec pins stitched bit-equality). */
  def strips(slices: Dataset[ZSlice], dims: Array[Int], scale: Array[Double], order: Int,
             stripeSize: Int = 32, maxRowBytes: Int = 1 << 20)
            (implicit spark: SparkSession): Dataset[ZStrip] = {
    import spark.implicits._
    require(dims.length == 3 && scale.length == 3, "VolumeZoom is rank-3")
    require(order == 0 || order == 1, s"order $order unsupported")
    require(stripeSize >= 1, "stripeSize must be >= 1")
    require(maxRowBytes >= 8, "maxRowBytes must hold at least one cell")
    val Array(d0, d1, d2) = dims
    val n0 = ZoomKernel.outDim(d0, scale(0))
    val n1 = ZoomKernel.outDim(d1, scale(1))
    val n2 = ZoomKernel.outDim(d2, scale(2))
    val t0 = ZoomKernel.axisTables(d0, n0)
    val t1 = ZoomKernel.axisTables(d1, n1)
    val t2 = ZoomKernel.axisTables(d2, n2)
    val stripRows = math.max(1, math.min(n1.toLong, maxRowBytes.toLong / 8 / math.max(1, n2)).toInt)
    val nStrips = (n1 + stripRows - 1) / stripRows
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    val effStripe = math.max(1, math.min(stripeSize, n0 / (2 * par)))
    val nStripes = (n0 + effStripe - 1) / effStripe
    def needOf(o: Int): Seq[Int] =
      if (order == 0) Seq(t0.nr(o)) else Seq(t0.lo(o), t0.hi(o))
    val needed: Array[Set[Int]] = Array.tabulate(nStripes) { st =>
      (st * effStripe until math.min((st + 1) * effStripe, n0)).flatMap(needOf).toSet
    }
    val pieces = slices.flatMap { sl =>
      (0 until nStripes).collect {
        case st if needed(st)(sl.sid) => SlicePiece(sl.id, st, sl.sid, sl.data)
      }
    }
    pieces.groupByKey(p => (p.id, p.stripe)).flatMapGroups {
      (key: (Long, Int), it: Iterator[SlicePiece]) =>
        val (id, st) = key
        val bySid = it.map(p => p.sid -> p.data).toMap
        val oLo = st * effStripe
        val oHi = math.min(oLo + effStripe, n0)
        // one buffer per strip LENGTH (full-width strips plus at most one
        // shorter remainder), reused across every emission in the group —
        // see fillRows' reuse contract. The downstream serializer copies
        // each strip before the iterator advances.
        val bufs = scala.collection.mutable.Map.empty[Int, Array[Double]]
        for {
          os <- (oLo until oHi).iterator
          sp <- (0 until nStrips).iterator
        } yield {
          val rLo = sp * stripRows
          val rHi = math.min(rLo + stripRows, n1)
          val buf = bufs.getOrElseUpdate((rHi - rLo) * n2, new Array[Double]((rHi - rLo) * n2))
          ZStrip(id, os, sp, fillRows(bySid, os, rLo, rHi, n1, n2, d2, order, t0, t1, t2, buf))
        }
    }
  }

  /** Reassemble strip output into full slices (groups by (id, sid); one
    * O(slice) concat per slice). For consumers that need the `ZSlice`
    * contract back after a striped run — at true scale prefer consuming
    * strips directly. */
  def stitch(strips: Dataset[ZStrip])(implicit spark: SparkSession): Dataset[ZSlice] = {
    import spark.implicits._
    strips.groupByKey(s => (s.id, s.sid)).mapGroups { (key, it) =>
      val parts = it.toArray.sortBy(_.strip)
      val total = parts.iterator.map(_.data.length).sum
      val out = new Array[Double](total)
      var p = 0
      parts.foreach { s => System.arraycopy(s.data, 0, out, p, s.data.length); p += s.data.length }
      ZSlice(key._1, key._2, out)
    }
  }
}
