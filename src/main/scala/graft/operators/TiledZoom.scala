package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.kernels.ZoomKernel

/** Tiled zoom over row stripes — the 100 TB path for `zoom` on images too
  * large for one row. A 2-D image is stored as full-width stripes of `ts`
  * rows; output stripe o needs only the input rows its source coordinates
  * bracket (1-row halo for order-1), so each input stripe ships to the few
  * output stripes whose range overlaps it — shuffle O(overlap), not
  * O(image). Sampling uses the exact same per-axis tables as the in-row
  * kernel (ZoomKernel.axisTables), so results are bit-identical.
  */
object TiledZoom {

  final case class Stripe(id: Long, sid: Int, data: Array[Double]) // ts rows x C
  final case class StripePiece(id: Long, osid: Int, sid: Int, data: Array[Double])

  /** Zoom (R x C) stripes by (s0, s1); returns output stripes of `ts` rows
    * (last one ragged) x newC. */
  def apply(stripes: Dataset[Stripe], ts: Int, rows: Int, cols: Int,
            s0: Double, s1: Double, order: Int)
           (implicit spark: SparkSession): Dataset[Stripe] = {
    import spark.implicits._
    val newR = ZoomKernel.outDim(rows, s0)
    val newC = ZoomKernel.outDim(cols, s1)
    val t0 = ZoomKernel.axisTables(rows, newR)
    val t1 = ZoomKernel.axisTables(cols, newC)
    val nOut = (newR + ts - 1) / ts

    // input row range needed by each output stripe
    val needLo = Array.tabulate(nOut) { o =>
      (o * ts until math.min((o + 1) * ts, newR)).map(t0.lo).min
    }
    val needHi = Array.tabulate(nOut) { o =>
      (o * ts until math.min((o + 1) * ts, newR)).map(oi => math.max(t0.hi(oi), t0.nr(oi))).max
    }

    val pieces = stripes.flatMap { st =>
      val a = st.sid * ts
      val b = math.min(a + ts, rows)
      (0 until nOut).collect {
        case o if needLo(o) < b && needHi(o) >= a =>
          StripePiece(st.id, o, st.sid, st.data)
      }
    }
    pieces.groupByKey(p => (p.id, p.osid)).mapGroups { (key: (Long, Int), it: Iterator[StripePiece]) =>
      val (id, o) = key
      val bySid = it.map(p => p.sid -> p.data).toMap
      def src(r: Int, c: Int): Double = bySid(r / ts)(r % ts * cols + c)
      val oLo = o * ts
      val oHi = math.min(oLo + ts, newR)
      val out = new Array[Double]((oHi - oLo) * newC)
      var p = 0
      var oi = oLo
      while (oi < oHi) {
        if (order == 0) {
          val r = t0.nr(oi)
          var oj = 0
          while (oj < newC) { out(p) = src(r, t1.nr(oj)); p += 1; oj += 1 }
        } else {
          val l0 = t0.lo(oi); val h0 = t0.hi(oi); val f0 = t0.fr(oi)
          var oj = 0
          while (oj < newC) {
            val l1 = t1.lo(oj); val h1 = t1.hi(oj); val f1 = t1.fr(oj)
            // corner order/association identical to ZoomKernel.zoom2
            out(p) = (1.0 * (1 - f0) * (1 - f1)) * src(l0, l1) +
                     (1.0 * f0 * (1 - f1)) * src(h0, l1) +
                     (1.0 * (1 - f0) * f1) * src(l0, h1) +
                     (1.0 * f0 * f1) * src(h0, h1)
            p += 1; oj += 1
          }
        }
        oi += 1
      }
      Stripe(id, o, out)
    }
  }

  def toStripes(data: Array[Double], rows: Int, cols: Int, ts: Int, id: Long = 0L): Seq[Stripe] =
    (0 until (rows + ts - 1) / ts).map { s =>
      val a = s * ts
      val b = math.min(a + ts, rows)
      Stripe(id, s, data.slice(a * cols, b * cols))
    }

  def fromStripes(stripes: Seq[Stripe], rows: Int, cols: Int, ts: Int): Array[Double] = {
    val out = new Array[Double](rows * cols)
    stripes.foreach { s =>
      System.arraycopy(s.data, 0, out, s.sid * ts * cols, s.data.length)
    }
    out
  }
}
