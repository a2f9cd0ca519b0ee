package graft.kernels

import graft.core.NdTensor

/** Connected-components labeling, semantics of the reference `label`
  * (/root/reference/imops/measure.py:33-137):
  *
  *  - groups equal-valued non-background cells; default background 0, a custom
  *    background is value-swapped with 0 before labeling (measure.py:106-113)
  *  - connectivity c in 1..ndim: neighbors differing by +-1 on at most c axes
  *    (the skimage convention, mapped to cc3d 4/8/6/18/26 in `_SKIMAGE2CC3D`,
  *    measure.py:22-29); default = ndim
  *  - output labels are 1..N in first-appearance (row-major scan) order
  *  - extras: count, label list, per-component sizes (measure.py:120-132)
  */
object LabelKernel {

  final case class Result(labels: Array[Long], num: Int, sizes: Array[Long])

  def label(data: Array[Double], shape: Array[Int],
            background: Double = 0.0, connectivity: Int = -1): Result = {
    val rank = shape.length
    val conn = if (connectivity <= 0) rank else connectivity
    require(conn >= 1 && conn <= rank, s"connectivity $conn out of 1..$rank")
    val n = data.length
    // background swap trick (measure.py:106-113): treat `background` as 0
    val vals = if (background == 0.0) data
               else data.map(v => if (v == background) 0.0 else if (v == 0.0) background else v)
    val parent = Array.tabulate(n)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val strides = NdTensor.strides(shape)
    // neighbor offsets with <= conn nonzero components, only "previous" ones
    val offs = neighborOffsets(rank, conn)
    val idx = new Array[Int](rank)
    var flat = 0
    while (flat < n) {
      if (vals(flat) != 0.0) {
        var d = 0
        while (d < rank) { idx(d) = (flat / strides(d)) % shape(d); d += 1 }
        var k = 0
        while (k < offs.length) {
          val off = offs(k)
          var oob = false
          var nFlat = 0
          var dd = 0
          while (dd < rank) {
            val c = idx(dd) + off(dd)
            if (c < 0 || c >= shape(dd)) oob = true else nFlat += c * strides(dd)
            dd += 1
          }
          if (!oob && nFlat < flat && vals(nFlat) == vals(flat)) union(flat, nFlat)
          k += 1
        }
      }
      flat += 1
    }
    val labelOf = new java.util.HashMap[Int, Int]()
    val labels = new Array[Long](n)
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    flat = 0
    while (flat < n) {
      if (vals(flat) != 0.0) {
        val root = find(flat)
        var lb = labelOf.getOrDefault(root, -1)
        if (lb == -1) { lb = sizes.length + 1; labelOf.put(root, lb); sizes += 0L }
        labels(flat) = lb
        sizes(lb - 1) += 1L
      }
      flat += 1
    }
    Result(labels, sizes.length, sizes.toArray)
  }

  /** All offsets in {-1,0,1}^rank \ {0} with at most `conn` nonzero axes,
    * restricted to "previous in scan order" (first nonzero component is -1). */
  private def neighborOffsets(rank: Int, conn: Int): Array[Array[Int]] = {
    val all = Array.newBuilder[Array[Int]]
    val total = math.pow(3, rank).toInt
    var code = 0
    while (code < total) {
      val off = new Array[Int](rank)
      var c = code
      var nz = 0
      var d = rank - 1
      while (d >= 0) { off(d) = c % 3 - 1; if (off(d) != 0) nz += 1; c /= 3; d -= 1 }
      if (nz >= 1 && nz <= conn) {
        // keep only predecessors in row-major scan order (negative lexicographic)
        var firstNonzero = 0
        while (firstNonzero < rank && off(firstNonzero) == 0) firstNonzero += 1
        if (off(firstNonzero) < 0) all += off
      }
      code += 1
    }
    all.result()
  }
}
