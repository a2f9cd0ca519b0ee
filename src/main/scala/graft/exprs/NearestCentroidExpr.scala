package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Codegen'd max-cosine centroid assignment: argmax over the quantizer in
  * one primitive pass, returning struct(cid, ccos).
  *
  * This is the hot-loop form of `assignBest`'s interpreted `aggregate`
  * fold (kept as the reference backend for the agreement spec). The fold's
  * cost class bites twice: interpreted lambda evaluation per centroid per
  * row, and — measured in the IVF-PQ soak — Catalyst pushing
  * `isnotnull(<fold>)` from a downstream equi-join INTO a join condition,
  * re-evaluating the whole fold per joined pair. A native Expression is
  * ~2 orders cheaper per evaluation and cheap enough that incidental
  * re-evaluation stops mattering.
  *
  * Bit-identical semantics to the fold, spec-pinned:
  *  - cosine = dot(a,c) / (sqrt(dot(a,a)) * sqrt(dot(c,c))), every dot an
  *    ascending-index left-fold; centroid self-dots precompute with the
  *    same loop (IEEE-identical to recomputing per row).
  *  - ccos rounds to 6 places exactly as Spark's `round` does for doubles
  *    (BigDecimal.valueOf → HALF_UP; NaN/Infinity pass through).
  *  - argmax compares with java.lang.Double.compare (Spark's double
  *    ordering — NaN greatest, -0.0 < 0.0) and keeps the LOWEST centroid
  *    id on ties (entries iterate id-ascending, strict-greater replaces).
  *  - empty quantizer → the fold's zero: (cid -1, ccos -2.0).
  *  - null elements contribute nothing (the DotProduct convention).
  */
case class NearestCentroid(child: Expression, ids: Array[Long],
                           cents: Array[Array[Double]]) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid expects array<float> or array<double>, got ${dt.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("ccos", DoubleType, nullable = false)))

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** sqrt(Σ c[k]²), ascending fold — the exact value the interpreted path
    * computes per row via sqrt(dot(c, c)). */
  @transient private lazy val centNorms: Array[Double] =
    cents.map { c =>
      var acc = 0.0; var k = 0
      while (k < c.length) { acc += c(k) * c(k); k += 1 }
      math.sqrt(acc)
    }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = arr.numElements()
    // dot(a, a) with the null-skip guard, ascending
    var da = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
        da += x * x
      }
      i += 1
    }
    val na = math.sqrt(da)
    var bestCos = -2.0
    var bestCid = -1L
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val lim = math.min(n, c.length)
      var dot = 0.0
      var k = 0
      while (k < lim) {
        if (!arr.isNullAt(k)) {
          val x = if (isF) arr.getFloat(k).toDouble else arr.getDouble(k)
          dot += x * c(k)
        }
        k += 1
      }
      val cos = dot / (na * centNorms(j))
      val r = NearestCentroid.round6(cos)
      if (java.lang.Double.compare(r, bestCos) > 0) { bestCos = r; bestCid = ids(j) }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestCos))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("ncCents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("ncNorms", centNorms, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val guarded = child.dataType.asInstanceOf[ArrayType].containsNull
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val da = ctx.freshName("da")
      val na = ctx.freshName("na")
      val c = ctx.freshName("c")
      val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot")
      val cos = ctx.freshName("cos")
      val r = ctx.freshName("r")
      val bestCos = ctx.freshName("bestCos")
      val bestCid = ctx.freshName("bestCid")
      val x = ctx.freshName("x")
      def g(idx: String, body: String) =
        if (guarded) s"if (!$a.isNullAt($idx)) { $body }" else body
      s"""
         |int $n = $a.numElements();
         |double $da = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${g(i, s"double $x = (double) $a.$get($i); $da += $x * $x;")}
         |}
         |double $na = java.lang.Math.sqrt($da);
         |double $bestCos = -2.0;
         |long $bestCid = -1L;
         |for (int $j = 0; $j < $centsRef.length; $j++) {
         |  double[] $c = $centsRef[$j];
         |  int $lim = java.lang.Math.min($n, $c.length);
         |  double $dot = 0.0;
         |  for (int $k = 0; $k < $lim; $k++) {
         |    ${g(k, s"double $x = (double) $a.$get($k); $dot += $x * $c[$k];")}
         |  }
         |  double $cos = $dot / ($na * $normsRef[$j]);
         |  double $r = graft.exprs.NearestCentroid.round6($cos);
         |  if (java.lang.Double.compare($r, $bestCos) > 0) { $bestCos = $r; $bestCid = $idsRef[$j]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $bestCid, $bestCos });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Spark's own double `round(x, 6)` semantics: BigDecimal.valueOf
    * (decimal string repr) → setScale(6, HALF_UP); NaN/Infinity pass
    * through unrounded.
    *
    * Fast path (r11): this sits in the per-CANDIDATE inner loop of every
    * nearest-centroid argmax, and BigDecimal.valueOf goes through
    * Double.toString — it dominated the whole assignment pass at large k
    * (jstack'd at the top of every executor thread in the x1000 soak).
    * When the scaled value is comfortably away from a .5 tie the
    * half-up result is plain floor(y+0.5)/1e6: for |y| ≤ 2^52 the
    * binary-scaling error (≤ 0.5 ulp(1e6) ≈ 6e-11) and the shortest-repr
    * deviation BigDecimal.valueOf sees (≤ ulp(v)·1e6 ≈ 1e-10 for cosines)
    * are 4+ orders below the 1e-6 guard band, so fast and slow paths
    * agree exactly; within the band we defer to BigDecimal. Pinned
    * bit-equal against the BigDecimal form over random + adversarial
    * near-tie inputs by PropertySpec. */
  def round6(v: Double): Double = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return v
    if (v == 0.0) return 0.0 // BigDecimal.valueOf(-0.0) normalizes to +0.0
    val y = v * 1e6
    if (math.abs(y) < 4.5e15) {
      val f = math.floor(y)
      val d = y - f
      if (math.abs(d - 0.5) > 1e-6)
        return (if (d > 0.5) f + 1.0 else f) / 1e6
    }
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** The shared argmax kernel: (best id, best rounded cosine) of `arr`
    * against id-ascending (ids, cents, norms) — the exact loop the
    * NearestCentroid codegen emits, exposed for expressions whose
    * centroid set is row-dependent ([[NearestCentroidByCell]]) and so
    * cannot bake the loops at codegen time. Empty set → (-1, -2.0). */
  def bestRow(arr: ArrayData, isFloat: Boolean, ids: Array[Long],
              cents: Array[Array[Double]], norms: Array[Double]): InternalRow = {
    val n = arr.numElements()
    var da = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        da += x * x
      }
      i += 1
    }
    val na = math.sqrt(da)
    var bestCos = -2.0
    var bestCid = -1L
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val lim = math.min(n, c.length)
      var dot = 0.0
      var k = 0
      while (k < lim) {
        if (!arr.isNullAt(k)) {
          val x = if (isFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
          dot += x * c(k)
        }
        k += 1
      }
      val r = round6(dot / (na * norms(j)))
      if (java.lang.Double.compare(r, bestCos) > 0) { bestCos = r; bestCid = ids(j) }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestCos))
  }

  /** Column wrapper: struct(cid, ccos) of the max-cosine centroid among
    * `cen` (iterated in the given order — pass id-ascending for the
    * min-id tie rule). */
  def best(emb: Column, cen: Seq[(Long, Seq[Double])]): Column =
    GraftColumnBridge.column(NearestCentroid(GraftColumnBridge.expression(emb),
      cen.map(_._1).toArray, cen.map(_._2.toArray).toArray))
}
