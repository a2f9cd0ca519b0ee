package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd product-quantization encoder: ALL m subspace codes of one
  * embedding in a single primitive pass.
  *
  * The expression-API form (per subspace, an `aggregate` argmin fold whose
  * lambda runs a `zip_with` squared-distance fold per codebook entry) pays
  * interpreted lambda calls and an intermediate array allocation per
  * (subspace × entry) — ~m·ks allocations per row; this native Expression
  * compiles to three nested primitive loops inside WholeStageCodegen with
  * the codebook as one constant `double[][][]` reference (the
  * Expression > UDF > interpreted-HOF preference order).
  *
  * Semantics are bit-identical to the fold path ([[graft.functions.
  * SimilarityFunctions.pqEncodeHof]], spec-pinned): per subspace the
  * squared distance accumulates in ascending component order (IEEE-exact),
  * quantizes via floor(d2·1e6 + 0.5) to a long, and the argmin keeps the
  * LOWEST entry index on ties (strict less-than replacement over ascending
  * j). Null elements contribute nothing (the DotProduct convention); an
  * embedding shorter than m·dsub yields null.
  */
case class PqCodes(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = books.length
  private val dsub = if (m > 0 && books(0).length > 0) books(0)(0).length else 0

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_codes expects array<float> or array<double>, got ${dt.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() < m * dsub) return null
    val isF = elemIsFloat
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var bestD = Long.MaxValue
      var bestJ = Long.MaxValue
      var j = 0
      while (j < book.length) {
        val cb = book(j)
        var acc = 0.0
        var k = 0
        while (k < dsub) {
          if (!arr.isNullAt(off + k)) {
            val x = if (isF) arr.getFloat(off + k).toDouble else arr.getDouble(off + k)
            val d = x - cb(k)
            acc += d * d
          }
          k += 1
        }
        val dq = math.floor(acc * 1e6 + 0.5).toLong
        if (dq < bestD) { bestD = dq; bestJ = j.toLong }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val guard =
      if (child.dataType.asInstanceOf[ArrayType].containsNull) true else false
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val off = ctx.freshName("off")
      val book = ctx.freshName("book")
      val cb = ctx.freshName("cb")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val dq = ctx.freshName("dq")
      val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ")
      val x = ctx.freshName("x")
      val body =
        if (guard)
          s"""if (!$a.isNullAt($off + $k)) {
             |  double $x = (double) $a.$get($off + $k);
             |  double $d = $x - $cb[$k];
             |  $acc += $d * $d;
             |}""".stripMargin
        else
          s"""double $x = (double) $a.$get($off + $k);
             |double $d = $x - $cb[$k];
             |$acc += $d * $d;""".stripMargin
      s"""
         |if ($a.numElements() < ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $codes = new long[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    double[][] $book = $booksRef[$s];
         |    int $off = $s * $dsub;
         |    long $bestD = Long.MAX_VALUE;
         |    long $bestJ = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $book.length; $j++) {
         |      double[] $cb = $book[$j];
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < $dsub; $k++) {
         |        $body
         |      }
         |      long $dq = (long) java.lang.Math.floor($acc * 1e6 + 0.5);
         |      if ($dq < $bestD) { $bestD = $dq; $bestJ = (long) $j; }
         |    }
         |    $codes[$s] = $bestJ;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {
  /** Column wrapper: the m PQ codes of `emb` against `books` (m × ks ×
    * dsub), one codegen'd pass. */
  def codes(emb: Column, books: Seq[Seq[(Long, Seq[Double])]]): Column = {
    val arr = books.map(b => b.map(_._2.toArray).toArray).toArray
    GraftColumnBridge.column(PqCodes(GraftColumnBridge.expression(emb), arr))
  }
}
