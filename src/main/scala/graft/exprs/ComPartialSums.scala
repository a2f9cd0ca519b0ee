package graft.exprs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-row center-of-mass partial sums over a 2-D slice of a stacked
  * volume — the codegen'd half of the vectorized center_of_mass path.
  *
  * The TypedImperativeAggregate path ([[CenterOfMassAgg]]) runs through
  * ObjectHashAggregateExec, which sits OUTSIDE whole-stage codegen: every
  * slice row pays an interpreted `eval` + a bulk `toDoubleArray()` copy
  * before the reduction loop. This expression instead folds the whole
  * per-slice reduction (the reference's inner prange body,
  * /root/reference/imops/src/_measure.pyx:73-91) into a single generated
  * primitive loop inside WholeStageCodegen — zero copies, direct
  * `ArrayData.getDouble` reads — and leaves only four scalar doubles per
  * row for a plain codegen'd hash aggregate to sum.
  *
  * Output: `[Σw, Σw·slice, Σw·row, Σw·col]` for one slice row. Row-local
  * accumulation order matches [[CenterOfMassAgg.update]] exactly, so both
  * paths produce bit-identical partials.
  */
case class ComPartialSums(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  private def data = first
  private def rows = second
  private def cols = third
  private def sliceIdx = fourth

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val dataOk = data.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    def integral(e: Expression) = e.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
      case _ => false
    }
    if (!dataOk)
      TypeCheckResult.TypeCheckFailure(
        s"com_partial data must be array<double>, got ${data.dataType.sql}")
    else if (!integral(rows) || !integral(cols) || !integral(sliceIdx))
      TypeCheckResult.TypeCheckFailure(
        "com_partial rows/cols/sliceIdx must be integral, got " +
          s"${rows.dataType.sql}/${cols.dataType.sql}/${sliceIdx.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(d: Any, r: Any, c: Any, s: Any): Any = {
    val arr = d.asInstanceOf[ArrayData]
    val nr = r.asInstanceOf[Number].intValue()
    val nc = c.asInstanceOf[Number].intValue()
    // ArrayData.getDouble on UnsafeArrayData is an unchecked off-heap read:
    // rows/cols inconsistent with the array length must fail, not read garbage
    if (nr.toLong * nc > arr.numElements())
      throw new IllegalArgumentException(
        s"com_partial: rows*cols = ${nr.toLong * nc} exceeds array length ${arr.numElements()}")
    val sl = s.asInstanceOf[Number].longValue().toDouble
    val canBeNull = data.dataType.asInstanceOf[ArrayType].containsNull
    var sw = 0.0; var swi = 0.0; var swj = 0.0
    var i = 0; var p = 0
    while (i < nr) {
      var rowW = 0.0; var rowWj = 0.0
      var j = 0
      while (j < nc) {
        val w = if (canBeNull && arr.isNullAt(p)) 0.0 else arr.getDouble(p)
        rowW += w; rowWj += w * j
        j += 1; p += 1
      }
      sw += rowW; swi += rowW * i; swj += rowWj
      i += 1
    }
    new GenericArrayData(Array(sw, sw * sl, swi, swj))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (arr, r, c, s) => {
      val sw = ctx.freshName("sw"); val swi = ctx.freshName("swi")
      val swj = ctx.freshName("swj"); val sl = ctx.freshName("sl")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val w = ctx.freshName("w")
      val rowW = ctx.freshName("rowW"); val rowWj = ctx.freshName("rowWj")
      val nr = ctx.freshName("nr"); val nc = ctx.freshName("nc")
      // emit the element null guard only when the schema allows nulls,
      // keeping the common path a branch-free streaming read
      val get =
        if (data.dataType.asInstanceOf[ArrayType].containsNull)
          s"($arr.isNullAt($p) ? 0.0 : $arr.getDouble($p))"
        else s"$arr.getDouble($p)"
      s"""
         |int $nr = (int) $r;
         |int $nc = (int) $c;
         |if ((long) $nr * $nc > $arr.numElements()) {
         |  throw new IllegalArgumentException("com_partial: rows*cols = " +
         |    ((long) $nr * $nc) + " exceeds array length " + $arr.numElements());
         |}
         |double $sl = (double) $s;
         |double $sw = 0.0; double $swi = 0.0; double $swj = 0.0;
         |int $p = 0;
         |for (int $i = 0; $i < $nr; $i++) {
         |  double $rowW = 0.0; double $rowWj = 0.0;
         |  for (int $j = 0; $j < $nc; $j++) {
         |    double $w = $get;
         |    $rowW += $w; $rowWj += $w * $j;
         |    $p++;
         |  }
         |  $sw += $rowW; $swi += $rowW * $i; $swj += $rowWj;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new double[]{$sw, $sw * $sl, $swi, $swj});
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object ComPartialSums {
  /** Column form: per-slice-row `[Σw, Σw·s, Σw·i, Σw·j]`. */
  def comPartial(data: Column, rows: Column, cols: Column, sliceIdx: Column): Column =
    GraftColumnBridge.column(
      ComPartialSums(GraftColumnBridge.expression(data), GraftColumnBridge.expression(rows),
        GraftColumnBridge.expression(cols), GraftColumnBridge.expression(sliceIdx)))

  /** Whole-volume center of mass as a two-stage codegen plan: per-row
    * partial sums (generated primitive loop) + a plain hash aggregate over
    * four scalar doubles. Same result as [[CenterOfMassAgg.centerOfMass]]
    * with the volume framing; this is the throughput path for large
    * volumes (the agg stays inside WholeStageCodegen end-to-end).
    * Returns one row `(com_s, com_i, com_j)`.
    */
  def centerOfMassVolume(df: DataFrame, data: Column, rows: Column, cols: Column,
                         sliceIdx: Column): DataFrame = {
    df.select(comPartial(data, rows, cols, sliceIdx).as("p"))
      .select(element_at(col("p"), 1).as("sw"), element_at(col("p"), 2).as("sws"),
              element_at(col("p"), 3).as("swi"), element_at(col("p"), 4).as("swj"))
      .agg((sum("sws") / sum("sw")).as("com_s"),
           (sum("swi") / sum("sw")).as("com_i"),
           (sum("swj") / sum("sw")).as("com_j"))
  }
}
