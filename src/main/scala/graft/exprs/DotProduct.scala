package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Codegen'd dot product over two numeric array columns.
  *
  * The expression-API form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate array and runs interpreted lambda calls per
  * element; this native Expression compiles to a tight primitive loop inside
  * WholeStageCodegen — the preference order the build plan mandates for hot
  * scalar kernels (custom Expression > UDF > interpreted HOFs).
  *
  * Accumulation is ascending-index left-fold, matching both the interpreted
  * variant and the DuckDB oracle (`list_sum(list_transform(...))`), so all
  * three paths produce bit-identical doubles.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // only the element types the eval paths actually read: getFloat/getDouble
    // on an int/long/decimal UnsafeArrayData would misread bits, so reject
    // anything else at analysis time (callers cast, e.g. a.cast("array<double>"))
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float> or array<double>, got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null elements contribute nothing (array<double> from parquet can
      // carry containsNull=true even when no element is actually null)
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val lNull = left.dataType.asInstanceOf[ArrayType].containsNull
      val rNull = right.dataType.asInstanceOf[ArrayType].containsNull
      // emit the null guard only when the schema says elements can be null,
      // keeping the common all-non-null loop branch-free
      val guard =
        if (lNull || rNull) s"if (!$a.isNullAt($i) && !$b.isNullAt($i)) " else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard$acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column wrapper: Σ a[k]*b[k] as a codegen'd primitive loop. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
