package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Default-footprint binary morphology as a native Expression over
  * [[graft.kernels.StencilKernel]]: bulk `toBooleanArray`/`toIntArray`
  * reads in, one `UnsafeArrayData.fromPrimitiveArray` out — the same
  * boxing-elimination pattern as [[ZoomExpr]]/[[Interp1dExpr]], applied to
  * the erosion/dilation hot path
  * (/root/reference/imops/src/_morphology.pyx:313-329). `morphUdf` remains
  * the arbitrary-footprint entry point.
  */
case class MorphExpr(data: Expression, shape: Expression, dilation: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(data, shape, dilation)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = ArrayType(BooleanType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = data.dataType == ArrayType(BooleanType, containsNull = false) ||
      data.dataType == ArrayType(BooleanType, containsNull = true)
    if (!ok)
      TypeCheckResult.TypeCheckFailure(s"morph data must be array<boolean>, got ${data.dataType.sql}")
    else if (shape.dataType != ArrayType(IntegerType, containsNull = false) &&
             shape.dataType != ArrayType(IntegerType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(s"morph shape must be array<int>, got ${shape.dataType.sql}")
    else if (dilation.dataType != BooleanType)
      TypeCheckResult.TypeCheckFailure(s"morph dilation flag must be boolean, got ${dilation.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  // null-element policy is decided by the STATIC type, not the physical
  // representation: nullable element schemas get an explicit fail-fast scan
  // (ADVICE r3), dense schemas compile to the unguarded bulk read
  private lazy val dataElemNullable = ExprGuards.elemNullable(data.dataType)
  private lazy val shapeElemNullable = ExprGuards.elemNullable(shape.dataType)

  override def eval(input: InternalRow): Any = {
    val d = data.eval(input); val sh = shape.eval(input); val dil = dilation.eval(input)
    if (d == null || sh == null || dil == null) null
    else MorphExpr.call(
      ExprGuards.evalGuard(d.asInstanceOf[ArrayData], dataElemNullable, "morph data"),
      ExprGuards.evalGuard(sh.asInstanceOf[ArrayData], shapeElemNullable, "morph shape"),
      dil.asInstanceOf[Boolean])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gs = children.map(_.genCode(ctx))
    val call = s"""graft.exprs.MorphExpr.call(
            ${ExprGuards.genGuard(gs(0).value.toString, dataElemNullable, "morph data")},
            ${ExprGuards.genGuard(gs(1).value.toString, shapeElemNullable, "morph shape")},
            ${gs(2).value})"""
    val childCode = code"${gs(0).code}\n${gs(1).code}\n${gs(2).code}"
    // when no child is nullable, ev.isNull is the FalseLiteral "false" and
    // must not be redeclared as a boolean variable
    if (nullable) {
      val nullCheck = gs.map(_.isNull).mkString(" || ")
      ev.copy(code =
        code"""
          $childCode
          boolean ${ev.isNull} = $nullCheck;
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
          if (!${ev.isNull}) {
            ${ev.value} = $call;
          }
        """)
    } else {
      ev.copy(code =
        code"""
          $childCode
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $call;
        """)
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(data = c(0), shape = c(1), dilation = c(2))
}

object MorphExpr {
  /** Plain-JVM bridge for generated code. */
  def call(data: ArrayData, shape: ArrayData, dilation: Boolean): ArrayData = {
    val d = data.toBooleanArray()
    val sh = shape.toIntArray()
    val out =
      if (dilation) graft.kernels.StencilKernel.dilateDefault(d, sh)
      else graft.kernels.StencilKernel.erodeDefault(d, sh)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def erode(data: Column, shape: Column): Column =
    GraftColumnBridge.column(MorphExpr(GraftColumnBridge.expression(data),
      GraftColumnBridge.expression(shape), GraftColumnBridge.expression(
        org.apache.spark.sql.functions.lit(false))))

  def dilate(data: Column, shape: Column): Column =
    GraftColumnBridge.column(MorphExpr(GraftColumnBridge.expression(data),
      GraftColumnBridge.expression(shape), GraftColumnBridge.expression(
        org.apache.spark.sql.functions.lit(true))))
}
