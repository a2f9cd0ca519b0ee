package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Every-k-th fixed-size frame extraction from a binary payload as a native
  * Expression: one bulk byte-array read in, `copyOfRange` slices out — no
  * per-element Scala-UDF converter boxing (the r3 measurement: ~40% of a
  * cheap kernel's cost), and the projection stays inside WholeStageCodegen.
  * The video-frame-sampling plumbing of [[graft.multimodal.Multimodal]];
  * the chunk model itself is the stub codec's (fixed `frameBytes` chunks).
  */
case class FrameSampleExpr(payload: Expression, frameBytes: Expression, everyK: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(payload, frameBytes, everyK)
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (payload.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"payload must be binary, got ${payload.dataType.sql}")
    else if (frameBytes.dataType != IntegerType || everyK.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("frameBytes/everyK must be int")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val p = payload.eval(input); val fb = frameBytes.eval(input); val k = everyK.eval(input)
    if (p == null || fb == null || k == null) null
    else FrameSampleExpr.call(p.asInstanceOf[Array[Byte]],
      fb.asInstanceOf[Int], k.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gs = children.map(_.genCode(ctx))
    val call = s"graft.exprs.FrameSampleExpr.call(${gs(0).value}, ${gs(1).value}, ${gs(2).value})"
    val childCode = code"${gs(0).code}\n${gs(1).code}\n${gs(2).code}"
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
    copy(payload = c(0), frameBytes = c(1), everyK = c(2))
}

object FrameSampleExpr {
  /** Plain-JVM bridge for generated code. */
  def call(payload: Array[Byte], frameBytes: Int, everyK: Int): ArrayData = {
    require(frameBytes > 0 && everyK > 0,
      s"frameBytes/everyK must be positive, got $frameBytes/$everyK")
    val nFrames = (payload.length + frameBytes - 1) / frameBytes
    val kept = if (nFrames == 0) 0 else (nFrames + everyK - 1) / everyK
    val out = new Array[Any](kept)
    var f = 0; var o = 0
    while (f < nFrames) {
      if (f % everyK == 0) {
        val from = f * frameBytes
        out(o) = java.util.Arrays.copyOfRange(payload, from,
          math.min(from + frameBytes, payload.length))
        o += 1
      }
      f += 1
    }
    new GenericArrayData(out)
  }

  def sample(payload: Column, frameBytes: Column, everyK: Column): Column =
    GraftColumnBridge.column(FrameSampleExpr(GraftColumnBridge.expression(payload),
      GraftColumnBridge.expression(frameBytes), GraftColumnBridge.expression(everyK)))
}
