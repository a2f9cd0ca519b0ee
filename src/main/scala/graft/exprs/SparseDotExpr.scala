package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd sparse dot product over two TERM-SORTED posting arrays
  * (`array<struct<term: string, tf: long>>`): one merge-intersection pass,
  * Σ tf_a · tf_b over shared terms.
  *
  * This is the row-local core of the sparse similarity join: instead of
  * expanding candidate × posting ROWS through term-equality joins and a
  * pair-group aggregation (the row-join reference plan), each document's
  * postings pack once into a sorted array and every candidate pair costs
  * one linear merge. Term comparison is UTF8String binary order — exactly
  * `sort_array`'s ordering on a struct<string, …> (struct ordering = first
  * field first), so arrays built with `sort_array(collect_list(struct(
  * term, tf)))` are merge-ready regardless of collect order. Terms must be
  * unique per array (grouped postings are, by construction); tf products
  * accumulate in a long — exact integers, order-free, bit-identical to any
  * per-term sum the oracle computes. */
case class SparseDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StructType(Array(f1, f2)), _) =>
        (f1.dataType == StringType || f1.dataType == LongType) && f2.dataType == LongType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType) && left.dataType == right.dataType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sparse_dot expects the same array<struct<string|bigint, bigint>> on both sides, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  private def keyIsLong: Boolean = left.dataType match {
    case ArrayType(StructType(Array(f1, _)), _) => f1.dataType == LongType
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (keyIsLong) SparseDot.mergeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else SparseDot.merge(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (keyIsLong) "mergeLong" else "merge"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.exprs.SparseDot.$fn($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SparseDot {
  /** The merge-intersection kernel (shared by interpreted eval and the
    * generated code — one static call per row, JIT-compiled). */
  def merge(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n && j < m) {
      val sa = a.getStruct(i, 2)
      val sb = b.getStruct(j, 2)
      val cmp = sa.getUTF8String(0).compareTo(sb.getUTF8String(0))
      if (cmp == 0) { acc += sa.getLong(1) * sb.getLong(1); i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    acc
  }

  /** The long-key variant of [[merge]] for arrays packed as
    * struct<bigint, bigint> (e.g. md5-60-bit term keys — narrower rows,
    * primitive compares). */
  def mergeLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n && j < m) {
      val sa = a.getStruct(i, 2)
      val sb = b.getStruct(j, 2)
      val ka = sa.getLong(0)
      val kb = sb.getLong(0)
      if (ka == kb) { acc += sa.getLong(1) * sb.getLong(1); i += 1; j += 1 }
      else if (ka < kb) i += 1
      else j += 1
    }
    acc
  }

  /** Column wrapper: Σ tf_a·tf_b over shared keys of two key-sorted
    * posting arrays (string or long keys). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(SparseDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
