package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Center-of-mass aggregate over 2-D slice rows of a stacked volume — the
  * custom `CenterOfMassAgg` of SURVEY §4.3, implementing the reference's
  * partial+final prange reduction
  * (/root/reference/imops/src/_measure.pyx:73-91) as a Catalyst
  * TypedImperativeAggregate.
  *
  * Unlike a UDF, `update` reads the slice's `ArrayData` in place — no
  * boxed-Seq conversion and no defensive array copy per row — so the scan
  * runs at memory bandwidth. Buffer = (Σw, Σw·slice, Σw·row, Σw·col);
  * output = the weighted mean coordinate (slice, row, col).
  */
case class CenterOfMassAgg(data: Expression, rows: Expression, cols: Expression,
                           sliceIdx: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(data, rows, cols, sliceIdx)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

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
        s"center_of_mass_agg data must be array<double>, got ${data.dataType.sql}")
    else if (!integral(rows) || !integral(cols) || !integral(sliceIdx))
      TypeCheckResult.TypeCheckFailure(
        "center_of_mass_agg rows/cols/sliceIdx must be integral, got " +
          s"${rows.dataType.sql}/${cols.dataType.sql}/${sliceIdx.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](4)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val arr = data.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      // SQL integer literals arrive as Int/Long/Short/Byte depending on the
      // parser path; coerce instead of blind casts
      val r = rows.eval(input).asInstanceOf[Number].intValue()
      val c = cols.eval(input).asInstanceOf[Number].intValue()
      val s = sliceIdx.eval(input).asInstanceOf[Number].longValue().toDouble
      // one bulk copy to a primitive array (a single copyMemory for
      // UnsafeArrayData), then a monomorphic JIT-friendly loop — per-element
      // ArrayData.getDouble is a megamorphic virtual call that dominated the
      // 512^3 benchmark
      val d = arr.toDoubleArray()
      var sw = 0.0; var swi = 0.0; var swj = 0.0
      var i = 0
      var p = 0
      while (i < r) {
        var rowW = 0.0; var rowWj = 0.0
        var j = 0
        while (j < c) {
          val w = d(p)
          rowW += w; rowWj += w * j
          j += 1; p += 1
        }
        sw += rowW; swi += rowW * i; swj += rowWj
        i += 1
      }
      buf(0) += sw
      buf(1) += sw * s
      buf(2) += swi
      buf(3) += swj
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 4) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(0) == 0.0) null
    else new GenericArrayData(Array(buf(1) / buf(0), buf(2) / buf(0), buf(3) / buf(0)))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(4)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CenterOfMassAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CenterOfMassAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(data = newChildren(0), rows = newChildren(1), cols = newChildren(2), sliceIdx = newChildren(3))
}

object CenterOfMassAgg {
  /** Column form: aggregate slice rows into the volume's [slice, row, col]
    * center of mass. */
  def centerOfMass(data: Column, rows: Column, cols: Column, sliceIdx: Column): Column =
    GraftColumnBridge.column(
      CenterOfMassAgg(GraftColumnBridge.expression(data), GraftColumnBridge.expression(rows),
        GraftColumnBridge.expression(cols), GraftColumnBridge.expression(sliceIdx))
        .toAggregateExpression())
}
