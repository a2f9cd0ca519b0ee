package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd per-cell max-cosine assignment: the fine level of the
  * two-level IVF tree. The centroid set depends on the row's coarse cell
  * id, so unlike [[NearestCentroid]] the loops can't bake a single
  * constant set — the cell id binary-searches a sorted long[] and the
  * matched cell's (ids, cents, norms) go through the shared
  * [[NearestCentroid.bestRow]] argmax kernel (one static call per row;
  * JIT-compiled, so per-row cost is the dot products, not expression-tree
  * evaluation).
  *
  * Semantics mirror the interpreted fold this replaces (`aggregate` over
  * `element_at(<map literal>, cid)` with a coalesce-to-empty): entries
  * iterate id-ascending with strict-greater replacement (min-id ties),
  * cosines round through [[NearestCentroid.round6]], and a cell with no
  * fine centroids yields the explicit (fid -1, fcos -2.0) sentinel. */
case class NearestCentroidByCell(left: Expression, right: Expression,
                                 cellIds: Array[Long],
                                 fids: Array[Array[Long]],
                                 fcents: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid_by_cell expects (array<float|double>, bigint), got ${l.sql} / ${r.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("fid", LongType, nullable = false),
    StructField("fcos", DoubleType, nullable = false)))

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val fnorms: Array[Array[Double]] =
    fcents.map(_.map { c =>
      var acc = 0.0; var k = 0
      while (k < c.length) { acc += c(k) * c(k); k += 1 }
      math.sqrt(acc)
    })

  private def sentinel = new GenericInternalRow(Array[Any](-1L, -2.0))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val idx = java.util.Arrays.binarySearch(cellIds, b.asInstanceOf[Long])
    if (idx < 0) sentinel
    else NearestCentroid.bestRow(a.asInstanceOf[ArrayData], elemIsFloat,
      fids(idx), fcents(idx), fnorms(idx))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("nccCells", cellIds, "long[]")
    val fidsRef = ctx.addReferenceObj("nccFids", fids, "long[][]")
    val centsRef = ctx.addReferenceObj("nccCents", fcents, "double[][][]")
    val normsRef = ctx.addReferenceObj("nccNorms", fnorms, "double[][]")
    val isF = elemIsFloat
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = java.util.Arrays.binarySearch($cellsRef, $b);
         |if ($idx < 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { -1L, -2.0 });
         |} else {
         |  ${ev.value} = graft.exprs.NearestCentroid.bestRow(
         |    $a, $isF, $fidsRef[$idx], $centsRef[$idx], $normsRef[$idx]);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidByCell {
  /** Column wrapper: struct(fid, fcos) of the max-cosine centroid among
    * the row's cell's fine set. `byCell` maps coarse cid → id-ascending
    * fine (id, centroid) pairs. */
  def best(emb: Column, cid: Column,
           byCell: Map[Long, Seq[(Long, Seq[Double])]]): Column = {
    val cells = byCell.keys.toArray.sorted
    val fids = cells.map(c => byCell(c).map(_._1).toArray)
    val fcents = cells.map(c => byCell(c).map(_._2.toArray).toArray)
    GraftColumnBridge.column(NearestCentroidByCell(
      GraftColumnBridge.expression(emb), GraftColumnBridge.expression(cid),
      cells, fids, fcents))
  }
}
