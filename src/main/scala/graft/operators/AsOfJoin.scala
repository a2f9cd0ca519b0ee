package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (most-recent-match) join.
  *
  * No counterpart exists in the reference (it has no relational joins —
  * SURVEY.md §2.8); this is the tabular analog of interp1d's "bracket each
  * query between grid points" (/root/reference/imops/src/_zoom.pyx:42).
  *
  * Implementation: union both sides tagged, one shuffle on the key, and a
  * running `last(ignoreNulls)` window ordered by (time, side) so right rows
  * at the same timestamp precede left rows (inclusive `<=` semantics). This
  * scales linearly — no range-explosion join, one shuffle, partition count =
  * distinct keys spread over `spark.sql.shuffle.partitions` — which is the
  * 100 TB-safe plan; a naive `t1.time <= t2.time` theta-join would be O(n*m).
  */
object AsOfJoin {

  /** For every left row, attach `payload` from the right row with the same
    * key and the greatest rightTime <= leftTime (null if none). Ties on
    * (key, rightTime) are resolved by greatest payload for determinism. */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            payload: String, payloadOut: String): DataFrame = {
    val leftCols = left.columns
    val r = right
      .groupBy(col(rightKey).as("__k"), col(rightTime).as("__t"))
      .agg(max(col(payload)).as(payloadOut))
      .withColumn("__side", lit(0)) // right rows sort first on time ties => inclusive <=
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn(payloadOut, lit(null).cast(r.schema(payloadOut).dataType))
      .withColumn("__side", lit(1))
    val unioned = l.select(("__k" +: "__t" +: "__side" +: payloadOut +: leftCols.map(c => c)).map(col): _*)
      .unionByName(r.select(
        Seq(col("__k"), col("__t"), col("__side"), col(payloadOut)) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(payloadOut, last(col(payloadOut), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) :+ col(payloadOut): _*)
  }
}
