package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}

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
  *
  * Directions (the pandas merge_asof surface): `backward` matches the
  * greatest rightTime <= leftTime, `forward` the least rightTime >=
  * leftTime (both inclusive), `nearest` the smaller absolute distance with
  * ties to the backward match. `nearest` runs BOTH window passes over the
  * one union — same single exchange, two in-partition sorts — and compares
  * distances in exact integer time units (µs for timestamps, days for
  * dates, the raw value for numerics), so the choice is never an FP
  * boundary call.
  */
object AsOfJoin {

  /** For every left row, attach `payload` from the right row with the same
    * key and the `direction`-matching rightTime (null if none). Ties on
    * (key, rightTime) are resolved by greatest payload for determinism. */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            payload: String, payloadOut: String,
            direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns
    val r0 = right
      .groupBy(col(rightKey).as("__k"), col(rightTime).as("__t"))
      .agg(max(col(payload)).as(payloadOut))
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn(payloadOut, lit(null).cast(r0.schema(payloadOut).dataType))
      .withColumn("__r", lit(0))
    val unioned = l.select(("__k" +: "__t" +: "__r" +: payloadOut +: leftCols.map(c => c)).map(col): _*)
      .unionByName(r0.withColumn("__r", lit(1)).select(
        Seq(col("__k"), col("__t"), col("__r"), col(payloadOut)) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*))
    val part = Window.partitionBy("__k")
    // backward: right rows sort BEFORE left rows on time ties => inclusive <=
    val wb = part.orderBy(col("__t"), lit(1) - col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: right rows sort AFTER left rows on time ties => inclusive >=
    val wf = part.orderBy(col("__t"), col("__r"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rp = when(col("__r") === 1, col(payloadOut))
    val rt = when(col("__r") === 1, col("__t"))
    val matched = direction match {
      case "backward" => unioned.withColumn(payloadOut, last(rp, ignoreNulls = true).over(wb))
      case "forward"  => unioned.withColumn(payloadOut, first(rp, ignoreNulls = true).over(wf))
      case "nearest"  =>
        // exact integer distance per time type — a double epoch at 1.7e9 s
        // only resolves ~0.24 µs and could flip the tie rule at boundaries
        val toNum: Column => Column = unioned.schema("__t").dataType match {
          case TimestampType    => c => unix_micros(c)
          // NTZ -> TZ reinterprets in the session zone: both distances
          // shift by the same offset, which cancels — still exact µs
          case TimestampNTZType => c => unix_micros(c.cast(TimestampType))
          case DateType         => c => unix_date(c).cast("long")
          case _: NumericType   => c => c
          case _                => c => c.cast("double")
        }
        unioned
          .withColumn("__bp", last(rp, ignoreNulls = true).over(wb))
          .withColumn("__bt", last(rt, ignoreNulls = true).over(wb))
          .withColumn("__fp", first(rp, ignoreNulls = true).over(wf))
          .withColumn("__ft", first(rt, ignoreNulls = true).over(wf))
          .withColumn(payloadOut,
            when(col("__bp").isNull, col("__fp"))
              .when(col("__fp").isNull, col("__bp"))
              .when(toNum(col("__t")) - toNum(col("__bt")) <=
                    toNum(col("__ft")) - toNum(col("__t")), col("__bp"))
              .otherwise(col("__fp")))
    }
    matched
      .where(col("__r") === 0)
      .select(leftCols.map(col) :+ col(payloadOut): _*)
  }
}
