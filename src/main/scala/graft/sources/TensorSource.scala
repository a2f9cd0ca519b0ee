package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.NdTensor

/** Tensor sources and sinks (SURVEY §2.8 "Scans / sources / sinks").
  *
  * The reference has no I/O layer — arrays arrive in memory; our engine's
  * sources are parquet scans of tensor rows plus a generator (the
  * distributed form of `full`, /root/reference/imops/numeric.py:256-300).
  * Sinks write partitioned parquet; at 100 TB the partition column choice
  * (e.g. tensor id ranges or tile coordinates) is what keeps each file a
  * scannable, pruneable unit.
  */
object TensorSource {

  /** Generator source: `n` tensors of `shape` filled with `value` — the
    * reference's `full`, distributed over rows. */
  def full(spark: SparkSession, n: Long, shape: Seq[Int], value: Double,
           dtype: String = "float64"): Dataset[NdTensor] = {
    import spark.implicits._
    val numel = shape.product
    spark.range(n).select(
      col("id"),
      typedLit(shape).as("shape"),
      lit(dtype).as("dtype"),
      array_repeat(lit(value), numel).as("data"))
      .as[NdTensor]
  }

  /** Read tensor rows written by [[write]]. */
  def read(spark: SparkSession, path: String): Dataset[NdTensor] = {
    import spark.implicits._
    spark.read.parquet(path).as[NdTensor]
  }

  private val castBackUdf = udf { (data: Array[Double], dtype: String) =>
    if (data == null || dtype == null || dtype == "float64") data
    else data.map(NdTensor.castToDtype(_, dtype))
  }

  /** Partitioned parquet sink. `buckets` spreads tensors into directory
    * partitions by id hash so a 100 TB dataset prunes by partition at scan.
    * Applies the logical-dtype cast-back (rounding/clamping per the tensor's
    * `dtype` tag) on the way out — the sink half of the dtype-tag scheme. */
  def write(ds: Dataset[NdTensor], path: String, buckets: Int = 64): Unit =
    ds.withColumn("data", castBackUdf(col("data"), col("dtype")))
      .withColumn("part", pmod(hash(col("id")), lit(buckets)))
      .write.mode(SaveMode.Overwrite).partitionBy("part").parquet(path)

  /** Read with partition pruning for a specific tensor id. */
  def readOne(spark: SparkSession, path: String, id: Long, buckets: Int = 64): DataFrame = {
    // reconstruct the partition value so the scan prunes directories
    val part = spark.range(1).select(pmod(hash(lit(id)), lit(buckets))).head().getInt(0)
    spark.read.parquet(path).where(col("part") === part && col("id") === id)
  }
}
