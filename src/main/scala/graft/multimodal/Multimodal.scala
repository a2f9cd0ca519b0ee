package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernels.ZoomKernel

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads plus typed metadata, with the decode step
  * STUBBED (this container has no codec libraries) behind a deterministic
  * fake, and the Spark-side plumbing — schema, batched per-partition
  * execution, resize via the real zoom kernel — fully real and tested.
  *
  * At scale: payload rows are processed with `mapPartitions` so decode
  * state (a real codec context) is allocated once per partition, not per
  * row; rows stay narrow (no shuffle) until an explicit aggregation.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, channels: Int)
  final case class Decoded(id: Long, meta: MediaMeta, pixels: Array[Double])

  /** STUB decode: a real implementation would call an image codec here.
    * The fake is deterministic in the payload bytes: an 8x8 single-channel
    * "image" whose pixels are byte values cycled through the buffer —
    * stable across runs and partitions, so downstream ops are testable. */
  def decodeStub(payload: Array[Byte]): (MediaMeta, Array[Double]) = {
    val (w, h) = (8, 8)
    val px = Array.tabulate(w * h) { i =>
      if (payload.isEmpty) 0.0 else (payload(i % payload.length) & 0xff).toDouble
    }
    (MediaMeta("stub-gray8", w, h, 1), px)
  }

  /** Decode a binary column per partition (codec state amortized). */
  def decode(df: DataFrame, idCol: String, payloadCol: String)
            (implicit spark: SparkSession): Dataset[Decoded] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition: open codec once (stub has no state, but the shape
        // of the loop is the real one)
        it.map { case (id, payload) =>
          val (meta, px) = decodeStub(payload)
          Decoded(id, meta, px)
        }
      }
  }

  /** Resize decoded frames with the real zoom kernel (order-1). */
  def resize(decoded: Dataset[Decoded], targetH: Int, targetW: Int)
            (implicit spark: SparkSession): Dataset[Decoded] = {
    import spark.implicits._
    decoded.map { d =>
      val (px, shape) = ZoomKernel.zoomToShape(d.pixels,
        Array(d.meta.height, d.meta.width), Array(targetH, targetW), 1, 0.0)
      Decoded(d.id, d.meta.copy(width = shape(1), height = shape(0)), px)
    }
  }

  /** "Video" frame sampling stub: treat the payload as a sequence of
    * fixed-size frame chunks and keep every k-th — the partition/batch
    * plumbing of real frame sampling. */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int, everyK: Int): DataFrame = {
    val u = udf { (payload: Array[Byte]) =>
      payload.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % everyK == 0 => chunk }
        .toSeq
    }
    df.withColumn("frames", u(col(payloadCol).cast("binary")))
      .withColumn("n_frames", size(col("frames")))
  }

  /** Metadata extraction that needs no decode: byte size + checksum. */
  def meta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol).cast("binary")))
      .withColumn("checksum", md5(col(payloadCol).cast("binary")))
}
