package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: media
 * (image/audio/video) travels as an opaque `binary` column plus a typed
 * metadata struct; per-item decode/feature-extract runs as a partition-
 * mapped stage over grouped batches (the Scala analog of `mapInPandas`:
 * one iterator pass per partition, constant memory, no driver collect).
 *
 * The DECODERS are deliberately deterministic stubs — no media codecs
 * ship in this environment — but everything Spark-side is real and
 * tested: schema contract, batch iteration, partitioning behavior, and
 * the derived-column shapes a real decoder would produce. Swapping in a
 * real JNI/FFmpeg/libvips decoder changes only [[stubDecode]].
 */
object MultimodalOps {

  /** Canonical media-row schema: content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("content", BinaryType, nullable = true), // opaque payload
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** Deterministic fake decode: a real implementation would inflate the
    * codec bytes; the stub derives stable pseudo-features from the bytes
    * so tests can assert exact values. */
  private[pipeline] def stubDecode(content: Array[Byte]): Array[Float] = {
    if (content == null) Array.empty
    else {
      var h = 1125899906842597L
      content.foreach(b => h = h * 31 + b)
      Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xFF).toInt - 128) / 128.0f)
    }
  }

  /** One decoded-feature row per media item. */
  final case class MediaFeat(media_id: Long, kind: String,
                             feat: Array[Float], n_bytes: Long)

  /** Per-item media features via a single partition-mapped pass —
    * binary in, fixed-width feature vector + size out. The decoder runs
    * once per row inside the partition iterator (constant memory per
    * task; no collect). Schema: (media_id, kind, feat: array<float>,
    * n_bytes). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, content) =>
          MediaFeat(id, kind, stubDecode(content),
            if (content == null) 0L else content.length.toLong)
        }
      }
      .toDF()
  }

  /** Resize stub for image rows: real work happens per-partition against
    * the binary payload; here the metadata transform (the Spark-visible
    * contract) is exact and the payload passes through. */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = when(greatest(w, h) > maxSide,
      lit(maxSide).cast("double") / greatest(w, h)).otherwise(lit(1d))
    media.withColumn("meta", struct(
      ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.mime").as("mime")))
  }

  /** Frame sampling for video rows: one output row per sampled frame at
    * `everyMs` intervals — pure relational explode on duration metadata;
    * the per-frame decode would hang off the same partition-mapped stage
    * as [[extractFeatures]]. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))

  /** Batch-shape audit: rows per partition — the knob that decides decoder
    * memory footprint at 100 TB (pair with repartition/maxPartitionBytes). */
  def partitionHistogram(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(spark_partition_id().as("pid"))
      .groupBy($"pid").count()
  }
}
