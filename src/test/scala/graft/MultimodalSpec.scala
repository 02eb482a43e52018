package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.pipeline.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4), Row(4000, 1000, null, "image/png")),
      Row(2L, "image", Array[Byte](9, 9), Row(100, 50, null, "image/jpeg")),
      Row(3L, "video", Array[Byte](7), Row(1920, 1080, 2500L, "video/mp4")),
      Row(4L, "audio", null, Row(null, null, 1000L, "audio/wav")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
  }

  test("extractFeatures: partition-mapped decode, stable schema and values") {
    val out = MultimodalOps.extractFeatures(media)
    assert(out.schema.fieldNames.toSeq == Seq("media_id", "kind", "feat", "n_bytes"))
    val rows = out.collect().map(r => r.getAs[Long]("media_id") ->
      (r.getAs[scala.collection.Seq[Float]]("feat"), r.getAs[Long]("n_bytes"))).toMap
    assert(rows(1L)._1.length == 8 && rows(1L)._2 == 4L)
    assert(rows(4L)._1.isEmpty && rows(4L)._2 == 0L) // null payload
    // deterministic stub: same bytes → same features
    val again = MultimodalOps.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[scala.collection.Seq[Float]]("feat")).toMap
    assert(again(1L) == rows(1L)._1)
  }

  test("resizeImages: metadata transform keeps aspect, caps max side") {
    val out = MultimodalOps.resizeImages(media, 2000)
      .select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(out(1L) == ((2000, 500)))  // 4000×1000 → halved
    assert(out(2L) == ((100, 50)))    // under the cap → untouched
  }

  test("sampleFrames: one row per sampled timestamp for videos only") {
    val out = MultimodalOps.sampleFrames(media, everyMs = 1000L).collect()
    assert(out.map(_.getAs[Long]("media_id")).toSet == Set(3L))
    assert(out.map(_.getAs[Long]("frame_ts_ms")).sorted.toSeq == Seq(0L, 1000L, 2000L))
  }

  test("partitionHistogram reports batch shape") {
    val h = MultimodalOps.partitionHistogram(media).agg(sum("count")).head().getLong(0)
    assert(h == 4L)
  }
}
