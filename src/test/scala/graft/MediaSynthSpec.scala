package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{MediaSynth, MultimodalOps}

/** The synth→sniff round-trip behind the `multimodal_meta` registered
  * query: rendered container bytes must parse back to exactly the
  * doc_id-derived metadata the DuckDB twin recomputes arithmetically. */
class MediaSynthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def expected(d: Long): (String, Option[Int], Option[Int],
      Option[Int], Option[Int], Option[Long]) = {
    val w = Some((d % 640).toInt + 16); val h = Some((d % 360).toInt + 9)
    (d % 6) match {
      case 0 => ("png", w, h, None, None, None)
      case 1 => ("gif", w, h, None, None, None)
      case 2 => ("bmp", w, h, None, None, None)
      case 3 => ("wav", None, None, Some((d % 2).toInt + 1),
        Some(8000 * ((d % 3).toInt + 1)), Some(100L * ((d % 10) + 1)))
      case 4 => ("mp4/isom", w, h, None, None, Some(500L * ((d % 8) + 1)))
      case _ => ("jpeg", w, h, None, None, None)
    }
  }

  test("synthesized containers round-trip through the one-pass sniffer") {
    import spark.implicits._
    // ids chosen to hit every container and every modulus branch,
    // including width/height extremes of the derivation formulas
    val ids = (0L to 24L) ++ Seq(639L, 640L, 999L, 1283L, 3599L)
    val docs = ids.toDF("doc_id")
    val out = MediaSynth.mediaMeta(MediaSynth.synthesize(docs)).collect()
      .map(r => r.getAs[Long]("media_id") -> ((
        r.getAs[String]("format"),
        Option(r.getAs[Integer]("width")).map(_.toInt),
        Option(r.getAs[Integer]("height")).map(_.toInt),
        Option(r.getAs[Integer]("channels")).map(_.toInt),
        Option(r.getAs[Integer]("sample_rate")).map(_.toInt),
        Option(r.getAs[java.lang.Long]("duration_ms")).map(_.toLong)))).toMap
    assert(out.size == ids.size)
    ids.foreach { d => assert(out(d) == expected(d), s"doc_id=$d") }
  }

  test("synthesized bytes also satisfy the standalone kind-specific extractors") {
    import spark.implicits._
    val media = MediaSynth.synthesize((0L to 14L).toDF("doc_id")).cache()
    val img = MultimodalOps.imageMeta(media.where(col("kind") === "image"))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[String]("format")).toMap
    assert(img.nonEmpty && img.forall { case (d, f) =>
      f == Map(0 -> "png", 1 -> "gif", 2 -> "bmp", 5 -> "jpeg")((d % 6).toInt) })
    val aud = MultimodalOps.audioMeta(media.where(col("kind") === "audio")).collect()
    assert(aud.nonEmpty && aud.forall(_.getAs[String]("format") == "wav"))
    // bits_per_sample is synthesized as 16 everywhere — the one field the
    // unified row drops
    assert(aud.forall(_.getAs[Integer]("bits_per_sample") == 16))
    val vid = MultimodalOps.videoMeta(media.where(col("kind") === "video")).collect()
    assert(vid.nonEmpty && vid.forall(_.getAs[String]("format") == "mp4/isom"))
    media.unpersist()
  }
}
