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

  test("imageMeta parses real container headers: PNG, GIF, BMP, JPEG SOF walk") {
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(33)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ Array((w & 0xFF).toByte, (w >> 8).toByte,
        (h & 0xFF).toByte, (h >> 8).toByte, 0.toByte, 0.toByte, 0.toByte)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(30).putInt(0).putInt(26).putInt(12)
      b.position(18); b.putInt(w).putInt(h)
      b.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
      b.put(0xFF.toByte).put(0xD8.toByte)                    // SOI
      b.put(0xFF.toByte).put(0xE0.toByte).putShort(16)       // APP0, skipped
      b.position(b.position() + 14)
      b.put(0xFF.toByte).put(0xC4.toByte).putShort(4)        // DHT: NOT a SOF
      b.position(b.position() + 2)
      b.put(0xFF.toByte).put(0xC2.toByte).putShort(17)       // SOF2 (progressive)
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.array()
    }
    // 0xFF fill padding between segments must be skipped, not parsed as
    // a marker with a bogus length
    def jpegWithFill(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(32)
      b.put(0xFF.toByte).put(0xD8.toByte)                    // SOI
      b.put(0xFF.toByte).put(0xFF.toByte).put(0xFF.toByte)   // fill bytes
      b.put(0xC0.toByte).putShort(17)                        // SOF0 after fill
      b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      b.array()
    }
    // SOS starts entropy-coded data: a fake FF C0 inside it must NOT be
    // read as a SOF — the walk stops at SOS with no dimensions
    def jpegSosFirst(): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(32)
      b.put(0xFF.toByte).put(0xD8.toByte)                    // SOI
      b.put(0xFF.toByte).put(0xDA.toByte).putShort(4)        // SOS
      b.position(b.position() + 2)
      b.put(0xFF.toByte).put(0xC0.toByte).putShort(17)       // fake SOF in entropy data
      b.put(8.toByte).putShort(9999.toShort).putShort(9999.toShort)
      b.array()
    }
    val rows = Seq(
      Row(1L, "image", png(640, 480), null),
      Row(2L, "image", gif(320, 200), null),
      Row(3L, "image", bmp(800, 600), null),
      Row(4L, "image", jpeg(1024, 768), null),
      Row(5L, "image", Array[Byte](1, 2, 3), null),  // junk payload
      Row(6L, "image", null, null),
      Row(7L, "image", jpegWithFill(321, 123), null),
      Row(8L, "image", jpegSosFirst(), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
    val m = MultimodalOps.imageMeta(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[String]("format"),
          Option(r.getAs[Integer]("width")).map(_.toInt),
          Option(r.getAs[Integer]("height")).map(_.toInt))).toMap
    assert(m(1L) == (("png", Some(640), Some(480))))
    assert(m(2L) == (("gif", Some(320), Some(200))))
    assert(m(3L) == (("bmp", Some(800), Some(600))))
    assert(m(4L) == (("jpeg", Some(1024), Some(768)))) // skipped APP0+DHT, read SOF2
    assert(m(5L) == (("unknown", None, None)))
    assert(m(6L) == (("unknown", None, None)))
    assert(m(7L) == (("jpeg", Some(321), Some(123)))) // FF fill skipped
    assert(m(8L) == (("jpeg", None, None)))           // stopped at SOS, no fake dims
  }

  test("audioMeta parses RIFF/WAV headers: rate, channels, bits, duration from chunks") {
    // canonical 16-byte PCM fmt chunk + data chunk; an extra LIST chunk
    // between them proves the walk skips unknown chunks by size
    def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int,
            listChunk: Boolean = false): Array[Byte] = {
      val byteRate = rate * channels * (bits / 8)
      val listSz = if (listChunk) 8 + 6 else 0 // odd payload → padded below
      val b = java.nio.ByteBuffer.allocate(44 + listSz + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16)
      b.putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      b.putInt(byteRate).putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      if (listChunk) { b.put("LIST".getBytes).putInt(5); b.put("INFOx".getBytes); b.put(0.toByte) }
      b.put("data".getBytes).putInt(dataBytes)
      b.array()
    }
    val rows = Seq(
      Row(1L, "audio", wav(2, 44100, 16, 176400), null),          // exactly 1 s stereo
      Row(2L, "audio", wav(1, 16000, 8, 4000, listChunk = true), null), // 250 ms mono, LIST skipped
      Row(3L, "audio", Array[Byte](1, 2, 3, 4), null),            // junk
      Row(4L, "audio", null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
    val m = MultimodalOps.audioMeta(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[String]("format"),
          Option(r.getAs[Integer]("channels")).map(_.toInt),
          Option(r.getAs[Integer]("sample_rate")).map(_.toInt),
          Option(r.getAs[Integer]("bits_per_sample")).map(_.toInt),
          Option(r.getAs[java.lang.Long]("duration_ms")).map(_.toLong))).toMap
    assert(m(1L) == (("wav", Some(2), Some(44100), Some(16), Some(1000L))))
    assert(m(2L) == (("wav", Some(1), Some(16000), Some(8), Some(250L))))
    assert(m(3L) == (("unknown", None, None, None, None)))
    assert(m(4L) == (("unknown", None, None, None, None)))

  }

  test("videoMeta parses ISO-BMFF boxes: brand, mvhd duration, tkhd dimensions") {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes).put(payload)
      b.array()
    }
    def mvhd(version: Int, timescale: Int, duration: Long): Array[Byte] = {
      val timeBytes = if (version == 1) 8 else 4
      val b = java.nio.ByteBuffer.allocate(4 + 2 * timeBytes + 4 + timeBytes + 80)
      b.put(version.toByte).put(Array[Byte](0, 0, 0)) // version + flags
      if (version == 1) { b.putLong(0L).putLong(0L).putInt(timescale).putLong(duration) }
      else { b.putInt(0).putInt(0).putInt(timescale).putInt(duration.toInt) }
      b.array()
    }
    def tkhd(width: Int, height: Int): Array[Byte] = {
      // v0 tkhd: 4 (ver+flags) + 4+4 (times) + 4 (id) + 4 (res) + 4 (dur)
      // + 8 (res) + 2+2+2+2 + 36 (matrix) + width/height as 16.16
      val b = java.nio.ByteBuffer.allocate(84)
      b.position(76)
      b.putInt(width << 16).putInt(height << 16)
      b.array()
    }
    val ftyp = box("ftyp", "isom".getBytes ++ Array.fill[Byte](8)(0))
    def movie(durV: Int, ts: Int, dur: Long, tracks: Seq[(Int, Int)]): Array[Byte] =
      ftyp ++ box("moov",
        box("mvhd", mvhd(durV, ts, dur)) ++
          tracks.flatMap(t => box("trak", box("tkhd", tkhd(t._1, t._2)))))
    val rows = Seq(
      // 90s at timescale 600 = 54000 units; audio track is 0×0 and must
      // lose to the 1280×720 video track
      Row(1L, "video", movie(0, 600, 54000L, Seq((0, 0), (1280, 720))), null),
      // version-1 mvhd (64-bit duration): 2.5 s at timescale 1000
      Row(2L, "video", movie(1, 1000, 2500L, Seq((640, 360))), null),
      Row(3L, "video", "not a video".getBytes, null),
      Row(4L, "video", null, null),
      // truncated moov (corrupt inner size): brand parses, fields stay None
      Row(5L, "video", ftyp ++ java.nio.ByteBuffer.allocate(8).putInt(9999).put("moov".getBytes).array(), null),
      // mvhd truncated to version+flags only (size 12): the walk must not
      // read the sibling box's bytes as timescale/duration
      Row(6L, "video", ftyp ++ box("moov",
        java.nio.ByteBuffer.allocate(12).putInt(12).put("mvhd".getBytes).array()
          ++ box("trak", box("tkhd", tkhd(320, 240)))), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
    val m = MultimodalOps.videoMeta(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[String]("format"),
          Option(r.getAs[java.lang.Long]("duration_ms")).map(_.toLong),
          Option(r.getAs[Integer]("width")).map(_.toInt),
          Option(r.getAs[Integer]("height")).map(_.toInt))).toMap
    assert(m(1L) == (("mp4/isom", Some(90000L), Some(1280), Some(720))))
    assert(m(2L) == (("mp4/isom", Some(2500L), Some(640), Some(360))))
    assert(m(3L) == (("unknown", None, None, None)))
    assert(m(4L) == (("unknown", None, None, None)))
    assert(m(5L) == (("mp4/isom", None, None, None)))
    assert(m(6L) == (("mp4/isom", None, Some(320), Some(240)))) // duration None, track real
  }

  test("dedupExactMedia: digest groups match byte equality, rep = min id") {
    val rows = Seq(
      Row(10L, "image", Array[Byte](1, 2, 3), Row(null, null, null, null)),
      Row(11L, "image", Array[Byte](1, 2, 3), Row(null, null, null, null)), // dup of 10
      Row(12L, "image", Array[Byte](1, 2, 4), Row(null, null, null, null)), // near miss: distinct
      Row(13L, "audio", Array[Byte](1, 2, 3), Row(null, null, null, null)), // same bytes, 3rd copy
      Row(14L, "audio", Array[Byte](), Row(null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), MultimodalOps.mediaSchema)
    val out = MultimodalOps.dedupExactMedia(df).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("rep"), r.getAs[Long]("n_copies"), r.getAs[Boolean]("keep"))).toMap
    assert(out(10L) == ((10L, 3L, true)))   // group {10,11,13} across kinds
    assert(out(11L) == ((10L, 3L, false)))
    assert(out(13L) == ((10L, 3L, false)))
    assert(out(12L) == ((12L, 1L, true)))   // one differing byte -> own group
    assert(out(14L) == ((14L, 1L, true)))   // empty payload is its own class
    // synthesized corpus: wav payloads collide (bytes depend on d mod 2/3/10),
    // images/videos below the lcm never do
    val ids = spark.range(0, 500).toDF("doc_id")
    val synth = MultimodalOps.dedupExactMedia(graft.pipeline.MediaSynth.synthesize(ids))
    val byKind = synth.groupBy(col("kind"))
      .agg(sum(when(col("keep"), 0L).otherwise(1L)).as("dups")).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("dups")).toMap
    assert(byKind("audio") > 0L && byKind("image") == 0L && byKind("video") == 0L)
    // every group internally byte-identical: recompute via full-byte grouping
    val expect = graft.pipeline.MediaSynth.synthesize(ids)
      .groupBy(base64(col("content"))).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).head().getLong(0)
    val got = synth.where(col("keep"))
      .agg(sum(col("n_copies") * col("n_copies"))).head().getLong(0)
    assert(got == expect)
  }

  test("chunkFingerprints: aligned offsets, payload-derived hashes, tail chunk included") {
    val rows = Seq(
      Row(1L, "image", Array.tabulate[Byte](600)(_.toByte), Row(null, null, null, null)),
      Row(2L, "image", Array.tabulate[Byte](600)(_.toByte).take(300), Row(null, null, null, null)),
      Row(3L, "image", null, Row(null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
    val fps = MultimodalOps.chunkFingerprints(df, 256).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("pos")) -> r.getAs[Long]("ch")).toMap
    // 600 bytes -> chunks at 0,1,2 (tail 88 bytes); 300 -> 0,1 (tail 44)
    assert(fps.keySet == Set((1L, 0), (1L, 1), (1L, 2), (2L, 0), (2L, 1)))
    // item 2 is a truncation of item 1: chunk 0 identical, chunk 1 (partial
    // on item 2) differs — the aligned-chunk signature of a cut download
    assert(fps((1L, 0)) == fps((2L, 0)))
    assert(fps((1L, 1)) != fps((2L, 1)))
  }

  test("cdcFingerprints + nearDupMediaCdc: mid-stream insertion defeats aligned chunks but not content-defined ones") {
    // high-entropy 2 KB payload (deterministic LCG bytes), plus a copy
    // with 24 junk bytes INSERTED at offset 40 — every aligned 256-byte
    // block shifts, so nearDupMedia must miss the pair; CDC boundaries
    // re-synchronize after the insertion, so nearDupMediaCdc must
    // cluster it. An unrelated payload must stay apart in both.
    def bytes(seed: Long, n: Int): Array[Byte] = {
      var h = seed
      Array.fill(n) { h = h * 6364136223846793005L + 1442695040888963407L; (h >>> 33).toByte }
    }
    val base = bytes(42L, 2048)
    val inserted = base.take(40) ++ bytes(7L, 24) ++ base.drop(40)
    val rows = Seq(
      Row(1L, "image", base, Row(null, null, null, null)),
      Row(2L, "image", inserted, Row(null, null, null, null)),
      Row(3L, "image", bytes(99L, 2048), Row(null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
    def reps(out: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      out.collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("rep")).toMap
    val aligned = reps(MultimodalOps.nearDupMedia(df))
    assert(aligned(1L) != aligned(2L), "aligned chunks must shift under an early insertion")
    val cdc = reps(MultimodalOps.nearDupMediaCdc(df))
    assert(cdc(1L) == cdc(2L) && cdc(2L) == 1L, "CDC must re-synchronize past the insertion")
    assert(cdc(3L) == 3L, "unrelated payload stays its own cluster")
    // cut determinism: same bytes -> identical chunk-hash multiset
    val f1 = MultimodalOps.cdcFingerprints(df).where(col("media_id") === 1L)
      .select("ch").collect().map(_.getLong(0)).sorted.toSeq
    val f1b = MultimodalOps.cdcFingerprints(df).where(col("media_id") === 1L)
      .select("ch").collect().map(_.getLong(0)).sorted.toSeq
    assert(f1 == f1b && f1.nonEmpty)
    // no false merges across a fully unrelated corpus (r13 review catch:
    // sub-minBytes chunks collide by pigeonhole — 1,500 random payloads
    // produced a 709-member false cluster before the length floor)
    val noise = (0L until 1500L).map(i =>
      Row(i, "image", bytes(1000 + i, 2048), Row(null, null, null, null)))
    val noiseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(noise, 4), MultimodalOps.mediaSchema)
    val merged = MultimodalOps.nearDupMediaCdc(noiseDf)
      .where(!col("keep")).count()
    assert(merged == 0L, s"$merged unrelated payloads were falsely clustered")
  }

  test("nearDupMedia: planted truncation + suffix variants cluster with their base; distinct classes stay apart") {
    val ids = spark.range(0, 500).toDF("doc_id")
    val planted = graft.pipeline.MediaSynth.plantNearDups(
      graft.pipeline.MediaSynth.synthesize(ids))
    val out = MultimodalOps.nearDupMedia(planted).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("rep"), r.getAs[Long]("n_members"), r.getAs[Boolean]("keep"))).toMap
    assert(out.size == planted.count())
    // every planted variant clusters with its base (same rep), never keeps
    (0L until 500L).foreach { d =>
      if (d % 7 == 3) {
        assert(out(d + 1000000000L)._1 == out(d)._1, s"truncation variant of $d")
        assert(!out(d + 1000000000L)._3)
      }
      if (d % 7 == 5) {
        assert(out(d + 2000000000L)._1 == out(d)._1, s"suffix variant of $d")
        assert(!out(d + 2000000000L)._3)
      }
    }
    // reps are cluster minima and exactly the keepers
    assert(out.forall { case (id, (rep, _, keep)) => keep == (id == rep) })
    // clusters == byte classes of the base: two image ids with different
    // (w, h) never share a cluster even in the same container format
    assert(out(0L)._1 != out(6L)._1) // both png, different dims
    // exact-dup wavs (same d%2, d%3, d%10 → identical bytes) DO cluster
    val wavSame = (3L, 33L) // 3%6==33%6==3; 3≡33 mod 2,3,10
    assert(out(wavSame._1)._1 == out(wavSame._2)._1)
    // n_members consistent: sum over keepers == total rows
    val total = out.collect { case (_, (_, n, true)) => n }.sum
    assert(total == out.size)
  }
  test("cdcInvariants: planted insertion/truncation/suffix/exact variants all co-cluster; violation columns 0") {
    val ids = spark.range(0, 300).toDF("doc_id")
    val planted = graft.pipeline.MediaSynth.plantCdcVariants(
      graft.pipeline.MediaSynth.synthesize(ids))
    val row = MultimodalOps.cdcInvariants(planted).collect().head
    def g(c: String): Long = row.getAs[Long](c)
    val expTrunc = (0L until 300L).count(_ % 7 == 3)
    val expSuffix = (0L until 300L).count(_ % 7 == 5)
    val expIns = (0L until 300L).count(_ % 7 == 1)
    val expExact = (0L until 300L).count(_ % 7 == 2)
    assert(g("n_rows") == 300L + expTrunc + expSuffix + expIns + expExact)
    assert(g("n_media") == g("n_rows"), "exactly-once coverage")
    assert(g("n_trunc") == expTrunc && g("n_suffix") == expSuffix &&
      g("n_ins") == expIns && g("n_exact") == expExact)
    Seq("bad_keep", "multi_keep", "bad_members", "trunc_split",
      "suffix_split", "ins_split", "exact_split", "short_chunks")
      .foreach(c => assert(g(c) == 0L, s"$c must be 0, was ${g(c)}"))
  }

  test("cdcFingerprints: all-tiny-chunk payloads still collapse as exact duplicates (whole-payload digest row)") {
    // payloads short enough that EVERY content-defined chunk is under
    // minBytes: before the unconditional digest row, such media emitted
    // zero fingerprints and even byte-identical copies escaped the
    // digest collapse (r13 advice)
    val tiny = Array.tabulate[Byte](16)(i => (i * 7 + 1).toByte)
    val other = Array.tabulate[Byte](16)(i => (i * 11 + 5).toByte)
    val rows = Seq(
      Row(1L, "image", tiny, Row(null, null, null, null)),
      Row(2L, "image", tiny.clone(), Row(null, null, null, null)),
      Row(3L, "image", other, Row(null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
    val fps = MultimodalOps.cdcFingerprints(df).collect()
    assert(fps.count(_.getAs[Int]("len") == -1) == 3, "one whole-payload row per media")
    val out = MultimodalOps.nearDupMediaCdc(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("rep")).toMap
    assert(out(1L) == 1L && out(2L) == 1L, "byte-identical tiny payloads collapse")
    assert(out(3L) == 3L, "distinct tiny payload stays apart")
  }

  test("perceptual tier: aHash/envelope invariant under planted transforms; all fixture classes pairwise distinct") {
    import graft.pipeline.MediaSynth
    // (a) feature invariance is STRUCTURAL: brightness shift leaves the
    // aHash bit-identical, exact half-volume leaves the envelope
    // bit-identical (computed off-Spark on the raw fixture bytes)
    val img0 = MediaSynth.bmpGray(5)
    val imgShift = img0.clone()
    (54 until imgShift.length).foreach(i => imgShift(i) = (imgShift(i) + 8).toByte)
    assert(MultimodalOps.bmpAHash(img0) == MultimodalOps.bmpAHash(imgShift))
    val wav0 = MediaSynth.wavPcm(7)
    val wavHalf = wav0.clone()
    var i = 44
    while (i + 1 < wavHalf.length) {
      val s = ((wavHalf(i + 1) << 8) | (wavHalf(i) & 0xFF)).toShort / 2
      wavHalf(i) = s.toByte; wavHalf(i + 1) = (s >> 8).toByte
      i += 2
    }
    assert(MultimodalOps.wavEnvelope(wav0) == MultimodalOps.wavEnvelope(wavHalf))
    // (b) the class space is CLOSED (every sf draws from these 24+20
    // payloads), so pairwise distinctness here covers all scales
    val imgHashes = (0 until 24).map(c => MultimodalOps.bmpAHash(MediaSynth.bmpGray(c)).get)
    assert(imgHashes.distinct.size == 24, "image classes must have distinct aHashes")
    val envs = (0 until 20).map(c => MultimodalOps.wavEnvelope(MediaSynth.wavPcm(c)).get)
    assert(envs.distinct.size == 20, "audio classes must have distinct envelopes")
    // (c) end-to-end: clusters == generative classes incl. planted variants
    val ids = spark.range(0, 200).toDF("doc_id")
    val planted = MediaSynth.plantPerceptualVariants(MediaSynth.synthesizeDecodable(ids))
    val out = MultimodalOps.nearDupPerceptual(planted).collect()
      .map(r => r.getAs[Long]("media_id") -> (r.getAs[Long]("rep"), r.getAs[Boolean]("keep"))).toMap
    assert(out.size == planted.count())
    (0L until 200L).foreach { d =>
      val expRep = if (d % 2 == 0) (d / 2) % 24 * 2 else ((d / 2) % 20) * 2 + 1
      assert(out(d)._1 == expRep, s"base $d cluster")
      if (d % 3 == 1) assert(out(d + 1000000000L)._1 == expRep, s"variant of $d")
    }
    assert(out.forall { case (id, (rep, keep)) => keep == (id == rep) })
  }

  test("GIF perceptual tier: LZW roundtrip, palette-permutation invariance, zero shared payload bytes") {
    import graft.pipeline.MediaSynth
    // (a) the decoder really decodes: per-class aHash equals the aHash
    // of the SAME luma grid folded via the BMP path is not required
    // (row orders differ) — but all 24 GIF classes must decode and be
    // pairwise distinct (closed class space ⇒ covers every sf)
    val hashes = (0 until 24).map(c => MultimodalOps.gifAHash(MediaSynth.gifReal(c)))
    assert(hashes.forall(_.isDefined), "every fixture class must decode")
    assert(hashes.flatten.distinct.size == 24, "GIF classes must have distinct aHashes")
    // (b) planted variant: permuted palette + uniform +8 shift decodes
    // to base+8 ⇒ aHash bit-identical (structural invariance)
    val c = 7
    val base = MediaSynth.gifReal(c)
    val variant = MediaSynth.gifEncode(32, 32,
      (x, y) => 64 + ((x * (1 + c % 5) + y * (2 + c % 7) + x * y * (1 + c % 3)) % 97),
      i => (181 * i + 97) % 256, shift = 8)
    assert(MultimodalOps.gifAHash(variant) == MultimodalOps.gifAHash(base))
    // (c) what the byte tiers would need is a shared RUN: the palette
    // region must differ in EVERY byte (no π fixed point survives the
    // +8 shift), and no ≥16-byte run past the header may coincide
    // (bit-packing can align single bytes by chance; runs cannot)
    assert((13 until 13 + 768).forall(i => base(i) != variant(i)),
      "every palette byte must differ")
    val n = math.min(base.length, variant.length)
    var run = 0; var maxRun = 0
    (13 until n).foreach { i =>
      if (base(i) == variant(i)) { run += 1; maxRun = math.max(maxRun, run) }
      else run = 0
    }
    assert(maxRun < 16, s"shared $maxRun-byte run would re-enter the byte tiers")
    // (d) general-decoder robustness: a dictionary-GROWING stream from
    // a conformant third-party-style encoder shape — single initial
    // CLEAR, then literals without intermediate clears — decodes too
    // (the dictionary fills and the code width must grow past 9 bits)
    val grown = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes)
      out.write(Array[Byte](32, 0, 32, 0)); out.write(0xF7); out.write(0); out.write(0)
      (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
      out.write(0x2C)
      out.write(Array[Byte](0, 0, 0, 0, 32, 0, 32, 0, 0))
      out.write(8)
      val codes = Seq(256) ++ (0 until 1024).map { p =>
        val (x, y) = (p % 32, p / 32)
        64 + ((x * (1 + c % 5) + y * (2 + c % 7) + x * y * (1 + c % 3)) % 97)
      } ++ Seq(257)
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nBits = 0; var width = 9; var dictN = 258
      var firstAfterClear = true
      codes.foreach { code =>
        acc |= code.toLong << nBits; nBits += width
        while (nBits >= 8) { bits.write((acc & 0xFF).toInt); acc >>>= 8; nBits -= 8 }
        // decoder-side dict mirror: the FIRST literal after a clear
        // adds no entry; each later code adds one, and the width grows
        // the moment the dictionary reaches 2^width
        if (code == 256) { dictN = 258; width = 9; firstAfterClear = true }
        else if (code < 256) {
          if (firstAfterClear) firstAfterClear = false
          else if (dictN < 4096) {
            dictN += 1
            if (dictN == (1 << width) && width < 12) width += 1
          }
        }
      }
      if (nBits > 0) bits.write((acc & 0xFF).toInt)
      val data = bits.toByteArray
      var o = 0
      while (o < data.length) {
        val len = math.min(255, data.length - o)
        out.write(len); out.write(data, o, len); o += len
      }
      out.write(0); out.write(0x3B)
      out.toByteArray
    }
    assert(MultimodalOps.gifAHash(grown) == MultimodalOps.gifAHash(base),
      "dictionary-growing LZW stream must decode to the same grid")
    // (e) end-to-end: clusters == generative GIF classes incl. variants
    val ids = spark.range(0, 150).toDF("doc_id")
    val planted = MediaSynth.plantGifVariants(MediaSynth.synthesizeGif(ids))
    val out = MultimodalOps.nearDupPerceptual(planted).collect()
      .map(r => r.getAs[Long]("media_id") -> (r.getAs[Long]("rep"), r.getAs[Boolean]("keep"))).toMap
    assert(out.size == planted.count())
    (0L until 150L).foreach { d =>
      val expRep = d % 24
      assert(out(d)._1 == expRep, s"base $d cluster")
      if (d % 3 == 1) assert(out(d + 1000000000L)._1 == expRep, s"variant of $d")
    }
    assert(out.forall { case (id, (rep, keep)) => keep == (id == rep) })
  }
}
