package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateless fact projection runs unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    source.addData(
      Event(0L, ts("2024-01-01 00:00:00"), 1L, "signup", 1.0),
      Event(1L, ts("2024-01-01 01:00:00"), 1L, "error", 0.0),
      Event(2L, ts("2024-01-01 02:00:00"), 2L, "click", 5.0))
    val q = EventStream.factStream(source.toDF())
      .writeStream.format("memory").queryName("facts_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val facts = spark.table("facts_sink")
    assert(facts.count() == 6) // 2 fact rows per event
    // error event emits a value RETRACTION
    val retracted = facts.where(col("tx") === 2L && !col("added")).collect()
    assert(retracted.length == 1 && retracted.head.getAs[String]("attr") == "value.double.vertex")
  }

  test("stream-ingested fact log equals the batch replay at every checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(0L, ts("2024-01-01 00:00:00"), 1L, "signup", 1.0),
      Event(1L, ts("2024-01-02 00:00:00"), 1L, "purchase", 9.5),
      Event(2L, ts("2024-01-03 00:00:00"), 2L, "click", 5.0),
      Event(3L, ts("2024-01-04 00:00:00"), 1L, "error", 0.0),
      Event(4L, ts("2024-01-05 00:00:00"), 2L, "view", 7.0))
    val root = "/root/repo/target/tmp/stream_ingest"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    // ingest across TWO micro-batches (exercise the append path)
    val source = MemoryStream[Event]
    source.addData(events.take(3): _*)
    val q = EventStream.ingestToLog(source.toDF(), root, root + "/_chk")
    q.processAllAvailable()
    source.addData(events.drop(3): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = EventStream.openIngested(spark, root)
    val batch = graft.projection.EventsReplay.fromNormalized(spark,
      events.toDF().select(
        (col("event_id") + 1).cast("long").as("tx"), col("ts"),
        (lit(graft.projection.EventsReplay.VUser) + col("user_id")).cast("long").as("e"),
        col("event_type"), col("value")))

    def factSet(st: graft.log.FactStore, at: String) =
      graft.snapshot.Snapshot.head(st).asOf(ts(at))
        .currentFacts.collect().map(_.toString).toSet
    // head state and a mid-stream checkpoint both reconstruct identically
    for (at <- Seq("2024-01-03 12:00:00", "2024-12-31 00:00:00")) {
      val s = factSet(streamed, at); val b = factSet(batch, at)
      assert(s == b, s"asOf $at: streamed $s != batch $b")
      assert(s.nonEmpty)
    }
    // derived touch chains match the batch replay's (version counts)
    def counts(st: graft.log.FactStore) =
      graft.temporal.VersionChains.versionCounts(st)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(streamed) == counts(batch))
    // retraction made it through the sink: user 1's value is absent at head
    val headVals = graft.snapshot.Snapshot.head(streamed)
      .prop("value", graft.model.PropType.PDouble, graft.model.A.Vertex)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!headVals.contains(graft.projection.EventsReplay.VUser + 1L))
    assert(headVals(graft.projection.EventsReplay.VUser + 2L) == 7.0)
  }

  test("watermarked windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    source.addData(
      Event(0L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
      Event(1L, ts("2024-01-01 00:20:00"), 2L, "click", 1.0),
      Event(2L, ts("2024-01-01 01:10:00"), 1L, "view", 1.0),
      Event(3L, ts("2024-01-01 09:00:00"), 1L, "click", 1.0)) // advances watermark
    val q = EventStream.windowedCounts(source.toDF())
      .writeStream.format("memory").queryName("win_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("win_sink")
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // windows before the watermark (9:00 − 2h) have been finalized
    assert(rows.contains(("2024-01-01 00:00:00", "click", 2L)))
    assert(rows.contains(("2024-01-01 01:00:00", "view", 1L)))
  }

  test("windowed distinct-user HLL: stream == batch, exact in the linear regime") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two windows; window 0 has users {1, 2, 3} across 4 events (one
    // repeat), window 1 has {1}; the 9:00 event advances the watermark
    val data = Seq(
      Event(0L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
      Event(1L, ts("2024-01-01 00:20:00"), 2L, "click", 1.0),
      Event(2L, ts("2024-01-01 00:30:00"), 3L, "click", 1.0),
      Event(3L, ts("2024-01-01 00:40:00"), 1L, "click", 1.0),
      Event(4L, ts("2024-01-01 01:10:00"), 1L, "view", 1.0),
      Event(5L, ts("2024-01-01 09:00:00"), 9L, "click", 1.0))
    val source = MemoryStream[Event]
    // two batches so standing HLL state genuinely MERGES across
    // micro-batches (registers from batch 1 max-folded with batch 2)
    source.addData(data.take(2): _*)
    val q = EventStream.windowedDistinctUsers(source.toDF())
      .writeStream.format("memory").queryName("wd_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      source.addData(data.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("win_start").toString, r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("nonzero_registers"),
          r.getAs[Long]("register_sum"), r.getAs[Double]("est_users"))
    val streamed = spark.table("wd_sink").collect().map(key).toMap
    val batch = EventStream.windowedDistinctUsers(data.toDF()).collect().map(key).toMap
    // every finalized window matches batch BIT-FOR-BIT (register merge
    // commutes across the micro-batch split)
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"window $k") }
    assert(streamed.contains(("2024-01-01 00:00:00.0", "click")))
    val (n0, nz0, _, est0) = batch(("2024-01-01 00:00:00.0", "click"))
    assert(n0 == 4L && nz0 == 3L) // 3 distinct users → 3 registers
    // linear-counting regime: ln-based estimate lands within 1% of 3
    assert(math.abs(est0 - 3.0) < 0.03)
  }

  test("windowed value quantiles: stream == batch; small window exact; sample bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // window 0: 5 values; window 1: 40 events (> k=32, sample truncates)
    val w0 = (0 until 5).map(i =>
      Event(i.toLong, ts(s"2024-01-01 00:1$i:00"), i.toLong, "click", (i + 1) * 10.0))
    val w1 = (0 until 40).map(i =>
      Event(100L + i, ts(s"2024-01-01 01:${10 + i % 45}:00"), i.toLong, "click", i.toDouble))
    val late = Seq(Event(999L, ts("2024-01-01 09:00:00"), 9L, "click", 1.0))
    val data = w0 ++ w1 ++ late
    val source = MemoryStream[Event]
    // split mid-window so the bottom-k state genuinely merges across
    // micro-batches (union-truncate folded batch 1 with batch 2)
    source.addData((w0.take(3) ++ w1.take(17)): _*)
    val q = EventStream.windowedValueQuantiles(source.toDF(), k = 32)
      .writeStream.format("memory").queryName("wq_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      source.addData((w0.drop(3) ++ w1.drop(17) ++ late): _*)
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("win_start").toString, r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_sample"), r.getAs[Double]("p25"),
          r.getAs[Double]("p50"), r.getAs[Double]("p75")))
    val streamed = spark.table("wq_sink").collect().map(key).toMap
    val batch = EventStream.windowedValueQuantiles(data.toDF(), k = 32)
      .collect().map(key).toMap
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"window $k") }
    // k >= n: the sample IS the window -> exact quantiles of {10..50}:
    // rk(25) = 1 + (25*4)/100 = 2 -> 20; rk(50) = 3 -> 30; rk(75) = 4 -> 40
    val (n0, ns0, p25, p50, p75) = batch(("2024-01-01 00:00:00.0", "click"))
    assert(n0 == 5L && ns0 == 5L && p25 == 20.0 && p50 == 30.0 && p75 == 40.0)
    // k < n: sample truncated to exactly k
    val (n1, ns1, _, _, _) = batch(("2024-01-01 01:00:00.0", "click"))
    assert(n1 == 40L && ns1 == 32L)
  }

  test("windowed top-k by value: stream == batch; heap truncates to k with deterministic ties") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // window 0: 8 events incl. a VALUE TIE (ids 3 and 4 both at 60.0 —
    // the heap must keep/rank them id-ascending); window 1: 2 events
    // (< k, all kept); the 9:00 event advances the watermark
    val w0 = Seq(80.0, 20.0, 50.0, 60.0, 60.0, 10.0, 70.0, 30.0).zipWithIndex.map {
      case (v, i) => Event(i.toLong, ts(s"2024-01-01 00:1$i:00"), i.toLong, "click", v)
    }
    val w1 = Seq(
      Event(100L, ts("2024-01-01 01:10:00"), 1L, "view", 5.0),
      Event(101L, ts("2024-01-01 01:20:00"), 2L, "view", 9.0))
    val late = Seq(Event(999L, ts("2024-01-01 09:00:00"), 9L, "click", 1.0))
    val data = w0 ++ w1 ++ late
    val source = MemoryStream[Event]
    // split mid-window so heap state genuinely merges across batches
    source.addData(w0.take(4): _*)
    val q = EventStream.windowedTopK(source.toDF())
      .writeStream.format("memory").queryName("wt_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      source.addData((w0.drop(4) ++ w1 ++ late): _*)
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[java.sql.Timestamp]("win_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("rk")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    val streamed = spark.table("wt_sink").collect().map(key).toMap
    val batch = EventStream.windowedTopK(data.toDF()).collect().map(key).toMap
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"row $k") }
    // top-5 of window 0: 80(id0), 70(id6), 60(id3), 60(id4), 50(id2) —
    // the tie ranks id-ascending and 50 survives the truncation to k=5
    val w0k = "2024-01-01 00:00:00.0"
    assert(batch((w0k, "click", 1L)) == ((8L, 0L, 80.0)))
    assert(batch((w0k, "click", 2L)) == ((8L, 6L, 70.0)))
    assert(batch((w0k, "click", 3L)) == ((8L, 3L, 60.0)))
    assert(batch((w0k, "click", 4L)) == ((8L, 4L, 60.0)))
    assert(batch((w0k, "click", 5L)) == ((8L, 2L, 50.0)))
    assert(!batch.contains((w0k, "click", 6L))) // truncated at k
    // under-full window keeps everything, ranked
    val w1k = "2024-01-01 01:00:00.0"
    assert(batch((w1k, "view", 1L)) == ((2L, 101L, 9.0)))
    assert(batch((w1k, "view", 2L)) == ((2L, 100L, 5.0)))
  }

  test("streaming URL dedup: canonical re-crawls dropped; batch dedupUrls agrees on survivors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    val rows = Seq(
      (0L, ts("2024-01-01 00:00:00"), "https://a.com/p?id=1&z=2"),
      (1L, ts("2024-01-01 00:10:00"), "HTTPS://WWW.A.com:443/p/?z=2&utm_source=t&id=1"), // canonical dup of 0
      (2L, ts("2024-01-01 00:20:00"), "https://a.com/q"))
    val q = EventStream.dedupUrlStream(
        source.toDF().toDF("doc_id", "ts", "url"), "ts")
      .writeStream.format("memory").queryName("urldedup_sink")
      .outputMode("append").start()
    try {
      // doc 0 committed to state BEFORE its canonical dup arrives:
      // within one micro-batch Spark only guarantees an ARBITRARY first
      // row per key after the shuffle, so same-batch delivery would make
      // the keep-doc-0 assertion partitioning-dependent (r12 ADVICE)
      source.addData(rows.head)
      q.processAllAvailable()
      source.addData(rows.tail: _*)
      q.processAllAvailable()
      // later-batch re-crawl of page p, still inside the watermark
      source.addData((3L, ts("2024-01-01 00:30:00"), "https://a.com/p?id=1&z=2#frag"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("urldedup_sink").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 2L)) // 1 and 3 collapse onto 0's canonical URL
    // stream survivors == batch dedupUrls keepers over the same feed
    val batchKeep = graft.pipeline.TextOps.dedupUrls(
        (rows :+ (3L, ts("2024-01-01 00:30:00"), "https://a.com/p?id=1&z=2#frag"))
          .toDF("doc_id", "ts", "url"), col("url"))
      .collect().map(_.getAs[Long]("keep_doc_id")).toSet
    assert(batchKeep == ids)
  }

  test("streaming dedup drops content duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    source.addData(
      (0L, ts("2024-01-01 00:00:00"), "the quick brown fox"),
      (1L, ts("2024-01-01 00:10:00"), "THE  quick   BROWN fox"), // dup of 0 normalized
      (2L, ts("2024-01-01 00:20:00"), "something else entirely"))
    val q = EventStream.dedupDocStream(
        source.toDF().toDF("doc_id", "ts", "text"), "ts")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // re-delivery of doc 0's content in a later batch, still in-window
      source.addData((3L, ts("2024-01-01 00:30:00"), "the quick brown fox"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_sink").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 2L)) // 1 and 3 deduped against 0's hash
  }

  test("semantic decontamination is streaming-compatible: stateless projection, stream == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the operator is a pure projection (eval rides as a plan literal, no
    // shuffle/agg — plan-asserted in PipelineSpec), so it must compose with
    // readStream unmodified: the ingest-time contamination filter shape
    val evalE = Seq((100L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (1L, Seq(0.99f, 0.1f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val source = MemoryStream[(Long, Seq[Float])]
    source.addData((1L, Seq(0.99f, 0.1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
    val q = graft.pipeline.VectorOps.decontaminateSemantic(
        source.toDF().toDF("vec_id", "embedding"), evalE, 0.9)
      .writeStream.format("memory").queryName("semdecon_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("semdecon_sink").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val batched = graft.pipeline.VectorOps.decontaminateSemantic(batch, evalE, 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed == batched && streamed.exists(_._3) && streamed.exists(!_._3))
  }

  test("streaming near-dup pairs: minhash bands match batch LSH; watermark bounds the pair horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ~100-token docs, one substitution apart → shingle Jaccard ≈ 0.94,
    // far enough from the 0.8 bar that the 128-hash estimator can't flake
    val base = (1 to 100).map(i => s"w$i")
    val dA = base.mkString(" ")
    val dB = base.updated(50, "zz").mkString(" ")
    val source = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.nearDupPairsStream(
        source.toDF().toDF("doc_id", "ts", "text"), "ts", "1 hour")
      .writeStream.format("memory").queryName("neardup_sink")
      .outputMode("append").start()
    try {
      source.addData(
        (0L, ts("2024-01-01 00:00:00"), dA),
        (1L, ts("2024-01-01 00:10:00"), dB),       // near-dup of 0, in window
        (2L, ts("2024-01-01 00:20:00"), "an entirely different subject matter"))
      q.processAllAvailable()
      // same content as doc 0, but 3 h later — outside the 1 h horizon:
      // the time-range join condition must exclude it
      source.addData((4L, ts("2024-01-01 03:00:00"), dA))
      q.processAllAvailable()
    } finally q.stop()
    val streamPairs = spark.table("neardup_sink")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamPairs == Set((0L, 1L)))
    // batch parity on the in-window docs: identical band hashing, exact
    // verify instead of the estimator — same pair set on this corpus
    val batchPairs = graft.pipeline.TextOps.dedupMinHashLsh(
        Seq((0L, dA), (1L, dB), (2L, "an entirely different subject matter"))
          .toDF("doc_id", "text"), 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs == streamPairs)
  }

  test("session windows: streaming result equals the batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(0L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      Event(1L, ts("2024-01-01 00:05:00"), 1L, "view", 1.0),  // same session (gap 5m < 10m)
      Event(2L, ts("2024-01-01 00:15:00"), 1L, "click", 1.0), // at exactly end: MERGES (inclusive boundary)
      Event(3L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0), // new session
      Event(4L, ts("2024-01-01 00:00:00"), 2L, "view", 1.0),  // user 2: one session
      Event(5L, ts("2024-01-01 09:00:00"), 9L, "click", 1.0)) // watermark pusher
    val batch = EventStream.sessionize(events.toDF(), "10 minutes")
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // boundary semantics: an event AT start+gap still merges (inclusive)
    assert(batch.contains((1L, "2024-01-01 00:00:00", "2024-01-01 00:25:00", 3L)))
    assert(batch.contains((1L, "2024-01-01 01:00:00", "2024-01-01 01:10:00", 1L)))
    assert(batch.contains((2L, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 1L)))

    val source = MemoryStream[Event]
    source.addData(events: _*)
    val q = EventStream.sessionize(
        source.toDF().withWatermark("ts", "1 hour"), "10 minutes")
      .writeStream.format("memory").queryName("session_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("session_sink")
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // every session closed by the watermark matches batch exactly
    assert(streamed.subsetOf(batch))
    assert(streamed.intersect(batch.filter(_._1 == 1L)).size == 2)
  }

  test("LOCF stream equals the batch running window, one-batch and split-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Event(0L, ts("2024-01-01 00:00:00"), 1L, "click", 5.0),    // before any purchase -> null
      Event(1L, ts("2024-01-01 00:05:00"), 1L, "purchase", 9.5), // sets the carry
      Event(2L, ts("2024-01-01 00:10:00"), 1L, "view", 1.0),     // carries 9.5
      Event(3L, ts("2024-01-01 00:20:00"), 1L, "purchase", 2.5), // replaces the carry
      Event(4L, ts("2024-01-01 00:30:00"), 1L, "error", 0.0),    // carries 2.5
      Event(5L, ts("2024-01-01 00:00:00"), 2L, "view", 3.0))     // user 2: never -> null
    // batch truth: the events_locf running window
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val batch = events.toDF()
      .select(col("event_id"), col("user_id"),
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
          .over(w).as("lpv"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(batch == Map(0L -> None, 1L -> Some(9.5), 2L -> Some(9.5),
      3L -> Some(2.5), 4L -> Some(2.5), 5L -> None))
    def run(feeds: Seq[Seq[Event]], sink: String): Map[Long, Option[Double]] = {
      val source = MemoryStream[Event]
      val q = EventStream.locfStream(source.toDS())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try { feeds.foreach { f => source.addData(f: _*); q.processAllAvailable() } }
      finally q.stop()
      spark.table(sink).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    }
    // one batch: in-batch fold order is (ts, event_id) — exact parity
    assert(run(Seq(events), "locf_one") == batch)
    // split mid-carry: state carries 9.5 across the batch boundary
    assert(run(Seq(events.take(3), events.drop(3)), "locf_split") == batch)
  }

  test("LOCF stream under the RocksDB provider: split-batch carry survives the production state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val chkRoot = "/root/repo/target/tmp/rocksdb_chk_locf"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(chkRoot))
    EventStream.withRocksDbStateStore(spark) {
      val source = MemoryStream[Event]
      val q = EventStream.locfStream(source.toDS())
        .writeStream.format("memory").queryName("rocks_locf_sink")
        .option("checkpointLocation", s"$chkRoot/locf")
        .outputMode("append").start()
      try {
        source.addData(
          Event(0L, ts("2024-01-01 00:00:00"), 1L, "click", 5.0),
          Event(1L, ts("2024-01-01 00:05:00"), 1L, "purchase", 9.5))
        q.processAllAvailable()
        // the carry must cross the micro-batch boundary through RocksDB
        source.addData(Event(2L, ts("2024-01-01 00:10:00"), 1L, "view", 1.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("rocks_locf_sink").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      assert(got == Map(0L -> None, 1L -> Some(9.5), 2L -> Some(9.5)))
    }
  }

  test("funnel pairs: stream-stream interval join equals batch; window bounds respected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Event(0L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      Event(1L, ts("2024-01-01 03:00:00"), 1L, "click", 1.0),
      Event(2L, ts("2024-01-01 00:00:00"), 2L, "click", 1.0))
    val purchases = Seq(
      Event(10L, ts("2024-01-01 00:30:00"), 1L, "purchase", 5.0), // in window of click 0
      Event(11L, ts("2024-01-01 02:00:00"), 1L, "purchase", 5.0), // exactly at 0+2h: inclusive
      Event(12L, ts("2024-01-01 03:00:00"), 1L, "purchase", 5.0), // at click-1 ts: EXCLUDED (strict >)
      Event(13L, ts("2024-01-01 04:30:00"), 1L, "purchase", 5.0), // in window of click 1 only
      Event(14L, ts("2024-01-01 00:10:00"), 2L, "purchase", 5.0)) // user 2
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("trigger_id"), col("follow_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = canon(EventStream.funnelPairs(
      clicks.toDF(), purchases.toDF(), "2 hours"))
    assert(batch == Set((0L, 10L), (0L, 11L), (1L, 13L), (2L, 14L)))

    val cSrc = MemoryStream[Event]; val pSrc = MemoryStream[Event]
    cSrc.addData(clicks: _*); pSrc.addData(purchases: _*)
    val q = EventStream.funnelPairs(
        cSrc.toDF().withWatermark("ts", "1 hour"),
        pSrc.toDF().withWatermark("ts", "1 hour"), "2 hours")
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(canon(spark.table("funnel_sink")) == batch)

    // first-follow aggregation: earliest f_ts wins per trigger
    val first = EventStream.funnelFirst(
        (clicks ++ purchases).toDF(), "click", "purchase", "2 hours")
      .collect().map(r => r.getAs[Long]("trigger_id") ->
        (r.getAs[Long]("follow_id"), r.getAs[Long]("lag_ms"))).toMap
    assert(first == Map(
      0L -> (10L, 30L * 60 * 1000),
      1L -> (13L, 90L * 60 * 1000),
      2L -> (14L, 10L * 60 * 1000)))
  }

  test("stream-static enrichment equals the batch join; unmatched keys keep nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("user_id", "mktsegment")
    val events = Seq(
      Event(0L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
      Event(1L, ts("2024-01-01 00:01:00"), 2L, "view", 1.0),
      Event(2L, ts("2024-01-01 00:02:00"), 9L, "click", 1.0)) // no dim row
    val source = MemoryStream[Event]
    source.addData(events: _*)
    val q = EventStream.enrichEvents(source.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("mktsegment"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val streamed = canon(spark.table("enrich_sink"))
    val batch = canon(EventStream.enrichEvents(events.toDF(), dim, Seq("user_id")))
    assert(streamed == batch)
    assert(streamed == Set((0L, Some("BUILDING")), (1L, Some("MACHINERY")), (2L, None)))
  }

  test("contaminationGuard: stream == batch; no false negatives vs exact decontamination") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // eval doc plants the 3-gram "alpha beta gamma"; doc 10 repeats it,
    // doc 11 shares no gram, doc 12 is too short to shingle
    val evalDocs = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "noise alpha beta gamma tail"),
      (11L, "completely unrelated words here"),
      (12L, "too short"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("flagged"), col("n_grams"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSet
    // batch run
    val batch = canon(EventStream.contaminationGuard(
      incoming.toDF("doc_id", "text"), evalDocs))
    // stream run, split across two micro-batches (stateless ⇒ trivially equal)
    val source = MemoryStream[(Long, String)]
    val q = EventStream.contaminationGuard(
      source.toDF().toDF("doc_id", "text"), evalDocs)
      .writeStream.format("memory").queryName("guard_sink")
      .outputMode("append").start()
    try {
      source.addData(incoming.take(1): _*); q.processAllAvailable()
      source.addData(incoming.drop(1): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = canon(spark.table("guard_sink"))
    assert(streamed == batch)
    // no false negatives: every doc the EXACT pass flags is flagged here
    val exactHits = graft.pipeline.TextOps.decontaminate(
      incoming.toDF("doc_id", "text"), evalDocs, n = 3)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(exactHits.subsetOf(streamed.filter(_._2).map(_._1)))
    assert(exactHits == Set(10L))        // the planted leak is real
    assert(!streamed.find(_._1 == 12L).get._2) // gram-less doc unflagged
  }

  test("RocksDB state store: dedup and near-dup parity suites run green under the production provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val chkRoot = "/root/repo/target/tmp/rocksdb_chk"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(chkRoot))
    EventStream.withRocksDbStateStore(spark) {
      // exact dedup, same scenario as the default-provider test
      val source = MemoryStream[(Long, Timestamp, String)]
      source.addData(
        (0L, ts("2024-01-01 00:00:00"), "the quick brown fox"),
        (1L, ts("2024-01-01 00:10:00"), "THE  quick   BROWN fox"),
        (2L, ts("2024-01-01 00:20:00"), "something else entirely"))
      val q = EventStream.dedupDocStream(
          source.toDF().toDF("doc_id", "ts", "text"), "ts")
        .writeStream.format("memory").queryName("rocks_dedup_sink")
        .option("checkpointLocation", s"$chkRoot/dedup")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        source.addData((3L, ts("2024-01-01 00:30:00"), "the quick brown fox"))
        q.processAllAvailable()
      } finally q.stop()
      val ids = spark.table("rocks_dedup_sink").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(0L, 2L))

      // near-dup stream-stream self-join under RocksDB
      val base = (1 to 100).map(i => s"w$i")
      val dA = base.mkString(" ")
      val dB = base.updated(50, "zz").mkString(" ")
      val src2 = MemoryStream[(Long, Timestamp, String)]
      val q2 = EventStream.nearDupPairsStream(
          src2.toDF().toDF("doc_id", "ts", "text"), "ts", "1 hour")
        .writeStream.format("memory").queryName("rocks_neardup_sink")
        .option("checkpointLocation", s"$chkRoot/neardup")
        .outputMode("append").start()
      try {
        src2.addData(
          (0L, ts("2024-01-01 00:00:00"), dA),
          (1L, ts("2024-01-01 00:10:00"), dB),
          (2L, ts("2024-01-01 00:20:00"), "an entirely different subject matter"))
        q2.processAllAvailable()
      } finally q2.stop()
      val pairs = spark.table("rocks_neardup_sink")
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((0L, 1L)))

      // windowed distinct-user HLL: the 4 KB register buffers round-trip
      // through RocksDB state BETWEEN micro-batches and still merge
      // bit-identically with the batch run
      val src3 = MemoryStream[Event]
      val wdData = Seq(
        Event(0L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
        Event(1L, ts("2024-01-01 00:20:00"), 2L, "click", 1.0),
        Event(2L, ts("2024-01-01 00:30:00"), 3L, "click", 1.0),
        Event(3L, ts("2024-01-01 09:00:00"), 9L, "click", 1.0))
      val q3 = EventStream.windowedDistinctUsers(src3.toDF())
        .writeStream.format("memory").queryName("rocks_wd_sink")
        .option("checkpointLocation", s"$chkRoot/wd")
        .outputMode("append").start()
      try {
        src3.addData(wdData.take(2): _*)
        q3.processAllAvailable()
        src3.addData(wdData.drop(2): _*)
        q3.processAllAvailable()
      } finally q3.stop()
      def wdKey(r: org.apache.spark.sql.Row) =
        (r.getAs[java.sql.Timestamp]("win_start").toString, r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n"), r.getAs[Long]("nonzero_registers"),
            r.getAs[Long]("register_sum"), r.getAs[Double]("est_users"))
      val wdStreamed = spark.table("rocks_wd_sink").collect().map(wdKey).toMap
      val wdBatch = EventStream.windowedDistinctUsers(wdData.toDF()).collect().map(wdKey).toMap
      wdStreamed.foreach { case (k, v) => assert(wdBatch(k) == v, s"window $k") }
      assert(wdStreamed.contains(("2024-01-01 00:00:00.0", "click")))

      // windowed KMV value quantiles: the bottom-k buffers round-trip
      // through RocksDB state between micro-batches; union-truncate
      // merge still equals batch exactly
      val src4 = MemoryStream[Event]
      val wqData = (0 until 5).map(i =>
        Event(i.toLong, ts(s"2024-01-01 00:1$i:00"), i.toLong, "click", (i + 1) * 10.0)) :+
        Event(9L, ts("2024-01-01 09:00:00"), 9L, "click", 1.0)
      val q4 = EventStream.windowedValueQuantiles(src4.toDF())
        .writeStream.format("memory").queryName("rocks_wq_sink")
        .option("checkpointLocation", s"$chkRoot/wq")
        .outputMode("append").start()
      try {
        src4.addData(wqData.take(2): _*)
        q4.processAllAvailable()
        src4.addData(wqData.drop(2): _*)
        q4.processAllAvailable()
      } finally q4.stop()
      def wqKey(r: org.apache.spark.sql.Row) =
        (r.getAs[java.sql.Timestamp]("win_start").toString, r.getAs[String]("event_type")) ->
          ((r.getAs[Long]("n"), r.getAs[Long]("n_sample"),
            r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75")))
      val wqStreamed = spark.table("rocks_wq_sink").collect().map(wqKey).toMap
      val wqBatch = EventStream.windowedValueQuantiles(wqData.toDF())
        .collect().map(wqKey).toMap
      wqStreamed.foreach { case (k, v) => assert(wqBatch(k) == v, s"window $k") }
      assert(wqStreamed(("2024-01-01 00:00:00.0", "click")) ==
        ((5L, 5L, 20.0, 30.0, 40.0)))
    }
    // the provider restore worked
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .contains(EventStream.RocksDbProvider))
    // evidence the state REALLY went through RocksDB: its checkpoints are
    // zip/changelog snapshots, never the HDFS provider's .delta files
    val stateFiles = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(chkRoot), null, true)
      .toArray.map(_.toString).filter(_.contains("/state/"))
    assert(stateFiles.nonEmpty, "no state files written under the checkpoints")
    assert(!stateFiles.exists(_.endsWith(".delta")),
      s"found HDFS-provider .delta state — RocksDB was not used:\n${stateFiles.take(5).mkString("\n")}")
  }

  test("keyed state tracks per-user versions with retraction semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    source.addData(
      Event(0L, ts("2024-01-01 00:00:00"), 1L, "signup", 1.0),
      Event(1L, ts("2024-01-01 01:00:00"), 1L, "purchase", 9.5),
      Event(2L, ts("2024-01-01 02:00:00"), 2L, "error", 0.0))
    val q = EventStream.latestPerUser(source.toDS())
      .writeStream.format("memory").queryName("state_sink")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val byUser = spark.table("state_sink").as[EventStream.UserVersion]
      .collect().groupBy(_.user_id).map { case (k, vs) => k -> vs.last }
    assert(byUser(1L).versions == 2 && byUser(1L).value.contains(9.5))
    assert(byUser(2L).versions == 1 && byUser(2L).value.isEmpty) // retracted
  }

  test("keyed state with idle TTL: same answers while keys are live; timeout path wired") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    source.addData(
      Event(0L, ts("2024-01-01 00:00:00"), 1L, "signup", 1.0),
      Event(1L, ts("2024-01-01 01:00:00"), 1L, "purchase", 9.5),
      Event(2L, ts("2024-01-01 02:00:00"), 2L, "error", 0.0))
    source.addData(Event(3L, ts("2024-01-01 03:00:00"), 1L, "view", 2.0))
    // SHORT TTL so the idle timers actually fire in-test. Waiting note:
    // with ProcessingTimeTimeout the stateful operator unconditionally
    // requests another (no-data) batch to fire future timers, so BOTH
    // processAllAvailable and Trigger.AvailableNow never settle — the
    // correct wait is polling the sink: batch 0 emits the two live
    // states, the timeout batches re-emit each state once on eviction
    // (the hasTimedOut branch), giving ≥4 rows.
    val q = EventStream.latestPerUser(source.toDS(), idleTtl = Some("2 seconds"))
      .writeStream.format("memory").queryName("ttl_state_sink")
      .outputMode("update").start()
    try {
      val deadline = System.currentTimeMillis() + 90000
      while (System.currentTimeMillis() < deadline &&
             spark.table("ttl_state_sink").count() < 4) Thread.sleep(250)
      assert(spark.table("ttl_state_sink").count() >= 4,
        "idle timers never fired (no eviction re-emission)")
    } finally q.stop()
    val byUser = spark.table("ttl_state_sink").as[EventStream.UserVersion]
      .collect().groupBy(_.user_id).map { case (k, vs) => k -> vs.maxBy(_.versions) }
    assert(byUser(1L).versions == 3 && byUser(1L).value.contains(2.0))
    assert(byUser(2L).versions == 1 && byUser(2L).value.isEmpty)
  }

  test("userFeatures: RFM aggregates per user, hand-checked") {
    import spark.implicits._
    val ev = Seq(
      (0L, ts("2024-01-01 01:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-01-01 02:00:00"), 1L, "buy", 2.0),
      (2L, ts("2024-01-02 01:00:00"), 1L, "click", 4.0),
      (3L, ts("2024-01-01 05:00:00"), 2L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventStream.userFeatures(ev).collect()
      .map(x => x.getAs[Long]("user_id") -> x).toMap
    val u1 = r(1L)
    assert(u1.getAs[Long]("n_events") == 3 && u1.getAs[Long]("n_types") == 2
      && u1.getAs[Long]("active_days") == 2)
    assert(u1.getAs[String]("first_ts") == "2024-01-01 01:00:00"
      && u1.getAs[String]("last_ts") == "2024-01-02 01:00:00")
    assert(u1.getAs[Double]("total_value") == 6.0 && u1.getAs[Double]("mean_value") == 2.0)
    assert(r(2L).getAs[Long]("n_events") == 1 && r(2L).getAs[Double]("mean_value") == 1.0)
  }

  test("retentionCohorts: first-day cohorts, offsets, distinct user counts") {
    import spark.implicits._
    val ev = Seq(
      // user 1: first active day1, returns day2 and day4
      (0L, ts("2024-01-01 01:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-01-02 01:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-02 02:00:00"), 1L, "buy", 1.0), // same day, counted once
      (3L, ts("2024-01-04 01:00:00"), 1L, "click", 0.0),
      // user 2: also cohort day1, no return
      (4L, ts("2024-01-01 05:00:00"), 2L, "click", 0.0),
      // user 3: cohort day2, returns day3
      (5L, ts("2024-01-02 09:00:00"), 3L, "click", 0.0),
      (6L, ts("2024-01-03 09:00:00"), 3L, "buy", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventStream.retentionCohorts(ev).collect()
      .map(x => (x.getAs[String]("cohort"), x.getAs[Long]("day_offset")) ->
        x.getAs[Long]("n_users")).toMap
    assert(r == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L, ("2024-01-01", 3L) -> 1L,
      ("2024-01-02", 0L) -> 1L, ("2024-01-02", 1L) -> 1L))
  }

  test("typeDriftDaily: hand-computed smoothed KL; vanished types still register") {
    import spark.implicits._
    // day 1: 3 clicks, 1 buy; day 2: 1 click, 3 buys — strong drift.
    // types T=2; p smoothed = (c+1)/(tot+2)
    val ev = Seq(
      (0L, ts("2024-01-01 01:00:00"), 1L, "click", 0.0),
      (1L, ts("2024-01-01 02:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 03:00:00"), 2L, "click", 0.0),
      (3L, ts("2024-01-01 04:00:00"), 2L, "buy", 1.0),
      (4L, ts("2024-01-02 01:00:00"), 1L, "click", 0.0),
      (5L, ts("2024-01-02 02:00:00"), 1L, "buy", 1.0),
      (6L, ts("2024-01-02 03:00:00"), 2L, "buy", 1.0),
      (7L, ts("2024-01-02 04:00:00"), 2L, "buy", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventStream.typeDriftDaily(ev).collect()
      .map(x => x.getAs[String]("day") ->
        (x.getAs[Long]("n_events"), x.getAs[Double]("kl"))).toMap
    assert(r.keySet == Set("2024-01-02")) // day 1 has no predecessor
    assert(r("2024-01-02")._1 == 4)
    val p1c = 4d / 6; val p1b = 2d / 6 // day-1 smoothed shares
    val p2c = 2d / 6; val p2b = 4d / 6
    val want = p2c * math.log(p2c / p1c) + p2b * math.log(p2b / p1b)
    assert(math.abs(r("2024-01-02")._2 - want) < 1e-6)
  }

  test("streaming model filter: stateless projection predictions equal the batch classifier argmax") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.TextOps
    // two clearly-separable languages + a per-doc token for variety
    def text(d: Long): String = {
      val base = if (d % 2 == 0) "the cat sat on the mat with the dog"
                 else "le chat assis sur le tapis avec le chien"
      s"$base extra$d token${d % 5}"
    }
    val train = (0L until 40L).map(d =>
      (d, text(d), if (d % 2 == 0) "en" else "fr")).toDF("doc_id", "text", "lang")
    val buckets = 64
    // stream the same docs through the filter
    val source = MemoryStream[(Long, Timestamp, String)]
    source.addData((0L until 40L).map(d =>
      (d, ts("2024-01-01 00:00:00"), text(d))): _*)
    val q = EventStream.modelFilterStream(
        source.toDF().toDF("doc_id", "ts", "text"), train, buckets)
      .writeStream.format("memory").queryName("modelfilter_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("modelfilter_sink")
      .select("doc_id", "pred_lang", "pred_tier", "keep").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getBoolean(3))).toMap
    assert(streamed.size == 40, "stateless projection must emit every doc")
    // batch twins: the SAME per-doc argmax surfaces
    val langPred = TextOps.classifierPredictions(train, "lang", buckets)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val tiers = TextOps.qualityTiers(train).select(col("doc_id"), col("tier"))
    val tierPred = TextOps.classifierPredictions(
        train.select(col("doc_id"), col("text")).join(tiers, "doc_id"), "tier", buckets)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // holdout docs (doc_id % 10 >= 8) are where the batch surface predicts
    langPred.foreach { case (d, p) =>
      assert(streamed(d)._1 == p, s"pred_lang mismatch for doc $d") }
    assert(langPred.nonEmpty && tierPred.nonEmpty)
    tierPred.foreach { case (d, p) =>
      assert(streamed(d)._2 == p, s"pred_tier mismatch for doc $d") }
    // keep verdict: tier present and not tail
    streamed.foreach { case (d, (_, t, k)) =>
      assert(k == (t != null && t != "tail"), s"keep verdict for doc $d") }
    // every holdout doc hits at least one trained bucket in this corpus
    assert((0L until 40L).filter(_ % 10 >= 8).forall(d => streamed(d)._1 != null))
  }

  test("composed pipeline: url dedup -> exact dedup -> guard -> near-dup in one query DAG") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 100).map(i => s"w$i")
    val dA = base.mkString(" ")
    val dB = base.updated(50, "zz").mkString(" ")          // near-dup of dA
    val evalText = (200 to 260).map(i => s"e$i").mkString(" ")
    val evalDocs = Seq((99L, evalText)).toDF("doc_id", "text")
    // rows: (doc_id, ts, text, url) — 0 re-delivered under a variant URL,
    // 3 an exact-text dup of 0 under its own URL, 4 contaminated, 1 near-dup
    val rows = Seq(
      (0L, ts("2024-01-01 00:00:00"), dA, "https://x.com/p/0?a=1"),
      (0L, ts("2024-01-01 00:00:01"), dA, "HTTPS://WWW.X.com:443/p/0/?utm_source=z&a=1"),
      (1L, ts("2024-01-01 00:10:00"), dB, "https://x.com/p/1?a=1"),
      (3L, ts("2024-01-01 00:11:00"), dA, "https://x.com/p/3?a=1"),
      (4L, ts("2024-01-01 00:12:00"), evalText, "https://x.com/p/4?a=1"),
      (5L, ts("2024-01-01 00:13:00"), "an entirely different subject matter", "https://x.com/p/5?a=1"))
    val source = MemoryStream[(Long, Timestamp, String, String)]
    val chained = {
      val src = source.toDF().toDF("doc_id", "ts", "text", "url")
      val urlDeduped = EventStream.dedupUrlStream(src, "ts").drop("url")
      val exactDeduped = EventStream.dedupDocStream(urlDeduped, "ts")
      val clean = EventStream.contaminationGuard(exactDeduped, evalDocs)
        .where(!col("flagged")).drop("flagged", "n_grams")
      EventStream.nearDupPairsStream(clean, "ts")
    }
    val q = chained.writeStream.format("memory").queryName("composed_sink")
      .outputMode("append").start()
    try {
      source.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("composed_sink")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the url re-delivery of 0 collapsed, the exact dup 3 collapsed into
    // doc 0's class, the contaminated doc 4 was dropped before near-dup,
    // leaving exactly the (0, 1) near-dup pair
    assert(pairs == Set((0L, 1L)))
  }

  test("trendingTermsStream: MG invariants hold on the finalized window; capacity-bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cap = 4
    val source = MemoryStream[(Long, Timestamp, String)]
    // window [00:00, 01:00): n = 13 tokens, alpha 6, beta 2, five
    // singletons — threshold n/(cap+1) = 2.6, so alpha is the one
    // GUARANTEED survivor and every estimate must sit in
    // [true − 2.6, true]. Split across micro-batches so the standing
    // MG state genuinely merges.
    source.addData(
      (0L, ts("2024-01-01 00:05:00"), "alpha alpha alpha beta"),
      (1L, ts("2024-01-01 00:15:00"), "alpha gamma beta alpha"))
    val q = EventStream.trendingTermsStream(
        source.toDF().toDF("doc_id", "ts", "text"), "ts",
        watermark = "30 minutes", k = cap, capacity = cap)
      .writeStream.format("memory").queryName("trend_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      source.addData(
        (2L, ts("2024-01-01 00:25:00"), "alpha delta epsilon zeta eta"),
        (3L, ts("2024-01-01 02:00:00"), "closer closer")) // advances the watermark past 01:00
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("trend_sink")
      .where(col("win_start") === ts("2024-01-01 00:00:00")).collect()
    assert(rows.nonEmpty, "window [00:00, 01:00) must finalize")
    assert(rows.length <= cap) // the summary is capacity-bounded
    assert(rows.forall(_.getAs[Long]("n_tokens") == 13L)) // exact count is order-free
    val exact = Map("alpha" -> 6L, "beta" -> 2L, "gamma" -> 1L,
      "delta" -> 1L, "epsilon" -> 1L, "zeta" -> 1L, "eta" -> 1L)
    val est = rows.map(r => r.getAs[String]("tok") -> r.getAs[Long]("freq_est")).toMap
    // guaranteed-survivor containment: true > n/(cap+1) ⇒ present
    assert(est.contains("alpha"), s"guaranteed survivor missing: $est")
    // under-count bound for every emitted token: est ≤ true ≤ est + n/(cap+1)
    est.foreach { case (tok, e) =>
      val t = exact(tok)
      assert(e <= t && t - e <= 13.0 / (cap + 1), s"MG bound violated for $tok: est $e true $t")
    }
    // rank 1 is the dominant term: alpha's est ≥ 6 − 2.6 > any other
    // token's est ≤ its true ≤ 2
    val rk1 = rows.find(_.getAs[Long]("rk") == 1L).get
    assert(rk1.getAs[String]("tok") == "alpha")
    // the batch run of the SAME transform satisfies the same bounds
    // (contents may legitimately differ by merge order — the
    // heavy_hitters_sketch rows-only reason)
    val batch = EventStream.trendingTermsStream(
        Seq((0L, ts("2024-01-01 00:05:00"), "alpha alpha alpha beta"),
          (1L, ts("2024-01-01 00:15:00"), "alpha gamma beta alpha"),
          (2L, ts("2024-01-01 00:25:00"), "alpha delta epsilon zeta eta"))
          .toDF("doc_id", "ts", "text"), "ts",
        watermark = "30 minutes", k = cap, capacity = cap)
      .collect()
    assert(batch.nonEmpty && batch.forall(_.getAs[Long]("n_tokens") == 13L))
    batch.foreach { r =>
      val (tok, e) = (r.getAs[String]("tok"), r.getAs[Long]("freq_est"))
      assert(e <= exact(tok) && exact(tok) - e <= 13.0 / (cap + 1))
    }
    assert(batch.exists(r => r.getAs[String]("tok") == "alpha" && r.getAs[Long]("rk") == 1L))
  }
}
