package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming throughput evidence (VERDICT r7 item 6): drives the three
  * stateful streaming paths over the sf1 feed UNDER THE ROCKSDB STATE
  * STORE and prints one JSON line with rows/sec, output counts, a batch
  * parity check, and the on-disk state/checkpoint footprint. This is the
  * missing scale evidence for the streaming surface — the parity SPECS
  * run at rows=3 scale; this runs the same operators at 50k docs / 1M
  * events (10× the bench feed) where heap-map state would actually hurt.
  *
  * Protocol notes:
  * - the staged sources are written as 32 parquet files read back with
  *   maxFilesPerTrigger, so each query processes a REAL multi-batch
  *   stream (state survives across micro-batches) rather than one giant
  *   batch;
  * - doc timestamps are synthesized inside one watermark horizon so the
  *   within-watermark dedup semantics coincide with global semantics —
  *   which is what makes the batch parity checks exact (out_rows must
  *   equal the batch distinct-hash / banded-join counts);
  * - `state_bytes` is the recursive size of the query's checkpoint dir
  *   (RocksDB changelog + snapshots), the durable footprint a 100 TB
  *   deployment provisions for.
  */
object StreamBench {
  private def dirBytes(p: java.nio.file.Path): Long = {
    if (!java.nio.file.Files.exists(p)) return 0L
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val root = sys.env.getOrElse("SPARK_GRAFT_STREAM_DIR", "/tmp/graft_streambench")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", graft.functions.GraftExtensions.configValue)
      // production RocksDB checkpointing: small per-batch changelogs +
      // periodic snapshots instead of a full SST snapshot retained per
      // micro-batch — `state_bytes` then measures the durable footprint
      // a deployment actually provisions, not N stacked snapshots
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    // ---- stage the sources as multi-file parquet dirs ----
    // docs: ts spread over 50 min, strictly inside the 1 h horizon
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000) +
          col("doc_id") % 3000).cast("timestamp").as("ts"))
    docs.repartition(32).write.parquet(s"$root/docs_src")
    val docSchema = docs.schema
    val nDocs = docs.count()
    // parity-validity guard (r12 ADVICE): every within-watermark parity
    // bit below assumes the whole doc feed fits inside ONE watermark
    // horizon — if the generator ever widens the ts spread past 1 h,
    // within-watermark dedup legitimately re-emits keys and parity:false
    // would be a protocol artifact, not a code defect. Fail fast instead.
    val span = docs.agg((max(col("ts")).cast("long") -
      min(col("ts")).cast("long")).as("s")).head.getLong(0)
    require(span < 3600,
      s"doc feed ts span ${span}s exceeds the 1 h watermark horizon; " +
        "within-watermark parity checks would be meaningless")

    // events: ts normalized to TIMESTAMP via the shared schema-adaptive
    // reader (EventsReplay.rawEvents — handles nanos-long and µs layouts).
    // Staged TIME-ORDERED (range-partitioned by ts, file order forced via
    // modification times): the sf1 feed spans days against a 1 h
    // watermark, so a randomly-ordered replay would advance the watermark
    // to near-max on the first micro-batch and drop everything after as
    // late — a replay artifact, not a production shape (real feeds arrive
    // roughly in time order; the watermark bounds the real disorder).
    val events = graft.projection.EventsReplay.rawEvents(spark, sfDir)
      .select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
    events.repartitionByRange(32, col("ts")).sortWithinPartitions("ts")
      .write.parquet(s"$root/events_src")
    // FileStreamSource takes files oldest-modTime-first; the part-file
    // index is the ts range order, so stamp strictly increasing times
    val parts = new java.io.File(s"$root/events_src").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(System.currentTimeMillis() - 1000L * (parts.length - i)) }
    val eventSchema = events.schema
    val nEvents = events.count()

    def fileStream(dir: String, schema: org.apache.spark.sql.types.StructType,
                   filesPerTrigger: Int): DataFrame =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger).parquet(dir)

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]

    /** Run a streaming transform to a counting foreachBatch sink under
      * RocksDB; returns (elapsed sec, output rows, checkpoint bytes). */
    def run(name: String, df: DataFrame): (Double, Long, Long) = {
      val ckpt = s"$root/ckpt_$name"
      val n = new AtomicLong(0L)
      val t0 = System.nanoTime()
      val q = EventStream.withRocksDbStateStore(spark) {
        df.writeStream.option("checkpointLocation", ckpt)
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            n.addAndGet(b.count()); ()
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, n.get(), dirBytes(java.nio.file.Paths.get(ckpt)))
    }

    // ---- 1. streaming exact dedup over 50k sf1 docs ----
    {
      val (secs, outRows, stBytes) =
        run("dedup", EventStream.dedupDocStream(
          fileStream(s"$root/docs_src", docSchema, 4), "ts"))
      // all ts inside one horizon → within-watermark dedup == global dedup
      val expect = docs.select(
        xxhash64(graft.pipeline.TextOps.normText(col("text"))).as("a"),
        xxhash64(lit(1), graft.pipeline.TextOps.normText(col("text"))).as("b"))
        .distinct().count()
      out("dedup_doc_stream") =
        s"""{"input_rows":$nDocs,"out_rows":$outRows,"batch_expect":$expect,""" +
        s""""parity":${outRows == expect},"secs":${f"$secs%.2f"},""" +
        s""""rows_per_sec":${(nDocs / secs).toLong},"state_bytes":$stBytes}"""
    }

    /** Revisit-heavy synthetic crawl: ~2.5 surface variants per page. */
    def withUrl(df: DataFrame): DataFrame = {
      val g = pmod(col("doc_id"), lit(20000)).cast("string")
      df.withColumn("url",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("https://crawl.example.com/page/"), g,
            lit("?id="), g, lit("&z=2&a=1")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit("HTTPS://WWW.Crawl.Example.com:443/page/"), g,
            lit("/?utm_source=x&z=2&a=1&id="), g))
        .otherwise(concat(lit("https://crawl.example.com/page/"), g,
          lit("?a=1&id="), g, lit("&z=2#f"))))
    }
    // deterministic held-out "eval set" shared by the guard stages
    val evalDocs = docs.where(pmod(col("doc_id"), lit(100)) === 7)
      .select(col("doc_id"), col("text"))

    // ---- 1b. streaming URL dedup over the same doc feed (r12) ----
    {
      val (secs, outRows, stBytes) =
        run("urldedup", EventStream.dedupUrlStream(
          withUrl(fileStream(s"$root/docs_src", docSchema, 4)), "ts"))
      // all ts in one horizon → within-watermark dedup == global dedup on
      // the canonical-URL hash pair
      val canon = graft.pipeline.TextOps.canonicalUrl(col("url"))
      val expect = withUrl(docs).select(
          xxhash64(canon).as("a"), xxhash64(lit(1), canon).as("b"))
        .distinct().count()
      out("dedup_url_stream") =
        s"""{"input_rows":$nDocs,"out_rows":$outRows,"batch_expect":$expect,""" +
        s""""parity":${outRows == expect},"secs":${f"$secs%.2f"},""" +
        s""""rows_per_sec":${(nDocs / secs).toLong},"state_bytes":$stBytes}"""
    }

    // ---- 1c. ingest-time contamination guard over the doc feed (r13:
    // every production streaming stage gets an sf1 throughput record).
    // Stateless Bloom-probe projection: state_bytes is offsets/commits
    // only — the record documents that the guard adds NO keyed state. ----
    {
      val guarded = EventStream.contaminationGuard(
        fileStream(s"$root/docs_src", docSchema, 4), evalDocs)
      val (secs, outRows, stBytes, flagged) = {
        val ckpt = s"$root/ckpt_contamination"
        val nOut = new AtomicLong(0L); val nFlag = new AtomicLong(0L)
        val t0 = System.nanoTime()
        val q = EventStream.withRocksDbStateStore(spark) {
          guarded.writeStream.option("checkpointLocation", ckpt)
            .outputMode("append")
            .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
              nOut.addAndGet(b.count())
              nFlag.addAndGet(b.where(col("flagged")).count()); ()
            }.start()
        }
        try q.processAllAvailable() finally q.stop()
        ((System.nanoTime() - t0) / 1e9, nOut.get(),
          dirBytes(java.nio.file.Paths.get(ckpt)), nFlag.get())
      }
      // batch twin: the SAME stateless projection over the batch frame —
      // parity is exact equality of the flagged doc sets (and the Bloom
      // contract: every exact-contaminated doc must be flagged)
      val batchFlagged = EventStream.contaminationGuard(docs, evalDocs)
        .where(col("flagged")).select("doc_id")
      val batchFlaggedN = batchFlagged.count()
      // decontaminate returns ONLY contaminated (doc_id, n_hits) rows;
      // same n as the guard so "no false negatives" is apples-to-apples
      val exactMissed = graft.pipeline.TextOps.decontaminate(docs, evalDocs, n = 3)
        .join(batchFlagged, Seq("doc_id"), "left_anti").count()
      out("contamination_guard_stream") =
        s"""{"input_rows":$nDocs,"out_rows":$outRows,"flagged":$flagged,""" +
        s""""batch_flagged":$batchFlaggedN,"exact_missed":$exactMissed,""" +
        s""""parity":${flagged == batchFlaggedN && exactMissed == 0L},""" +
        s""""secs":${f"$secs%.2f"},"rows_per_sec":${(nDocs / secs).toLong},""" +
        s""""state_bytes":$stBytes}"""
    }

    // ---- 1d. model-based filter (r13 verdict item 4): the trained
    // lang-id + quality-classifier bucket tables ride the ingest stream
    // as plan literals — a stateless projection like the Bloom guard;
    // state_bytes is offsets/commits only. Training is timed separately
    // (one-time batch cost, like the index builds in Bench). ----
    val (langProfile, tierProfile, trainSecs) = {
      import graft.pipeline.TextOps
      val trainDocs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      val t0t = System.nanoTime()
      val lp = TextOps.bucketProfile(trainDocs, "lang", 1024)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val tiers = TextOps.qualityTiers(trainDocs).select(col("doc_id"), col("tier"))
      val tp = TextOps.bucketProfile(
        trainDocs.select(col("doc_id"), col("text")).join(tiers, "doc_id"),
        "tier", 1024)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      (lp, tp, (System.nanoTime() - t0t) / 1e9)
    }
    {
      val sinkDir = s"$root/modelfilter_out"
      val ckpt = s"$root/ckpt_modelfilter"
      val t0 = System.nanoTime()
      val q = EventStream.withRocksDbStateStore(spark) {
        EventStream.modelFilterApply(
            fileStream(s"$root/docs_src", docSchema, 4), langProfile, tierProfile)
          .select(col("doc_id"), col("pred_lang"), col("pred_tier"), col("keep"))
          .writeStream.option("checkpointLocation", ckpt)
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.write.mode("append").parquet(sinkDir); ()
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val streamed = spark.read.parquet(sinkDir)
      val outRows = streamed.count()
      val kept = streamed.where(col("keep")).count()
      // parity: the SAME stateless scoring over the batch frame must
      // agree per doc (exact set equality on ids + both predictions)
      val batch = EventStream.modelFilterApply(docs, langProfile, tierProfile)
        .select(col("doc_id"), col("pred_lang"), col("pred_tier"), col("keep"))
      val mismatched = streamed.except(batch).count()
      out("model_filter_stream") =
        s"""{"input_rows":$nDocs,"out_rows":$outRows,"kept":$kept,""" +
        s""""mismatched":$mismatched,"parity":${mismatched == 0L && outRows == nDocs},""" +
        s""""train_secs":${f"$trainSecs%.2f"},"secs":${f"$secs%.2f"},""" +
        s""""rows_per_sec":${(nDocs / secs).toLong},""" +
        s""""state_bytes":${dirBytes(java.nio.file.Paths.get(ckpt))}}"""
    }

    // ---- trending terms (windowed Misra–Gries heavy hitters) ----
    // 5-minute tumbling windows over the ≤1 h feed so most windows
    // FINALIZE in append mode; k = capacity so the whole summary is
    // emitted and the survivor-containment audit below is meaningful.
    // Summary contents are merge-order-dependent (the
    // heavy_hitters_sketch rows-only reason) so the recorded bit is the
    // INVARIANT audit vs exact window counts, not row parity:
    // (1) n_tokens exact, (2) est ≤ true ≤ est + n/(cap+1) for every
    // emitted token, (3) every guaranteed survivor
    // (true > n/(cap+1)) present in its emitted window's summary.
    //
    // The finalize-able watermark (2 min ≪ feed span) makes arrival
    // ORDER load-bearing for the exact-count audit: docs_src files hold
    // random ts, so a batch can advance the watermark past a window
    // other files still carry rows for — those rows are then dropped as
    // late (correct streaming semantics, but the exact twin can't see
    // it). Stage a ts-ordered source instead: repartitionByRange puts
    // ascending ts ranges in ascending part indices, and the mod-time
    // stamp (the events_src trick) makes FileStreamSource consume them
    // in that order, so no row ever arrives behind the watermark.
    {
      val sinkDir = s"$root/trending_out"
      val ckpt = s"$root/ckpt_trending"
      val cap = 16
      docs.repartitionByRange(32, col("ts")).sortWithinPartitions("ts")
        .write.parquet(s"$root/trending_src")
      val tparts = new java.io.File(s"$root/trending_src").listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      tparts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(System.currentTimeMillis() - 1000L * (tparts.length - i)) }
      val t0 = System.nanoTime()
      val q = EventStream.withRocksDbStateStore(spark) {
        EventStream.trendingTermsStream(
            fileStream(s"$root/trending_src", docSchema, 4), "ts",
            window = "5 minutes", watermark = "2 minutes",
            k = cap, capacity = cap)
          .writeStream.option("checkpointLocation", ckpt)
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.write.mode("append").parquet(sinkDir); ()
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val streamed = spark.read.parquet(sinkDir).localCheckpoint(true)
      val nWins = streamed.select(col("win_start")).distinct().count()
      val toks = docs
        .select(org.apache.spark.sql.functions.window(col("ts"), "5 minutes").as("w"),
          explode(graft.pipeline.TextOps.tokens(col("text"))).as("tok"))
        .select(col("w.start").as("win_start"), col("tok"))
        .groupBy(col("win_start"), col("tok"))
        .agg(count(lit(1)).as("tc")).localCheckpoint(true)
      val winN = toks.groupBy(col("win_start")).agg(sum(col("tc")).as("nTrue"))
      val vCount = streamed.join(winN, "win_start")
        .where(col("n_tokens") =!= col("nTrue")).count()
      val vBound = streamed.join(toks, Seq("win_start", "tok"), "left")
        .where(col("freq_est") > coalesce(col("tc"), lit(0L)) ||
          coalesce(col("tc"), lit(0L)) - col("freq_est") >
            col("n_tokens").cast("double") / (cap + 1))
        .count()
      val vSurv = toks.join(winN, "win_start")
        .where(col("tc") * (cap + 1) > col("nTrue"))
        .join(streamed.select(col("win_start")).distinct(), Seq("win_start"), "left_semi")
        .join(streamed.select(col("win_start"), col("tok")),
          Seq("win_start", "tok"), "left_anti")
        .count()
      val audit = vCount == 0L && vBound == 0L && vSurv == 0L
      out("trending_terms_stream") =
        s"""{"input_rows":$nDocs,"finalized_windows":$nWins,"out_rows":${streamed.count()},""" +
        s""""count_violations":$vCount,"bound_violations":$vBound,""" +
        s""""survivor_violations":$vSurv,"invariants":$audit,""" +
        s""""secs":${f"$secs%.2f"},"rows_per_sec":${(nDocs / secs).toLong},""" +
        s""""state_bytes":${dirBytes(java.nio.file.Paths.get(ckpt))}}"""
    }

    /** Batch twin of the streaming near-dup estimator pipeline over an
      * arbitrary (doc_id, text) corpus: identical band hashing and
      * signature Jaccard (tuned constants mirrored from the operator),
      * regular join since every pair is in-horizon; localCheckpoint is
      * the batch staging barrier (same role as the stream operator's
      * Generate barriers — signature computed once). */
    def bandedPairCount(corpus: DataFrame): Long = {
      import graft.pipeline.TextOps
      val numHashes = EventStream.NearDupNumHashes
      val bands = EventStream.NearDupBandsTuned
      val r = numHashes / bands
      val sigT = corpus.select(col("doc_id"),
          TextOps.signatureBest(spark, TextOps.hashPairs(
            TextOps.shinglesFromTokens(TextOps.tokens(col("text")))),
            numHashes).as("sig"))
        .where(col("sig").isNotNull).localCheckpoint(true)
      def banded(side: String): DataFrame =
        sigT.select(col("doc_id").as(side), col("sig").as(s"sig_$side"))
          .select(col(side), col(s"sig_$side"),
            explode(transform(sequence(lit(0), lit(bands - 1)),
              b => struct(b.as("band"),
                xxhash64(slice(col(s"sig_$side"), b * r + 1, lit(r)), b).as("bh"))))
              .as("bb"))
          .select(col(side), col(s"sig_$side"),
            col("bb.band").as(s"band_$side"), col("bb.bh").as(s"bh_$side"))
      val matched = size(filter(
        zip_with(col("sig_a"), col("sig_b"), (p, q) => p === q), m => m))
      banded("a").join(banded("b"),
          col("band_a") === col("band_b") && col("bh_a") === col("bh_b") &&
            col("a") < col("b"))
        .where(matched.cast("double") / numHashes >= 0.8)
        .select("a", "b").distinct().count()
    }

    // ---- 2. streaming minhash near-dup pairs over 50k sf1 docs ----
    {
      // state-partition tuning for the 4-stateful-op pipeline: each
      // micro-batch commits one RocksDB instance per (operator ×
      // partition), so 32 shuffle partitions mean 4×32 store commits
      // per batch — fixed cost that dwarfs the data at this state size.
      // 8 partitions × 4 ops ≈ the core count; a production deployment
      // sizes state partitions to state volume, not to the CPU count.
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val (secs, outRows, stBytes) =
        try run("neardup", EventStream.nearDupPairsStream(
          fileStream(s"$root/docs_src", docSchema, 4), "ts",
          bands = EventStream.NearDupBandsTuned))
        finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      val expect = bandedPairCount(docs)
      out("neardup_pairs_stream") =
        s"""{"input_rows":$nDocs,"out_rows":$outRows,"batch_expect":$expect,""" +
        s""""parity":${outRows == expect},"secs":${f"$secs%.2f"},""" +
        s""""rows_per_sec":${(nDocs / secs).toLong},"state_bytes":$stBytes}"""
    }

    // ---- 2b. COMPOSED end-to-end pipeline (r13 verdict item 7, plus
    // the r14 model stage): url dedup → exact dedup → contamination
    // guard → MODEL FILTER → near-dup in ONE query DAG — production
    // runs the stages composed, and near-dup (the expensive stage)
    // sees only survivors. Parity contract: the url stage's
    // re-deliveries reuse the SAME doc row (id + text), so its
    // survivor set is deterministic; the exact stage keeps one
    // representative per normalized-text class; the guard and model
    // verdicts are pure functions of the text; and the near-dup PAIR
    // COUNT is invariant to which class member survives (signatures
    // are a pure function of the text class) — the batch twin replays
    // the class representatives through the guard+model filters and
    // the banded counter. ----
    {
      val withUniqueUrl = docs.withColumn("url",
        concat(lit("https://crawl.example.com/page/"), col("doc_id").cast("string"),
          lit("?id="), col("doc_id").cast("string"), lit("&z=2&a=1")))
      val redelivered = docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("ts", (col("ts").cast("long") + 1).cast("timestamp"))
        .withColumn("url",
          concat(lit("HTTPS://WWW.Crawl.Example.com:443/page/"),
            col("doc_id").cast("string"),
            lit("/?utm_source=x&z=2&a=1&id="), col("doc_id").cast("string")))
      val composedSrc = withUniqueUrl.unionByName(redelivered)
      composedSrc.repartition(32).write.parquet(s"$root/docs_composed_src")
      val nComposed = composedSrc.count()
      val composedSchema = composedSrc.schema
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val (secs, outRows, stBytes) =
        try {
          val src = fileStream(s"$root/docs_composed_src", composedSchema, 4)
          val urlDeduped = EventStream.dedupUrlStream(src, "ts").drop("url")
          val exactDeduped = EventStream.dedupDocStream(urlDeduped, "ts")
          val clean = EventStream.contaminationGuard(exactDeduped, evalDocs)
            .where(!col("flagged")).drop("flagged", "n_grams")
          val modeled = EventStream.modelFilterApply(clean, langProfile, tierProfile)
            .where(col("keep")).drop("pred_lang", "pred_tier", "keep")
          run("composed", EventStream.nearDupPairsStream(modeled, "ts",
            bands = EventStream.NearDupBandsTuned))
        } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      // batch twin: url stage collapses re-deliveries back to `docs`;
      // one representative per exact-text class; guard filter; banded count
      import graft.pipeline.TextOps
      val reps = docs
        .withColumn("ha", xxhash64(TextOps.normText(col("text"))))
        .withColumn("hb", xxhash64(lit(1), TextOps.normText(col("text"))))
        .groupBy(col("ha"), col("hb"))
        .agg(min(col("doc_id")).as("doc_id"))
      val repDocs = docs.join(reps.select("doc_id"), "doc_id")
      val guardedReps = EventStream.contaminationGuard(repDocs, evalDocs)
        .where(!col("flagged")).select(col("doc_id"), col("text"))
      val cleanReps = EventStream.modelFilterApply(
          guardedReps, langProfile, tierProfile)
        .where(col("keep")).select(col("doc_id"), col("text"))
        .localCheckpoint(true)
      val nSurvivors = cleanReps.count()
      val expect = bandedPairCount(cleanReps)
      out("composed_pipeline_stream") =
        s"""{"input_rows":$nComposed,"survivors":$nSurvivors,""" +
        s""""out_rows":$outRows,"batch_expect":$expect,""" +
        s""""parity":${outRows == expect},"secs":${f"$secs%.2f"},""" +
        s""""rows_per_sec":${(nComposed / secs).toLong},"state_bytes":$stBytes}"""
    }

    // ---- 3. session windows over 1M sf1 events (keyed session state) ----
    {
      val ckpt = s"$root/ckpt_sessions"
      val sinkDir = s"$root/sessions_out"
      val t0 = System.nanoTime()
      val q = EventStream.withRocksDbStateStore(spark) {
        EventStream.sessionize(
            fileStream(s"$root/events_src", eventSchema, 4)
              .withWatermark("ts", "1 hour"))
          .writeStream.option("checkpointLocation", ckpt)
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.write.mode("append").parquet(sinkDir); ()
          }.start()
      }
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val streamed = spark.read.parquet(sinkDir)
      val outRows = streamed.count()
      // closed sessions must be a SUBSET of the batch sessionization
      // (sessions the watermark never closed are withheld, so counts may
      // differ; rows emitted but absent from batch must be zero)
      val batch = EventStream.sessionize(events)
      val mismatched = streamed.except(batch).count()
      out("sessionize_stream") =
        s"""{"input_rows":$nEvents,"out_rows":$outRows,""" +
        s""""batch_sessions":${batch.count()},"mismatched":$mismatched,""" +
        s""""parity":${mismatched == 0L},"secs":${f"$secs%.2f"},""" +
        s""""rows_per_sec":${(nEvents / secs).toLong},""" +
        s""""state_bytes":${dirBytes(java.nio.file.Paths.get(ckpt))}}"""
    }

    val body = out.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_throughput","provider":"rocksdb","sf":"$sfDir","cpus":$cpus,"results":$body}""")
    spark.stop()
  }
}
