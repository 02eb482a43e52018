package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{TextOps, VectorOps}

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "THE  QUICK   brown fox jumps over the lazy dog"), // exact dup of 0 (normalized)
    (3L, "completely different text about spark engines and parquet files"),
    (4L, "tiny")                                            // < 3 tokens
  ).toDF("doc_id", "text")

  test("text stats: token and char counts") {
    val r = TextOps.textStats(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(r(0L) == 9 && r(2L) == 9 && r(4L) == 1)
  }

  test("BPE-ish pre-tokenizer: letter/digit/punct runs as separate tokens") {
    val d = Seq((1L, "Hello, world! 42 times")).toDF("doc_id", "text")
    val r = TextOps.tokenCounts(d).head()
    // whitespace: [Hello,][world!][42][times] = 4
    // bpe-ish:    [Hello][,][world][!][42][times] = 6
    assert(r.getAs[Long]("n_ws") == 4 && r.getAs[Long]("n_bpe") == 6)
  }

  test("exact dedup groups whitespace/case variants") {
    val r = TextOps.dedupExact(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_size")).toMap
    assert(r(0L) == 2)          // doc 2 collapsed into doc 0
    assert(!r.contains(2L))
    assert(r(1L) == 1 && r(3L) == 1 && r(4L) == 1)
  }

  test("minhash LSH finds the near-dup pair, skips unrelated docs") {
    val pairs = TextOps.dedupMinHashLsh(docs, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((0L, 2L))) // identical after normalization: J=1
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L))) // J = 6/8
    assert(pairs.size == 3)          // nothing else pairs
  }

  test("simhash: identical token streams share a fingerprint; pairs found") {
    val fps = docs.select(col("doc_id"), TextOps.simhash(col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    assert(fps(0L) == fps(2L)) // same tokens → same simhash
    val pairs = TextOps.simhashPairs(docs, maxHam = 3)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((0L, 2L)))
  }

  test("simhashFingerprints (relational codegen form) == per-doc fold, incl. empty text") {
    // the r14 rewrite of simhashPairs' fingerprint stage must reproduce
    // the higher-order-fold fingerprints BIT-FOR-BIT on every doc —
    // including an empty and a whitespace-only doc (fp = 0 path)
    val d = docs.unionAll(Seq((100L, ""), (101L, "   \t  ")).toDF("doc_id", "text"))
    val fold = d.select(col("doc_id"), TextOps.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = TextOps.simhashFingerprints(d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rel == fold)
  }

  test("langId picks the stopword-matching language") {
    val d = Seq((1L, "the cat and the dog of a house"),
      (2L, "der Hund und die Katze ist nicht da"),
      (3L, "zzz qqq xxx")).toDF("doc_id", "text")
    val r = d.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "und")
  }

  test("langIdTrained: disjoint-vocab languages classify; holdout split honored") {
    // train split = doc_id % 10 < 8; docs 8/9/18 are the holdout
    val d = (0L to 3L).map(i => (i, "alpha beta gamma delta", "en")) ++
      (4L to 7L).map(i => (i, "zork blum quux fnord", "xx")) ++
      Seq((8L, "alpha beta gamma", "en"),   // clean en holdout
          (9L, "zork blum quux", "xx"),     // clean xx holdout
          (18L, "zork blum fnord", "en"))   // mislabeled: votes say xx
    val cm = TextOps.langIdTrained(d.toDF("doc_id", "text", "lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm((("en", "en"))) == 1L)
    assert(cm((("xx", "xx"))) == 1L)
    assert(cm((("en", "xx"))) == 1L) // the planted misclassification row
    assert(cm.size == 3)
    // train docs never appear in the confusion matrix
    assert(cm.values.sum == 3L)
  }

  test("qualityClassifier: separable corpus classifies tiers on the holdout; labels follow qualityTiers") {
    // 30 docs, one lang, three 10-doc classes with token corpus-counts
    // 130 / 30 / 10 → avg bitlen-logprob 8 / 5 / 4 → qualityTiers cuts
    // land exactly on the classes (ranks 1-10 head, 11-20 middle,
    // 21-30 tail). Hashed-bucket majority then separates the disjoint
    // vocabularies; holdout = doc_id % 10 ∈ {8, 9} (two per class).
    val d = (0L to 9L).map(i => (i, Seq.fill(13)("ha hb hc hd he").mkString(" "), "en")) ++
      (10L to 19L).map(i => (i, Seq.fill(3)("ma mb mc md me").mkString(" "), "en")) ++
      (20L to 29L).map(i => (i, "ta tb tc td te", "en"))
    val cm = TextOps.qualityClassifier(d.toDF("doc_id", "text", "lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // perfect holdout confusion: the six held-out docs (8,9,18,19,28,29)
    // all land on their class tier
    assert(cm == Map(("head", "head") -> 2L, ("middle", "middle") -> 2L,
      ("tail", "tail") -> 2L))
  }

  test("ivfMaintain: drifted append triggers rebuild and restores affinity; compatible append keeps the index") {
    import graft.pipeline.VectorOps
    def axisCloud(ids: Range, axis: Int, dims: Int = 8): Seq[(Long, Array[Float])] =
      ids.map { i =>
        val v = Array.fill(dims)(0.001f * (i % 7))
        v(axis) = 1f
        (i.toLong, v)
      }
    // base cloud on axis 0; drifted appended batch on axis 4 — frozen
    // centroids describe it badly, the staleness compare must fire
    val base = axisCloud(0 until 60, 0).toDF("vec_id", "embedding")
    val drifted = axisCloud(100 until 130, 4).toDF("vec_id", "embedding")
    val app1 = VectorOps.ivfAppend(VectorOps.ivfBuild(base, k = 4), drifted)
    val h1 = VectorOps.ivfHealth(app1.index, col("nb") >= 100L).head()
    assert(h1.getAs[Boolean]("stale"), "drifted batch must read stale")
    assert(h1.getAs[Long]("n_app") == 30L && h1.getAs[Long]("n_base") == 60L)
    val (rebuilt, didRebuild) = VectorOps.ivfMaintain(app1.index, col("nb") >= 100L)
    assert(didRebuild)
    // post-rebuild: the appended batch's affinity is healthy again —
    // the same health row must no longer read stale
    val h2 = VectorOps.ivfHealth(rebuilt, col("nb") >= 100L).head()
    assert(!h2.getAs[Boolean]("stale"), "rebuild must clear the staleness")
    // compatible append (same distribution as base): no rebuild branch
    val sameDist = axisCloud(200 until 230, 0).toDF("vec_id", "embedding")
    val app2 = VectorOps.ivfAppend(VectorOps.ivfBuild(base, k = 4), sameDist)
    val (kept, didRebuild2) = VectorOps.ivfMaintain(app2.index, col("nb") >= 200L)
    assert(!didRebuild2 && (kept eq app2.index))
    kept.indexed.unpersist(false)
    rebuilt.indexed.unpersist(false)
  }

  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f), 0),
    (2L, Array(0f, 1f, 0f), 1),
    (3L, Array(0f, 0f, 1f), 2),
    (4L, Array(-1f, 0f, 0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k: exact cosine ranking") {
    val r = VectorOps.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0L), 2)
      .collect().map(r => (r.getAs[Long]("nb"), r.getAs[Double]("sim")))
    assert(r.map(_._1).toSeq == Seq(1L, 2L)) // closest first; ties → lower id
    assert(math.abs(r.head._2 - 0.9939) < 1e-9)
  }

  test("embedding norms") {
    val r = VectorOps.norms(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("norm")).toMap
    assert(r(0L) == 1.0 && math.abs(r(1L) - 0.9055) < 1e-9)
  }

  test("native graft_hyperplanes expression is bit-identical to the plan-literal HOF form") {
    assert(graft.functions.GraftExtensions.loadedIn(spark))
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .where(col("vec_id") < 50)
    def sigs(c: org.apache.spark.sql.Column) =
      realE.select(col("vec_id"), c.as("sig")).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Int]]("sig").toSeq).toMap
    val native = sigs(call_function("graft_hyperplanes",
      VectorOps.dvec(col("embedding")), lit(32), lit(64)))
    val hof = sigs(VectorOps.lshSignature(VectorOps.dvec(col("embedding")), 32, 64))
    assert(native == hof)
    // dims mismatch fails loudly on both paths
    intercept[Exception] {
      realE.select(call_function("graft_hyperplanes",
        VectorOps.dvec(col("embedding")), lit(8), lit(32))).collect()
    }
  }

  test("native graft_minhash expression agrees with the HOF composition") {
    assert(graft.functions.GraftExtensions.loadedIn(spark))
    val hp = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        TextOps.hashPairs(TextOps.shinglesFromTokens(col("t"))).as("hp"))
    val native = hp.select(col("doc_id"),
        call_function("graft_minhash", col("hp"), lit(16)).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[scala.collection.Seq[Long]]("sig")).map(_.toSeq)).toMap
    val hof = hp.select(col("doc_id"),
        TextOps.signatureFromPairs(col("hp"), 16).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[scala.collection.Seq[Long]]("sig")).map(_.toSeq)).toMap
    // identical signatures for every doc with shingles
    (0L to 3L).foreach(d => assert(native(d) == hof(d), s"doc $d"))
    // empty shingle set (doc 4, < 3 tokens): native returns NULL (doc
    // never enters banding) where the HOF form made an all-null array
    assert(native(4L).isEmpty)
    // null array elements from direct SQL use: skipped, not an NPE; an
    // all-null array degrades to NULL like the empty set
    val sqlRows = spark.sql(
      """SELECT graft_minhash(pairs, 4) AS sig FROM VALUES
        |  (array(named_struct('h1', 7L, 'h2', 3L), CAST(NULL AS STRUCT<h1: BIGINT, h2: BIGINT>))),
        |  (array(CAST(NULL AS STRUCT<h1: BIGINT, h2: BIGINT>))),
        |  (CAST(NULL AS ARRAY<STRUCT<h1: BIGINT, h2: BIGINT>>)) AS t(pairs)""".stripMargin)
      .collect().map(r => Option(r.getAs[scala.collection.Seq[Long]]("sig")).map(_.toSeq))
    assert(sqlRows(0).contains(Seq(7L, 10L, 13L, 16L)))
    assert(sqlRows(1).isEmpty && sqlRows(2).isEmpty)
  }

  test("native graft_cosine expression: SQL-resolvable, agrees with the HOF composition") {
    assert(graft.functions.GraftExtensions.loadedIn(spark))
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d, 3.0d), array(3.0d, 2.0d, 1.0d)) AS c").head().getDouble(0)
    assert(math.abs(r - 10.0 / 14.0) < 1e-12)
    // parity with the zip_with/aggregate composition on real data
    import spark.implicits._
    val two = vecs.select(VectorOps.dvec(col("embedding")).as("v")).limit(2)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("v"))
    val hof = vecs.as("x").crossJoin(vecs.as("y"))
      .where(col("x.vec_id") === 0L && col("y.vec_id") === 1L)
      .select(VectorOps.cosine(VectorOps.dvec(col("x.embedding")), VectorOps.dvec(col("y.embedding"))).as("c"))
      .head().getDouble(0)
    val native = vecs.as("x").crossJoin(vecs.as("y"))
      .where(col("x.vec_id") === 0L && col("y.vec_id") === 1L)
      .select(VectorOps.cosineBest(spark, VectorOps.dvec(col("x.embedding")), VectorOps.dvec(col("y.embedding"))).as("c"))
      .head().getDouble(0)
    assert(hof == native)
  }

  test("embedding near-dup: LSH buckets catch near-identical vectors, verify filters") {
    import spark.implicits._
    val e = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(1.0f).updated(0, 1.01f)), // ~identical to 0
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)),
      (3L, Array.fill(8)(-1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = VectorOps.embeddingNearDupPairs(e, 0.99, dims = 8)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs == Set((0L, 1L))) // only the near-identical pair survives
  }

  test("IVF ANN: clustered vectors resolve to their cluster-mates; recall vs brute force") {
    import spark.implicits._
    // three tight direction-clusters, 8 vectors each
    def jitter(base: Array[Float], seed: Int): Array[Float] =
      base.zipWithIndex.map { case (x, i) => x + ((seed * 31 + i) % 7) * 0.01f }
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f); val c = Array(0f, 0f, 1f, 0f)
    val rows = (0 until 8).flatMap(s => Seq(
      (s.toLong, jitter(a, s)), (100L + s, jitter(b, s)), (200L + s, jitter(c, s))))
    val e = rows.toDF("vec_id", "embedding")
    val r = VectorOps.ivfTopK(e, e.where(col("vec_id") === 0L), topK = 5, k = 3, nProbe = 1)
      .collect().map(_.getAs[Long]("nb")).toSeq
    assert(r.nonEmpty && r.forall(_ < 100L), s"expected cluster-A mates, got $r")

    // recall gate against exact brute force on the real embeddings table,
    // at the REGISTERED defaults (k=16, nProbe=10) — the general-ANN
    // contract (VERDICT r2): recall@10 ≥ 0.9 even on this weak-neighbor
    // corpus (max pairwise cosine ≈ 0.5, worst case for a pruning index)
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val qs = realE.where(col("vec_id") < 5)
    val exact = VectorOps.bruteForceTopK(realE, qs, 10)
      .collect().map(r => (r.getAs[Long]("q"), r.getAs[Long]("nb"))).toSet
    val ivf = VectorOps.ivfTopK(realE, qs, 10)
      .collect().map(r => (r.getAs[Long]("q"), r.getAs[Long]("nb"))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    info(s"IVF recall@10 at defaults: $recall")
    assert(recall >= 0.9, s"IVF recall gate failed: $recall < 0.9")
  }

  test("PQ ANN: 32x code compression, ADC+rerank recall vs brute force") {
    import spark.implicits._
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cb = VectorOps.pqTrain(realE)
    // compression: 64 float32 (256 B) -> 8 codes; codebooks are m*k
    // sub-centroids of subDim doubles
    assert(cb.m == 8 && cb.subDim == 8 && cb.k == 16)
    assert(cb.books.length == 8 && cb.books.forall(_.length == 16))
    assert(cb.books.forall(_.forall(_.length == 8)))
    val codes = VectorOps.pqEncode(realE, cb)
    val sample = codes.limit(5).collect()
    assert(sample.forall(_.getSeq[Int](1).length == 8))
    assert(codes.count() == realE.count())
    // deterministic: retrain + re-encode bit-identical (no RNG anywhere)
    val codes2 = VectorOps.pqEncode(realE, VectorOps.pqTrain(realE))
    assert(codes.collect().map(_.toSeq).toSet == codes2.collect().map(_.toSeq).toSet)
    // recall@10 against exact brute force on the weak-neighbor corpus:
    // ADC shortlists 100, exact cosine re-ranks — the IVF-style gate
    val qs = realE.where(col("vec_id") < 5)
    val exact = VectorOps.bruteForceTopK(realE, qs, 10)
      .collect().map(r => (r.getAs[Long]("q"), r.getAs[Long]("nb"))).toSet
    val pq = VectorOps.pqTopK(realE, codes, cb, qs, 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = pq.intersect(exact).size.toDouble / exact.size
    info(s"PQ recall@10 (shortlist 100, re-rank): $recall")
    assert(recall >= 0.8, s"PQ recall gate failed: $recall < 0.8")

    // the IVF+PQ composition compounds both stages' pruning losses —
    // gate is correspondingly looser on this worst-case corpus
    val idx = VectorOps.ivfBuild(realE)
    val both = VectorOps.ivfPqTopK(idx, codes, cb, realE, qs, 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recallBoth = both.intersect(exact).size.toDouble / exact.size
    info(s"IVF+PQ recall@10: $recallBoth")
    assert(recallBoth >= 0.7, s"IVF+PQ recall gate failed: $recallBoth < 0.7")
    idx.indexed.unpersist(false)
  }

  test("LSH ANN: same-direction vectors share buckets, ranking is exact on candidates") {
    val r = VectorOps.lshTopK(vecs, vecs.where(col("vec_id") === 0L), 3, dims = 3)
      .collect().map(_.getAs[Long]("nb")).toSeq
    assert(r.contains(1L))  // near-identical direction must collide
    assert(!r.contains(0L)) // self excluded
  }

  test("IVF index survives a parquet save/open round-trip") {
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val qs = realE.where(col("vec_id") < 3)
    val built = VectorOps.ivfBuild(realE)
    val root = "/root/repo/target/tmp/ivf_index"
    VectorOps.saveIndex(built, root)
    val reopened = VectorOps.openIndex(spark, root)
    assert(reopened.k == built.k)
    def rows(idx: VectorOps.IvfIndex) =
      VectorOps.ivfSearch(idx, qs, 10).collect()
        .map(r => (r.getAs[Long]("q"), r.getAs[Long]("nb"))).toSet
    assert(rows(reopened) == rows(built))
    // searches over the OPENED index must hit the persisted in-memory
    // assignment, not re-scan the index parquet per search
    val openedPlan = VectorOps.ivfSearch(reopened, qs, 10)
      .queryExecution.executedPlan.toString
    assert(openedPlan.contains("InMemoryTableScan"),
      s"opened-index search does not read the persisted assignment:\n$openedPlan")
    built.indexed.unpersist(false)
    reopened.indexed.unpersist(false)
  }

  test("similar docs: exact Jaccard top-k ranking from a broadcast query") {
    val r = TextOps.similarDocs(docs, docs.where(col("doc_id") === 0), 3)
      .collect().map(x => (x.getAs[Long]("nb"), x.getAs[Double]("jac"))).toSeq
    // doc 2 is an exact dup (1.0), doc 1 near (6 of 8 distinct shingles),
    // then nb-tiebreak among the zero-overlap rest
    assert(r.map(_._1) == Seq(2L, 1L, 3L))
    assert(r.head._2 == 1.0)
    assert(r(1)._2 == 0.75)
  }

  test("repetition stats: degenerate docs score low distinct ratios") {
    val d = Seq(
      (0L, "spam spam spam spam"),              // 1 distinct of 4
      (1L, "all words here are unique tokens"), // all distinct
      (2L, "ab ab cd cd ab ab cd cd")           // 2 distinct, 1 distinct bigram pattern
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_tokens") == 4)
    assert(r(0L).getAs[Double]("distinct_ratio") == 0.25)
    assert(r(0L).getAs[Double]("top_token_ratio") == 1.0)
    assert(r(1L).getAs[Double]("distinct_ratio") == 1.0)
    assert(math.abs(r(1L).getAs[Double]("top_token_ratio") - 1.0 / 6) < 0.0001)
    // doc 2: bigrams = [ab ab, ab cd, cd cd, cd ab, ...] distinct 4 of 7
    assert(math.abs(r(2L).getAs[Double]("bigram_distinct_ratio") - 4.0 / 7) < 0.001)
  }

  test("PII redaction: emails, IPs, phones counted and replaced") {
    val d = Seq(
      (0L, "mail a.b+c@foo-bar.example.org or x@y.io, host 192.168.0.1, call 555-0142-9876"),
      (1L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val r = TextOps.piiRedact(d, "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_emails") == 2)
    assert(r(0L).getAs[Long]("n_ips") == 1)
    assert(r(0L).getAs[Long]("n_phones") == 1)
    assert(r(0L).getAs[String]("redacted") ==
      "mail [EMAIL] or [EMAIL], host [IP], call [PHONE]")
    assert(r(1L).getAs[Long]("n_emails") == 0)
    assert(r(1L).getAs[String]("redacted") == "nothing sensitive here")
  }

  test("split assignment: deterministic, uniform, correctly proportioned") {
    val ids = spark.range(0, 10000).toDF("id")
    val r = TextOps.splitAssign(ids, "id").groupBy("split").count()
      .collect().map(x => x.getAs[String]("split") -> x.getAs[Long]("count")).toMap
    // 90/5/5 ± a few % at n=10k under a uniform hash
    assert(math.abs(r("train") - 9000L) < 300, r.toString)
    assert(math.abs(r("val") - 500L) < 150, r.toString)
    assert(math.abs(r("test") - 500L) < 150, r.toString)
    // stability: same id always lands in the same split
    val twice = TextOps.splitAssign(ids, "id").select("id", "split")
      .except(TextOps.splitAssign(ids, "id").select("id", "split"))
    assert(twice.isEmpty)
  }

  test("chunking: stride windows cover every token, boundaries exact") {
    val d = Seq((0L, "t1 t2 t3 t4 t5 t6 t7"), (1L, "")).toDF("doc_id", "text")
    val r = TextOps.chunkDocs(d, chunkTokens = 3, stride = 2).collect()
      .map(x => (x.getAs[Long]("chunk_id"), x.getAs[String]("chunk"),
        x.getAs[Long]("n_chunk_tokens")))
      .sortBy(_._1)
    // starts 0,2,4,6 → windows of ≤3 tokens; empty doc emits nothing
    assert(r.toSeq == Seq(
      (0L, "t1 t2 t3", 3L), (1L, "t3 t4 t5", 3L),
      (2L, "t5 t6 t7", 3L), (3L, "t7", 1L)))
  }

  test("int8 quantization: scale and reconstruction error") {
    // 63.5 and -32 are exact binary floats on the q-grid of scale
    // 63.5/127 = 0.5, so reconstruction is exact → rms 0
    val d = Seq(
      (0L, Array(63.5f, -32f, 0f)),
      (1L, Array(0f, 0f, 0f))           // zero vector excluded
    ).toDF("vec_id", "embedding")
    val r = VectorOps.quantizeInt8(d).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("scale") == 0.5)
    assert(r.head.getAs[Double]("rms_err") == 0.0)
  }

  test("decontamination: train docs sharing an eval n-gram are flagged with hit counts") {
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon"),      // contains eval gram "beta gamma delta"
      (1L, "completely unrelated words entirely"), // clean
      (2L, "x alpha beta gamma delta y"),          // two overlapping eval grams
      (3L, "beta gamma")                           // < 3 tokens of overlap: no gram
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val r = TextOps.decontaminate(train, eval, n = 3).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_hits")).toMap
    // eval grams: {alpha beta gamma, beta gamma delta}
    assert(r == Map(0L -> 2L, 2L -> 2L))
  }

  test("length quantiles: exact matches a hand computation; approx within tolerance") {
    val d = Seq.tabulate(101)(i => (i.toLong, "en", i.toLong))
      .toDF("doc_id", "lang", "n_chars")
    val ex = TextOps.lengthQuantiles(d).head()
    // 0..100: quantile at p is exactly 100p under linear interpolation
    assert(ex.getAs[Double]("p10") == 10.0 &&
      ex.getAs[Double]("p50") == 50.0 && ex.getAs[Double]("p90") == 90.0)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextOps.lengthQuantiles(real).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("p50")).toMap
    val approx = TextOps.lengthQuantilesApprox(real).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("p50")).toMap
    exact.foreach { case (lang, p50) =>
      assert(math.abs(approx(lang) - p50) / p50 < 0.05, s"$lang p50 approx vs exact")
    }
  }

  test("vocab stats: exact distinct; HLL sketch within 5% of exact") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextOps.vocabStats(real).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("distinct_tokens"))).toMap
    val est = TextOps.vocabSketch(real).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("est_distinct"), r.getAs[Long]("nonzero_registers"),
          r.getAs[Long]("register_sum"))).toMap
    exact.foreach { case (lang, (total, distinct)) =>
      assert(total >= distinct && distinct > 0)
      val (e, nz, rs) = est(lang)
      assert(math.abs(e - distinct) / distinct < 0.05,
        s"$lang HLL estimate $e vs exact $distinct")
      // register-state sanity: at most one register per distinct token,
      // every nonzero register ranks ≥ 1
      assert(nz <= distinct && nz > 0 && rs >= nz)
    }
    // order/partitioning independence: identical bit-for-bit state and
    // estimate under 1 vs 32 partitions (elementwise-max commutes)
    val one = TextOps.vocabSketch(real.coalesce(1)).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("nonzero_registers"), r.getAs[Long]("register_sum"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("est_distinct")))).toMap
    val many = TextOps.vocabSketch(real.repartition(32)).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("nonzero_registers"), r.getAs[Long]("register_sum"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("est_distinct")))).toMap
    assert(one == many)
    // raw-HLL branch (the tiny synthetic vocab only reaches linear
    // counting): 100k distinct tokens — values pinned to the DuckDB
    // register-replay of the same token set (cross-engine, bit-for-bit
    // including the final double expression); true-count error ≈ 1.8%,
    // inside the 1.04/√4096 regime
    val big = spark.range(100000)
      .selectExpr("'x' AS lang", "concat('tok', id) AS tok")
      .groupBy($"lang")
      .agg(count(lit(1)).as("total_tokens"),
        call_function("graft_hll", $"tok", lit(12)).as("h"))
      .select($"h.nonzero", $"h.rank_sum", round($"h.est", 4).as("est"))
      .head()
    assert(big.getLong(0) == 4096L && big.getLong(1) == 24174L)
    assert(big.getDouble(2) == 98227.3168)
  }

  test("native graft_vec_mean aggregate: exact means, null/dim semantics, matches posexplode path") {
    assert(graft.functions.GraftExtensions.loadedIn(spark))
    // exact arithmetic on small integers — no float tolerance needed
    val d = Seq(
      (0L, "a", Array(1.0, 2.0)),
      (1L, "a", Array(3.0, 6.0)),
      (2L, "b", Array(10.0, 20.0))
    ).toDF("vec_id", "label", "embedding")
    d.createOrReplaceTempView("vm_in")
    val m = spark.sql(
      "SELECT label, graft_vec_mean(embedding) AS m FROM vm_in GROUP BY label")
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]]("m").toSeq).toMap
    assert(m == Map("a" -> Seq(2.0, 4.0), "b" -> Seq(10.0, 20.0)))
    // null ARRAY skipped; null ELEMENT poisons its group; empty group → null
    val edge = spark.sql(
      """SELECT label, graft_vec_mean(v) AS m FROM VALUES
        |  ('skip', array(2.0d, 4.0d)), ('skip', CAST(NULL AS ARRAY<DOUBLE>)),
        |  ('poison', array(1.0d, CAST(NULL AS DOUBLE))),
        |  ('empty', CAST(NULL AS ARRAY<DOUBLE>)) AS t(label, v)
        |GROUP BY label""".stripMargin)
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[scala.collection.Seq[Double]]("m")).map(_.toSeq)).toMap
    assert(edge("skip").contains(Seq(2.0, 4.0)))
    assert(edge("poison").isEmpty && edge("empty").isEmpty)
    // real corpus: native centroid norms equal the posexplode composition
    val realE = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("label", col("label").cast("long"))
    val native = VectorOps.labelCentroids(realE).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val composed = realE
      .select(col("label"), posexplode(VectorOps.dvec(col("embedding"))).as(Seq("i", "x")))
      .groupBy(col("label"), col("i")).agg(avg(col("x")).as("m"))
      .groupBy(col("label")).agg(round(sqrt(sum(col("m") * col("m"))), 4).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native == composed)
  }

  test("containmentPairs: quote inside a long doc flags one direction only") {
    // A = a short doc; B embeds A verbatim inside much longer unique text;
    // C is unrelated. Jaccard(A,B) is small (|A|/|B|), containment(A→B)=1.
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 40).map(i => s"unique$i word$i").mkString(" ")
    val d = Seq(
      (1L, quote),
      (2L, s"preamble text here $quote $filler"),
      (3L, "totally unrelated content about engines and turbines spinning")
    ).toDF("doc_id", "text")
    val rows = TextOps.containmentPairs(d, 3, 0.8).collect()
      .map(r => (r.getAs[Long]("contained"), r.getAs[Long]("container"),
        r.getAs[Long]("n_common"), r.getAs[Long]("n_grams"),
        r.getAs[Double]("containment")))
    // A's 4 shingles all recur in B (df=2, indexed); B's own grams are
    // df=1 and leave the numerator, but its denominator stays |S(B)| —
    // so only the A→B direction crosses 0.8
    assert(rows.toSeq == Seq((1L, 2L, 4L, 4L, 1.0)), rows.toSeq.toString)
  }

  test("containmentPairs: boilerplate grams above maxDf never flag a pair") {
    // every doc shares the same 5-token boilerplate banner (df=4 > maxDf=3)
    // but nothing else — the numerator drops those grams, so no pairs
    val banner = "standard legal disclaimer applies here"
    val d = (1L to 4L).map(i =>
      (i, s"$banner body$i content$i differs$i entirely$i")).toDF("doc_id", "text")
    assert(TextOps.containmentPairs(d, 3, 0.5, maxDf = 3).count() == 0)
    // same corpus with maxDf back at default: banner grams are indexed
    // (df=4 ≤ 50) yet the denominator keeps full sizes — symmetric weak
    // overlap, still below a 0.5 threshold for all pairs
    assert(TextOps.containmentPairs(d, 3, 0.5, maxDf = 50).count() == 0)
  }

  test("dedupClusters: transitive near-dup chains collapse to one kept representative") {
    // A/B differ by one token, A/C by another: A~B and A~C pass the 0.8
    // shingle-Jaccard bar (~0.88) but B~C (two diffs) lands at ~0.78 —
    // so {1,2,3} is one TRANSITIVE cluster even though (2,3) is not a
    // pair, which is exactly what pair-wise dropping gets wrong
    val base = (1 to 50).map(i => s"tok$i")
    val d = Seq(
      (1L, base.mkString(" ")),
      (2L, base.updated(9, "xx").mkString(" ")),
      (3L, base.updated(39, "yy").mkString(" ")),
      (99L, "completely different text about nothing else entirely"))
      .toDF("doc_id", "text")
    val r = TextOps.dedupClusters(d, 0.8).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r(1L) == ((1L, true)))
    assert(r(2L) == ((1L, false)))
    assert(r(3L) == ((1L, false)))
    assert(r(99L) == ((99L, true))) // singleton keeps itself
    assert(r.size == 4)
  }

  test("dedupKeepBest: the longest doc wins the cluster, not min doc_id") {
    val base = (1 to 50).map(i => s"tok$i")
    val d = Seq(
      (1L, base.mkString(" ")),
      (2L, base.updated(9, "xxmuchlongertoken").mkString(" ")), // longer near-dup
      (99L, "completely different text about nothing else entirely"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = TextOps.dedupKeepBest(d, 0.8).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r(1L) == ((1L, false))) // min doc_id (the cluster id) but SHORTER — dropped
    assert(r(2L) == ((1L, true))) // longest in the cluster — kept
    assert(r(99L) == ((99L, true))) // singleton keeps itself
    assert(r.size == 3)
  }

  test("zipfSlope + tokenEntropy: an exact 1/r corpus fits slope -1 and the closed-form H") {
    // frequencies 12, 6, 4, 3 are exactly f = 12/r at ranks 1..4, so
    // ln f = ln 12 − ln r is EXACTLY linear and the OLS slope is −1 up
    // to the 1e-6 micro quantization
    val text = (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")).mkString(" ")
    val d = Seq((1L, "en", text)).toDF("doc_id", "lang", "text")
    val z = TextOps.zipfSlope(d).head()
    assert(z.getAs[String]("lang") == "en")
    assert(z.getAs[Long]("vocab") == 4 && z.getAs[Long]("n_tokens") == 25)
    assert(math.abs(z.getAs[Double]("slope") + 1.0) <= 2e-4)
    val e = TextOps.tokenEntropy(d).head()
    val n = 25.0
    val want = math.log(n) - (12 * math.log(12) + 6 * math.log(6) +
      4 * math.log(4) + 3 * math.log(3)) / n
    assert(e.getAs[Long]("n_tokens") == 25 && e.getAs[Long]("vocab") == 4)
    assert(math.abs(e.getAs[Double]("entropy_nats") - want) <= 1e-4)
  }

  test("graft_vec_mean: empty-array groups survive partial aggregation; 0-vs-n dims merge throws") {
    val agg = graft.functions.VectorMeanAgg(org.apache.spark.sql.catalyst.expressions.Literal(null))
    // a buffer of empty arrays (dims=0, count>0) must round-trip through
    // serialize/deserialize as an EMPTY array, not null — null means "no
    // data" and would drop the count in merge
    val emptyBuf = new graft.functions.VectorMeanAgg.Buf(3L, Array.empty[Double], false)
    val rt = agg.deserialize(agg.serialize(emptyBuf))
    assert(rt.count == 3L && rt.sums != null && rt.sums.isEmpty && !rt.poisoned)
    // genuinely-no-data buffer still round-trips as null sums
    val noData = agg.deserialize(agg.serialize(new graft.functions.VectorMeanAgg.Buf(0L, null, false)))
    assert(noData.sums == null && noData.count == 0L)
    // merging empty-dims with n-dims is the same mixed-dims error update raises
    intercept[IllegalStateException] {
      agg.merge(rt, new graft.functions.VectorMeanAgg.Buf(1L, Array(1.0, 2.0), false))
    }
    // end-to-end: a group of empty arrays spanning partitions (forces the
    // partial → shuffle-serialized → final merge path) yields empty array
    assert(graft.functions.GraftExtensions.loadedIn(spark))
    val d = Seq(("e", Array.empty[Double]), ("e", Array.empty[Double]))
      .toDF("label", "v").repartition(2)
    d.createOrReplaceTempView("vm_empty")
    val res = spark.sql("SELECT graft_vec_mean(v) AS m FROM vm_empty GROUP BY label")
      .collect().map(r => Option(r.getAs[scala.collection.Seq[Double]]("m")).map(_.toSeq))
    assert(res.toSeq == Seq(Some(Seq.empty[Double])))
  }

  test("unigram log-prob: rarer-token docs score lower; probabilities are corpus-wide") {
    val d = Seq(
      (0L, "common common common common"),
      (1L, "common common rare1 rare2")
    ).toDF("doc_id", "text")
    val r = TextOps.unigramLogProb(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Double]("avg_logprob"))).toMap
    // 8 tokens total: P(common)=6/8, P(rare*)=1/8
    assert(r(0L)._1 == 4 && r(1L)._1 == 4)
    assert(r(0L)._2 > r(1L)._2) // the all-common doc is more probable
    assert(math.abs(r(0L)._2 - math.log(0.75)) < 1e-3)
    val expected1 = (2 * math.log(0.75) + 2 * math.log(0.125)) / 4
    assert(math.abs(r(1L)._2 - expected1) < 1e-3)
  }

  test("bm25: hand-computed score, query-term coverage, absent-term docs excluded") {
    val corpus = Seq(
      (0L, "spark spark join"),   // tf(spark)=2, tf(join)=1, dl=3
      (1L, "join filter filter"), // tf(join)=1, dl=3
      (2L, "filter scan scan")    // no query term → excluded
    ).toDF("doc_id", "text")
    val out = TextOps.bm25Scores(corpus, Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(0L, 1L))
    // closed form: N=3, avgdl=3, dl=3 → denominator tf + 1.2
    def idf(df: Int) = math.log((3 - df + 0.5) / (df + 0.5) + 1)
    def sat(tf: Double) = tf * 2.2 / (tf + 1.2)
    val exp0 = idf(1) * sat(2) + idf(2) * sat(1)
    val exp1 = idf(2) * sat(1)
    assert(math.abs(out(0L) - BigDecimal(exp0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(1L) - BigDecimal(exp1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(0L) > out(1L)) // higher tf on the rarer term ranks first

    // an empty corpus degrades to zero rows, not an NPE on null avgdl
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.bm25Scores(empty, Seq("spark")).count() == 0L)
    val allEmpty = Seq((0L, ""), (1L, "   ")).toDF("doc_id", "text")
    assert(TextOps.bm25Scores(allEmpty, Seq("spark")).count() == 0L)

    // query terms run through the same tokenizer as the corpus: casing
    // and punctuation must not silently zero the match set
    val viaMessy = TextOps.bm25Scores(corpus, Seq("SPARK!", "Join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaMessy == out)
  }

  test("packSequences: exact coverage, budget respected, BFD half-full invariant") {
    val corpus = (0L until 40L).map { i =>
      // token counts 1..40 via repeated words
      (i, Seq.fill(i.toInt + 1)("tok").mkString(" "))
    }.toDF("doc_id", "text")
    val bins = TextOps.packSequences(corpus, budgetTokens = 64, shards = 4)
      .collect().map(r => (r.getString(0),
        r.getSeq[Long](1), r.getInt(2), r.getLong(3)))
    // every doc exactly once
    val allDocs = bins.flatMap(_._2)
    assert(allDocs.sorted.toSeq == (0L until 40L).toSeq)
    // no bin over budget (no doc exceeds it here)
    bins.foreach { case (id, ds, n, total) =>
      assert(total <= 64, s"bin $id over budget: $total")
      assert(n == ds.length && total > 0)
    }
    // BFD: at most one bin ≤ half-full per partition
    bins.groupBy(_._1.split("-")(0)).foreach { case (pid, pb) =>
      assert(pb.count(_._4 <= 32) <= 1, s"partition $pid has >1 half-empty bin")
    }
    // oversized doc gets a singleton bin, not dropped
    val over = Seq((100L, Seq.fill(200)("tok").mkString(" "))).toDF("doc_id", "text")
    val ob = TextOps.packSequences(over, budgetTokens = 64).collect()
    assert(ob.length == 1 && ob.head.getLong(3) == 200L)
  }

  test("graft_topk two-phase shortlist: identical to the window rank, ties and small groups") {
    import org.apache.spark.sql.expressions.Window
    // adversarial candidate set: a hot group (500 candidates, tied scores),
    // a group smaller than k, and a singleton — spread over many partitions
    // so the map-side partial heaps genuinely truncate before the exchange
    val rows = (0 until 500).map(i => (1L, i.toLong, (i % 7).toDouble)) ++
      (0 until 3).map(i => (2L, 100L + i, 1.0)) ++ Seq((3L, 7L, 0.5))
    val df = rows.toDF("g", "id", "score").repartition(16)
    val native = VectorOps.groupedTopK(df, "g", "id", "score", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w)).where(col("rk") <= 10)
      .select(col("g"), col("id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native == viaWindow, "bounded-heap shortlist diverged from the window rank")
    // deterministic tie handling: score 6.0 ties resolve to the LOWEST ids
    val hot = native.filter(_._1 == 1L)
    assert(hot.size == 10)
    assert(hot.filter(_._3 == 6.0).map(_._2).toSeq.sorted ==
      (0 until 500).filter(_ % 7 == 6).map(_.toLong).sorted.take(hot.count(_._3 == 6.0)))
    // NaN/null scores (0/0 cosine of a zero vector) are excluded on BOTH
    // paths — a NaN in the heap would wedge its root (every comparison
    // false) while the window would rank it FIRST; neither is an answer
    val poisoned = (rows ++ Seq((1L, 9999L, Double.NaN), (3L, 8L, Double.NaN)))
      .toDF("g", "id", "score").repartition(16)
    val cleaned = VectorOps.groupedTopK(poisoned, "g", "id", "score", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cleaned == native, "NaN scores leaked into the shortlist")

    // the native path really is an aggregate, not a window
    if (graft.functions.GraftExtensions.loadedIn(spark)) {
      val plan = VectorOps.groupedTopK(df, "g", "id", "score", 10)
        .queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("topkagg") && !plan.contains("window"),
        s"expected an aggregate-based shortlist:\n$plan")
    }
  }

  test("ivfAppend: incremental index matches full-rebuild recall; staleness signal sane") {
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val base = VectorOps.ivfBuild(realE.where(pmod(col("vec_id"), lit(7)) =!= 0))
    val appended = VectorOps.ivfAppend(base,
      realE.where(pmod(col("vec_id"), lit(7)) === 0))
    // every corpus vector is indexed exactly once after the append
    assert(appended.index.indexed.count() == realE.count())
    assert(appended.index.indexed.select(col("nb")).distinct().count() == realE.count())
    // in-distribution append: assignment quality of the appended batch
    // stays near the base index's (staleness is the drop, floored at 0)
    info(f"base=${appended.baseMeanCos}%.4f appended=${appended.appendedMeanCos}%.4f " +
      f"staleness=${appended.staleness}%.4f")
    assert(appended.staleness >= 0d && appended.staleness < 0.1,
      s"in-distribution append should not look stale: ${appended.staleness}")
    // recall of the appended index within epsilon of a full rebuild
    val qs = realE.where(col("vec_id") < 5)
    val exact = VectorOps.bruteForceTopK(realE, qs, 10)
      .collect().map(r => (r.getAs[Long]("q"), r.getAs[Long]("nb"))).toSet
    def recall(idx: VectorOps.IvfIndex): Double = {
      val got = VectorOps.ivfSearch(idx, qs, 10)
        .collect().map(r => (r.getAs[Long]("q"), r.getAs[Long]("nb"))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val full = VectorOps.ivfBuild(realE)
    val rAppended = recall(appended.index)
    val rFull = recall(full)
    info(s"recall@10 appended=$rAppended rebuilt=$rFull")
    assert(rAppended >= rFull - 0.1,
      s"appended-index recall $rAppended fell >0.1 below rebuilt $rFull")
    Seq(appended.index, full).foreach(_.indexed.unpersist(false))
  }

  test("PQ index survives a parquet save/open round-trip; opened search is identical") {
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cb = VectorOps.pqTrain(realE)
    val codes = VectorOps.pqEncode(realE, cb)
    val root = "/root/repo/target/tmp/pq_index"
    VectorOps.pqSave(cb, codes, root)
    val (cb2, codes2) = VectorOps.pqOpen(spark, root)
    assert(cb2.m == cb.m && cb2.subDim == cb.subDim && cb2.k == cb.k)
    assert(cb2.books.map(_.toSeq).toSeq == cb.books.map(_.toSeq).toSeq,
      "codebooks changed across the round-trip")
    val qs = realE.where(col("vec_id") < 3)
    def rows(c: VectorOps.PqCodebooks, cd: org.apache.spark.sql.DataFrame) =
      VectorOps.pqTopK(realE, cd, c, qs, 10)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
          r.getAs[Int]("rank"))).toSet
    assert(rows(cb2, codes2) == rows(cb, codes))
    codes2.unpersist(false)
  }

  test("LruMemo: bounded, LRU eviction order, access refreshes recency") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val memo = new VectorOps.LruMemo[Int, String](3, evicted += _)
    (1 to 3).foreach(i => memo.getOrBuild(i)(s"v$i"))
    memo.getOrBuild(1)("rebuilt-1") // hit: refreshes 1, does NOT rebuild
    assert(memo.getOrBuild(1)("x") == "v1")
    memo.getOrBuild(4)("v4") // evicts 2 (LRU after 1 was touched)
    memo.getOrBuild(5)("v5") // evicts 3
    assert(evicted.toSeq == Seq("v2", "v3"))
    assert(memo.size == 3)
    assert(memo.contains(1) && memo.contains(4) && memo.contains(5))
    // the shared ANN caches ride the same bound
    assert(VectorOps.IvfCache.cachedCount <= VectorOps.MaxCachedIndexes)
    assert(VectorOps.PqCache.cachedCount <= VectorOps.MaxCachedIndexes)
  }

  test("pqTrain: sparse id space misses the sample residue class; falls back to full corpus") {
    import spark.implicits._
    // ids ≡ 1 (mod 5): the vec_id % 5 == 0 sample is EMPTY
    val rnd = new scala.util.Random(7)
    val rows = (0 until 24).map(i =>
      (5L * i + 1L, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val e = rows.toDF("vec_id", "embedding")
    val cb = VectorOps.pqTrain(e, m = 2, k = 4)
    assert(cb.books.length == 2 && cb.books.forall(_.length == 4))
    assert(cb.books.forall(_.forall(_.length == 4)))
    val codes = VectorOps.pqEncode(e, cb)
    assert(codes.count() == 24)
    // and a corpus smaller than k fails LOUDLY instead of silently
    val tiny = rows.take(2).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      VectorOps.pqTrain(tiny, m = 2, k = 4)
    }
    assert(ex.getMessage.contains("too small"))
  }

  test("heavy hitters: exact ranks; MG sketch exact when vocab fits capacity") {
    import spark.implicits._
    val d = Seq(
      (0L, "a a a b b c", "en"), (1L, "a b d", "en"),
      (2L, "x x y", "de")).toDF("doc_id", "text", "lang")
    val exact = TextOps.heavyHitters(d, 3).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rk")) ->
        (r.getAs[String]("tok"), r.getAs[Long]("freq"))).toMap
    assert(exact(("en", 1L)) == ("a", 4L))
    assert(exact(("en", 2L)) == ("b", 3L))
    assert(exact(("en", 3L)) == ("c", 1L)) // freq tie (c=d=1) → tok asc
    assert(exact(("de", 1L)) == ("x", 2L))
    // vocab per lang ≤ capacity → the sketch IS the exact answer,
    // across the partial-merge path (forced multi-partition input)
    val sk = TextOps.heavyHittersSketch(d.repartition(4), 3, capacity = 16)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("rk")) ->
        (r.getAs[String]("tok"), r.getAs[Long]("freq_est"))).toMap
    assert(sk == exact)
  }

  test("dupSpans: maximal repeated runs, hand-built boilerplate case") {
    import spark.implicits._
    // docs 1 and 2 share an 8-token boilerplate block at different
    // offsets inside otherwise-distinct text; doc 3 is clean
    val boiler = "terms of service apply to all users here"
    val d = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two $boiler three four five six"),
      (3L, "entirely unrelated content with no repeats at all zero"))
      .toDF("doc_id", "text")
    val out = TextOps.dupSpans(d, n = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the shared run is exactly the 8 boilerplate tokens: every 5-gram
    // inside it repeats, nothing outside does. doc 1: tokens 4..11;
    // doc 2: tokens 3..10
    assert(out(1L) == ((4L, 11L, 8L)))
    assert(out(2L) == ((3L, 10L, 8L)))
    assert(!out.contains(3L))
    // within-doc repetition counts too: the same 6 tokens twice in one doc
    val rep = Seq((9L, "a b c d e f x y z a b c d e f")).toDF("doc_id", "text")
    val r2 = TextOps.dupSpans(rep, n = 5).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(r2 == Set((1L, 6L, 6L), (10L, 15L, 6L)))
  }

  test("removeDupSpans: excises the boilerplate, keeps clean docs intact") {
    import spark.implicits._
    val boiler = "terms of service apply to all users here"
    val d = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"one two $boiler three four five six"),
      (3L, "entirely unrelated content with no repeats at all zero"))
      .toDF("doc_id", "text")
    val out = TextOps.removeDupSpans(d, n = 5).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("alpha beta gamma delta epsilon", 5L, 8L)))
    assert(out(2L) == (("one two three four five six", 6L, 8L)))
    // clean doc passes through with its normalized token stream
    assert(out(3L)._3 == 0L && out(3L)._1.startsWith("entirely unrelated"))
    // reassembly order survives aggressive partitioning
    val shuffled = TextOps.removeDupSpans(
      spark.createDataFrame(d.rdd.repartition(7), d.schema), n = 5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(shuffled(1L) == "alpha beta gamma delta epsilon")
  }

  test("hashEmbed: hand-pinned cells, kernel properties, order independence") {
    import spark.implicits._
    // md5('spark') word1 % 8 = 2 (sign +), md5('join') word1 % 8 = 5
    // (sign −) — values verified against a Python md5 reference
    val d = Seq((1L, "spark spark spark join join")).toDF("doc_id", "text")
    val v = TextOps.hashEmbed(d, dim = 8).head().getSeq[Long](1)
    assert(v == Seq(0L, 0L, 3L, 0L, 0L, -2L, 0L, 0L))
    // kernel sanity on real docs: a doc is its own nearest neighbor
    // (cosine 1 on identical text), and the vectors are integer-exact
    // under re-partitioning
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextOps.hashEmbed(real, 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = TextOps.hashEmbed(real.repartition(16), 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 64))
    // token-count mass is conserved up to sign: Σ|cells| ≤ Σ counts,
    // equality when no two tokens share a cell with opposite signs
    val toks = real.select(col("doc_id"),
        explode(graft.pipeline.TextOps.tokens(col("text"))).as("t"))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { case (id, vec) =>
      assert(vec.map(math.abs).sum <= toks(id), s"doc $id mass")
    }
  }

  test("cmsHeavyHitters: est >= true, CMS error bound, order independence") {
    import spark.implicits._
    // 20k distinct rare tokens + 5 planted heavy hitters → real column
    // collisions at w=1024 (≈20 rare tokens per column), so the probe
    // must actually take the min over rows, not read a clean counter
    val heavy = Seq("alpha" -> 400, "beta" -> 300, "gamma" -> 200,
      "delta" -> 100, "epsilon" -> 50)
    val text = (heavy.flatMap { case (t, n) => Seq.fill(n)(t) } ++
      (0 until 20000).map(i => s"r$i")).mkString(" ")
    val d = Seq((0L, text, "en")).toDF("doc_id", "text", "lang")
    val out = TextOps.cmsHeavyHitters(d, k = 5).collect()
      .map(r => r.getAs[String]("tok") ->
        (r.getAs[Long]("true_count"), r.getAs[Long]("est"), r.getAs[Long]("rk"))).toMap
    val n = heavy.map(_._2).sum + 20000L
    heavy.zipWithIndex.foreach { case ((t, c), i) =>
      val (tc, est, rk) = out(t)
      assert(tc == c && rk == i + 1)
      assert(est >= tc, s"$t: CMS must never under-count")
      // far looser than the e/w bound at delta = e^-4 — a deterministic
      // sanity net, not the probabilistic guarantee
      assert(est - tc <= n / 64, s"$t: est $est vs true $tc")
    }
    // counters are sums → bit-identical under re-partitioning
    val a = TextOps.cmsHeavyHitters(d, k = 5).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val b = TextOps.cmsHeavyHitters(
        spark.createDataFrame(d.rdd.repartition(16), d.schema), k = 5)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(a == b)
  }

  test("graft_topfreq: MG error bound under capacity pressure; nulls skipped") {
    import spark.implicits._
    // zipf-ish: token t_i appears (40 - i) times, i = 0..39, n = 1020
    val rows = (0 until 40).flatMap(i => Seq.fill(40 - i)(s"t$i")) ++
      Seq(null.asInstanceOf[String])
    val d = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "tok").repartition(8)
    val cap = 10
    val est = d.groupBy(lit(1)).agg(
        call_function("graft_topfreq", col("tok"), lit(cap)).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= cap)
    val n = rows.count(_ != null).toLong
    val trueFreq = (0 until 40).map(i => s"t$i" -> (40L - i)).toMap
    // under-estimates only, within the n/(capacity+1) MG bound
    est.foreach { case (t, e) =>
      assert(e <= trueFreq(t) && trueFreq(t) - e <= n / (cap + 1) + 1)
    }
    // every item with true freq > n/(cap+1) must have survived
    trueFreq.filter(_._2 > n / (cap + 1)).keys.foreach(t =>
      assert(est.contains(t), s"guaranteed heavy hitter $t evicted"))
  }

  test("heavyHittersSketchAudit: every (lang, token) invariant TRUE under eviction") {
    import spark.implicits._
    // per-lang zipf-ish streams with capacity far below the vocabulary,
    // so eviction fires and the audit exercises both the survivor bound
    // and the absent-token lightness proof
    val rows = for {
      lang <- Seq("aa", "bb")
      i <- 0 until 40
      r <- 0 until (if (lang == "aa") 40 - i else 2 + i % 5)
    } yield (lang.hashCode.toLong * 100 + i * 50 + r, s"w$i $lang", lang)
    val d = rows.zipWithIndex
      .map { case ((_, t, l), ix) => (ix.toLong, t, l) }
      .toDF("doc_id", "text", "lang").repartition(8)
    val audit = TextOps.heavyHittersSketchAudit(d, capacity = 6).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Boolean]("mg_ok"),
        s"MG invariant violated for (${r.getString(0)}, ${r.getString(1)}), " +
          s"true=${r.getLong(2)}")
    }
    // and the audit FAILS when fed a corrupted sketch bound: capacity 6
    // with 41 distinct tokens per lang must actually have evicted some
    val vocabPerLang = audit.length
    assert(vocabPerLang > 12, "audit should cover the full exact vocabulary")
  }

  test("canonicalUrl: rule table — case, www, ports, params, slash, fragment") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercase, path case kept
      ("HTTPS://ExAmPle.COM/Path/To", "https://example.com/Path/To"),
      // www. + default https port stripped
      ("https://WWW.site.org:443/a", "https://site.org/a"),
      // http default port stripped; non-default kept
      ("http://site.org:80/a", "http://site.org/a"),
      ("http://site.org:8080/a", "http://site.org:8080/a"),
      // https :80 is NOT a default port → kept
      ("https://site.org:80/a", "https://site.org:80/a"),
      // tracking params dropped, rest sorted; fragment dropped
      ("https://a.com/p?utm_source=x&b=2&a=1#sec", "https://a.com/p?a=1&b=2"),
      ("https://a.com/p?gclid=1&fbclid=2&ref=h", "https://a.com/p"),
      // bare authority and trailing slashes → "/"
      ("https://a.com", "https://a.com/"),
      ("https://a.com///", "https://a.com/"),
      ("https://a.com/x/?id=3", "https://a.com/x?id=3"),
      // whitespace trimmed
      ("  https://a.com/x ", "https://a.com/x"))
    val got = cases.map(_._1).toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    got.zip(cases).foreach { case (c, (in, want)) =>
      assert(c == want, s"canonicalUrl($in) = $c, want $want")
    }
  }

  test("dedupUrls: surface variants collapse to one row with min doc_id") {
    import spark.implicits._
    val d = Seq(
      (5L, "https://a.com/p?id=1&z=2"),
      (3L, "HTTPS://WWW.A.com:443/p/?z=2&utm_source=t&id=1"),
      (9L, "https://a.com/p?id=1&z=2#frag"),
      (7L, "https://a.com/q")).toDF("doc_id", "url")
    val got = TextOps.dedupUrls(d, col("url")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("https://a.com/p?id=1&z=2", 3L, 3L),
      ("https://a.com/q", 7L, 1L)))
  }

  test("lshRowsPerBand: bitlen formula — floor 4, then +1 per doubling") {
    // the SQL twin computes GREATEST(4, length(bin(n-1)) - 7); this pins
    // the Scala side to the same integer function
    assert(VectorOps.lshRowsPerBand(0L) == 4)  // empty table: twin's
    // GREATEST(count(*)-1, 0) clamp lands on the same floor (r12 ADVICE)
    assert(VectorOps.lshRowsPerBand(1L) == 4)
    assert(VectorOps.lshRowsPerBand(2000L) == 4)    // sf0.01 regime: unchanged rows
    assert(VectorOps.lshRowsPerBand(2048L) == 4)    // bitlen(2047)=11
    assert(VectorOps.lshRowsPerBand(2049L) == 5)    // bitlen(2048)=12
    assert(VectorOps.lshRowsPerBand(20000L) == 8)   // sf1 regime
    assert(VectorOps.lshRowsPerBand(100000L) == 10) // sf5 regime
    assert(VectorOps.lshRowsPerBand(1L << 40) == 33)
  }

  test("ivfCellStats: populations sum to corpus; affinity bounded by 1e6 per member") {
    val idx = VectorOps.ivfBuild(vecs, k = 2, iters = 1)
    val rows = VectorOps.ivfCellStats(idx).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == 5L)
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_cos_mu") <= r.getAs[Long]("n_vectors") * 1000000L)
    }
    assert(rows.map(_.getAs[Long]("cell")).toSet.subsetOf(Set(0L, 1L)))
  }

  test("dedupUrlsIncremental: batch groups by canonical URL, history anti-joins") {
    import spark.implicits._
    val history = Seq(
      (0L, "https://a.com/p?id=1"),
      (1L, "https://a.com/q")).toDF("doc_id", "url")
    val batch = Seq(
      (10L, "HTTPS://WWW.A.com:443/p/?id=1&utm_source=x"), // canonical dup of history p → dropped
      (11L, "https://a.com/r?b=2&a=1"),                    // new page, survives
      (12L, "https://a.com/r?a=1&b=2#frag"),               // in-batch dup of 11 → collapsed
      (13L, "https://b.org/s")).toDF("doc_id", "url")
    val got = TextOps.dedupUrlsIncremental(batch, history).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (11L, "https://a.com/r?a=1&b=2", 2L),
      (13L, "https://b.org/s", 1L)))
  }

  test("hostStats: per-host docs / pages / distinct texts / chars") {
    import spark.implicits._
    val d = Seq(
      (0L, "same text", "https://a.com/p?id=1"),
      (1L, "same  TEXT", "HTTPS://WWW.A.com:443/p/?id=1"), // same page + same norm text
      (2L, "other text", "https://a.com/q"),
      (3L, "b text", "https://b.org/x")).toDF("doc_id", "text", "url")
    val got = TextOps.hostStats(d, col("url")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a.com") == ((3L, 2L, 2L,
      "same text".length.toLong + "same  TEXT".length + "other text".length)))
    assert(got("b.org") == ((1L, 1L, 1L, "b text".length.toLong)))
  }

  test("perplexityTiers: repeated-pattern docs head, odd doc tails, tertiles exact") {
    import spark.implicits._
    // 6 docs, one lang: five share the high-probability bigram stream,
    // one is lexically odd (rare bigrams → high NLL); plus a 1-token doc
    // that must sort to the tail END without NULL-ordering surprises.
    val d = (0L to 4L).map(i => (i, "a b a b a b a b", "en")) ++
      Seq((5L, "zz qq rr ss tt uu", "en"), (6L, "x", "en"))
    val rows = TextOps.perplexityTiers(d.toDF("doc_id", "text", "lang")).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // n = 7 → head: rk ≤ 2, middle: rk ≤ 4 (3·rk ≤ 14 ⇒ rk ≤ 4), tail: 5..7
    assert(byId(6L)._3 == "tail" && byId(6L)._1 == 0L) // bigram-less → tail end
    assert(byId(5L)._3 == "tail")                      // rare bigrams → worst real score
    assert(byId(0L)._3 == "head" && byId(1L)._3 == "head")
    assert(byId(2L)._3 == "middle" && byId(3L)._3 == "middle")
    assert(byId(4L)._3 == "tail")                      // rk 5 of 7
    // identical docs share the identical integer score
    assert((0L to 4L).map(byId(_)._2).toSet.size == 1)
  }

  test("vocabDrift: novel batch tokens rank as most divergent; kl total is the term sum") {
    import spark.implicits._
    val history = Seq((0L, "alpha beta alpha beta gamma"),
      (1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val batch = Seq((10L, "zork zork zork alpha"),
      (11L, "zork beta")).toDF("doc_id", "text")
    val rows = TextOps.vocabDrift(batch, history, k = 3).collect()
    assert(rows.length == 3)
    // zork: 4 batch occurrences, 0 history — the dominant positive term
    val top = rows.find(_.getAs[Long]("rk") == 1L).get
    assert(top.getAs[String]("tok") == "zork")
    assert(top.getAs[Long]("c_batch") == 4L && top.getAs[Long]("c_hist") == 0L)
    assert(top.getAs[Long]("term_pico") > 0L)
    // kl_pico is identical on every row (the order-free corpus total)
    assert(rows.map(_.getAs[Long]("kl_pico")).toSet.size == 1)
    // ranks are 1..3 under the (|term| desc, tok) contract
    assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("dedupIncremental: in-batch dedup plus anti-join against history") {
    import spark.implicits._
    val history = Seq((0L, "seen before"), (1L, "also seen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen  BEFORE"),      // normalized dup of history → dropped
      (11L, "fresh text"),        // survives
      (12L, "fresh text"),        // in-batch dup of 11 → collapsed
      (13L, "another new one")).toDF("doc_id", "text")
    val r = TextOps.dedupIncremental(batch, history).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("batch_dups")).toMap
    assert(r == Map(11L -> 2L, 13L -> 1L))
  }

  test("domainMix: quota respected, md5 order, threshold prune == plain window") {
    import spark.implicits._
    // 3 sources with very different sizes; source c smaller than quota
    val rows = (0L until 200L).map(i => (i, "t" + i, s"src${i % 2}")) ++
      Seq((1000L, "x", "c"), (1001L, "y", "c"))
    val d = rows.toDF("doc_id", "text", "source")
    val got = TextOps.domainMix(d, quota = 7)
    val byS = got.collect().groupBy(_.getAs[String]("source"))
    assert(byS("src0").length == 7 && byS("src1").length == 7)
    assert(byS("c").length == 2) // undersized source keeps everything
    // reference: the plain per-source window over md5 order
    import org.apache.spark.sql.expressions.Window
    val ref = d.select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .where(col("rk") <= 7)
      .select(col("doc_id"), col("source"), col("rk").cast("long").as("rk"))
    assert(got.collect().toSet == ref.collect().toSet)
    // margin 1.0 forces the shortfall fallback on some source with high
    // probability; the answer must be identical either way
    val tight = TextOps.domainMix(d, quota = 7, margin = 1.0)
    assert(tight.collect().toSet == ref.collect().toSet)
  }

  test("tfidfTopTerms: rare terms outrank common ones; k bound; idf formula") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha alpha alpha common"),
      (1L, "beta common common"),
      (2L, "gamma common")).toDF("doc_id", "text")
    val r = TextOps.tfidfTopTerms(d, k = 2).collect()
    assert(r.count(_.getAs[Long]("doc_id") == 0L) == 2)
    val top0 = r.filter(_.getAs[Long]("doc_id") == 0L)
      .minBy(_.getAs[Long]("rk"))
    // alpha: tf=3, df=1 → 3·(ln(4/2)+1) ≈ 5.0794; common: tf=1, df=3 → 1.0
    assert(top0.getAs[String]("term") == "alpha")
    assert(math.abs(top0.getAs[Double]("tfidf") - 3d * (math.log(2d) + 1d)) < 1e-3)
    val top2 = r.filter(_.getAs[Long]("doc_id") == 2L).minBy(_.getAs[Long]("rk"))
    assert(top2.getAs[String]("term") == "gamma") // rarer beats common
  }

  test("bottomKSketch: k smallest shingle hashes, identical docs share sketches") {
    import spark.implicits._
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "THE  QUICK   brown fox jumps over the lazy dog"), // same tokens
      (2L, "xy")).toDF("doc_id", "text") // < 3 tokens → no shingles
    val r = TextOps.bottomKSketch(d, k = 3).collect()
    val sk = r.groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[String]("h")).toSeq }
    assert(sk(0L) == sk(1L) && sk(0L).length == 3)
    assert(!sk.contains(2L))
    assert(sk(0L) == sk(0L).sorted) // ranks follow hash order
    // brute-force twin: md5 of every shingle, 3 smallest
    val brute = d.where(col("doc_id") === 0L)
      .select(explode(TextOps.shingles(col("text"))).as("s"))
      .select(md5(col("s")).as("h")).collect().map(_.getString(0)).sorted.take(3)
    assert(sk(0L) == brute.toSeq)
  }

  test("semanticDedupPairs: tight clusters pair within their cell; verify bound holds") {
    import spark.implicits._
    // two tight clusters, one seed vector each (init = the k lowest
    // vec_ids) — k-means separates them, so the in-cluster near-dup
    // pairs are guaranteed same-cell regardless of cell ids
    val d = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0.99f, 0.01f, 0f)), (3L, Array(0.01f, 0.99f, 0f))
    ).toDF("vec_id", "embedding")
    val idx = VectorOps.ivfBuild(d, k = 2, iters = 3)
    val r = VectorOps.semanticDedupPairs(idx, 0.9).collect()
      .map(x => (x.getAs[Long]("a"), x.getAs[Long]("b"), x.getAs[Double]("sim")))
    idx.indexed.unpersist(false)
    assert(r.map(t => (t._1, t._2)).toSet == Set((0L, 2L), (1L, 3L)))
    assert(r.forall(_._3 >= 0.9)) // verify stage: exact cosine, not cell co-residency

    // real-corpus parity: the cell-bucketed join must equal the plain
    // same-cell all-pairs relation (the contract the oracle replays)
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val ridx = VectorOps.ivfBuild(realE, k = 16, iters = 3)
    val got = VectorOps.semanticDedupPairs(ridx, 0.45).collect()
      .map(x => (x.getAs[Long]("a"), x.getAs[Long]("b"))).toSet
    val asg = ridx.indexed.select(col("nb"), col("nbv"), col("cell")).collect()
      .map(x => x.getAs[Long]("nb") ->
        (x.getAs[Int]("cell"), x.getAs[scala.collection.Seq[Double]]("nbv").toArray))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = asg.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if asg(a)._1 == asg(b)._1 && cos(asg(a)._2, asg(b)._2) >= 0.45
    } yield (a, b)).toSet
    ridx.indexed.unpersist(false)
    assert(got == brute, s"cell-join pairs != brute same-cell pairs")
    info(s"semantic pairs on real corpus: ${got.size}")
  }

  test("dedupIncrementalLsh: batch-vs-history near-dups only, exact-Jaccard verified") {
    import spark.implicits._
    val history = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different text about spark engines and parquet files"),
      (4L, "tiny")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
      (11L, "THE  QUICK   brown fox jumps over the lazy dog"), // exact dup of 0
      (12L, "totally novel content nothing like the corpus here at all")
    ).toDF("doc_id", "text")
    val r = TextOps.dedupIncrementalLsh(batch, history, threshold = 0.5)
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("dup_of"),
        x.getAs[Double]("jac")))
    val pairs = r.map(t => (t._1, t._2)).toSet
    assert(pairs == Set((10L, 0L), (11L, 0L))) // 12 is new; no in-batch pairs
    assert(r.find(_._1 == 11L).get._3 == 1.0)  // exact dup: J = 1
    assert(r.find(_._1 == 10L).get._3 == 0.75) // 6 shared of 8 distinct shingles
  }

  test("chunkDedup: identical token windows collapse to their first owner") {
    import spark.implicits._
    val d = Seq(
      (10L, "a b c d e f"),
      (11L, "a b c x y z"),
      (12L, "q r s")).toDF("doc_id", "text")
    val r = TextOps.chunkDedup(d, chunkTokens = 3, stride = 3).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("doc_id") == 10L && row.getAs[Long]("chunk_id") == 0L
      && row.getAs[Long]("n_copies") == 2L) // "a b c" shared by 10 and 11
  }

  test("mixtureWeights: alpha-temperature weights, budget draws, epoch counts") {
    import spark.implicits._
    val d = Seq(
      (0L, "srcA", "w w w"), (1L, "srcA", "w w"), (2L, "srcA", "w"),
      (3L, "srcA", "w w w w"), (4L, "srcB", "w w w w w")
    ).toDF("doc_id", "source", "text")
    val r = TextOps.mixtureWeights(d, alpha = 0.5, budgetDocs = 10L).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"),
          x.getAs[Double]("weight"), x.getAs[Long]("expected_docs"),
          x.getAs[Double]("epochs"))).toMap
    // w_A = √4/(√4+√1) = 2/3, w_B = 1/3; α<1 upweights the small source
    // (proportional would give B 2 draws; temperature gives it 3)
    assert(r("srcA") == ((4L, 10L, 0.666667, 7L, 1.6667)))
    assert(r("srcB") == ((1L, 5L, 0.333333, 3L, 3.3333)))
  }

  test("decontaminateBloom: identical to the exact join; bloom actually prunes; empty eval") {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = real.where(col("doc_id") % 25 =!= 0)
    val eval = real.where(col("doc_id") % 25 === 0)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    val exact = toMap(TextOps.decontaminate(train, eval, n = 3))
    val bloomed = toMap(TextOps.decontaminateBloom(train, eval, n = 3))
    assert(exact.nonEmpty && bloomed == exact,
      "bloom-prefiltered result diverged from the exact join")

    // the prefilter must REJECT most non-eval grams: probe the filter
    // directly with grams that are not in the eval set
    val evalGrams = eval.select(explode(TextOps.shingles(col("text"), 3)).as("gram")).distinct()
    val bloom = evalGrams.agg(call_function("graft_bloom_agg",
      xxhash64(col("gram")), lit(100000L), lit(800000L))).head().getAs[Array[Byte]](0)
    val foreign = (1 to 1000).map(i => s"zz_$i nope_$i gram_$i").toDF("gram")
    val fp = foreign.where(call_function("graft_might_contain",
      lit(bloom), xxhash64(col("gram")))).count()
    assert(fp < 20, s"bloom false-positive count $fp of 1000 foreign grams")

    // empty eval set → empty result, no NPE on the null bloom
    val none = TextOps.decontaminateBloom(train, eval.limit(0), n = 3)
    assert(none.count() == 0)
  }

  test("bigramLogProb: hand-computed add-k conditional probabilities") {
    import spark.implicits._
    val d = Seq(
      (0L, "a b a b"),   // bigrams: (a,b) ×2, (b,a) ×1
      (1L, "a b"),       // bigram: (a,b)
      (2L, "c")          // < 2 tokens → excluded
    ).toDF("doc_id", "text")
    // corpus: c12(a,b)=3, c12(b,a)=1; c1(a)=3, c1(b)=1; V=3 (a,b,c)
    val pAB = (3 + 0.5) / (3 + 0.5 * 3) // 3.5/4.5
    val pBA = (1 + 0.5) / (1 + 0.5 * 3) // 1.5/2.5
    val r = TextOps.bigramLogProb(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Double]("avg_logprob"))).toMap
    assert(!r.contains(2L))
    assert(r(0L)._1 == 3 && r(1L)._1 == 1)
    val want0 = (2 * math.log(pAB) + math.log(pBA)) / 3
    assert(math.abs(r(0L)._2 - BigDecimal(want0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(r(1L)._2 - BigDecimal(math.log(pAB)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("sourceOverlap: near-dup pairs fold to an ordered source matrix") {
    import spark.implicits._
    val d = Seq(
      (0L, "web", "the quick brown fox jumps over the lazy dog"),
      (1L, "books", "the quick brown fox jumps over the lazy dog"),  // dup of 0, cross-source
      (2L, "web", "the quick brown fox jumps over the lazy dog"),    // dup of 0, same source
      (3L, "books", "completely different text about spark engines and parquet")
    ).toDF("doc_id", "source", "text")
    val r = TextOps.sourceOverlap(d, threshold = 0.9).collect()
      .map(x => (x.getAs[String]("source_x"), x.getAs[String]("source_y")) ->
        x.getAs[Long]("n_pairs")).toMap
    // pairs: (0,1) web-books, (0,2) web-web, (1,2) books-web
    assert(r(("books", "web")) == 2 && r(("web", "web")) == 1 && r.size == 2)
  }

  test("embeddingOutliers: planted far vector ranks first; integer key partition-free") {
    import spark.implicits._
    // label 0: nine vectors at (1,0) + one planted at (-3,4); centroid
    // = (0.6, 0.4), planted distance = 3.6·√2 ≈ 5.091169 — and on the
    // 1e-4 grid the scaled key is EXACT: c·xq−N = ±360000 per dim
    val emb = ((0 until 9).map(i => (i.toLong, 0, Seq(1.0f, 0.0f))) :+
      (99L, 0, Seq(-3.0f, 4.0f))).toDF("vec_id", "label", "embedding")
    val r = VectorOps.embeddingOutliers(emb, k = 3).collect()
      .map(x => x.getAs[Long]("rnk") ->
        (x.getAs[Long]("vec_id"), x.getAs[Double]("dist"))).toMap
    assert(r(1L)._1 == 99L)
    assert(math.abs(r(1L)._2 - 5.091169) < 1e-6)
    // the nine identical vectors tie on the key; ties break by vec_id
    assert(r(2L)._1 == 0L && r(3L)._1 == 1L)

    // real embeddings: result identical under 1 vs 16 partitions (the
    // ranking key is an exact integer — no float summation order)
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def runOn(d: org.apache.spark.sql.DataFrame) =
      VectorOps.embeddingOutliers(d).collect()
        .map(x => (x.getAs[Long]("label"), x.getAs[Long]("rnk")) ->
          (x.getAs[Long]("vec_id"), x.getAs[Double]("dist"))).toMap
    val a = runOn(real.coalesce(1)); val b = runOn(real.repartition(16))
    assert(a == b && a.nonEmpty)
  }

  test("sourceOverlapSketch: planted overlap recovered; estimates track exact; state order-free") {
    import spark.implicits._
    // one 3-token doc = exactly one shingle: source A carries shingles
    // 0..899, source B 600..1499 → |A∩B| = 300, |A∪B| = 1500, J = 0.2
    val planted = ((0 until 900).map(i => (i.toLong, "srcA", s"w${i}a w${i}b w${i}c")) ++
      (600 until 1500).map(i => (10000L + i, "srcB", s"w${i}a w${i}b w${i}c")))
      .toDF("doc_id", "source", "text")
    val p = TextOps.sourceOverlapSketch(planted).collect()
    assert(p.length == 1)
    val row = p.head
    assert(row.getAs[String]("source_a") == "srcA" &&
      row.getAs[String]("source_b") == "srcB")
    // n ≪ 2.5·m: the linear-counting branch, tight at this scale
    assert(math.abs(row.getAs[Double]("est_a") - 900) / 900 < 0.03)
    assert(math.abs(row.getAs[Double]("est_b") - 900) / 900 < 0.03)
    assert(math.abs(row.getAs[Double]("est_union") - 1500) / 1500 < 0.03)
    assert(math.abs(row.getAs[Double]("jaccard_est") - 0.2) < 0.05)

    // real corpus: every pair's estimates inside 5% of the exact
    // distinct-shingle counts (union via the same exact sets)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = real.select(col("source"),
        explode(TextOps.shingles(col("text"))).as("g"))
      .distinct().collect()
      .groupBy(_.getAs[String]("source"))
      .map { case (s, rows) => s -> rows.map(_.getAs[String]("g")).toSet }
    val est = TextOps.sourceOverlapSketch(real).collect()
    assert(est.nonEmpty)
    est.foreach { x =>
      val a = sh(x.getAs[String]("source_a")); val b = sh(x.getAs[String]("source_b"))
      val u = (a ++ b).size.toDouble
      assert(math.abs(x.getAs[Double]("est_a") - a.size) / a.size < 0.05)
      assert(math.abs(x.getAs[Double]("est_b") - b.size) / b.size < 0.05)
      assert(math.abs(x.getAs[Double]("est_union") - u) / u < 0.05)
      // inclusion–exclusion compounds three errors: bound vs union size
      assert(math.abs(x.getAs[Double]("est_common") - a.intersect(b).size) / u < 0.1)
    }
    // register state is order/partition independent (elementwise max)
    def state(d: org.apache.spark.sql.DataFrame) =
      TextOps.sourceOverlapSketch(d).collect().map(x =>
        (x.getAs[String]("source_a"), x.getAs[String]("source_b")) ->
          (x.getAs[Long]("nonzero_union"), x.getAs[Long]("register_sum_union"),
            java.lang.Double.doubleToLongBits(x.getAs[Double]("est_union")))).toMap
    assert(state(real.coalesce(1)) == state(real.repartition(32)))
  }

  test("curationFunnel: cumulative stage counts in one pass") {
    import spark.implicits._
    // 26 distinct words, ~170 chars: inside the length band, ratio 1.0
    val longText = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu"
    val d = Seq(
      (0L, "en", longText),                         // passes everything
      (1L, "en", longText),                         // exact dup of 0
      (2L, "fr", longText),                         // fails lang
      (3L, "en", "short"),                          // fails length
      (4L, "en", ("spam " * 60).trim)               // 300 chars, 1 distinct token → fails quality
    ).toDF("doc_id", "lang", "text")
    val r = TextOps.curationFunnel(d, Seq("en", "de"), 100L, 2000L, 0.3).collect()
      .map(x => x.getAs[String]("stage") -> x.getAs[Long]("n_docs")).toMap
    assert(r == Map("0_raw" -> 5L, "1_lang" -> 4L, "2_length" -> 3L,
      "3_quality" -> 2L, "4_dedup" -> 1L))
  }

  test("minhash family: per-position agreement tracks Jaccard (the mod-p property)") {
    import spark.implicits._
    // the direct probability claim behind banded LSH recall: for a pair
    // at Jaccard J, each signature position agrees with probability J.
    // The unreduced affine family failed this catastrophically (1/128
    // positions at J=0.82 — lower-envelope argmin correlation); the
    // mod-p family must sit near J·128
    val base = "the quick brown fox jumps over the lazy dog while the calm " +
      "river flows past the old stone bridge under a pale morning sky and " +
      "birds circle slowly above the quiet field"
    val d = Seq((0L, base), (1L, base.replace("quick", "quack"))).toDF("doc_id", "text")
    val sh = d.select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
    val sets = sh.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[String]]("sh").toSet).toMap
    val j = (sets(0L) & sets(1L)).size.toDouble / (sets(0L) | sets(1L)).size
    val hp = sh.select(col("doc_id"), TextOps.hashPairs(col("sh")).as("hp"))
    val sig = hp.select(col("doc_id"),
      TextOps.signatureBest(spark, col("hp"), 128).as("sig"))
    val sigs = sig.collect().map(r => r.getLong(0) ->
      r.getAs[scala.collection.Seq[Long]]("sig")).toMap
    val agree = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    // binomial(128, J): mean ≈ J·128, σ ≈ 4.4 — gate at ±4σ
    assert(math.abs(agree - j * 128) < 18,
      s"position agreement $agree far from J*128 = ${j * 128}")
    // and the banded join must therefore see the pair
    val pairs = TextOps.dedupMinHashLsh(d, threshold = 0.5).collect()
    assert(pairs.length == 1 && pairs.head.getAs[Long]("a") == 0L)
  }

  test("dedupEditPairs: integer predicate keeps small edits, drops rewrites") {
    import spark.implicits._
    // long enough that one edit keeps shingle Jaccard ≈ 0.8 (the banded
    // candidate stage is shared with dedupMinHashLsh; a short doc's
    // single edit can push J below the band geometry's recall)
    val base = "the quick brown fox jumps over the lazy dog while the calm " +
      "river flows past the old stone bridge under a pale morning sky and " +
      "birds circle slowly above the quiet field"
    val d = Seq(
      (0L, base),
      (1L, base.replace("quick", "quack")),  // 1 char edit
      (2L, "completely different content with nothing shared at all okay")
    ).toDF("doc_id", "text")
    val r = TextOps.dedupEditPairs(d).collect()
      .map(x => (x.getAs[Long]("a"), x.getAs[Long]("b"),
        x.getAs[Long]("lev"), x.getAs[Long]("max_len")))
    assert(r.length == 1)
    assert(r.head._1 == 0L && r.head._2 == 1L && r.head._3 == 1L)
    assert(r.head._3 * 5 <= r.head._4)
    assert(r.head._4 == base.length) // normText is a no-op on this fixture
  }

  test("winnowFingerprints: shared long runs share a fingerprint; density bounded") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val d = Seq(
      (0L, s"$shared india juliet"),
      (1L, s"kilo lima $shared"),           // same 8-token run, shifted
      (2L, "mike november oscar papa")       // nothing shared
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(d, w = 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (k, v) => k -> v.map(_.getAs[String]("fp")).toSet }
    // winnowing guarantee: a shared run of ≥ w+2 = 6 tokens ⇒ ≥1 shared fp
    assert((fps(0L) & fps(1L)).nonEmpty)
    assert((fps(0L) & fps(2L)).isEmpty)
    // density: selected ≤ number of windows ≤ grams
    assert(fps(0L).size <= 8) // 10 tokens → 8 grams
  }

  test("langConfusion: diagonal for clean text, 'und' column for noise") {
    import spark.implicits._
    val d = Seq(
      (0L, "en", "the cat and the dog of a house"),
      (1L, "en", "the fox is in the den for now"),
      (2L, "de", "der Hund und die Katze ist nicht da"),
      (3L, "en", "zzz qqq xxx")).toDF("doc_id", "lang", "text")
    val r = TextOps.langConfusion(d).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("pred")) -> x.getAs[Long]("n")).toMap
    assert(r == Map(("en", "en") -> 2L, ("de", "de") -> 1L, ("en", "und") -> 1L))
  }

  test("splitBalance: counts and within-split shares per (split, lang)") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, if (i % 4 == 0) "de" else "en", "w x y z"))
      .toDF("doc_id", "lang", "text")
    val r = TextOps.splitBalance(d).collect()
    val bySplit = r.groupBy(_.getAs[String]("split"))
    // every split's shares sum to 1 and docs sum to the split size
    bySplit.foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    }
    assert(r.map(_.getAs[Long]("n_docs")).sum == 200)
    // every doc contributes exactly its 4 tokens
    assert(r.forall(x => x.getAs[Long]("n_tokens") == 4 * x.getAs[Long]("n_docs")))
  }

  test("weightedSample: hand-computed A-ES priorities; heavier docs favored in aggregate") {
    import spark.implicits._
    val d = Seq(
      (0L, "one two three four five six seven eight nine ten"), // 10 tokens
      (1L, "a b"),                                              // 2 tokens
      (2L, "x y z w")                                           // 4 tokens
    ).toDF("doc_id", "text")
    val r = TextOps.weightedSample(d, k = 3).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Double]("priority"), x.getAs[Long]("rk"))).toMap
    // replicate priority for doc 0 exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    def pri(id: Long, w: Long): Double = {
      val h = md.digest(id.toString.getBytes).take(4)
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(h, 16) + 1d) / 4294967297d
      BigDecimal(math.log(u) / w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq((0L, 10L), (1L, 2L), (2L, 4L)).foreach { case (id, w) =>
      assert(r(id)._1 == w && math.abs(r(id)._2 - pri(id, w)) < 1e-9, s"doc $id")
    }
    // ranks follow priority desc
    val byRk = r.toSeq.sortBy(_._2._3).map(_._2._2)
    assert(byRk.sliding(2).forall(p => p.head >= p.last))
  }

  test("splitStratified: exact per-stratum proportions, integer-exact cuts") {
    import spark.implicits._
    // 20 docs in one stratum, 3 in another — hash split would drift on
    // the small one; stratified must cut exactly 18/1/1 and 2/0/1
    val d = ((0L until 20L).map(i => (i, "en", "web", s"doc $i")) ++
      Seq((100L, "de", "books", "a"), (101L, "de", "books", "b"), (102L, "de", "books", "c")))
      .toDF("doc_id", "lang", "source", "text")
    val r = TextOps.splitStratified(d, 90, 5).collect()
      .groupBy(x => (x.getAs[String]("lang"), x.getAs[String]("split")))
      .map { case (k, v) => k -> v.length }
    assert(r(("en", "train")) == 18 && r(("en", "val")) == 1 && r(("en", "test")) == 1)
    // n=3: rk*100 <= 270 → train rk 1,2; <= 285 → no val; test rk 3
    assert(r(("de", "train")) == 2 && r(("de", "test")) == 1 && !r.contains(("de", "val")))
  }

  test("budgetSample: running token totals stop exactly at the budget, md5 order") {
    import spark.implicits._
    val d = Seq(
      (0L, "web", "a b c"),      // 3 tokens
      (1L, "web", "d e"),        // 2
      (2L, "web", "f g h i"),    // 4
      (3L, "books", "x y z")     // separate source, own budget
    ).toDF("doc_id", "source", "text")
    val kept = TextOps.budgetSample(d, 5L).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("cum_tokens")).toMap
    // md5 order within 'web' is deterministic; recompute it here
    val order = Seq(0L, 1L, 2L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5").digest(i.toString.getBytes)
        .map("%02x".format(_)).mkString)
    val toks = Map(0L -> 3L, 1L -> 2L, 2L -> 4L)
    var cum = 0L
    val expect = order.flatMap { i =>
      cum += toks(i); if (cum <= 5L) Some(i -> cum) else None
    }.toMap
    // kept 'web' docs must equal the hand-walked prefix-within-budget
    assert(kept.filter(_._1 != 3L) == expect)
    assert(kept(3L) == 3L) // books fits its own budget
    assert(kept.values.forall(_ <= 5L))
  }

  test("pmiTopPairs: a dominating collocation wins; min-count floor; exact ratio rank") {
    import spark.implicits._
    val d = Seq(
      (0L, "new york a b new york c d new york")
    ).toDF("doc_id", "text")
    // bigrams: 9 total; (new,york)=3; cl(new)=3, cr(york)=3 → ratio = 3·9/9 = 3
    val r = TextOps.pmiTopPairs(d, minCount = 2L, k = 5).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("w1") == "new" && row.getAs[String]("w2") == "york")
    assert(row.getAs[Long]("n") == 3 && row.getAs[Long]("rk") == 1)
    assert(math.abs(row.getAs[Double]("pmi") - 1.0986) < 1e-9) // ln 3
  }

  test("lengthPercentiles: tie-aware percent_rank per language") {
    import spark.implicits._
    val d = Seq(
      (0L, "en", "a"), (1L, "en", "ab"), (2L, "en", "xy"), (3L, "de", "zzz")
    ).toDF("doc_id", "lang", "text")
    val r = TextOps.lengthPercentiles(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("pr")).toMap
    assert(r(0L) == 0.0)                 // shortest en doc
    assert(r(1L) == 0.5 && r(2L) == 0.5) // tied lengths share the rank
    assert(r(3L) == 0.0)                 // singleton partition
  }

  test("standardize: hand-computed z-scores; constant dimension centers without NaN") {
    import spark.implicits._
    val d = Seq(
      (0L, Array(1f, 10f)), (1L, Array(3f, 10f)), (2L, Array(5f, 10f))
    ).toDF("vec_id", "embedding")
    val r = VectorOps.standardize(d).collect()
      .map(x => (x.getAs[Long]("vec_id"), x.getAs[Long]("i")) -> x.getAs[Double]("z")).toMap
    // dim 0: μ=3, σ=√(8/3)≈1.632993 → z(1)=-1.2247, z(3)=0, z(5)=1.2247
    assert(math.abs(r((0L, 0L)) + 1.2247) < 1e-9 && r((1L, 0L)) == 0.0
      && math.abs(r((2L, 0L)) - 1.2247) < 1e-9)
    // dim 1 constant: σ=0 → centered, not NaN
    assert(Seq(0L, 1L, 2L).forall(v => r((v, 1L)) == 0.0))
  }

  test("standardize: z-scores are summation-order-independent (the r9 driver-FAIL property)") {
    import spark.implicits._
    // §27 doctrine: test the PROPERTY directly, not just output equality.
    // Awkward float values (many fractional bits) under 1 vs 32 input
    // partitions — float-μ/σ would differ in last ulps across partition
    // layouts; the integer-sum contract must be bit-identical.
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j => (math.sin(i * 31 + j) * 0.7).toFloat))
    }
    def z(parts: Int): Map[(Long, Long), Double] =
      VectorOps.standardize(rows.toDF("vec_id", "embedding").repartition(parts))
        .collect()
        .map(x => (x.getAs[Long]("vec_id"), x.getAs[Long]("i")) -> x.getAs[Double]("z"))
        .toMap
    val one = z(1)
    val many = z(32)
    assert(one.size == 1600)
    // bit-for-bit, not approximate: the whole point of the contract
    assert(one.forall { case (k, v) =>
      java.lang.Double.doubleToLongBits(many(k)) == java.lang.Double.doubleToLongBits(v)
    })
  }

  test("mmrRerank: diversity beats redundancy; greedy order is deterministic") {
    import spark.implicits._
    // q on the x-axis; a and c symmetric around it (equal relevance, a
    // wins the tie by id), b nearly parallel to a (redundant)
    val d = Seq(
      (0L, Array(1f, 0f, 0f)),      // query
      (1L, Array(0.9f, 0.1f, 0f)),  // a
      (2L, Array(0.9f, 0.11f, 0f)), // b — redundant with a, higher simq than c? no: ~0.9926
      (3L, Array(0.9f, -0.1f, 0f))  // c — as relevant as a, diverse
    ).toDF("vec_id", "embedding")
    val r = VectorOps.mmrRerank(d, d.where(col("vec_id") === 0L), k = 3, shortlist = 3)
      .collect().sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("vec_id")).toSeq
    // step1: tie a/c on relevance → lowest id (a); step2: c's penalty
    // (sim to a ≈ .9756) < b's (≈ .99997), so diversity wins; step3: b
    assert(r == Seq(1L, 3L, 2L), s"MMR pick order was $r")
  }

  test("randomProject: exact JL projection; near-dup cosine distortion bounded") {
    import spark.implicits._
    // hand-check against the shared ±1 matrix on a tiny fixture
    val d = Seq((0L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    val m = graft.functions.Hyperplanes.matrix(2, 3)
    val got = VectorOps.randomProject(d, outDims = 2, dims = 3).head()
      .getAs[scala.collection.Seq[Double]]("proj")
    val want = m.map(p => (p(0) * 1 + p(1) * 2 + p(2) * 3) / math.sqrt(2d))
    assert(got.zip(want).forall { case (g, w) => math.abs(g - w) < 1e-12 })

    // the JL guarantee is PAIRWISE geometry, not top-k rank (rank recall
    // on this weak-neighbor corpus is registered honestly as rp_recall):
    // for the 14 near-dup pairs, 64→16 keeps cosine within ±0.4 (measured
    // max 0.357, mean 0.184 — deterministic: fixed matrix, fixed data)
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val proj = VectorOps.randomProject(realE, 16, 64)
      .select(col("vec_id"), col("proj").as("embedding"))
    val origPairs = VectorOps.embeddingNearDupPairs(realE, threshold = 0.45)
      .select(col("a"), col("b"), col("sim").as("c0"))
    val projV = proj.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Double]]("embedding").toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val deltas = origPairs.collect().map { r =>
      math.abs(r.getAs[Double]("c0") - cos(projV(r.getAs[Long]("a")), projV(r.getAs[Long]("b"))))
    }
    assert(deltas.nonEmpty && deltas.max < 0.4,
      s"JL max distortion ${if (deltas.isEmpty) -1 else deltas.max}")
    assert(deltas.sum / deltas.length < 0.22, s"JL mean distortion ${deltas.sum / deltas.length}")
  }

  test("decontaminateSemantic: paraphrase-close vectors flagged, orthogonal clean; zero-shuffle plan") {
    val evalE = Seq((100L, Seq(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.99f, 0.1f, 0f, 0f)),  // cos ≈ 0.995 vs eval — leaked paraphrase
      (2L, Seq(0f, 1f, 0f, 0f)),       // orthogonal — clean
      (3L, Seq(-1f, 0f, 0f, 0f)))      // anti-parallel — clean (cos = -1)
      .toDF("vec_id", "embedding")
    val r = VectorOps.decontaminateSemantic(corpus, evalE, 0.9)
    // the operator must be a pure projection: eval rides in the plan as a
    // literal, so NO exchange of any kind may appear
    assert(!r.queryExecution.executedPlan.toString.contains("Exchange"),
      r.queryExecution.executedPlan.toString)
    val m = r.collect().map(x => x.getAs[Long]("vec_id") ->
      ((x.getAs[Double]("max_sim"), x.getAs[Boolean]("contaminated")))).toMap
    assert(m(1L)._2 && m(1L)._1 > 0.99)
    assert(!m(2L)._2 && m(2L)._1 == 0.0)
    assert(!m(3L)._2 && m(3L)._1 == -1.0)
  }

  test("splitLeakageSafe: near-dup cluster members always share a split") {
    // doc 1 hashes to 'train' and doc 11 to 'test' under the per-doc
    // split — the planted leakage: a near-dup pair straddling the
    // train/test boundary. Cluster-keyed hashing must heal it.
    val base = (1 to 50).map(i => s"tok$i")
    val d = Seq(
      (1L, base.mkString(" ")),
      (11L, base.updated(9, "xx").mkString(" ")),
      (99L, "completely different text about nothing else entirely"))
      .toDF("doc_id", "text")
    val perDoc = TextOps.splitAssign(d, "doc_id").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("split")).toMap
    assert(perDoc(1L) == "train" && perDoc(11L) == "test") // the leak exists
    val r = TextOps.splitLeakageSafe(d, 0.8).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("cluster_id"), x.getAs[Boolean]("keep"), x.getAs[String]("split")))).toMap
    assert(r(1L) == ((1L, true, "train")))
    assert(r(11L) == ((1L, false, "train"))) // healed: inherits cluster 1's split
    assert(r(99L)._3 == perDoc(99L))         // singleton == plain splitAssign
  }

  test("gramNovelty: repeats of an earlier doc are fully stale; originals fully novel") {
    val d = Seq(
      (0L, "alpha beta gamma delta"),          // 2 grams, first occurrence
      (1L, "alpha beta gamma delta"),          // same grams -> all stale
      (2L, "epsilon zeta eta theta iota"),     // 3 fresh grams
      (3L, "hi")                               // gram-less
    ).toDF("doc_id", "text")
    val r = TextOps.gramNovelty(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_grams"), x.getAs[Long]("n_stale"),
          x.getAs[Double]("novelty")))).toMap
    assert(r(0L) == ((2L, 0L, 1.0)))
    assert(r(1L) == ((2L, 2L, 0.0)))
    assert(r(2L) == ((3L, 0L, 1.0)))
    assert(r(3L) == ((0L, 0L, 1.0)))
  }

  test("heapsLaw: final checkpoint equals corpus totals; growth is monotone") {
    val d = Seq(
      (0L, "a b c"), (1L, "a b d"), (2L, "e f"), (3L, "a"), (4L, "g h i j")
    ).toDF("doc_id", "text")
    val rows = TextOps.heapsLaw(d).collect()
      .map(x => (x.getAs[Long]("pct"), x.getAs[Long]("n_docs"),
        x.getAs[Long]("total_tokens"), x.getAs[Long]("distinct_tokens")))
      .sortBy(_._1)
    val last = rows.last
    assert(last == ((100L, 5L, 13L, 10L)))
    // prefix counts never decrease
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4 })
    // 40% checkpoint = first 2 docs: 6 tokens, vocab {a,b,c,d}
    assert(rows.find(_._1 == 40L).get == ((40L, 2L, 6L, 4L)))
  }

  test("dsirWeights: target-heavy docs outscore off-target; scores are integers of bigram mass") {
    val d = Seq(
      (0L, "the cat sat on the mat", "en"),
      (1L, "the cat sat on the mat", "en"),
      (2L, "der hund lief durch den park", "de"), // de-only: t=0, λ=-1
      (4L, "x", "en")                             // <2 tokens -> 0 features
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.dsirWeights(d, "en").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_feat"), x.getAs[Long]("score")))).toMap
    assert(r(4L) == ((0L, 0L)))
    // target-pure bigrams (t = r -> λ = 0) outscore the off-target ones
    // (t = 0 -> λ = 1 - bitlen(r+1) = -1 at r = 1: score -5)
    assert(r(0L)._2 == 0L && r(2L)._2 == -5L)
    // identical text = identical profile
    assert(r(0L) == r(1L))
    assert(r(0L)._1 == 5L) // 6 tokens -> 5 bigram occurrences
  }

  test("tokenizerFertility: exact totals and ratios on a hand corpus") {
    val d = Seq(
      (0L, "Hello, world!", "en"),   // bpe: [Hello][,][world][!] = 4; ws 2
      (1L, "abc 123", "en")          // bpe: [abc][123] = 2; ws 2
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.tokenizerFertility(d).head()
    assert(r.getAs[Long]("n_docs") == 2)
    assert(r.getAs[Long]("total_bytes") == 20) // ASCII: bytes == chars
    assert(r.getAs[Long]("total_chars") == 20)
    assert(r.getAs[Long]("n_ws") == 4 && r.getAs[Long]("n_bpe") == 6)
    assert(r.getAs[Double]("bytes_per_bpe") == 3.3333) // round(20/6, 4)
  }

  test("hardNegatives: near-duplicates excluded from the shortlist, ranking preserved") {
    val e = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(1f, 0.01f, 0f, 0f)),  // near-dup of 0 (cos ~ 1)
      (2L, Seq(1f, 1f, 0f, 0f)),     // cos = .7071 — the hard negative
      (3L, Seq(0f, 1f, 0f, 0f)),     // cos = 0
      (4L, Seq(-1f, 0f, 0f, 0f))     // cos = -1
    ).toDF("vec_id", "embedding")
    val r = VectorOps.hardNegatives(e, e.where(col("vec_id") === 0), 2, 0.95)
      .collect().map(x => (x.getAs[Long]("nb"), x.getAs[Double]("sim")))
    assert(r.map(_._1).toSeq == Seq(2L, 3L)) // 1 excluded as a duplicate
    assert(r.head._2 == 0.7071)
  }

  test("quotaApportion: quotas sum exactly to the budget; largest remainders win the seats") {
    val d = (0 until 7).map(i => (i.toLong, "t", Seq("a", "a", "a", "b", "b", "c", "c")(i)))
      .toDF("doc_id", "text", "source")
    // n = 7, B = 10: a 30/7=4 rem 2, b 20/7=2 rem 6, c 20/7=2 rem 6 ->
    // base 8, 2 leftover seats -> b and c (larger remainder)
    val r = TextOps.quotaApportion(d, 10L).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("quota")).toMap
    assert(r == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    assert(r.values.sum == 10L)
    // degenerate budgets still sum exactly
    assert(TextOps.quotaApportion(d, 0L).collect().map(_.getAs[Long]("quota")).sum == 0L)
    assert(TextOps.quotaApportion(d, 2L).collect().map(_.getAs[Long]("quota")).sum == 2L)
  }

  test("qualityTiers: frequent-token docs rank head; tertile cuts exact; token-less doc tails") {
    val common = "the cat sat" // tokens appearing in many docs
    val d = Seq(
      (0L, s"$common $common $common", "en"),
      (1L, s"$common xylophone", "en"),
      (2L, "qqq zzz www", "en"),           // all rare -> lowest avg
      (3L, "", "en"),                       // token-less
      (4L, s"$common", "en"),
      (5L, s"$common quartz", "en")
    ).toDF("doc_id", "text", "lang")
    val r = TextOps.qualityTiers(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("tier")).toMap
    // n = 6 -> head: rk 1-2, middle: rk 3-4, tail: rk 5-6
    assert(r(0L) == "head")
    assert(r(2L) == "tail" && r(3L) == "tail")
    assert(r.values.count(_ == "head") == 2)
    assert(r.values.count(_ == "middle") == 2)
  }

  test("groupBottomKQuantiles: per-group exact quantiles at k >= group size") {
    import graft.pipeline.SketchOps
    val d = ((1 to 99).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 9).map(i => ("b", (1000 + i).toLong, (i * 10).toDouble)))
      .toDF("grp", "k", "v")
    val r = SketchOps.groupBottomKQuantiles(d, col("grp"), col("k"), col("v"))
      .collect().map(x => (x.getAs[String]("group"), x.getAs[Long]("pct")) ->
        ((x.getAs[Double]("val"), x.getAs[Long]("n_sample")))).toMap
    // group a: n=99, pct 50 -> rk 1+(50*98)/100 = 50 -> value 50
    assert(r(("a", 50L)) == ((50.0, 99L)))
    assert(r(("a", 25L)) == ((25.0, 99L)) && r(("a", 75L)) == ((74.0, 99L)))
    // group b: n=9, pct 50 -> rk 5 -> 50.0
    assert(r(("b", 50L)) == ((50.0, 9L)))
  }

  test("bottomKQuantiles: k >= N degrades to exact quantiles; bottom-k sets merge") {
    import graft.pipeline.SketchOps
    val n = 200
    val df = (1 to n).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val q = SketchOps.bottomKQuantiles(df, col("k"), col("v"), k = 1024)
      .collect().map(x => x.getAs[Long]("pct") -> x.getAs[Double]("val")).toMap
    // nearest-rank-lower over the full population: rk = 1 + (pct*(n-1))/100
    (10 to 90 by 10).foreach { p =>
      assert(q(p.toLong) == (1 + (p * (n - 1)) / 100).toDouble, s"pct $p")
    }
    // mergeability: sample(k) over the union == re-truncated union of halves
    val (a, b) = (df.where(col("k") <= 100), df.where(col("k") > 100))
    def sample(d: org.apache.spark.sql.DataFrame) = d
      .select(md5(col("k").cast("string")).as("h"), col("v"))
      .orderBy("h").limit(16).collect().map(r => (r.getString(0), r.getDouble(1)))
    val merged = (sample(a) ++ sample(b)).sortBy(_._1).take(16).toSeq
    assert(merged == sample(df).toSeq)
  }

  test("bpeLearn: hand-checked merges, greedy run parity, early exhaustion") {
    // corpus: aaaa ×2, ab ×3 → pairs r0: (a,a)=6 beats (a,b)=3
    val d = Seq((0L, "aaaa ab ab"), (1L, "aaaa ab")).toDF("doc_id", "text")
    val m = TextOps.bpeLearn(d, 8).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("weight")))
    // r0: (a,a) w=6 (3 greedy pairs per aaaa × freq 2); aaaa → [aa,aa]
    // r1: (a,b) w=3 beats (aa,aa) w=2; ab → [ab]
    // r2: (aa,aa) w=2; aaaa → [aaaa]; then no pairs remain → stop at 3
    assert(m.toSeq == Seq((0L, "a", "a", 6L), (1L, "a", "b", 3L),
      (2L, "aa", "aa", 2L)))
  }

  test("bpeLearn: odd runs merge leftmost-greedy (floor(n/2) pairs)") {
    // aaa: pair (a,a) appears at 2 positions but only ONE merge applies
    val d = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val m = TextOps.bpeLearn(d, 2).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("weight")))
    // r0: (a,a) w=2·1=2? No — greedy count per word: positions (1,2),(2,3)
    // overlap; weighted pair count is the RAW adjacent count 2·freq=4,
    // the Sennrich counting (merge application, not counting, is greedy)
    assert(m(0) == ("a", "a", 4L))
    // after merging: aaa → [aa, a]; r1 best = (aa, a) w=2
    assert(m(1) == ("aa", "a", 2L))
  }

  test("bpeEncodeStats: fully-merged vocab yields 1 subword per word") {
    val d = Seq((0L, "aaaa ab ab"), (1L, "aaaa ab")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val r = TextOps.bpeEncodeStats(d, 8).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_words") == 5L)
    assert(row.getAs[Long]("n_subwords") == 5L)
    assert(row.getAs[Double]("subwords_per_word") == 1.0)
  }

  test("ivfSearchFiltered: pre-filter restricts neighbors; subset of allowed ids") {
    import spark.implicits._
    val realE = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val qs = realE.where(col("vec_id") < 3)
    val idx = VectorOps.ivfBuild(realE)
    val allowed = realE.where(col("vec_id") % 2 === 0).select(col("vec_id"))
    val r = VectorOps.ivfSearchFiltered(idx, qs, allowed, 10)
      .collect().map(x => (x.getAs[Long]("q"), x.getAs[Long]("nb")))
    assert(r.nonEmpty && r.forall(_._2 % 2 == 0))
    // pre-filter semantics: every returned neighbor must also appear in
    // the unfiltered search of the SAME cells only if it survives there —
    // but a filtered top-10 may rank DEEPER candidates; assert instead
    // that filtered results are exactly the unfiltered scored set
    // restricted to allowed, re-ranked (spot-check one query)
    val unfiltered = VectorOps.ivfSearch(idx, qs, 1000)
      .collect().filter(_.getAs[Long]("q") == 0L)
      .filter(_.getAs[Long]("nb") % 2 == 0)
      .sortBy(x => (-x.getAs[Double]("sim"), x.getAs[Long]("nb")))
      .take(10).map(_.getAs[Long]("nb")).toSeq
    val filtered0 = r.filter(_._1 == 0L).map(_._2).toSeq
    assert(filtered0 == unfiltered)
    idx.indexed.unpersist(false)
  }

  test("sourceLabelMix: per-source label shares sum to 1") {
    import spark.implicits._
    val e = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1)).toDF("vec_id", "label")
    val d = Seq((0L, "A"), (1L, "A"), (2L, "A"), (3L, "B")).toDF("doc_id", "source")
    val r = VectorOps.sourceLabelMix(e, d).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[Long]("label")) ->
        (x.getAs[Long]("n"), x.getAs[Double]("pct"))).toMap
    assert(r(("A", 0L)) == ((2L, 0.6667)) && r(("A", 1L)) == ((1L, 0.3333)))
    assert(r(("B", 1L)) == ((1L, 1.0)))
  }

  test("sourceEmbeddingDrift: hand-checked centroid cosines; partition-invariant") {
    import spark.implicits._
    val e = Seq((0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val d = Seq((0L, "A"), (1L, "A"), (2L, "B")).toDF("doc_id", "source")
    def run(ee: org.apache.spark.sql.DataFrame) =
      VectorOps.sourceEmbeddingDrift(ee, d).collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_vecs"), r.getAs[Double]("cos_to_global"))).toMap
    val r = run(e)
    // s1_A=(20000,0), s1_B=(0,10000), g=(20000,10000)
    // cos_A = 4e8/(2e4*sqrt(5e8)) = 2/sqrt(5); cos_B = 1/sqrt(5)
    assert(r("A") == ((2L, BigDecimal(2 / math.sqrt(5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(r("B") == ((1L, BigDecimal(1 / math.sqrt(5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(run(e.repartition(7)) == r)
  }

  test("dupRatioBySource: drop share follows cluster membership") {
    // docs 0,1,2 are one near-dup cluster (keep 0); 3,4 singletons
    val d = docs.withColumn("source",
      when(col("doc_id") <= 2, "feedA").otherwise("feedB"))
    val r = TextOps.dupRatioBySource(d, 0.5).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_dupes"),
          x.getAs[Double]("dup_ratio"))).toMap
    assert(r("feedA") == ((3L, 2L, 0.6667)))
    assert(r("feedB") == ((2L, 0L, 0.0)))
  }

  test("evalCoverage: per-eval-doc shingle exposure incl. gram-less docs") {
    val train = Seq((1L, "x a b c y"), (2L, "unrelated text entirely here"))
      .toDF("doc_id", "text")
    val ev = Seq((100L, "a b c d"), (101L, "zz yy")).toDF("doc_id", "text")
    val r = TextOps.evalCoverage(train, ev, 3).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_grams"), x.getAs[Long]("n_covered"),
          x.getAs[Double]("coverage"))).toMap
    // eval 100: grams {a b c, b c d}; train exposes only "a b c"
    assert(r(100L) == ((2L, 1L, 0.5)))
    assert(r(101L) == ((0L, 0L, 0.0))) // too short to shingle
  }

  test("crossLingualLeakage: shared grams counted once per lang pair") {
    // the 5-gram "a b c d e" is in en, fr and de; "x y z w v" only in en
    val d = Seq(
      (0L, "a b c d e tail1", "en"), (1L, "head a b c d e", "fr"),
      (2L, "a b c d e", "de"), (3L, "x y z w v", "en"),
      (4L, "short one", "es")).toDF("doc_id", "text", "lang")
    val r = TextOps.crossLingualLeakage(d, 5).collect()
      .map(x => (x.getAs[String]("lang_a"), x.getAs[String]("lang_b")) ->
        x.getAs[Long]("n_shared_grams")).toMap
    assert(r(("de", "en")) == 1L && r(("de", "fr")) == 1L && r(("en", "fr")) == 1L)
    assert(r.size == 3) // es shares nothing; x-y-z-w-v is en-only
  }

  test("bpeVocab: repeated subwords count per occurrence; words distinct") {
    // one merge on {aaaa×2, ab×3}: (a,a) wins → aaaa=[aa,aa], ab=[a,b]
    val d = Seq((0L, "aaaa ab ab"), (1L, "aaaa ab")).toDF("doc_id", "text")
    val v = TextOps.bpeVocab(d, 1).collect()
      .map(r => r.getAs[String]("sym") ->
        (r.getAs[Long]("freq"), r.getAs[Long]("n_words"))).toMap
    assert(v("aa") == ((4L, 1L)))   // 2 occurrences/word × freq 2
    assert(v("a") == ((3L, 1L)) && v("b") == ((3L, 1L)))
    assert(v.size == 3)
  }

  test("sourceChi2: hand-checked 2-source contingency, unobserved mass included") {
    // src A: a a b   src B: a c  → N=5, C(a)=3, C(b)=1, C(c)=1
    val d = Seq((0L, "a a b", "A"), (1L, "a c", "B")).toDF("doc_id", "text", "source")
    val r = TextOps.sourceChi2(d).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_cells"),
          x.getAs[Long]("chi2_micro"))).toMap
    // A: R=3. E(a)=3*3/5=1.8, E(b)=0.6, E(c)=0.6 (unobserved)
    //   chi2 = (2-1.8)^2/1.8 + (1-0.6)^2/0.6 + 0.6 = 0.022222+0.266667+0.6
    //   micros: 22222 + 266667 + 600000 = 888889
    assert(r("A") == ((3L, 2L, 888889L)))
    // B: R=2. E(a)=1.2, E(c)=0.4, E(b)=0.4 (unobserved)
    //   (1-1.2)^2/1.2 + (1-0.4)^2/0.4 + 0.4 = 0.033333+0.9+0.4
    //   micros: 33333 + 900000 + 400000 = 1333333
    assert(r("B") == ((2L, 2L, 1333333L)))
  }

  test("sourceChi2 is partition-invariant (micros quantize before the sum)") {
    val d = Seq((0L, "a a b c d e", "A"), (1L, "a c f g", "B"),
      (2L, "b b d h", "A"), (3L, "e e e a", "C")).toDF("doc_id", "text", "source")
    val a = TextOps.sourceChi2(d).collect().map(_.toString).sorted.toSeq
    val b = TextOps.sourceChi2(d.repartition(7)).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("bpeLearn: equal-weight pairs break ties lexicographically") {
    // both pairs have weight 1; (a,b) < (c,d) must win round 0
    val d = Seq((0L, "ab cd")).toDF("doc_id", "text")
    val m = TextOps.bpeLearn(d, 2).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs")))
    assert(m(0) == ((0L, "a", "b")) && m(1) == ((1L, "c", "d")))
  }

  test("BpeCache: same (session, dir, rounds) returns the memoized pair") {
    val t1 = TextOps.BpeCache.trained(spark, "/root/testdata/sf0.001", 8)
    val t2 = TextOps.BpeCache.trained(spark, "/root/testdata/sf0.001", 8)
    assert(t1._2 eq t2._2)   // identical cached DataFrame instance
    assert(TextOps.BpeCache.cachedCount >= 1)
  }

  test("bpeDocTokens: per-doc counts under a partially-merged vocabulary") {
    // 1 merge on {aaaa×2, ab×3}: aaaa=[aa,aa] (2 tokens), ab=[a,b] (2)
    val d = Seq((0L, "aaaa ab ab"), (1L, "aaaa ab")).toDF("doc_id", "text")
    val r = TextOps.bpeDocTokens(d, 1).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("n_bpe_tokens"))).toMap
    assert(r(0L) == ((3L, 6L)) && r(1L) == ((2L, 4L)))
  }

  test("bpeLearn is partition-invariant (integer weights, deterministic argmax)") {
    val base = Seq((0L, "batch window spark order"), (1L, "batch batch spark"),
      (2L, "window windows orders"), (3L, "spark sparks batch")).toDF("doc_id", "text")
    val a = TextOps.bpeLearn(base, 6).collect().toSeq
    val b = TextOps.bpeLearn(base.repartition(7), 6).collect().toSeq
    assert(a == b)
  }

  test("epochPlan: cap, one redistribution round, final clamp — hand-checked integers") {
    // three sources, budget 600 equal-split to 200 each, cap 2 epochs:
    //   tiny  (t=40):  cap 80  < 200 -> capped, frees 120
    //   mid   (t=90):  cap 180 < 200 -> capped, frees 20
    //   big   (t=400): cap 800 >= 200 -> uncapped, absorbs all 140 freed
    // redistribution (proportional to t over uncapped {big}): big +140
    //   -> want 340 <= 800: uncapped, epochs_ppm = 1e6*340 div 400 = 850000
    val d = Seq(
      ("tiny", ("w " * 40).trim), ("mid", ("w " * 90).trim),
      ("big", ("w " * 400).trim)).toDF("source", "text")
    val out = TextOps.epochPlan(d, 600L, 2L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out("tiny") == ((40L, 80L, 2000000L, true)))
    assert(out("mid") == ((90L, 180L, 2000000L, true)))
    assert(out("big") == ((400L, 340L, 850000L, false)))
    // the clamp path: cap 1 epoch -> big's 200+freed overflows its own
    // cap (400), so it is clamped AND flagged
    val clamped = TextOps.epochPlan(d, 2000L, 1L).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(clamped("big") == ((400L, true)) &&
      clamped("tiny") == ((40L, true)) && clamped("mid") == ((90L, true)))
  }

  test("shardManifest: deterministic shards; positions are a 1..n permutation per shard") {
    val d = spark.range(0, 1000).select(col("id").as("doc_id"))
    val m = TextOps.shardManifest(d.toDF(), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.length == 1000)
    // shard is the split_assign-family multiplicative hash mod 8
    m.foreach { case (id, sh, _) =>
      assert(sh == ((id % 2147483648L) * 2654435761L % 4294967296L) % 8) }
    // per shard: pos is exactly 1..count (a permutation, no gaps/dups)
    m.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq) }
    // and the order is NOT the doc_id order (the second hash shuffles)
    val shard0 = m.filter(_._2 == m.head._2).sortBy(_._3).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
    // deterministic across runs/partitionings
    val again = TextOps.shardManifest(d.repartition(7).toDF(), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(again == m.sorted.toSeq)
  }

  test("knnGraph: the non-broadcast batch self-search equals ivfSearch on the same queries") {
    val corpus = (0L until 80L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val idx = VectorOps.ivfBuild(corpus, k = 4, iters = 2)
    val g = VectorOps.knnGraph(idx, corpus, topK = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every vector gets rows, k-bounded
    val byQ = g.groupBy(_._1)
    assert(byQ.keySet == (0L until 80L).toSet)
    assert(byQ.values.forall(_.size <= 3))
    // plan-shape difference must not change answers: the broadcast-query
    // ivfSearch on a 5-vector slice agrees row-for-row
    val slice = corpus.where(col("vec_id") < 5)
    val direct = VectorOps.ivfSearch(idx, slice, topK = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(g.filter(_._1 < 5L) == direct)
    idx.indexed.unpersist(false)
  }

  test("nswSearch: beam walk over the kNN graph — k-bounded, self-free, recall floor, beam-monotone") {
    // the REGISTERED composition: real embeddings + the memoized
    // dedup-scaled kNN graph (the IVF recall-gate precedent — a
    // structureless random fixture is the wrong navigability testbed:
    // measured 0.33 there vs 0.90 here, NSW quality is a property of
    // the corpus geometry, which is exactly why the recall query is
    // driver-visible)
    val dir = "/root/testdata/sf0.01"
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
    val nn = VectorOps.IvfCache.knnGraphFrame(spark, dir)
    val qs = corpus.where(col("vec_id") < 10)
    def recallOf(res: Array[(Long, Long)]): Double = {
      val truth = VectorOps.bruteForceTopK(corpus, qs, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      res.count(truth).toDouble / truth.size
    }
    val out = VectorOps.nswSearch(nn, corpus, qs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // shape: ≤ topK rows per query, never the query itself
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet)
    assert(byQ.values.forall(g => g.size <= 10 && g.size == g.toSet.size))
    assert(out.forall { case (q, nb) => q != nb })
    // determinism: a second run is row-identical
    assert(VectorOps.nswSearch(nn, corpus, qs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == out.toSeq)
    // quality floor at the registered defaults; and a WIDER beam can
    // only help (candidate sets nest round by round, and the final
    // top-10 picks by exact similarity, so hits vs the exact top-10
    // are monotone in beam width when sims are distinct)
    val narrow = VectorOps.nswSearch(nn, corpus, qs, beam = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (rWide, rNarrow) = (recallOf(out), recallOf(narrow))
    info(s"NSW recall@10: beam16 $rWide, beam4 $rNarrow")
    assert(rWide >= 0.85, s"beam-16 recall $rWide below floor")
    assert(rWide >= rNarrow, s"beam widening lowered recall: $rNarrow -> $rWide")
  }
}
