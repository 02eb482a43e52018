package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`), for the
 * `embeddings(vec_id, embedding, label)` table. All math is double-
 * precision column expressions (`zip_with` + `aggregate` — codegen'd, no
 * UDF).
 *
 * Two paths, per the brief:
 *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
 *    against the corpus. This is a broadcast nested-loop by construction:
 *    correct at 100 TB corpus size as long as the QUERY side stays small
 *    (it is sent to every executor once; the corpus is never shuffled).
 *  - [[lshTopK]]: the scale path — random-hyperplane LSH buckets the
 *    corpus; each query only scores candidates sharing a band bucket
 *    (equi-join), trading recall for corpus-side pruning.
 */
object VectorOps {

  /** embedding cast to array<double> for stable math. */
  def dvec(c: Column): Column = c.cast("array<double>")

  /** The §18 release discipline (see GraphXTraversal.releaseCheckpoint):
    * free an eager localCheckpoint's backing blocks once no downstream
    * plan will read them again. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Two-phase grouped shortlist: keep each group's top `n` ids by
    * (score desc, id asc). With the graft extension loaded this is the
    * native bounded-heap aggregate [[graft.functions.TopKAgg]]: the
    * PARTIAL aggregation truncates to ≤n map-side, so the exchange moves
    * ≤ partitions×n rows per group — the scale-safe shape for a hot
    * group, where the `row_number` window fallback would funnel every
    * candidate of the group through one reducer sort. Both paths emit
    * the identical (group, id, score) set in the identical rank order. */
  /** ADC lookup weights quantized onto the 2⁻⁴⁰ grid as EXACT longs
    * (the §28 float doctrine applied to the PQ shortlist): per-candidate
    * ADC totals become integer sums — independent of row order in either
    * engine — so the rank-`shortlist` cut between ulp-close candidates
    * (e.g. duplicate vectors, the sf1 ann_ivfpq catch) is deterministic.
    * ×2⁴⁰ is an exponent shift, exact for |w| ≤ 1; Σ over 8 subspaces
    * ≤ 2⁴³ — exact in Long and in the double graft_topk casts to. */
  private[graft] def adcWeight(w: Double): Long =
    math.floor(w * 1099511627776d + 0.5d).toLong

  private[graft] def groupedTopK(df: DataFrame, group: String, id: String,
                                 score: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null/NaN-scored candidates are excluded up front ON BOTH PATHS: a
    // NaN (0/0 cosine of a zero vector) poisons any ordering — the heap's
    // comparisons would wedge it at the root, the window would sort it
    // FIRST (Spark treats NaN as largest) — and a null score cannot rank.
    // Filtering before the rank keeps the two paths bit-identical.
    val ranked = df.where(col(score).isNotNull && !isnan(col(score).cast("double")))
    if (graft.functions.GraftExtensions.loadedIn(df.sparkSession))
      ranked.groupBy(col(group))
        .agg(call_function("graft_topk",
          col(score).cast("double"), col(id).cast("long"), lit(n)).as("top"))
        .select(col(group), explode(col("top")).as("e"))
        .select(col(group), col("e.id").as(id), col("e.score").as(score))
    else
      ranked.withColumn("__rk", row_number().over(
          Window.partitionBy(col(group)).orderBy(col(score).desc, col(id))))
        .where(col("__rk") <= n)
        .select(col(group), col(id), col(score))
  }

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native codegen'd [[graft.functions.CosineSimilarity]]
    * when the graft session extension is loaded (single fused loop, no
    * intermediate arrays); HOF composition otherwise. */
  def cosineBest(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (graft.functions.GraftExtensions.loadedIn(spark)) call_function("graft_cosine", a, b)
    else cosine(a, b)

  /** Per-vector L2 norms: (vec_id, norm). */
  def norms(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), round(norm(dvec(col("embedding"))), 4).as("norm"))

  /** Exact top-k neighbors for each query vector: (q, nb, sim), ranked by
    * (cosine desc, vec_id) — deterministic tiebreak. Self-pairs excluded.
    * The rank is the two-phase [[groupedTopK]]: each scan partition folds
    * its |corpus|/partitions candidates into a ≤k heap map-side, so the
    * per-query exchange moves ≤ partitions×k rows — at 100 TB corpus
    * size the difference between shuffling the whole scored corpus per
    * query and shuffling a few kilobytes. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q"), dvec(col("embedding")).as("qv")))
    val scored = corpus.select(col("vec_id").as("nb"), dvec(col("embedding")).as("cv"))
      .join(q, col("q") =!= col("nb")) // broadcast nested-loop: query side tiny
      .select(col("q"), col("nb"),
        cosineBest(corpus.sparkSession, col("qv"), col("cv")).as("sim"))
    groupedTopK(scored, "q", "nb", "sim", k)
      .select(col("q"), col("nb"), round(col("sim"), 4).as("sim"))
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query, the top-k most-similar neighbors whose cosine stays BELOW
    * `dupSim` — the near-miss band that actually teaches a model, with
    * the near-duplicate "false negatives" excluded (a positive leaking
    * into the negative set is the classic contrastive-training bug;
    * `dupSim` should match the dedup threshold in force, so the
    * exclusion is exactly "what dedup would have collapsed").
    * Same two-phase shape as [[bruteForceTopK]]: the filter runs on the
    * scored stream BEFORE the per-partition k-heaps, so the exchange
    * still moves ≤ partitions×k rows per query. Returns (q, nb, sim)
    * ranked (sim desc, nb). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                    dupSim: Double = 0.95): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q"), dvec(col("embedding")).as("qv")))
    val scored = corpus.select(col("vec_id").as("nb"), dvec(col("embedding")).as("cv"))
      .join(q, col("q") =!= col("nb"))
      .select(col("q"), col("nb"),
        cosineBest(corpus.sparkSession, col("qv"), col("cv")).as("sim"))
      .where(col("sim") < dupSim)
    groupedTopK(scored, "q", "nb", "sim", k)
      .select(col("q"), col("nb"), round(col("sim"), 4).as("sim"))
  }

  /** 64-bit SIGN SKETCH of the embedding column, packed as two 32-bit
    * halves (`lo` = dims 0..31, `hi` = dims 32..63): bit i = [xᵢ > 0].
    * The 8-byte-per-vector binary compression a 100 TB ANN tier keeps
    * hot while the float vectors stay cold — Hamming distance on the
    * packed words is a proxy for angular distance (each agreeing bit is
    * one axis on whose side both vectors fall). Two halves instead of
    * one long keep every shift below the sign bit in BOTH engines
    * (DuckDB's BIGINT << 63 overflows); 2^i is computed as an exact
    * double pow then cast (exact for i ≤ 31), matching the twin's
    * integer shifts value-for-value. Returns (vec_id, lo, hi). */
  def signSketch(emb: DataFrame, dims: Int = 64): DataFrame = {
    require(dims % 2 == 0, s"signSketch needs an even dims, got $dims")
    val half = dims / 2
    // fail loudly on a dims mismatch (the lshSignature doctrine): a
    // short vector would otherwise slice short, null-pad through
    // zip_with, and silently sketch as zero bits — every wrong-width
    // vector colliding at Hamming 0
    val checked = when(
      assert_true(size(col("embedding")) === dims,
        lit(s"signSketch: embedding length != dims=$dims")).isNull,
      dvec(col("embedding")))
    def packHalf(offset: Int): Column =
      aggregate(
        zip_with(
          slice(checked, offset + 1, half),
          sequence(lit(0), lit(half - 1)),
          (x, i) => when(x > 0d, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc + b)
    emb.select(col("vec_id"), packHalf(0).as("lo"), packHalf(half).as("hi"))
  }

  /** Exact top-k by HAMMING distance over the packed sign sketches:
    * (q, nb, ham) ranked (ham asc, nb asc) — the brute-force baseline of
    * the binary tier, scanning 8 bytes + two XOR/popcounts per corpus
    * row where cosine scans 256 float bytes and 64 multiplies. Query
    * sketches broadcast; the per-partition k-heaps of [[groupedTopK]]
    * (on matching-bits = dims − ham, so the heap order IS ham asc) keep
    * the exchange at partitions×k rows. The tie band at a Hamming cut is
    * wide (ham ∈ 0..64) — the nb tiebreak makes the cut deterministic. */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                  dims: Int = 64): DataFrame = {
    val c = signSketch(corpus, dims)
      .select(col("vec_id").as("nb"), col("lo").as("clo"), col("hi").as("chi"))
    val q = broadcast(signSketch(queries, dims)
      .select(col("vec_id").as("q"), col("lo").as("qlo"), col("hi").as("qhi")))
    val scored = c.join(q, col("q") =!= col("nb"))
      .select(col("q"), col("nb"),
        (lit(dims.toLong) - bit_count(col("clo").bitwiseXOR(col("qlo"))).cast("long")
          - bit_count(col("chi").bitwiseXOR(col("qhi"))).cast("long")).as("mb"))
    // graft_topk carries scores as double — the small-integer mb round-
    // trips exactly; cast the distance back to the integer it is
    groupedTopK(scored, "q", "nb", "mb", k)
      .select(col("q"), col("nb"),
        (lit(dims.toLong) - col("mb")).cast("long").as("ham"))
  }

  /** Multi-index Hamming near-dup pairs over the sign sketches
    * (Norouzi et al.'s multi-index hashing shape): each 64-bit sketch
    * splits into 8 byte chunks; vectors sharing ANY (position, byte)
    * bucket become candidates — a hash equi-join on (j, chunk), never
    * all-pairs — then exact XOR-popcount keeps pairs with ham ≤
    * `maxHam`. By pigeonhole the candidates are COMPLETE for ham ≤ 7
    * (some byte must match); above that the contract is the LSH class
    * this repo's dedup family already carries — candidates ∩ predicate
    * (the dedup_minhash/dedup_edit doctrine), and the twin replays the
    * same bands so recall gaps can't diverge silently. Bucket fan-out
    * is 8×corpus rows; per-(position, byte) bucket sizes govern the
    * join — at 100 TB the byte alphabet (256 per position) would be
    * widened to 16-bit chunks, same plan. Returns (a, b, ham). */
  def hammingNearDupPairs(emb: DataFrame, maxHam: Int = 20,
                          dims: Int = 64): DataFrame = {
    val sk = signSketch(emb, dims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ch = sk.select(col("vec_id"), col("lo"), col("hi"),
      explode(array((0 until 8).map { j =>
        val word = if (j < 4) col("lo") else col("hi")
        struct(lit(j).as("j"),
          shiftrightunsigned(word, 8 * (j % 4)).bitwiseAND(lit(255L)).as("c"))
      }: _*)).as("e"))
      .select(col("vec_id"), col("lo"), col("hi"),
        col("e.j").as("j"), col("e.c").as("c"))
    val lhs = ch.select(col("j"), col("c"), col("vec_id").as("a"),
      col("lo").as("alo"), col("hi").as("ahi"))
    val rhs = ch.select(col("j"), col("c"), col("vec_id").as("b"),
      col("lo").as("blo"), col("hi").as("bhi"))
    val cand = lhs.join(rhs, Seq("j", "c")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("alo"), col("ahi"),
        col("blo"), col("bhi")).distinct()
    val out = cand.select(col("a"), col("b"),
        (bit_count(col("alo").bitwiseXOR(col("blo"))).cast("long") +
         bit_count(col("ahi").bitwiseXOR(col("bhi"))).cast("long")).as("ham"))
      .where(col("ham") <= maxHam)
      .localCheckpoint(true)
    sk.unpersist(false)
    out
  }

  /** Deterministic ±1 hyperplane matrix (md5-derived, see
    * [[graft.functions.Hyperplanes.matrix]]), embedded as a plan
    * literal — the per-(plane,dim) hashing happens ONCE at plan build,
    * per-row work stays pure arithmetic. */
  private def planes(nPlanes: Int, dims: Int): Column =
    typedlit(graft.functions.Hyperplanes.matrix(nPlanes, dims).map(_.toSeq).toSeq)

  /** `nPlanes`-bit signature of a vector under the shared hyperplane set:
    * bit j = [plane_j · v > 0]. Fails loudly on a dims mismatch — zip_with
    * would otherwise null-pad, every dot would go null, and all signatures
    * would silently collapse to one bucket (degenerate all-pairs join). */
  def lshSignature(v: Column, nPlanes: Int, dims: Int): Column = {
    val checked = when(
      assert_true(size(v) === dims,
        lit(s"lshSignature: embedding length != dims=$dims")).isNull, v)
    transform(planes(nPlanes, dims), p =>
      when(aggregate(zip_with(checked, p, (x, w) => x * w), lit(0d), (acc, x) => acc + x) > 0, 1)
        .otherwise(0))
  }

  /** Signature via the native codegen'd
    * [[graft.functions.HyperplaneSignature]] when the graft extension is
    * loaded (one fused dot loop, plane matrix as a codegen reference
    * object instead of an nPlanes·dims plan literal — bit-identical, same
    * seeded draw); HOF composition otherwise. Both fail loudly on a dims
    * mismatch. */
  def lshSignatureBest(spark: org.apache.spark.sql.SparkSession,
                       v: Column, nPlanes: Int, dims: Int): Column =
    if (graft.functions.GraftExtensions.loadedIn(spark))
      call_function("graft_hyperplanes", v, lit(nPlanes), lit(dims))
    else lshSignature(v, nPlanes, dims)

  /**
   * Bucketed top-k for the HIGH-SIMILARITY regime (≥0.8 cosine — near-dup
   * retrieval): `bands` independent 8-plane signatures (bits b*8..b*8+7
   * packed per band); query meets corpus vectors sharing ANY band bucket,
   * then exact-ranks only those candidates. The corpus-side explode is
   * bands× the corpus, the join is a hash equi-join on (band, bucket) —
   * never all-pairs.
   *
   * NOT a general ANN: on a corpus without strong neighbors (max pairwise
   * cosine ≈ 0.5, like the synthetic embeddings table) measured recall@10
   * is ~0.06 vs brute force, because 8-plane buckets only collide for
   * tightly-aligned vectors — exactly the dedup regime this geometry
   * targets. For general top-k use [[ivfTopK]] (measured recall@10 ≥ 0.9
   * with its registered parameters; PipelineSpec gates this).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              bands: Int = 4, rowsPerBand: Int = 8, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nPlanes = bands * rowsPerBand
    def withBands(df: DataFrame, idCol: String): DataFrame =
      df.select(col("vec_id").as(idCol), dvec(col("embedding")).as(idCol + "v"),
          lshSignatureBest(df.sparkSession, dvec(col("embedding")), nPlanes, dims).as("sig"))
        .select(col(idCol), col(idCol + "v"),
          explode(transform(sequence(lit(0), lit(bands - 1)), b =>
            struct(b.as("band"),
              aggregate(zip_with(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
                sequence(lit(0), lit(rowsPerBand - 1)),
                (bit, j) => bit.cast("long") * call_function("shiftleft", lit(1L), j.cast("int"))),
                lit(0L), (acc, x) => acc + x).as("bh")))).as("bb"))
        .select(col(idCol), col(idCol + "v"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    // barrier: evaluate the nPlanes-projection signature once per vector,
    // not once per band reference (CollapseProject would inline it)
    val c = withBands(corpus, "nb").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = broadcast(withBands(queries, "q"))
    // dedup multi-band collisions on the (q, nb) id pair FIRST — distinct
    // over two longs, not over 2×64-element double arrays — then join the
    // vectors back for exact scoring of the surviving candidates.
    val cand = c.select(col("nb"), col("band"), col("bh"))
      .join(q.select(col("q"), col("band"), col("bh")), Seq("band", "bh"))
      .where(col("q") =!= col("nb"))
      .select(col("q"), col("nb")).distinct()
    val qv = broadcast(queries.select(col("vec_id").as("q"), dvec(col("embedding")).as("qv")))
    val cv = corpus.select(col("vec_id").as("nb"), dvec(col("embedding")).as("nbv"))
    val scoredCand = cand.join(qv, "q").join(cv, "nb")
      .select(col("q"), col("nb"),
        cosineBest(corpus.sparkSession, col("qv"), col("nbv")).as("sim"))
    // two-phase rank over the bucket candidates (a hot bucket no longer
    // funnels through one reducer sort)
    val out = groupedTopK(scoredCand, "q", "nb", "sim", k)
      .select(col("q"), col("nb"), round(col("sim"), 4).as("sim"))
    val res = out.localCheckpoint(true)
    c.unpersist(false)
    res
  }

  /** Embedding-cosine near-duplicate pairs: (a, b, sim) with a < b and
    * cosine ≥ `threshold`. Candidates come from banded hyperplane-LSH
    * buckets (self equi-join on (band, bucket) — never all-pairs), then
    * exact cosine verifies. Band geometry tuned for dedup thresholds:
    * P(bit agree) = 1 − θ/π ≈ 0.9 at cos 0.95, so 16 bands × 4 planes
    * catch a true pair with p ≈ 1 − (1 − 0.9⁴)¹⁶ ≈ 1 − 5·10⁻⁴ per band
    * set; raise `bands` for stricter recall. */
  /** Adaptive LSH band width for [[embeddingNearDupPairs]]:
    * rowsPerBand = max(4, ceil(log₂ N) − 7), computed as a pure integer
    * bit length (bitlen(N−1), the dsirWeights trick) so any engine
    * replays the same value from the same N. Rationale: a band's hash
    * space is 2^r buckets, so expected bucket size N∕2^r stays ≈128 as
    * the corpus grows — at a FIXED r=4 the per-band candidate join is
    * Σ|bucket|² ≈ N²∕16, i.e. quadratic (measured 26 s at 20k vectors);
    * adapting r keeps it ~128·N. Recall at the true near-dup operating
    * point (cos ≥ 0.95, per-bit agreement p ≈ 0.9) stays ≥ 0.99 out to
    * r=10∕b=6 (1−(1−pʳ)ᵇ); the detection CONTRACT (candidates ∩
    * threshold) is replayed exactly by the twin at any r. */
  def lshRowsPerBand(n: Long): Int = {
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))
    math.max(4, bitlen - 7)
  }

  def embeddingNearDupPairs(emb: DataFrame, threshold: Double = 0.95,
                            bands: Int = 16, rowsPerBand: Int = 4,
                            dims: Int = 64): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val nPlanes = bands * rowsPerBand
    val vecs = emb.select(col("vec_id"), dvec(col("embedding")).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sigF = vecs
      .select(col("vec_id"),
        lshSignatureBest(emb.sparkSession, col("v"), nPlanes, dims).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = sigF
      .select(col("vec_id"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            aggregate(zip_with(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              sequence(lit(0), lit(rowsPerBand - 1)),
              (bit, j) => bit.cast("long") * call_function("shiftleft", lit(1L), j.cast("int"))),
              lit(0L), (acc, x) => acc + x).as("bh")))).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b")).distinct()
    val out = cand
      .join(vecs.select(col("vec_id").as("a"), col("v").as("va")), "a")
      .join(vecs.select(col("vec_id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"),
        cosineBest(emb.sparkSession, col("va"), col("vb")).as("sim"))
      .where(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))
    val res = out.localCheckpoint(true)
    Seq(vecs, sigF).foreach(_.unpersist(false))
    res
  }

  /**
   * Embedding-space decontamination: score every corpus vector by its
   * max cosine against an EVAL embedding set and flag those at or above
   * `threshold` — the semantic complement of the n-gram overlap check
   * (TextOps.decontaminate catches verbatim/near-verbatim leakage; this
   * catches paraphrased eval material that shares no 13-gram).
   *
   * Shape for 100 TB: eval sets are small by nature, so the eval
   * vectors ride INSIDE the plan as one literal array (bounded driver
   * collect, same class as ANN query batches) and the whole operator is
   * a PROJECTION + filter — no join, no shuffle, no agg exchange; each
   * corpus partition streams once computing m cosines per row. `max`
   * commutes exactly (no float-order hazard — the §28/§31 doctrine
   * needs no quantization here), and each pairwise cosine is one fixed
   * left-to-right fold identical in both engines.
   *
   * Returns (vec_id, max_sim, contaminated) for every corpus vector;
   * callers keep `!contaminated`.
   */
  def decontaminateSemantic(corpus: DataFrame, eval: DataFrame,
                            threshold: Double, maxEval: Int = 100000): DataFrame = {
    val spark = corpus.sparkSession
    // limit BEFORE collect: the guard must fire without materializing an
    // unbounded eval side on the driver (limit(maxEval+1) caps the fetch;
    // one extra row is enough to prove the bound was exceeded)
    val evalVecs: Seq[Seq[Double]] = eval
      .select(dvec(col("embedding")).as("v")).limit(maxEval + 1).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    require(evalVecs.nonEmpty && evalVecs.size <= maxEval,
      s"eval set must be 1..$maxEval vectors — " +
        "an unbounded 'eval' side means the operator is being misused as a join")
    val ev = typedlit(evalVecs)
    corpus.select(col("vec_id"), dvec(col("embedding")).as("x"))
      .withColumn("max_sim",
        aggregate(ev, lit(-1d), (acc, e) => greatest(acc, cosineBest(spark, col("x"), e))))
      .select(col("vec_id"),
        round(col("max_sim"), 4).as("max_sim"),
        (col("max_sim") >= threshold).as("contaminated"))
  }

  /**
   * IVF (inverted-file) ANN — the general-purpose path (the dedup-regime
   * alternative is [[lshTopK]]): a coarse k-means quantizer (trained on a
   * deterministic sample, driver-coordinated over tiny k×dims centroid
   * state) partitions the corpus into `k` cells; queries probe only the
   * `nProbe` nearest cells and exact-rank candidates there. Corpus-side
   * work per query scales with nProbe/k of the data.
   *
   * Centroid assignment is a BROADCAST-DataFrame join (k rows shipped to
   * every executor, map-side partial `max_by` folds the k scores per
   * vector back to one row before any shuffle) — not plan literals, so k
   * can grow to 10⁴+ cells without the expression tree becoming the
   * bottleneck (VERDICT r2).
   *
   * Defaults (k=16, nProbe=10) are gated in PipelineSpec at recall@10 ≥ 0.9
   * vs brute force on the sf0.01 corpus — a weak-neighbor corpus (max
   * pairwise cosine ≈ 0.5), i.e. a worst case for any pruning index; with
   * real cluster structure the same geometry prunes far more per recall
   * point.
   */
  /** A trained IVF index: the k-row centroid table (broadcast at every
    * use) and the persisted `(nb, nbv, cell)` assignment. Build once,
    * search many times — index construction (k-means training + the full
    * corpus assignment pass) is a one-time cost like any other index
    * build, not a per-query one. */
  final case class IvfIndex(centroids: DataFrame, indexed: DataFrame, k: Int)

  /** Train the coarse quantizer and assign every corpus vector to its
    * cell — the build half of [[ivfTopK]], eager (the returned index's
    * assignment is materialized and persisted). */
  def ivfBuild(corpus: DataFrame, k: Int = 16, iters: Int = 3): IvfIndex = {
    import org.apache.spark.storage.StorageLevel
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col("vec_id"), dvec(col("embedding")).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // deterministic init: the k lowest vec_ids, cells 0..k−1 in id order.
    // Centroid state is a k-row DATAFRAME end to end (r15, VERDICT r14
    // item 3): the former Array[Seq[Double]] round-tripped k×dims doubles
    // through the driver once per Lloyd iteration — a driver barrier and
    // a transfer that grows with k·dims (a 10⁴-cell × 10³-dim quantizer
    // is ~80 MB through one process per iteration). The k-row eager
    // checkpoint keeps the same per-iteration job count (the collect WAS
    // a job) with no driver data path; every float is produced by the
    // identical avg() aggregation, so the centroids are bit-identical.
    // The limit(k) output is a single task, so the row_number window
    // needs no global sort shuffle.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    var centroids: DataFrame = vecs.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(w) - 1).as("cell"), col("v").as("cv"))
      .localCheckpoint(true)

    // nearest-centroid assignment on (vec_id, v): k scored rows per vector
    // from the broadcast join, folded back to one by a hash aggregation
    // whose map-side partials run BEFORE the shuffle (ties → lowest cell)
    def assign(df: DataFrame): DataFrame =
      df.join(broadcast(centroids), lit(true))
        .select(col("vec_id"), col("v"), col("cell"),
          cosineBest(spark, col("v"), col("cv")).as("s"))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cell"), struct(col("s"), -col("cell"))).as("cell"),
          first(col("v")).as("v"))

    // Lloyd iterations on a sample; the heavy work is the sampled
    // assignment scan, the new centroid table is k rows folded from a
    // (cell, dim)-keyed avg — never collected. Same sparse-id guard as
    // pqTrain: an empty residue class falls back to the full corpus.
    // An empty CELL keeps its previous centroid (the left_outer +
    // coalesce, exactly the old means.getOrElse(j, centroids(j))).
    val sample0 = vecs.where(pmod(col("vec_id"), lit(5)) === 0)
    val sample = if (sample0.limit(1).isEmpty) vecs else sample0
    (1 to iters).foreach { _ =>
      val means = assign(sample)
        .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("cell"), col("i")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("es"))
        .select(col("cell"), expr("transform(es, e -> e.m)").as("nv"))
      val next = centroids
        .join(means, Seq("cell"), "left_outer")
        .select(col("cell"), coalesce(col("nv"), col("cv")).as("cv"))
        .localCheckpoint(true)
      releaseCheckpoint(centroids)
      centroids = next
    }

    val indexed = assign(vecs)
      .select(col("vec_id").as("nb"), col("v").as("nbv"), col("cell"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    indexed.count() // materialize before releasing the staging cache
    vecs.unpersist(false)
    // the k-row centroid checkpoint stays pinned with the index (the
    // IvfCache memo holds it for the session, like `indexed`)
    IvfIndex(centroids, indexed, k)
  }

  /** Probe a trained [[IvfIndex]]: each query visits its `nProbe` nearest
    * cells and exact-ranks only those candidates. The index is left
    * persisted for the next search. */
  def ivfSearch(index: IvfIndex, queries: DataFrame, topK: Int = 10,
                nProbe: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // queries probe their nProbe closest cells: same broadcast join, kept
    // as nProbe rows per query by a per-query rank
    val wq = Window.partitionBy(col("q")).orderBy(col("s").desc, col("cell"))
    val q = broadcast(queries
      .select(col("vec_id").as("q"), dvec(col("embedding")).as("qv"))
      .join(broadcast(index.centroids), lit(true))
      .select(col("q"), col("qv"), col("cell"), cosineBest(queries.sparkSession, col("qv"), col("cv")).as("s"))
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= nProbe)
      .select(col("q"), col("qv"), col("cell")))

    val scored = index.indexed.join(q, Seq("cell"))
      .where(col("q") =!= col("nb"))
      .select(col("q"), col("nb"),
        cosineBest(queries.sparkSession, col("qv"), col("nbv")).as("sim"))
    groupedTopK(scored, "q", "nb", "sim", topK)
      .select(col("q"), col("nb"), round(col("sim"), 4).as("sim"))
  }

  /** Metadata-filtered IVF search: the candidate set restricts to
    * `allowed` (a vec_id relation — e.g. docs matching a language or
    * license predicate) BEFORE exact scoring — pre-filtering, the
    * semantics a vector store needs when predicates are selective
    * (post-filtering a top-k can return < k or miss matches entirely).
    * The filter is an equi-join against the indexed table, so the probe
    * plan is unchanged: broadcast centroid probe, cell equi-join, exact
    * re-rank of surviving members only. `allowed` is deduplicated first
    * (ADVICE r10): a predicate relation with repeated vec_ids must not
    * multiply candidate rows — the join is a membership test, and
    * duplicated candidates would repeat neighbors inside the top-k. */
  def ivfSearchFiltered(index: IvfIndex, queries: DataFrame,
                        allowed: DataFrame, topK: Int = 10,
                        nProbe: Int = 10): DataFrame =
    ivfSearch(
      index.copy(indexed = index.indexed
        .join(allowed.select(col("vec_id").as("nb")).distinct(), "nb")),
      queries, topK, nProbe)

  /**
   * IVF index health audit — per-cell population and centroid affinity:
   * (cell, n_vectors, sum_cos_mu), where sum_cos_mu is the order-free
   * sum of each member's cosine-to-own-centroid quantized to integer
   * micros per row (floor(cos·10⁶ + ½), DECIMAL(38,0) sum — the §28
   * portability doctrine). The cell-size histogram is THE operational
   * metric of a deployed IVF index: skewed cells mean probe-latency
   * tails and recall holes, and a falling mean affinity vs the
   * build-time value is drift — time to retrain (the per-cell
   * generalization of [[ivfAppend]]'s staleness scalar).
   *
   * Scale shape: one broadcast join (k centroid rows) + one cell-keyed
   * aggregation with map-side partials — rows out = k.
   */
  def ivfCellStats(index: IvfIndex): DataFrame =
    index.indexed
      .join(broadcast(index.centroids), Seq("cell"))
      .select(col("cell"),
        floor(cosineBest(index.indexed.sparkSession,
          col("nbv"), col("cv")) * 1e6 + 0.5).cast("long").as("cos_mu"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("cos_mu").cast("decimal(38,0)")).cast("long").as("sum_cos_mu"))
      .select(col("cell").cast("long").as("cell"), col("n_vectors"),
        col("sum_cos_mu"))

  /** k-NN GRAPH over the embedding corpus via the IVF index: every
    * vector's top-k cosine neighbors in one batch self-search — the
    * primitive SemDeDup-style clustering, duplicate-graph analysis, and
    * graph-based label propagation start from. Differs from
    * [[ivfSearch]] in ONE plan decision: the query side is the WHOLE
    * corpus, so it is NOT broadcast — queries rank their nProbe cells
    * against the broadcast centroid table (corpus×k rows through one
    * per-query window), then meet the indexed members in a plain cell
    * equi-join (both sides shuffle by cell — each side corpus-scale,
    * never corpus×corpus), and the per-query top-k heap truncates
    * before the final exchange. At 100 TB this is the canonical
    * bucketed kNN-graph build; a broadcast query side would ship the
    * corpus to every task. Returns (q, nb, sim round(4)) — k rows per
    * vector. */
  def knnGraph(index: IvfIndex, vectors: DataFrame, topK: Int = 5,
               nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.partitionBy(col("q")).orderBy(col("s").desc, col("cell"))
    val q = vectors
      .select(col("vec_id").as("q"), dvec(col("embedding")).as("qv"))
      .join(broadcast(index.centroids), lit(true))
      .select(col("q"), col("qv"), col("cell"), cosineBest(vectors.sparkSession, col("qv"), col("cv")).as("s"))
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= nProbe)
      .select(col("q"), col("qv"), col("cell"))
    val scored = index.indexed.join(q, Seq("cell"))
      .where(col("q") =!= col("nb"))
      .select(col("q"), col("nb"),
        cosineBest(vectors.sparkSession, col("qv"), col("nbv")).as("sim"))
    groupedTopK(scored, "q", "nb", "sim", topK)
      .select(col("q"), col("nb"), round(col("sim"), 4).as("sim"))
  }

  /** Graph-based ANN search (the NSW/HNSW search layer, Malkov &
    * Yashunin TPAMI 2020, single-layer form): fixed-round beam search
    * over a prebuilt kNN graph. Round t expands every beam node's
    * adjacency list, re-scores the candidate set against the query,
    * and keeps the top-`beam` by (cosine desc, id asc); after `rounds`
    * expansions the final beam is cut to `topK`, self-pairs excluded —
    * the deterministic fixed-iteration form of greedy NSW descent (no
    * visited set: re-scored candidates are idempotent, and a fixed
    * round count is what makes the walk an UNROLLABLE relational
    * fixpoint the DuckDB twin replays round by round, the kcore
    * pattern). Entry point pinned at vertex 0 (the NSW convention of a
    * fixed enter-point, and present at every sf by construction).
    *
    * Scale shape: each round is one (q,node)-keyed equi-join against
    * the edge list plus one against the vector table, then the
    * graft_topk heap — candidate volume per query is ≤ beam·(k+1)
    * rows REGARDLESS of corpus size (the whole point of graph ANN:
    * search cost scales with beam×rounds, not with N or with IVF cell
    * population). The beam frame is tiny relative to edges/vectors, so
    * AQE broadcasts it; at production query volume the same plan
    * degrades gracefully to shuffle joins on node. Returns
    * (q, nb, sim round(4)) — topK rows per query. */
  /** NSW defaults — interpolated into the DuckDB twin (one source of
    * truth, the HyperAnf constant rule): beam×(k+1) candidate rows per
    * query per round, 6 rounds reach ≥ the graph's sf0.1 effective
    * radius from the pinned entry. */
  val NswBeam = 16
  val NswRounds = 6

  def nswSearch(nn: DataFrame, emb: DataFrame, queries: DataFrame,
                beam: Int = NswBeam, rounds: Int = NswRounds,
                topK: Int = 10): DataFrame = {
    val spark = emb.sparkSession
    // NSW links are UNDIRECTED (Malkov §3: bidirectional connections
    // are what make the graph navigable from any entry) — the kNN
    // build emits directed top-k edges, so symmetrize: measured on the
    // sf0.01 gate this lifts mean recall@10 from 0.66 to the high-80s
    // band (a directed 5-NN graph strands walks in low-in-degree
    // regions, the q=3 0.1-recall case).
    //
    // r14 OPTIMIZATION (guide §2.4/§5): every round references the
    // adjacency list, the vector table AND the previous beam — and the
    // beam twice (expansion + candidate union). Left lazy, that plan
    // DOUBLES per round (2^rounds copies of round 1: the dumped sf0.001
    // plan was 14,594 formatted lines) and re-ran the corpus-scale
    // symmetrize-distinct shuffle and the embedding scan inside every
    // copy — ann_nsw read 13.3 s at sf0.1 for TEN queries. Materialize
    // the three loop-invariant frames ONCE (edges/vecs corpus-bounded,
    // qs query-bounded) and checkpoint the ≤ beam·|q|-row beam each
    // round, releasing its predecessor — search cost is now actually
    // beam×rounds-shaped, as the scaladoc always claimed (measured
    // 13.31 → 0.82 s, plan 14,594 → 50 lines).
    val edges = nn.select(col("q").as("node"), col("nb"))
      .unionAll(nn.select(col("nb").as("node"), col("q").as("nb")))
      .distinct()
      .localCheckpoint(true)
    val vecs = emb.select(col("vec_id").as("node"), dvec(col("embedding")).as("nv"))
      .localCheckpoint(true)
    val qs = queries.select(col("vec_id").as("q"), dvec(col("embedding")).as("qv"))
      .localCheckpoint(true)
    def score(cand: DataFrame): DataFrame =
      cand.join(vecs, "node").join(qs, "q")
        .select(col("q"), col("node"),
          cosineBest(spark, col("qv"), col("nv")).as("s"))
    var beamDf: DataFrame = qs.select(col("q"), lit(0L).as("node"))
    var lastBeam: DataFrame = null
    (1 to rounds).foreach { _ =>
      val expanded = beamDf.join(edges, "node")
        .select(col("q"), col("nb").as("node"))
      val cand = beamDf.unionAll(expanded).distinct()
      beamDf = groupedTopK(score(cand), "q", "node", "s", beam)
        .select(col("q"), col("node"))
        .localCheckpoint(true)
      if (lastBeam != null) releaseCheckpoint(lastBeam)
      lastBeam = beamDf
    }
    val fin = score(beamDf).where(col("node") =!= col("q"))
    val out = groupedTopK(fin, "q", "node", "s", topK)
      .select(col("q"), col("node").as("nb"), round(col("s"), 4).as("sim"))
      .localCheckpoint(true)
    Seq(edges, vecs, qs, beamDf).foreach(releaseCheckpoint)
    out
  }

  /** Embedding ISOTROPY audit: the cosine histogram over a
    * deterministic sample of pairs — each vector paired with the ids at
    * fixed offsets (v, (v+o) mod N) — the "did the embedding space
    * collapse" check run before trusting vectors for dedup or ANN (a
    * healthy space concentrates near 0; mass near 1 means the encoder
    * collapsed). The pairing is pure integer arithmetic (no sampling
    * RNG, no shuffle beyond one id-keyed join); each pair's cosine uses
    * the SEQUENTIAL HOF fold, which the twin replays term-for-term, so
    * the floor-bucket edges and the per-bucket integer micro sums land
    * bit-identically. Returns (bucket = ⌊10·cos⌋, n_pairs,
    * sum_cos_micro). */
  def cosineHistogram(emb: DataFrame,
                      offsets: Seq[Int] = Seq(1, 17, 131)): DataFrame = {
    val n = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val v = emb.select(col("vec_id"), dvec(col("embedding")).as("x"))
    val lhs = offsets.map { o =>
      v.select(col("vec_id").as("a"), col("x").as("xa"),
        ((col("vec_id") + o) % n).as("b"))
    }.reduce(_ unionAll _)
    lhs.join(v.select(col("vec_id").as("b"), col("x").as("xb")), "b")
      .where(col("a") =!= col("b"))
      .select(floor(cosineBest(emb.sparkSession, col("xa"), col("xb")) * lit(10.0)).cast("long").as("bucket"),
        floor(cosineBest(emb.sparkSession, col("xa"), col("xb")) * lit(1e6) + lit(0.5)).cast("long").as("m"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("m")).as("sum_cos_micro"))
  }

  /** Per-label kNN PURITY of a (q, nb, …) neighbor graph against a
    * (vec_id, label) frame — the standard "does the embedding space
    * respect the labels" audit run before trusting vectors for
    * clustering or semantic dedup: for each label, the fraction of its
    * vectors' neighbor slots occupied by the SAME label. Exact-integer
    * numerator/denominator (hit and pair counts), one final division
    * under round(4) — the oracle doctrine. Two vertex-keyed dimension
    * joins on the neighbor graph + one label-keyed aggregation,
    * map-side combined; nothing here outgrows the kNN graph itself.
    * Returns (label, n_vecs, hits, pairs, purity). */
  def labelPurity(nn: DataFrame, emb: DataFrame): DataFrame = {
    val lab = emb.select(col("vec_id"), col("label"))
    nn.join(lab.select(col("vec_id").as("q"), col("label")), "q")
      .join(lab.select(col("vec_id").as("nb"), col("label").as("nb_label")), "nb")
      .groupBy(col("label"))
      .agg(countDistinct(col("q")).as("n_vecs"),
        sum(when(col("nb_label") === col("label"), 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("pairs"))
      .select(col("label"), col("n_vecs"), col("hits"), col("pairs"),
        round(col("hits").cast("double") / col("pairs"), 4).as("purity"))
  }

  /** One-shot build + search (tests and ad-hoc use; long-lived deployments
    * hold the [[IvfIndex]] and call [[ivfSearch]] per query batch). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, topK: Int = 10,
              k: Int = 16, nProbe: Int = 10, iters: Int = 3): DataFrame = {
    val idx = ivfBuild(corpus, k, iters)
    val res = ivfSearch(idx, queries, topK, nProbe).localCheckpoint(true)
    idx.indexed.unpersist(false)
    res
  }

  /**
   * Symmetric int8 scalar quantization of the embedding column — the 4×
   * storage/bandwidth compression step an ANN index at 100 TB runs before
   * anything else: per-vector scale = max|x|∕127, qᵢ = round(xᵢ∕scale) ∈
   * [−127, 127]. Returns (vec_id, scale, rms_err) where rms_err is the
   * reconstruction error √(mean((x − q·scale)²)) — the number you monitor
   * to decide whether int8 recall is acceptable.
   *
   * The scale is computed once per row and STAGED as an attribute behind
   * a persist barrier: the error lambda references it per element, and
   * Spark re-evaluates expression (not attribute) references inside
   * lambdas — unstaged, the max|x| pass would run dims× per vector.
   * Zero vectors (scale = 0) are excluded rather than emitting NaN.
   */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val staged = emb
      .select(col("vec_id"), dvec(col("embedding")).as("x"))
      .select(col("vec_id"), col("x"),
        (array_max(transform(col("x"), a => abs(a))) / 127d).as("scale"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val err2 = aggregate(
      transform(col("x"), a => pow(a - round(a / col("scale")) * col("scale"), 2)),
      lit(0d), (acc, e) => acc + e) / size(col("x"))
    // rms first, rounding of scale in a SEPARATE projection: emitting
    // `round(scale, 6) AS scale` next to an expression that references
    // col("scale") makes Spark's lateral-column-alias resolution bind the
    // reference to the ROUNDED sibling alias, silently corrupting the
    // error term (measured: rms 4.66e-4 vs the true 4.71e-4)
    val out = staged.where(col("scale") > 0)
      .select(col("vec_id"), col("scale"), round(sqrt(err2), 6).as("rms_err"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"), col("rms_err"))
    val res = out.localCheckpoint(true)
    staged.unpersist(false)
    res
  }

  /** Persist a trained index as parquet (centroids + cell assignment) —
    * the durable-artifact half of build-once/search-many: a 100 TB corpus
    * is assigned once and every later job opens the assignment table
    * (cell predicate pushes down to the parquet scan). */
  def saveIndex(index: IvfIndex, root: String): Unit = {
    index.centroids.write.mode("overwrite").parquet(s"$root/centroids")
    index.indexed.write.mode("overwrite").parquet(s"$root/indexed")
  }

  def openIndex(spark: org.apache.spark.sql.SparkSession, root: String): IvfIndex = {
    import org.apache.spark.storage.StorageLevel
    val centroids = spark.read.parquet(s"$root/centroids")
    // mirror ivfBuild: searches over an opened index hit memory, not a
    // re-read parquet scan per search (ivfSearch leaves it persisted)
    val indexed = spark.read.parquet(s"$root/indexed")
      .persist(StorageLevel.MEMORY_AND_DISK)
    IvfIndex(centroids, indexed, centroids.count().toInt)
  }

  /** Bounded LRU memo — the same eviction discipline as the GraphX graph
    * caches (gx/GraphXTraversal): accessOrder LinkedHashMap capped at
    * `max`, the evicted value's persisted state released via `onEvict`.
    * A long-lived session touching many corpora keeps at most `max`
    * indexes pinned instead of accumulating every one forever. */
  private[graft] final class LruMemo[K, V](max: Int, onEvict: V => Unit) {
    private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean = {
        val evict = this.size() > max
        if (evict) onEvict(e.getValue)
        evict
      }
    }
    def getOrBuild(key: K)(build: => V): V = {
      synchronized {
        val hit = m.get(key)
        if (hit != null) return hit
      }
      // build OUTSIDE the monitor: a multi-minute index build must not
      // block concurrent hits on other keys. On a lost race the loser's
      // duplicate is released through the same onEvict hook.
      val v = build
      synchronized {
        val raced = m.get(key)
        if (raced != null) { onEvict(v); raced }
        else { m.put(key, v); v }
      }
    }
    def size: Int = synchronized(m.size())
    def contains(key: K): Boolean = synchronized(m.containsKey(key))
  }

  private[graft] val MaxCachedIndexes = 4

  /** Memoized trained IVF index per (session, sf dir) — the deployment
    * shape: the index is built once (a `build_ivf` cost, like the graph
    * projections) and every search reuses it. LRU-bounded at
    * [[MaxCachedIndexes]]; eviction unpersists the assignment table. */
  object IvfCache {
    private val cache =
      new LruMemo[(org.apache.spark.sql.SparkSession, String), IvfIndex](
        MaxCachedIndexes, _.indexed.unpersist(false))
    def index(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
      cache.getOrBuild((spark, dir))(
        ivfBuild(spark.read.parquet(s"$dir/embeddings.parquet")))
    private[graft] def cachedCount: Int = cache.size

    /** Memoized OPENED index: the trained index round-tripped through its
      * parquet persistence ([[saveIndex]]/[[openIndex]]) once per
      * (session, sf dir) — the cold-start deployment shape, where a
      * search job opens a durable index built by an earlier job instead
      * of retraining. Searches over it must hit the persisted in-memory
      * assignment, not a per-search parquet re-scan (plan-asserted in
      * PipelineSpec). */
    private val openedCache =
      new LruMemo[(org.apache.spark.sql.SparkSession, String), IvfIndex](
        MaxCachedIndexes, _.indexed.unpersist(false))
    def opened(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
      openedCache.getOrBuild((spark, dir)) {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_opened_${math.abs(dir.hashCode)}"
        saveIndex(index(spark, dir), root)
        openIndex(spark, root)
      }
    private[graft] def openedCachedCount: Int = openedCache.size

    /** Memoized DEDUP-SCALED index: same build chain, but k grows with
      * the corpus — k = max(16, ⌈√N⌉) — so NEITHER side of the SemDeDup
      * cost is quadratic: the within-cell verify is Σ|cell|² ≈ N·√N and
      * the flat nearest-centroid build is N·k = N·√N — both O(N^1.5),
      * the balanced point (verify ∝ N·(N∕k), build ∝ N·k ⇒ k = √N
      * minimizes the sum), vs N²∕16 verify at the r9 pinned k=16 and
      * N²∕32 build at a fixed-cell-target k (measured 1173 s at sf5).
      * The search indexes keep their recall-gated k=16; dedup gets its
      * own clustering because its scale contract is different. Past
      * ~10⁸ vectors swap in a hierarchical coarse quantizer (two-level
      * k-means, O(N·√k) assignment) — composes without touching
      * [[semanticDedupPairs]]. */
    private val dedupCache =
      new LruMemo[(org.apache.spark.sql.SparkSession, String), IvfIndex](
        MaxCachedIndexes, _.indexed.unpersist(false))
    def dedupIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
      dedupCache.getOrBuild((spark, dir)) {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
        ivfBuild(e, dedupK(e.count()))
      }

    /** Memoized kNN GRAPH over the dedup-scaled index (top-5, nProbe 4 —
      * the registered shape): knn_graph, knn_mutual_rate and
      * knn_label_purity all start from this one frame, so the batch
      * self-search runs once per (session, sf dir) instead of once per
      * caller. The localCheckpoint below is the memo's contract —
      * [[knnGraph]] itself returns a LAZY plan, and caching that would
      * re-run the cell join per caller; eviction needs no unpersist
      * (ContextCleaner reclaims checkpoint blocks). */
    private val knnCache =
      new LruMemo[(org.apache.spark.sql.SparkSession, String), DataFrame](
        MaxCachedIndexes, _ => ())
    def knnGraphFrame(spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame =
      knnCache.getOrBuild((spark, dir)) {
        // materialize eagerly — caching the lazy plan would re-run the
        // cell join + top-k heap per caller
        knnGraph(dedupIndex(spark, dir),
          spark.read.parquet(s"$dir/embeddings.parquet"), 5, 4)
          .localCheckpoint(true)
      }
  }

  /** k for [[IvfCache.dedupIndex]]: ⌈√N⌉, floored at 16 so tiny corpora
    * keep a meaningful clustering. IEEE sqrt/ceil are correctly rounded,
    * so any engine replays the same k from the same N. */
  def dedupK(n: Long): Int =
    math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt

  /** Incrementally extend a trained index with an appended vector batch —
    * the daily-append shape a real pipeline needs: new rows are assigned
    * to the EXISTING centroids via the same broadcast-assignment join
    * (no retrain — the k×dims quantizer is untouched, so saved ADC
    * tables and probe geometry stay valid), and the cell table grows by
    * a union. Also reports a staleness signal: the appended batch's mean
    * assigned-cosine vs the base index's — a drop means the frozen
    * centroids no longer describe the incoming data and a retrain is
    * due. */
  final case class IvfAppended(index: IvfIndex, baseMeanCos: Double,
                               appendedMeanCos: Double) {
    /** ≥0 drop in assignment quality for the appended batch. */
    def staleness: Double = math.max(0d, baseMeanCos - appendedMeanCos)
  }

  /** Mean cosine between each indexed vector and its assigned centroid —
    * the index-quality scalar both sides of the staleness compare use. */
  private def meanAssignedCos(indexed: DataFrame, centroids: DataFrame): Double = {
    // a zero vector's cosine is NaN, and avg PROPAGATES NaN — one bad row
    // would poison both sides of the staleness compare (max(0, NaN) = NaN)
    // and silently disable retrain gates; null it out so avg skips it,
    // the same guard the search paths apply to their score column
    val c = cosineBest(indexed.sparkSession, col("nbv"), col("cv"))
    val r = indexed.join(broadcast(centroids), "cell")
      .agg(avg(when(isnan(c), lit(null)).otherwise(c))).head()
    if (r.isNullAt(0)) 0d else r.getDouble(0)
  }

  /** Extend a trained index with an appended batch (see [[IvfAppended]]).
    *
    * CONSUMES the base index: its persisted assignment table (now
    * duplicated inside the merged one) is unpersisted before returning —
    * otherwise every daily append would leak one full-corpus cache.
    * Callers must hand over an index they own and use only the RETURNED
    * index afterwards; in particular, do NOT pass the shared
    * [[IvfCache]] entry (its persistence would silently vanish and later
    * cached searches would re-scan parquet) — build a private base or
    * evict the cache entry first. */
  def ivfAppend(index: IvfIndex, newVectors: DataFrame): IvfAppended = {
    import org.apache.spark.storage.StorageLevel
    val vecs = newVectors.select(col("vec_id"), dvec(col("embedding")).as("v"))
    // same broadcast nearest-centroid assignment as ivfBuild: k scored
    // rows per vector, folded map-side before the shuffle
    val assigned = vecs.join(broadcast(index.centroids), lit(true))
      .select(col("vec_id"), col("v"), col("cell"),
        cosineBest(newVectors.sparkSession, col("v"), col("cv")).as("s"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("s"), -col("cell"))).as("cell"),
        first(col("v")).as("v"))
      .select(col("vec_id").as("nb"), col("v").as("nbv"), col("cell"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val baseMean = meanAssignedCos(index.indexed, index.centroids)
    val appendedMean = meanAssignedCos(assigned, index.centroids)
    val merged = index.indexed.unionByName(assigned)
      .persist(StorageLevel.MEMORY_AND_DISK)
    merged.count() // materialize before releasing the staging caches
    assigned.unpersist(false)
    // the append CONSUMES the base index: its persisted assignment (6/7
    // of the corpus, now duplicated inside `merged`) is released here —
    // otherwise every append leaks one full-corpus cache until storage
    // memory dies. Callers keep using the returned index.
    index.indexed.unpersist(false)
    IvfAppended(IvfIndex(index.centroids, merged, index.k), baseMean, appendedMean)
  }

  /** One-row IVF self-maintenance DECISION table — the ANN analog of
    * the fact log's compact-if-needed: every input is an exact integer
    * so any engine replays the verdict bit-for-bit (the §28 doctrine
    * applied to a POLICY, not just a value):
    *  - staleness: per-row centroid-affinity micros (floor(cos·10⁶+½))
    *    summed per side (base vs `isAppended` rows); the "appended mean
    *    dropped more than `stalenessMicro` below the base mean" compare
    *    runs CROSS-MULTIPLIED (sum_base·n_app − sum_app·n_base >
    *    thr·n_base·n_app, DECIMAL(38,0)) — an exact rational compare,
    *    no float division anywhere;
    *  - imbalance: max cell population vs the fair share,
    *    max_cell_n·k > `imbalanceFactor`·n_vectors (integers);
    *  - rebuild = stale OR imbalanced.
    * Columns: (n_vectors, n_cells, max_cell_n, n_base, sum_base_mu,
    * n_app, sum_app_mu, stale, imbalanced, rebuild).
    * Scale shape: one broadcast join (k centroid rows) + two
    * map-side-combined aggregations — rows out = 1. */
  def ivfHealth(index: IvfIndex, isAppended: Column,
                stalenessMicro: Long = 20000L,
                imbalanceFactor: Long = 4L): DataFrame = {
    val spark = index.indexed.sparkSession
    val dec = "decimal(38,0)"
    val aff = index.indexed
      .join(broadcast(index.centroids), Seq("cell"))
      .select(
        floor(cosineBest(spark, col("nbv"), col("cv")) * 1e6 + 0.5)
          .cast("long").as("cos_mu"),
        isAppended.as("app"))
    val sides = aff.agg(
      sum(when(!col("app"), 1L).otherwise(0L)).cast("long").as("n_base"),
      sum(when(!col("app"), col("cos_mu")).otherwise(0L).cast(dec))
        .cast("long").as("sum_base_mu"),
      sum(when(col("app"), 1L).otherwise(0L)).cast("long").as("n_app"),
      sum(when(col("app"), col("cos_mu")).otherwise(0L).cast(dec))
        .cast("long").as("sum_app_mu"))
    val cells = index.indexed.groupBy(col("cell"))
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).cast("long").as("n_cells"),
        max(col("cnt")).cast("long").as("max_cell_n"))
    // 1×1 join of two single-row aggregates (the packInvariants BNLJ-by-
    // design shape, allowlisted in PlanInvariantsSpec)
    val stale =
      (col("sum_base_mu").cast(dec) * col("n_app") -
        col("sum_app_mu").cast(dec) * col("n_base")) >
        (lit(stalenessMicro).cast(dec) * col("n_base") * col("n_app"))
    sides.crossJoin(cells)
      .select(
        (col("n_base") + col("n_app")).cast("long").as("n_vectors"),
        col("n_cells"), col("max_cell_n"),
        col("n_base"), col("sum_base_mu"), col("n_app"), col("sum_app_mu"),
        stale.as("stale"),
        (col("max_cell_n") * index.k >
          lit(imbalanceFactor) * (col("n_base") + col("n_app")))
          .as("imbalanced"))
      .withColumn("rebuild", col("stale") || col("imbalanced"))
  }

  /** Self-maintaining index policy: consult [[ivfHealth]] and RETRAIN
    * the coarse quantizer from the index's own rows when the verdict
    * says so (the fact log's compactIfNeeded shape — the caller holds
    * whatever index comes back and never tracks drift manually).
    * Returns (index, rebuilt). On rebuild the old assignment cache is
    * released (the [[ivfAppend]] ownership contract: pass an index you
    * own, use only the returned one). */
  def ivfMaintain(index: IvfIndex, isAppended: Column,
                  stalenessMicro: Long = 20000L,
                  imbalanceFactor: Long = 4L,
                  iters: Int = 3): (IvfIndex, Boolean) = {
    val verdict = ivfHealth(index, isAppended, stalenessMicro, imbalanceFactor)
      .select(col("rebuild")).head().getBoolean(0)
    if (!verdict) (index, false)
    else {
      val corpus = index.indexed
        .select(col("nb").as("vec_id"), col("nbv").as("embedding"))
      val rebuilt = ivfBuild(corpus, index.k, iters)
      index.indexed.unpersist(false)
      (rebuilt, true)
    }
  }

  /** The FAISS-style IVF+PQ composition — IVF PRUNES (each query scans
    * only its nProbe cells' members), PQ COMPRESSES (the scan reads byte
    * codes, not raw vectors): at 100 TB the candidate store is
    * cells × codes, small enough for RAM, and the raw vectors are
    * touched only for the final exact re-rank of the shortlist. The ADC
    * join gains a `cell ∈ probed(q)` semi-join from the IVF assignment;
    * everything else is [[pqTopK]]'s shape. Recall compounds the two
    * stages' losses (gated in PipelineSpec on the worst-case corpus). */
  def ivfPqTopK(index: IvfIndex, codes: DataFrame, cb: PqCodebooks,
                corpus: DataFrame, queries: DataFrame, topK: Int = 10,
                nProbe: Int = 10, shortlist: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.partitionBy(col("q")).orderBy(col("s").desc, col("cell"))
    val probed = broadcast(queries
      .select(col("vec_id").as("q"), dvec(col("embedding")).as("qv"))
      .join(broadcast(index.centroids), lit(true))
      .select(col("q"), col("cell"), cosineBest(queries.sparkSession, col("qv"), col("cv")).as("s"))
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= nProbe)
      .select(col("q").as("qid"), col("cell")))
    // candidate codes: members of any probed cell for that query
    val candidates = index.indexed
      .select(col("nb").as("vec_id"), col("cell"))
      .join(probed, "cell")
      .select(col("qid"), col("vec_id"))
    val narrowed = codes.join(candidates, "vec_id")
    // ADC over the narrowed (qid, vec_id) pairs, then exact re-rank —
    // same table join as pqTopK but scoped per query
    val qvecs = queries
      .select(col("vec_id").as("qid"), normalized(dvec(col("embedding"))).as("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("v"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val table = broadcast(qvecs.flatMap { case (qid, q) =>
      cb.books.zipWithIndex.flatMap { case (bk, j) =>
        val qj = q.slice(j * cb.subDim, (j + 1) * cb.subDim)
        bk.zipWithIndex.map { case (c, code) =>
          (qid, j, code, adcWeight(qj.zip(c).map { case (a, b) => a * b }.sum))
        }
      }
    }.toSeq.toDF("qid", "sub", "code", "w"))
    val scored = narrowed
      .select(col("qid"), col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(table, Seq("qid", "sub", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("w")).as("adc"))
      .where(col("qid") =!= col("vec_id"))
    val adc = groupedTopK(scored, "qid", "vec_id", "adc", shortlist)
    adc.select(col("qid"), col("vec_id"))
      .join(corpus.select(col("vec_id"), dvec(col("embedding")).as("cv")), "vec_id")
      .join(broadcast(queries.select(col("vec_id").as("qid"),
        dvec(col("embedding")).as("qv"))), "qid")
      .select(col("qid"), col("vec_id"), cosineBest(queries.sparkSession, col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= topK)
      .select(col("qid"), col("vec_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Memoized PQ codebooks + encoded corpus per (session, sf dir) — same
    * deployment shape as [[IvfCache]]: train + encode once (`build_pq`),
    * every ADC search reuses the codes. */
  object PqCache {
    private val cache =
      new LruMemo[(org.apache.spark.sql.SparkSession, String), (PqCodebooks, DataFrame)](
        MaxCachedIndexes, { case (_, codes) => codes.unpersist(false) })
    def get(spark: org.apache.spark.sql.SparkSession, dir: String): (PqCodebooks, DataFrame) =
      cache.getOrBuild((spark, dir)) {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val cb = pqTrain(emb)
        val codes = pqEncode(emb, cb)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.count()
        (cb, codes)
      }
    private[graft] def cachedCount: Int = cache.size
  }

  /** Persist a trained PQ index (codebooks + encoded corpus) as parquet —
    * the durable-artifact path for the compressed store, parallel to the
    * IVF [[saveIndex]]: a 100 TB corpus is encoded once and every later
    * ADC job opens the byte codes instead of re-training. Codebooks
    * flatten to (sub, code, cv) rows; m/subDim/k are recovered from the
    * table shape on open. */
  def pqSave(cb: PqCodebooks, codes: DataFrame, root: String): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    cb.books.zipWithIndex.flatMap { case (bk, j) =>
      bk.zipWithIndex.map { case (c, code) => (j, code, c) }
    }.toSeq.toDF("sub", "code", "cv")
      .write.mode("overwrite").parquet(s"$root/codebooks")
    codes.write.mode("overwrite").parquet(s"$root/codes")
  }

  def pqOpen(spark: org.apache.spark.sql.SparkSession,
             root: String): (PqCodebooks, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    val flat = spark.read.parquet(s"$root/codebooks")
      .orderBy(col("sub"), col("code")).collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Double]]("cv").toSeq))
    require(flat.nonEmpty, s"pqOpen: no codebooks at $root")
    val m = flat.map(_._1).max + 1
    val k = flat.map(_._2).max + 1
    val books = flat.groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
    require(books.length == m && books.forall(_.length == k),
      s"pqOpen: ragged codebook table at $root")
    // codes persisted in memory like PqCache's build path: ADC searches
    // over an opened index must not re-scan parquet per query batch
    val codes = spark.read.parquet(s"$root/codes")
      .persist(StorageLevel.MEMORY_AND_DISK)
    (PqCodebooks(m, books.head.head.length, k, books), codes)
  }

  /** Per-label centroids via the native `graft_vec_mean`
    * TypedImperativeAggregate when the graft extension is loaded: ONE
    * running (count, sums[dims]) buffer per group, combined map-side and
    * shuffled as 16 + 8·dims bytes per (partition, group). The
    * posexplode + regroup fallback shuffles rows×dims (position, value)
    * pairs — at 100 TB that is the difference between shuffling 10¹²
    * exploded rows and |groups|·|partitions| small buffers. */
  def labelCentroidVectors(emb: DataFrame): DataFrame = {
    require(graft.functions.GraftExtensions.loadedIn(emb.sparkSession),
      "labelCentroidVectors needs the graft session extension (graft_vec_mean)")
    emb.select(col("label"), dvec(col("embedding")).as("v"))
      .groupBy(col("label"))
      .agg(call_function("graft_vec_mean", col("v")).as("centroid"))
  }

  /** Per-label centroid norms; native-aggregate path when available (see
    * [[labelCentroidVectors]]), posexplode + regroup composition
    * otherwise. Both paths hash-check against the same DuckDB oracle
    * (`label_centroids`). */
  def labelCentroids(emb: DataFrame): DataFrame =
    if (graft.functions.GraftExtensions.loadedIn(emb.sparkSession))
      labelCentroidVectors(emb)
        .select(col("label"),
          round(sqrt(aggregate(transform(col("centroid"), x => x * x),
            lit(0d), (acc, e) => acc + e)), 4).as("centroid_norm"))
    else
      emb.select(col("label"), posexplode(dvec(col("embedding"))).as(Seq("i", "x")))
        .groupBy(col("label"), col("i")).agg(avg(col("x")).as("m"))
        .groupBy(col("label")).agg(round(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"))

  // ---------------------------------------------------------------------
  // Product quantization: the MEMORY side of 100 TB ANN. IVF prunes the
  // candidate set; PQ shrinks each vector from dims×4 bytes to m byte
  // codes (here 64 floats → 8 codes, 32×), so the candidate store fits
  // in RAM at corpus sizes where raw vectors cannot. Search is ADC
  // (asymmetric distance): the query stays exact, each candidate scores
  // as Σ_j table[j][code_j] via one equi-join against the broadcast
  // per-query lookup table — no crossJoin, no per-row UDF.
  // ---------------------------------------------------------------------

  /** Per-subspace codebooks: books(j)(c) is the sub-centroid for code c
    * of subspace j. Vectors are L2-normalized before training/encoding so
    * inner-product ADC approximates cosine. */
  final case class PqCodebooks(m: Int, subDim: Int, k: Int,
                               books: Array[Array[Seq[Double]]])

  private def normalized(v: Column): Column = {
    val n = sqrt(aggregate(transform(v, x => x * x), lit(0d), (a, e) => a + e))
    transform(v, x => x / n)
  }

  /** Exploded (vec_id, sub, sv) sub-vectors of a normalized corpus. */
  private def subVectors(corpus: DataFrame, m: Int, subDim: Int): DataFrame =
    corpus.select(col("vec_id"), normalized(dvec(col("embedding"))).as("v"))
      .select(col("vec_id"), explode(transform(sequence(lit(0), lit(m - 1)),
        j => struct(j.cast("int").as("sub"),
          slice(col("v"), j * subDim + 1, lit(subDim)).as("sv")))).as("e"))
      .select(col("vec_id"), col("e.sub"), col("e.sv"))

  private def bookDF(spark: org.apache.spark.sql.SparkSession,
                     books: Array[Array[Seq[Double]]]): DataFrame = {
    import spark.implicits._
    broadcast(books.zipWithIndex.flatMap { case (bk, j) =>
      bk.zipWithIndex.map { case (c, code) => (j, code, c) }
    }.toSeq.toDF("sub", "code", "cv"))
  }

  /** L2 distance², composable over sub-vectors. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0d), (acc, e) => acc + e)

  /** Train per-subspace codebooks: ONE set of Spark jobs trains all m
    * subspaces together (the exploded sub-vector table carries the
    * subspace id, so assignment and the mean update are ordinary grouped
    * aggregations over it). Deterministic: sampled rows + lowest-id
    * init, no RNG. Codebook state on the driver is m×k×subDim doubles —
    * the same k-means-scale state IvfBuild already holds. */
  def pqTrain(corpus: DataFrame, m: Int = 8, k: Int = 16,
              iters: Int = 3): PqCodebooks = {
    import org.apache.spark.storage.StorageLevel
    val spark = corpus.sparkSession
    val subDim = {
      val d = corpus.select(size(col("embedding"))).head().getInt(0)
      require(d % m == 0, s"dims $d not divisible by m=$m")
      d / m
    }
    // deterministic sample — but an id space that misses the residue
    // class (or keeps < k ids) must fall back to the full corpus rather
    // than silently training empty codebooks
    val sampled = corpus.where(pmod(col("vec_id"), lit(5)) === 0)
    val trainSrc =
      if (sampled.select(col("vec_id")).distinct().limit(k).count() < k) corpus
      else sampled
    val sub = subVectors(trainSrc, m, subDim)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // init: the sub-vectors of the k lowest sampled vec_ids, per subspace
    val initIds = sub.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(k)
    var books: Array[Array[Seq[Double]]] = sub.join(initIds, "vec_id")
      .orderBy(col("sub"), col("vec_id")).collect()
      .groupBy(_.getInt(1)).toArray.sortBy(_._1)
      .map(_._2.map(_.getAs[scala.collection.Seq[Double]]("sv").toSeq))
    require(books.length == m && books.forall(_.length == k),
      s"pqTrain: corpus too small to seed $m×$k codebooks " +
        s"(got ${books.length} subspaces × ${books.headOption.map(_.length).getOrElse(0)} codes)")
    (1 to iters).foreach { _ =>
      val means = sub.join(bookDF(spark, books), "sub")
        .select(col("sub"), col("vec_id"), col("code"), col("sv"),
          l2sq(col("sv"), col("cv")).as("d"))
        .groupBy(col("sub"), col("vec_id"))
        .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"),
          first(col("sv")).as("sv"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy(col("sub"), col("code"), col("i")).agg(avg(col("x")).as("mu"))
        .groupBy(col("sub"), col("code"))
        .agg(map_from_entries(collect_list(struct(col("i"), col("mu")))).as("mm"))
        .collect().map { r =>
          val mm = r.getAs[Map[Int, Double]]("mm")
          (r.getInt(0), r.getInt(1)) -> (0 until mm.size).map(mm)
        }.toMap
      books = books.zipWithIndex.map { case (bk, j) =>
        bk.zipWithIndex.map { case (c, code) => means.getOrElse((j, code), c) }
      }
    }
    sub.unpersist(false)
    PqCodebooks(m, subDim, k, books)
  }

  /** Encode: (vec_id, codes array<int> of length m) — nearest sub-
    * centroid per subspace via the broadcast codebook equi-join. */
  def pqEncode(corpus: DataFrame, cb: PqCodebooks): DataFrame =
    subVectors(corpus, cb.m, cb.subDim)
      .join(bookDF(corpus.sparkSession, cb.books), "sub")
      .select(col("vec_id"), col("sub"), col("code"),
        l2sq(col("sv"), col("cv")).as("d"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(col("vec_id"), transform(col("sc"), e => e("code")).as("codes"))

  /** ADC top-k with exact re-rank: score every encoded vector as
    * Σ_j dot(q_j, book_j[code_j]) via one (sub, code) equi-join against
    * the broadcast per-query table, shortlist `shortlist` candidates per
    * query (grouped top-k, partial limit below the shuffle), then
    * exact-cosine re-rank only the shortlist against the raw vectors.
    * Returns (qid, vec_id, cos, rank ≤ topK). */
  def pqTopK(corpus: DataFrame, codes: DataFrame, cb: PqCodebooks,
             queries: DataFrame, topK: Int = 10,
             shortlist: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    // per-query ADC lookup table, built driver-side from the (small)
    // query batch: |Q|×m×k rows, broadcast
    val qvecs = queries
      .select(col("vec_id").as("qid"), normalized(dvec(col("embedding"))).as("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("v"))
    val table = broadcast(qvecs.flatMap { case (qid, q) =>
      cb.books.zipWithIndex.flatMap { case (bk, j) =>
        val qj = q.slice(j * cb.subDim, (j + 1) * cb.subDim)
        bk.zipWithIndex.map { case (c, code) =>
          (qid, j, code, adcWeight(qj.zip(c).map { case (a, b) => a * b }.sum))
        }
      }
    }.toSeq.toDF("qid", "sub", "code", "w"))
    val scored = codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(table, Seq("sub", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("w")).as("adc"))
      .where(col("qid") =!= col("vec_id"))
    // two-phase shortlist: bounded-heap partials truncate per partition
    // before the per-qid exchange — no global per-query reducer sort
    val adc = groupedTopK(scored, "qid", "vec_id", "adc", shortlist)
    adc.select(col("qid"), col("vec_id"))
      .join(corpus.select(col("vec_id"), dvec(col("embedding")).as("cv")), "vec_id")
      .join(broadcast(queries.select(col("vec_id").as("qid"),
        dvec(col("embedding")).as("qv"))), "qid")
      .select(col("qid"), col("vec_id"), cosineBest(queries.sparkSession, col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= topK)
      .select(col("qid"), col("vec_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /**
   * SemDeDup-style semantic near-duplicate pairs: cluster the corpus with
   * the (already-trained) IVF coarse quantizer, then exact-verify cosine
   * only WITHIN each cell — (a, b, cell, sim) with a < b and sim ≥
   * `threshold`.
   *
   * This is the embedding-dedup shape that survives 100 TB when even the
   * banded-LSH self-join gets expensive: the candidate set is a self
   * equi-join on the cell id, so pair work is Σ|cell|² instead of
   * |corpus|² — with k cells of balanced size that is |corpus|²/k, and k
   * grows with the corpus (the index is the same one ANN search already
   * maintains, so the clustering is free). Cross-cell near-dups are
   * deliberately out of contract (the SemDeDup trade: a pair whose
   * vectors quantize to different cells is below the dedup bar in
   * practice); the oracle replays the SAME assignment, so the contract
   * is exact on both sides.
   */
  def semanticDedupPairs(index: IvfIndex, threshold: Double): DataFrame = {
    val l = index.indexed.select(col("cell"), col("nb").as("a"), col("nbv").as("av"))
    val r = index.indexed.select(col("cell"), col("nb").as("b"), col("nbv").as("bv"))
    l.join(r, Seq("cell")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("cell").cast("long").as("cell"),
        cosineBest(index.indexed.sparkSession, col("av"), col("bv")).as("sim"))
      .where(col("sim") >= threshold)
      .select(col("a"), col("b"), col("cell"), round(col("sim"), 4).as("sim"))
  }

  /**
   * Johnson–Lindenstrauss random projection to `outDims` dimensions with
   * the shared md5-derived ±1 Rademacher matrix ([[graft.functions
   * .Hyperplanes.matrix]], the same family the LSH signatures use —
   * Achlioptas 2003 shows ±1 entries satisfy the JL lemma):
   * yⱼ = (pⱼ · x) / √outDims.
   *
   * The 100 TB role: dimensionality reduction BEFORE the heavy vector
   * stages — a 64→16 projection cuts every downstream shuffle, cache,
   * and index build 4× while approximately preserving pairwise geometry
   * (measured as `rp_recall`). Pure map-side column arithmetic: the
   * plane matrix is a plan literal, no shuffle, no UDF.
   */
  def randomProject(emb: DataFrame, outDims: Int = 16, dims: Int = 64): DataFrame = {
    val planes = typedlit(graft.functions.Hyperplanes.matrix(outDims, dims)
      .map(_.toSeq).toSeq)
    val scale = math.sqrt(outDims.toDouble)
    emb.select(col("vec_id"), transform(planes, p =>
        aggregate(zip_with(dvec(col("embedding")), p, (x, w) => x * w),
          lit(0d), (acc, x) => acc + x) / scale).as("proj"))
  }

  /** [[randomProject]] in long (vec_id, j, value) form — the registered
    * oracle shape (scalar columns hash deterministically; the DuckDB twin
    * re-derives the ±1 matrix from md5 and replays the fold). */
  def randomProjectLong(emb: DataFrame, outDims: Int = 16, dims: Int = 64): DataFrame =
    randomProject(emb, outDims, dims)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "v")))
      .select(col("vec_id"), col("j").cast("long").as("j"), round(col("v"), 4).as("v"))

  /**
   * Maximal-marginal-relevance re-ranking: from a bounded ANN shortlist,
   * greedily pick `k` results that balance query relevance against
   * redundancy with what's already picked —
   * argmax over remaining d of λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)
   * (Carbonell & Goldstein 1998), ties → lowest id; the first pick is
   * pure relevance (empty S ⇒ zero penalty). The training-data use is
   * retrieval WITHOUT redundancy: k near-identical neighbors carry one
   * document's worth of signal.
   *
   * Shape: the DISTRIBUTED work is the shortlist itself (brute force
   * here; any registered ANN path at scale). The greedy loop runs
   * driver-side over shortlist² rounded similarities — bounded by
   * construction (20² doubles), the same query-time footprint as the
   * PQ ADC table. All similarities are rounded to 4 decimals BEFORE
   * the objective so both engines make every pick from identical
   * numbers; the objective itself is then deterministic double math.
   */
  def mmrRerank(corpus: DataFrame, query: DataFrame, k: Int = 5,
                shortlist: Int = 20, lambda: Double = 0.7): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // objectives combine 4-decimal inputs with λ∕(1−λ) weights — exact
    // 5-decimal rationals whose round-4 HALF-POINTS the two engines
    // resolve differently by algorithm; rounding at 5 lands ON the grid
    def r5(x: Double): Double =
      BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val simQ = bruteForceTopK(corpus, query, shortlist).collect()
      .map(r => r.getAs[Long]("nb") -> r.getAs[Double]("sim")).toMap // pre-rounded
    val ids = simQ.keys.toSeq.sorted
    val vecs = corpus.where(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), dvec(col("embedding")).as("v")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("v").toArray).toMap
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val pair = (for { a <- ids; b <- ids if a != b }
      yield (a, b) -> r4(cosD(vecs(a), vecs(b)))).toMap
    var sel = Vector.empty[(Int, Long, Double)]
    (1 to math.min(k, ids.length)).foreach { step =>
      val chosen = sel.map(_._2).toSet
      val best = ids.filterNot(chosen)
        .map { d =>
          val pen = if (chosen.isEmpty) 0d else chosen.map(s => pair((d, s))).max
          d -> r5(lambda * simQ(d) - (1 - lambda) * pen)
        }
        .minBy { case (d, score) => (-score, d) }
      sel :+= ((step, best._1, best._2))
    }
    spark.createDataFrame(sel).toDF("step", "vec_id", "score")
      .select(col("step").cast("long").as("step"), col("vec_id"), col("score"))
  }

  /**
   * Per-dimension standardization (whitening without rotation):
   * zᵢ = (xᵢ − μᵢ) ∕ σᵢ with population μ/σ over the corpus — the
   * embedding-preprocessing pass before distance-based stages (k-means
   * and cosine thresholds behave badly when a few dimensions dominate
   * the variance). Returns long-form (vec_id, i, z).
   *
   * Determinism contract (round 10, replacing the r9 driver FAIL):
   * inputs are quantized onto the 1∕`scale` grid (xq = ⌊x·scale + ½⌋,
   * well inside the synthesized embeddings' precision) and μ/σ derive
   * from EXACT integer sums Σxq, Σxq² — independent of partition count
   * and summation order, so any engine replaying the integer chain
   * lands on bit-identical doubles before the final round(z, 4). The
   * old float path let Spark's and DuckDB's summation orders disagree
   * in μ's last ulps, and round(z, 4) flipped values on the 5·10⁻⁵
   * grid edge — an order-dependent contract, i.e. not a contract.
   *
   * Shape: the quantized posexplode feeds a hash groupBy(i) whose
   * map-side partials fold each partition to dims rows BEFORE the
   * shuffle — shuffle volume is partitions×dims, independent of corpus
   * size — and the dims-sized stats table broadcasts back onto the
   * exploded corpus. Σxq² stays inside Long for ~10⁹ rows at the
   * default scale (|x| ≤ 1 ⇒ xq² ≤ 10⁸). Constant-variance dimensions
   * pass through centered (σ = 0 ⇒ z = x − μ, not NaN).
   */
  /**
   * Per-source embedding drift: cosine between each source's centroid
   * and the corpus centroid — the embedding-space twin of the token
   * χ² audit (a vendor feed whose VECTORS point elsewhere is drifted
   * even when its token mix looks fine).
   *
   * Exactness (§28 doctrine, the assortativity pattern): inputs
   * quantize to integers (×`scale`), per-(source, dim) Σxq is exact in
   * any order, and the global per-dim sums re-aggregate from those. The
   * cosine of the two rational centroids REDUCES to integer sums — the
   * n·scale denominators cancel in the ratio — so
   * cos = Σ s1ᵢ·g1ᵢ ∕ (√Σ s1ᵢ² · √Σ g1ᵢ²) runs in DECIMAL(38) (the
   * cross-products pass 2⁶³ at large corpora) up to ONE final double
   * expression, identical on both engines. No float ever folds over an
   * engine-ordered list.
   *
   * Plan shape: one corpus posexplode → (source, dim)-keyed integer
   * aggregation (map-side partials; shuffle = sources × dims rows) →
   * dims-keyed equi-join of the two sum tables → #sources-row result.
   */
  def sourceEmbeddingDrift(emb: DataFrame, docs: DataFrame,
                           scale: Long = 10000L): DataFrame = {
    val s = scale.toDouble
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val q = emb
      .join(docs.select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .select(col("source"), posexplode(dvec(col("embedding"))).as(Seq("i", "x")))
      .select(col("source"), col("i").cast("long").as("i"),
        floor(col("x") * s + lit(0.5d)).cast("long").as("xq"))
    // sources × dims rows; persisted so the global re-aggregation and
    // the norm branch reuse it instead of re-exploding the corpus
    val perDim = q.groupBy(col("source"), col("i"))
      .agg(sum(col("xq")).as("s1"), count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val glob = perDim.groupBy(col("i")).agg(sum(col("s1")).as("g1"))
    val bb = glob.agg(sum(dec(col("g1")) * dec(col("g1"))).as("bb"))
    val res = perDim.join(broadcast(glob), "i")
      .groupBy(col("source"))
      .agg(sum(dec(col("s1")) * dec(col("g1"))).as("dd"),
        sum(dec(col("s1")) * dec(col("s1"))).as("aa"),
        max(col("n")).cast("long").as("n_vecs"))
      .crossJoin(broadcast(bb))
      .select(col("source"), col("n_vecs"),
        round(col("dd").cast("double") /
          (sqrt(col("aa").cast("double")) * sqrt(col("bb").cast("double"))), 6)
          .as("cos_to_global"))
    val out = res.localCheckpoint(true)
    perDim.unpersist(false)
    out
  }

  /** Topic-mix audit: the (source, label) contingency of the labeled
    * embedding set — what each feed actually contains, by cluster/topic
    * label. One (source, label)-keyed count plus a #sources-row total
    * join; pct is integers up to one division (round 4). The per-source
    * rows are the input to [[graft.pipeline.TextOps.quotaApportion]]-
    * style re-balancing when a feed's topic mix is off. */
  def sourceLabelMix(emb: DataFrame, docs: DataFrame): DataFrame = {
    val joined = emb.select(col("vec_id"), col("label"))
      .join(docs.select(col("doc_id").as("vec_id"), col("source")), "vec_id")
    val counts = joined.groupBy(col("source"), col("label"))
      .agg(count(lit(1)).cast("long").as("n"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("n")).cast("long").as("total"))
    counts.join(broadcast(totals), "source")
      .select(col("source"), col("label").cast("long").as("label"), col("n"),
        round(col("n").cast("double") / col("total"), 4).as("pct"))
  }

  /**
   * Embedding OUTLIER screen — the data-cleaning pass that surfaces
   * mislabeled/corrupted vectors before they poison contrastive
   * training: per label, the top-k vectors FARTHEST from their own
   * label centroid.
   *
   * §28 exact-integer contract end to end: coordinates quantize to the
   * 1e-4 grid (xq = ⌊x·10⁴ + ½⌋, the standardize doctrine), and the
   * ranking key is the count-scaled squared distance
   * c²·d² = Σ_i (c·xq_i − N_i)² where N_i = Σ xq_i over the label — an
   * exact DECIMAL(38,0) (c·xq² wraps BIGINT past the sf5 regime), so
   * the per-label ordering is bit-identical in any engine; ties break
   * by vec_id. `dist` (= √(c²d²)∕c∕10⁴, the de-scaled Euclidean
   * distance) is the one shared double expression, emitted rounded.
   *
   * Shape: centroid numerators via ONE (label, i) map-side-combined
   * aggregation (labels×dims partial rows per partition), broadcast
   * back (labels×dims table), per-vector integer fold, then a
   * label-PARTITIONED row_number cut — no global sort, no pair joins.
   */
  def embeddingOutliers(emb: DataFrame, k: Int = 5): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = emb
      .select(col("vec_id"), col("label"),
        posexplode(dvec(col("embedding"))).as(Seq("i", "x")))
      .select(col("vec_id"), col("label"), col("i"),
        floor(col("x") * lit(10000d) + lit(0.5d)).cast("long").as("xq"))
    val cent = q.groupBy(col("label"), col("i"))
      .agg(sum(col("xq")).cast(d38).as("ni"), count(lit(1)).as("c"))
    val d2 = q.join(broadcast(cent), Seq("label", "i"))
      .select(col("vec_id"), col("label"), col("c"),
        ((col("c").cast(d38) * col("xq") - col("ni")) *
          (col("c").cast(d38) * col("xq") - col("ni"))).as("term"))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(col("c")).as("c"), sum(col("term")).as("d2"))
    import org.apache.spark.sql.expressions.Window
    d2.withColumn("rnk", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("d2").desc, col("vec_id"))))
      .where(col("rnk") <= k)
      .select(col("label").cast("long").as("label"), col("vec_id"),
        col("rnk").cast("long").as("rnk"),
        round(sqrt(col("d2").cast("double")) / col("c") / lit(10000.0), 6)
          .as("dist"))
  }

  def standardize(emb: DataFrame, scale: Long = 10000L): DataFrame = {
    require(scale > 0, "scale must be positive")
    val s = scale.toDouble
    val q = emb
      .select(col("vec_id"), posexplode(dvec(col("embedding"))).as(Seq("i", "x")))
      .select(col("vec_id"), col("i").cast("long").as("i"),
        floor(col("x") * s + lit(0.5d)).cast("long").as("xq"))
    val m = col("s1").cast("double") / col("n") / s
    // Σxq and Σxq² carried in DECIMAL(38,0): xq² ≈ 10¹⁰ per row wraps a
    // Long sum past ~10⁹ vectors per dim — the 100× regime — and
    // non-ANSI Spark wraps silently (the DuckDB twin's BIGINT sums
    // widen to HUGEINT natively, so only this side needed the cast)
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val xq = col("xq").cast(d18)
    val stats = q.groupBy(col("i"))
      .agg(sum(xq).as("s1"), sum(xq * xq).as("s2"),
        count(lit(1)).as("n"))
      .select(col("i"), m.as("m"),
        sqrt(greatest(lit(0d),
          col("s2").cast("double") / col("n") / (s * s) - m * m)).as("sd"))
    q.join(broadcast(stats), "i")
      .select(col("vec_id"), col("i"),
        round(when(col("sd") > 0d, (col("xq") / s - col("m")) / col("sd"))
          .otherwise(col("xq") / s - col("m")), 4).as("z"))
  }
}
