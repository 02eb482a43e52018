package graft.gx

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.snapshot.Snapshot

/**
 * HyperANF-style neighborhood function over the label-filtered
 * snapshot graph (Boldi, Rosa & Vigna, "HyperANF: Approximating the
 * Neighbourhood Function of Very Large Graphs on a Budget", WWW 2011):
 * every vertex carries an m=64-register HyperLogLog sketch of its
 * OUT-ball, grown one hop per round by merging (register-wise max) the
 * sketches of its out-neighbours. The per-vertex estimate after round
 * h equals the HLL estimate of the EXACT ball(v, h) membership —
 * register state is a pure deterministic function of the ball set and
 * the hash — which is what makes a full hash oracle possible: the
 * DuckDB twin derives the exact balls from the order DAG's closed-form
 * level structure (the `shortest_paths` trick, Ctes.spDagCtes family),
 * hashes each member with the same md5 recipe, and replays the same
 * integer estimator bit-for-bit.
 *
 * Scale shape (the reason this operator exists at 100 TB): the exact
 * neighbourhood function needs |ball| DISTINCT members per vertex —
 * Σ_v |ball(v,h)| rows, quadratic-ish on dense graphs — while this
 * path carries at most m=64 sparse register rows per vertex. Each
 * round is ONE equi-join of the edge list against the register
 * relation plus ONE map-side-combined max-aggregate; message volume is
 * ≤ 64·|V| rows regardless of ball sizes. No GraphX, no RDD hop: the
 * whole fixpoint is relational and stays in Tungsten.
 *
 * Engine-exact estimator contract (the §28 doctrine applied to a
 * SKETCH): raw HLL E = α₆₄·m²·2³⁰·10⁶ / Q with Q = Σ_j 2^(30−M_j)
 * (empty registers contribute 2³⁰), α₆₄ pinned at 709/1000 — a single
 * long division, no float path. The standard small-range correction
 * (linear counting m·ln(m/V) when V>0 and E ≤ 2.5·m) is applied from a
 * PINNED 64-entry integer table computed once on the JVM and
 * interpolated into BOTH engines' plans, so the branch and the value
 * are bit-identical everywhere.
 */
object HyperAnf {

  /** Register count m (b=6 ⇒ σ ≈ 1.04/√64 ≈ 13% per-vertex). */
  val M = 64

  /** rho cap: 28 hex chars of md5 tail never exceed 113 leading-zero
    * bits, but registers beyond 30 are astronomically unlikely and a
    * fixed cap keeps 2^(30−M_j) a plain long in both engines. */
  val RhoCap = 30

  /** α₆₄·m²·2³⁰·10⁶ scaled to avoid floats: 709·4096·2³⁰·1000
    * (α₆₄ = 0.7213/(1+1.079/64) ≈ 0.70927, pinned at 709/1000).
    * ≈ 3.12e18 — inside long range; est_micros = this DIV Q. */
  val RawNumerMicros: Long = (709L * 4096L << 30) * 1000L

  /** Linear-counting switch threshold in micros: E_raw ≤ 2.5·m. */
  val LcThresholdMicros: Long = 160L * 1000000L

  /** Pinned linear-counting table: LcMicros(V−1) = ⌊m·ln(m/V)·10⁶⌋ for
    * V = 1..64 empty registers. Computed ONCE here and interpolated
    * into both the Spark plan and the DuckDB twin SQL — the float ln
    * never runs per-row in either engine. */
  val LcMicros: IndexedSeq[Long] =
    (1 to M).map(v => math.floor(M * math.log(M.toDouble / v) * 1e6).toLong)

  /** Default label set: the order DAG
    * customer -placed-> order -contains-> part -supplied_by-> supplier
    * (same closed-form-replayable structure as shortestPathsDF). */
  val DagLabels: Seq[String] = Seq("placed", "contains", "supplied_by")

  // ---- register derivation (shared recipe, mirrored by the twin) ----

  /** md5 hex of the vertex id rendered as a decimal string — both
    * engines render BIGINT→string identically. */
  private def hexOf(v: Column): Column = md5(v.cast("string"))

  /** Register index j ∈ [0, 64): first 2 hex chars (8 bits) mod 64. */
  private def regIndex(hex: Column): Column =
    (conv(substring(hex, 1, 2), 16, 10).cast("int") % M).as("j")

  /** rho = leading-zero bits of the 28-hex-char tail + 1, capped.
    * Computed from the HEX STRING (strip leading '0' chars, then a
    * 4-way case on the first surviving digit) so DuckDB replays it
    * with the same string ops — no 64-bit unsigned parse needed. */
  private def rho(hex: Column): Column = {
    val tail = substring(hex, 3, 28)
    val strip = regexp_replace(tail, "^0+", "")
    val first = substring(strip, 1, 1)
    val lzd = when(first === "1", 3)
      .when(first.isin("2", "3"), 2)
      .when(first.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(length(strip) === 0, RhoCap)
      .otherwise(least((lit(28) - length(strip)) * 4 + lzd + 1, lit(RhoCap)))
      .cast("int").as("m")
  }

  // ---- the fixpoint ----

  /** Memoized per-(vertex, hop) estimates — `hyperanf` and
    * `effective_diameter` share one propagation (the spCache
    * discipline). Eviction FREES the evicted frame's checkpoint blocks
    * (the Ranks.pin release rule — an eager localCheckpoint the LRU
    * drops without unpersisting leaks one estimate-frame copy per
    * evicted key for the session lifetime; a caller holding an evicted
    * frame fails loudly on the missing block, never silently). */
  private val MaxCached = 8
  private val anfCache =
    new java.util.LinkedHashMap[(Snapshot, Int, Seq[String]), DataFrame](
      16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Snapshot, Int, Seq[String]), DataFrame]): Boolean = {
        val evict = size() > MaxCached
        if (evict) releaseCheckpoint(e.getValue)
        evict
      }
    }

  /** Per-vertex ball-size estimates: (vertex_id, hop, est_micros) for
    * hop = 1..hops, one row per graph vertex per hop (balls include the
    * vertex itself; isolated vertices — no edge endpoint — carry no
    * row, the Graph.fromEdges convention shared with the other
    * analytics). */
  def hyperAnfDF(spark: SparkSession, snap: Snapshot, hops: Int = 3,
                 labels: Seq[String] = DagLabels): DataFrame = {
    val key = (snap, hops, labels)
    val hit = anfCache.synchronized(anfCache.get(key))
    if (hit != null) hit
    else {
      val built = buildAnf(spark, snap, hops, labels)
      anfCache.synchronized {
        val race = anfCache.get(key)
        if (race != null) race
        else { anfCache.put(key, built); built }
      }
    }
  }

  private def buildAnf(spark: SparkSession, snap: Snapshot, hops: Int,
                       labels: Seq[String]): DataFrame = {
    // multi-edges collapse up front: ball membership is a SET, and the
    // distinct halves the per-round join output on lineitem-derived
    // labels (part→supplier repeats per lineitem row)
    val edges = snap.edges.where(col("label").isin(labels: _*))
      .select(col("outV").as("src"), col("inV").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val verts = edges.select(col("src").as("v"))
      .unionAll(edges.select(col("dst").as("v"))).distinct()
    val hex = hexOf(col("v"))
    // round 0: every vertex's sketch holds exactly itself (one sparse row)
    var regs = verts.select(col("v"), regIndex(hex), rho(hex))
      .localCheckpoint(true)
    val perHop = Seq.newBuilder[DataFrame]
    (1 to hops).foreach { h =>
      // ball(v,h) = {v} ∪ ⋃_{v→u} ball(u,h−1): pull neighbours'
      // registers across the edge, fold by register-wise max (map-side
      // combined — the only shuffles per round are this join + agg)
      val pulled = edges.join(regs.withColumnRenamed("v", "dst"), "dst")
        .select(col("src").as("v"), col("j"), col("m"))
      val next = regs.unionAll(pulled)
        .groupBy(col("v"), col("j")).agg(max(col("m")).as("m"))
        .localCheckpoint(true)
      // only round 0 may be freed mid-loop: every later frame is in
      // perHop and its checkpoint blocks back the final union (a
      // localCheckpoint has no lineage to recompute from once released)
      if (h == 1) releaseCheckpoint(regs)
      regs = next
      perHop += next.withColumn("hop", lit(h))
    }
    val hopFrames = perHop.result()
    val lcArray = array(LcMicros.map(lit(_)): _*)
    val est = hopFrames.reduce(_ unionAll _)
      .groupBy(col("v").as("vertex_id"), col("hop"))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${RhoCap} - m)")).as("qp"),
        count(lit(1)).as("cnt"))
      .select(col("vertex_id"), col("hop"),
        (col("qp") + (lit(M.toLong) - col("cnt")) * lit(1L << RhoCap)).as("q"),
        (lit(M.toLong) - col("cnt")).as("v_empty"))
      .select(col("vertex_id"), col("hop"),
        expr(s"CAST($RawNumerMicros AS BIGINT) div q").as("raw"),
        col("v_empty"))
      .select(col("vertex_id"), col("hop"),
        when(col("v_empty") > 0 && col("raw") <= LcThresholdMicros,
          element_at(lcArray, col("v_empty").cast("int")))
          .otherwise(col("raw")).as("est_micros"))
      .localCheckpoint(true)
    hopFrames.foreach(releaseCheckpoint)
    releaseCheckpoint(edges)
    est
  }

  /** Landmark-free effective-diameter summary: N(h) = Σ_v est(v,h)
    * (order-free long sum of deterministic per-vertex integers) and
    * eff_diameter_90 = min h with 10·N(h) ≥ 9·N(hops) — the integer
    * form of the standard 90% effective diameter, replayed exactly by
    * the twin from the same per-vertex estimates. One row. */
  def effectiveDiameterDF(spark: SparkSession, snap: Snapshot, hops: Int = 3,
                          labels: Seq[String] = DagLabels): DataFrame = {
    val est = hyperAnfDF(spark, snap, hops, labels)
    // sums and the ×10/×9 compare run in DECIMAL(38,0) (the
    // assortativity doctrine: a long sum is safe at test SFs but the
    // ×10 compare would wrap first at corpus scale; DuckDB's HUGEINT
    // sum matches exactly); the emitted n_h cast back to long
    val sums = (1 to hops).map(h =>
      sum(when(col("hop") === h, col("est_micros")).otherwise(0L)
        .cast("decimal(38,0)")).as(s"d$h"))
    val row = est.groupBy().agg(sums.head, sums.tail: _*)
    val nH = col(s"d$hops")
    val eff = (1 to hops).foldRight(lit(hops): Column) { (h, elseCol) =>
      when(col(s"d$h") * 10 >= nH * 9, lit(h)).otherwise(elseCol)
    }
    row.select((1 to hops).map(h => col(s"d$h").cast("long").as(s"n$h"))
      :+ eff.as("eff_diameter_90"): _*)
  }

  /** The §18 release discipline (see GraphXTraversal.releaseCheckpoint). */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))
}
