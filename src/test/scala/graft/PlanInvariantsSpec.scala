package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Automated no-all-pairs gate over EVERY registered query: builds each
  * `SparkEntry.queries` plan at sf0.001 and rejects cartesian products
  * anywhere, and nested-loop joins outside the queries that broadcast a
  * tiny side BY DESIGN (brute-force ANN scores a ≤10-row query set against
  * the corpus; IVF/LSH broadcast k-row centroid/band tables). Checkpointed
  * results (LogicalRDD) have already executed their interesting plan —
  * their internals are covered by the per-operator plan assertions and
  * PLANS.md — but they still must not RETURN via a cartesian. */
class PlanInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("no registered query plans a cartesian product; nested loops only by design") {
    val dir = "/root/testdata/sf0.001"
    // BNLJ-by-design: a broadcast of a provably tiny side (query vectors,
    // centroid table, band table) — documented in VectorOps
    // each of these broadcasts a TINY query batch against the corpus
    // (exact-scoring search paths) — the corpus side is never shuffled
    val allowedBnlj = Set("ann_topk", "ann_ivf", "ann_ivf_opened",
      // per-cell audit over the memoized index: the only BNLJ is the
      // index BUILD's k-row centroid broadcast (cached InMemoryRelation,
      // billed as build_ivf); the audit itself is a broadcast hash join
      "ann_ivf_cells",
      // ann_ivf_cells' audit shape over the appended index PLUS the
      // 1×1 join of the two single-row decision aggregates (the
      // packInvariants BNLJ-by-design shape)
      "ann_ivf_health",
      // seven single-row invariant aggregates joined 1×1 (the
      // packInvariants BNLJ-by-design shape over the CDC clustering)
      "cdc_invariants",
      // ann_ivf's probe shape with the allowed-id equi-join added
      "ann_ivf_filtered",
      // NSW rides the memoized kNN graph: the only BNLJ is the graph
      // BUILD's centroid broadcast (billed as build_knn); the walk's
      // own joins are all equi-joins on node/q. The recall twin adds
      // bruteForceTopK's by-design broadcast nested loop (query side
      // tiny — the ann_*_recall shape)
      "ann_nsw", "ann_nsw_recall",
      // the appended-index search broadcasts the same k-row centroid
      // table as ann_ivf (the append assignment itself is a build step)
      "ann_ivf_appended", "ann_lsh",
      "dedup_embedding", "similar_docs",
      // probes the k-row centroid table with the same broadcast shape as
      // ann_ivf before the equi-join ADC scan
      "ann_ivfpq",
      // recall twins run the brute-force truth side (same tiny query
      // broadcast as ann_topk) next to the ANN path
      "ann_ivf_recall", "ann_ivfpq_recall",
      // ann_topk's scoring broadcast with the duplicate band filtered
      "hard_negatives",
      // #sources² pair frame from the ≤#sources-row distinct-source
      // dimension (inequality self-join, source_a < source_b) — bounded
      // by the source vocabulary, never the corpus; the register algebra
      // it feeds is equi-joined. (The r14-session-3 code comment says
      // "allowlisted" but the entry was lost to the mid-build stop.)
      "source_overlap_sketch",
      // the binary tier's 10-row query-sketch broadcast against the
      // corpus sketches — the ann_topk shape on 8-byte rows
      "ann_hamming",
      // the Hamming rank + the brute-force truth side: two tiny query
      // broadcasts (the ann_ivf_recall shape)
      "ann_hamming_recall",
      // prefix-slice search + full-dim truth: two ann_topk-shaped
      // broadcasts (the rp_recall shape)
      "matryoshka_recall",
      // joins two single-row aggregates (bin stats × distinct-doc count)
      "pack_invariants",
      // the same single-row × single-row invariant join, downstream of
      // the composed curation chain
      "curation_pipeline_pack",
      // same k-row centroid broadcast as ann_ivf (the IVF assignment
      // inside the memoized index build); the pair join itself is equi
      "dedup_semantic",
      // the kNN-graph probe broadcasts ONLY the k-row centroid table;
      // the corpus-sized query side meets the index in a cell equi-join
      // (knnGraph deliberately does NOT broadcast its query side)
      "knn_graph",
      // the same knn_graph centroid broadcast, downstream of the purity
      // aggregation's label dimension joins (those are equi)
      "knn_label_purity",
      // brute-force in projected + original space: two tiny query
      // broadcasts (the ann_topk shape, twice)
      "rp_recall",
      // single-row normalizer broadcast (Σ nₛ^α) against #sources rows
      "mixture_weights",
      // |types|-row dimension grid and 1-row type count, both broadcast
      "event_drift",
      // the MMR shortlist is the ann_topk brute-force shape (tiny query
      // broadcast); the greedy itself is bounded driver math
      "mmr_rerank",
      // ann_topk's exact-scoring shape over the hashEmbed vectors (5
      // broadcast query vectors against the corpus)
      "text_ann_hashed",
      // the same shape with ONE broadcast query vector (the hybrid
      // fusion's vector channel)
      "hybrid_rrf",
      // broadcast range-join of per-token first-occurrence ranks against
      // the 10-row checkpoint table (each row duplicated ≤ steps times)
      "heaps_law",
      // the 9-row percentile table joined on the computed rank equality
      // over the k-row (≤1024) sample — both sides bounded constants
      "bottomk_quantiles",
      // the same percentile-table join, per-group (≤ G·k sample rows)
      "lang_length_quantiles",
      // 1-row grand-total N broadcast against the (source, token) cells
      "source_chi2",
      // 1-row global-norm broadcast against the #sources aggregate
      "source_embedding_drift")
    // global-window gate: an unpartitioned Window funnels every input row
    // through ONE task's sort — allowed only above a Limit (the
    // TakeOrdered-then-rank pattern: the window sees ≤ k rows) or for
    // queries whose window input is bounded BY CONSTRUCTION (named here
    // with the bound)
    val allowedGlobalWindow = Set(
      // the 9-row percentile grid / ≤1024-row bottom-k sample windows
      "bottomk_quantiles", "lang_length_quantiles",
      // Hamilton-apportionment window math over the #sources dimension
      // table (post-aggregation, bounded by the source vocabulary)
      "quota_apportion", "epoch_plan",
      // both rank windows run over ≤ nCand(=100) rows by construction:
      // the lexical one above a TakeOrdered Limit, the vector one above
      // the heap-truncated graft_topk aggregate
      "hybrid_rrf",
      // the source-pair table is a #sources² dimension self-join on <
      // over the checkpointed register frame's distinct sources —
      // bounded by the source vocabulary, never the corpus
      "source_overlap_sketch")
    import org.apache.spark.sql.catalyst.plans.logical.{
      GlobalLimit, LocalLimit, Window => LWindow}
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"query $name plans a CartesianProduct:\n$plan")
      if (!allowedBnlj(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"query $name plans a BroadcastNestedLoopJoin outside the allowed set:\n$plan")
      if (!allowedGlobalWindow(name)) {
        val unbounded = df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
            w.child.collectFirst {
              case _: GlobalLimit => (); case _: LocalLimit => ()
            }.isEmpty => w
        }
        assert(unbounded.isEmpty,
          s"query $name plans an unpartitioned Window with no Limit below it " +
            s"(single-task global sort):\n${unbounded.mkString("\n")}")
      }
    }
  }

  test("lineitem edge ids are injective at the largest local SF (stride covers max per-order count)") {
    // Regression: stride 16 collided one 17-lineitem order's last edge
    // with the next order's first at sf0.1, double-crediting two
    // suppliers in supplier_revenue. Guard the LiStride invariant on the
    // largest data this host holds, not just the sf0.001 spec fixtures.
    import org.apache.spark.sql.expressions.Window
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    val maxSeq = li.withColumn("seq", row_number().over(w))
      .agg(max(col("seq"))).head.getInt(0)
    assert(maxSeq < graft.projection.TpchGraph.LiStride,
      s"an order has $maxSeq lineitems; LiStride=${graft.projection.TpchGraph.LiStride} no longer injective")
    val liKey = (col("l_orderkey") * graft.projection.TpchGraph.LiStride +
      row_number().over(w)).as("k")
    val dups = li.select(liKey).groupBy(col("k")).count()
      .where(col("count") > 1).count()
    assert(dups == 0, s"$dups colliding lineitem edge ids")
  }
}
