package graft

import org.scalatest.funsuite.AnyFunSuite

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
      // the appended-index search broadcasts the same k-row centroid
      // table as ann_ivf (the append assignment itself is a build step)
      "ann_ivf_appended", "ann_lsh",
      "dedup_embedding", "similar_docs",
      // probes the k-row centroid table with the same broadcast shape as
      // ann_ivf before the equi-join ADC scan
      "ann_ivfpq")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"query $name plans a CartesianProduct:\n$plan")
      if (!allowedBnlj(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"query $name plans a BroadcastNestedLoopJoin outside the allowed set:\n$plan")
    }
  }
}
