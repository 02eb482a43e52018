package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranks

/** The distributed prefix-rank helper behind gini_revenue /
  * revenue_deciles / heaps_law — proven against a planted permutation
  * so the parity check itself never needs a single-task sort. */
class RanksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("prefixRank == planted permutation rank at 10M rows, no global-sort task") {
    // value = (id * p) mod N is a permutation of 0..N-1 when gcd(p, N)=1,
    // so the 1-based rank of a row ordered by value is exactly value+1 —
    // a closed-form truth that checks all 10M ranks with one distributed
    // count, never a window
    val n = 10_000_000L
    val prime = 9_999_991L // prime < n, coprime with n
    val df = spark.range(n).select(col("id"),
      pmod(col("id") * lit(prime), lit(n)).as("v"))
    val ranked = Ranks.prefixRank(df, Seq(col("v")), "rk", numPartitions = 32)
    val bad = ranked.where(col("rk") =!= col("v") + 1).count()
    assert(bad === 0L, s"$bad of $n ranks disagree with the planted permutation")
  }

  test("prefixRank breaks ties by the full order key and is 1-based dense") {
    import spark.implicits._
    val df = Seq((10L, "c"), (10L, "a"), (5L, "b"), (10L, "b"), (5L, "a"))
      .toDF("x", "k")
    val got = Ranks.prefixRank(df, Seq(col("x").asc, col("k").asc), "rk")
      .orderBy("rk").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((5L, "a", 1L), (5L, "b", 2L), (10L, "a", 3L),
      (10L, "b", 4L), (10L, "c", 5L)))
  }

  test("prefixRank with surviving payload columns: offsets and stamps read ONE partitioning (r13 review regression)") {
    // pre-fix shape: a payload column that survives into the executed
    // query kept the count branch's and stamp branch's range exchanges
    // from canonicalizing identically, so RangePartitioner sampled two
    // DIFFERENT sets of range bounds (rdd.id-seeded reservoir) and the
    // broadcast offsets described the wrong boundaries — 9.7M of 10M
    // ranks wrong before the eager checkpoint pin. The window rank is
    // the ground truth here; payload forces the failing plan shape.
    import org.apache.spark.sql.expressions.Window
    val n = 500000L
    val df = spark.range(n).select(
      pmod(col("id") * lit(2654435761L), lit(1000003L)).as("v"),
      col("id").as("payload"))
    val ranked = Ranks.prefixRank(df, Seq(col("v"), col("payload")), "rk",
      numPartitions = 16)
    val truth = row_number().over(
      Window.orderBy(col("v"), col("payload"))).cast("long")
    val bad = ranked.withColumn("chk", truth)
      .where(col("rk") =!= col("chk")).count()
    assert(bad === 0L, s"$bad of $n ranks disagree with the window rank")
  }

  test("prefixRank preserves schema and handles array columns") {
    import spark.implicits._
    val df = Seq((2L, Seq("b", "c")), (1L, Seq("a"))).toDF("doc_id", "t")
    val got = Ranks.prefixRank(df, Seq(col("doc_id")), "rk")
    assert(got.schema.fieldNames.toSeq === Seq("doc_id", "t", "rk"))
    val rows = got.orderBy("rk").as[(Long, Seq[String], Long)].collect().toSeq
    assert(rows === Seq((1L, Seq("a"), 1L), (2L, Seq("b", "c"), 2L)))
  }

  test("prefixRank releases its eager checkpoints beyond the LRU bound (r13 advice)") {
    import spark.implicits._
    // each call pins one localCheckpoint; the registry must free the
    // oldest beyond MaxPinned=8 instead of accumulating for the session
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 12).foreach { i =>
      val df = Seq.tabulate(50)(j => (j.toLong * i, j.toLong)).toDF("v", "p")
      Ranks.prefixRank(df, Seq(col("v"), col("p")), "rk").count()
    }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 8,
      s"prefixRank leaked checkpoints: $before -> $after persistent RDDs (bound 8)")
  }
}
