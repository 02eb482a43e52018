package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic, mergeable sample-based sketches. Where the stock
 * approximate aggregates (`approx_percentile`, HLL++) are
 * merge-order-dependent — fine for monitoring, impossible to oracle —
 * these use the md5 bottom-k trick: hashing a unique key gives a
 * uniform permutation both engines reproduce bit-for-bit, so "the k
 * rows with the smallest hashes" is a deterministic uniform sample
 * and every statistic over it is exactly checkable cross-engine
 * (the `bottomk_sketch` / `vocab_sketch` doctrine, applied to
 * order statistics).
 */
object SketchOps {

  /**
   * Approximate quantiles from a deterministic bottom-k sample:
   * hash the unique `key` with md5, keep the `k` smallest hashes
   * (a uniform k-sample of the population, the KMV construction),
   * and return the exact nearest-rank-lower quantiles of `value`
   * over that sample — for sample index the integer contract
   * rk = 1 + (pct·(n−1)) div 100, ties broken by hash.
   *
   * Why not `approx_percentile`: its GK summary depends on partial
   * merge order, so two runs (or two engines) legitimately disagree.
   * The bottom-k sample is a pure function of the data — mergeable
   * (union of bottom-k sets, re-truncated, is the bottom-k of the
   * union), deterministic, and std-error ~1/√k on each quantile.
   *
   * Scale shape: the sample is a global top-k by hash —
   * TakeOrderedAndProject, i.e. per-partition k-heaps and a k-sized
   * driver merge, NO full sort and no shuffle proportional to data.
   * The quantile selection then runs over k rows. At 100 TB with
   * k = 1024 the reduce traffic is k·partitions hashes.
   *
   * Returns (pct, val) — one row per requested percentile.
   */
  def bottomKQuantiles(df: DataFrame, key: Column, value: Column,
                       k: Int = 1024,
                       pcts: Seq[Int] = (10 to 90 by 10)): DataFrame = {
    require(k > 0, "k must be positive")
    require(pcts.forall(p => p >= 0 && p <= 100), "pcts must be in [0, 100]")
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df
      .select(md5(key.cast("string")).as("h"), value.cast("double").as("v"))
      .orderBy(col("h"))
      .limit(k)
    val ranked = sample
      .withColumn("rk", row_number().over(Window.orderBy(col("v"), col("h"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    ranked
      .join(broadcast(pcts.toDF("pct")),
        col("rk") === lit(1) + expr("pct * (n - 1) div 100"))
      .select(col("pct").cast("long").as("pct"), col("v").as("val"))
  }

  /**
   * Group-wise [[bottomKQuantiles]]: an independent deterministic
   * bottom-k sample PER GROUP (hash rank within the group partition),
   * then the same exact nearest-rank quantile contract over each
   * group's sample. The per-group samples stay mergeable the same way
   * — union, re-truncate within group.
   *
   * Scale shape: both passes are group-partitioned windows — the
   * sample rank sorts each group's rows by hash inside its hash
   * partition (no global sort, no driver merge), and the quantile
   * rank then runs over ≤ k rows per group. With G groups the state
   * after sampling is G·k rows. For few, huge groups the window sort
   * is the cost — at 100 TB pre-aggregate with a per-partition k-heap
   * (the TakeOrdered shape, grouped) before the window; the contract
   * is unchanged.
   *
   * Returns (group, pct, val, n_sample).
   */
  def groupBottomKQuantiles(df: DataFrame, group: Column, key: Column,
                            value: Column, k: Int = 256,
                            pcts: Seq[Int] = Seq(25, 50, 75)): DataFrame = {
    require(k > 0, "k must be positive")
    require(pcts.forall(p => p >= 0 && p <= 100), "pcts must be in [0, 100]")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(group.as("grp"),
      md5(key.cast("string")).as("h"), value.cast("double").as("v"))
    val sample = base
      .withColumn("hrk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .where(col("hrk") <= k)
    val ranked = sample
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("h"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("grp"))))
    ranked
      .join(broadcast(pcts.toDF("pct")),
        col("rk") === lit(1) + expr("pct * (n - 1) div 100"))
      .select(col("grp").as("group"), col("pct").cast("long").as("pct"),
        col("v").as("val"), col("n").cast("long").as("n_sample"))
  }
}
