package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * Distributed total-order ranking — the replacement for the
 * `row_number().over(Window.orderBy(...))` anti-pattern, whose empty
 * partition spec funnels EVERY row through one task's sort. At 100 TB
 * a global rank must instead be assembled from a range-partitioned
 * sort plus per-partition offsets, which is exactly what
 * [[prefixRank]] does:
 *
 *  1. `repartitionByRange` on the order key — each of the N shuffle
 *     partitions holds a contiguous key range (range boundaries come
 *     from Spark's reservoir sample of the input);
 *  2. `sortWithinPartitions` — partitions are now globally ordered
 *     end-to-end;
 *  3. `zipWithIndex` — one light count job computes per-partition
 *     sizes (the cumulative offsets), then a map-only pass stamps
 *     `offset + local_position`. No second shuffle, no single-task
 *     sort anywhere.
 *
 * The emitted rank is 1-based and depends only on the TOTAL ORDER of
 * the keys, never on how the sampler drew range boundaries — callers
 * must pass a tie-broken (total) ordering for the output to be
 * deterministic, same contract as a window `orderBy`.
 */
object Ranks {

  /** Append a 1-based dense global rank column `rankCol` ordered by
    * `order` (which must be a total order — break ties explicitly).
    * Costs one range shuffle + one count job; no task ever sorts more
    * than its own partition. */
  def prefixRank(df: DataFrame, order: Seq[Column], rankCol: String,
                 numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "prefixRank needs at least one order column")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = StructType(df.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
