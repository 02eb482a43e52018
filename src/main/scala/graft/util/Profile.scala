package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-pass column profiler — the data-quality summary a pipeline runs
 * before committing a 100 TB ingest: per column, row/null/distinct
 * counts and min/max rendered to strings. ONE aggregation over the
 * input (no per-column scans); the multiple exact `count_distinct`s
 * expand the input ×|cols| inside the aggregate, so the `approx`
 * variant (HLL++, constant memory, no expand) is the extreme-scale
 * path — same output shape, estimated distincts.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false, rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    def distinctAgg(c: String) =
      if (approx) approx_count_distinct(col(c), rsd) else count_distinct(col(c))
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c => Seq(
      // sum over zero rows is NULL — an empty input profiles as 0 nulls
      coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as(s"__nulls_$c"),
      distinctAgg(c).as(s"__distinct_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")) }
    df.agg(aggs.head, aggs.tail: _*)
      // melt the single wide row into one row per profiled column
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }
}
