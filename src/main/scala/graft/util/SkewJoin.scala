package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation helpers for hot-key joins (the brief's "salting for
 * skew" tool, complementing AQE's runtime skew-join splitting — AQE only
 * helps sort-merge joins after materialization; salting also fixes
 * hash-aggregations and streaming joins).
 *
 * Pattern: the skewed (fact) side gets a deterministic salt derived from
 * other row content, widening each hot key into `salts` sub-keys; the
 * dimension side is replicated `salts` times. The join key becomes
 * (key, salt) — hot keys spread over `salts` reducers.
 */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `key`, salted: big rows hash-salt on
    * `saltFrom` (any column with per-row entropy, e.g. the row's own id),
    * small rows replicate via explode. Semantics identical to
    * `big.join(small, key)` for 1:N joins (small side unique on key). */
  def salted(big: DataFrame, small: DataFrame, key: String,
             saltFrom: Column, salts: Int = 16): DataFrame = {
    val b = big.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) count per key — the aggregation-side
    * skew fix: first aggregate on (key, salt), then merge per key. The
    * hot key's first-phase work spreads over `salts` tasks. */
  def saltedCount(df: DataFrame, key: String, saltFrom: Column,
                  salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("cnt"))
}
