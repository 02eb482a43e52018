package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Whole-operator temporal joins Spark lacks natively, composed from
 * operators Catalyst CAN optimize — the preferred extension path
 * (compose > custom plan) since both reduce to one equi-shuffle:
 *
 *  - [[asofJoin]]: for each left row, the LATEST right row at-or-before
 *    its timestamp per key. Implemented as union + per-key ordered
 *    window carry (`last(..., ignoreNulls)`), NOT an inequality join:
 *    one shuffle on the key, sort within partitions, zero candidate
 *    blowup — the shape that survives 100 TB where a theta-join
 *    (every left × every earlier right) quadratically explodes hot keys.
 *  - [[rangeBandJoin]]: left points against right intervals. Both sides
 *    are bucketed at a band width chosen near the max interval span, the
 *    join is a plain equi-join on (key, bucket) — intervals explode into
 *    the few buckets they overlap — and the exact containment predicate
 *    filters after. Candidate count stays O(pairs-per-band), not
 *    O(left × right).
 */
object TemporalJoins {

  /** As-of join: every `left` row picks the `right` row with the greatest
    * `rightTs` ≤ `leftTs` within the same `keys` group (LEFT-join
    * semantics: no match → null payload). Returns all left columns plus
    * `matchedTsCol` and the `rightPayload` columns (callers keep the two
    * column sets disjoint).
    *
    * Ties: a right row AT the left timestamp matches (≤). Several right
    * rows on the same (key, ts) resolve DETERMINISTICALLY to the one
    * with the greatest (matched_ts, payload...) struct — the window sort
    * carries `__r` ascending as a final tiebreak, so the answer never
    * depends on partition order (DuckDB/pandas leave this case
    * unspecified; we pin it). Exception: a payload containing an
    * UNORDERABLE type (map) cannot join the sort — those fall back to
    * the old contract (ties unspecified; pre-dedupe if it matters).
    *
    * `tolerance` (e.g. "1 hour") nulls out matches older than
    * `leftTs - tolerance` without re-shuffling.
    *
    * Scale: ONE hash shuffle of (left ∪ right) on `keys` + an in-partition
    * sort — the window carry replaces the unbounded per-row candidate set
    * of the naive `l.ts >= r.ts` theta-join. A pathologically hot key
    * serializes its own sort (inherent to ordered semantics); everything
    * else distributes. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightPayload: Seq[String],
               matchedTsCol: String = "matched_ts",
               tolerance: Option[String] = None): DataFrame = {
    val reserved = Set("__ts", "__side", "__l", "__r", "__m")
    requireNoReserved(left, reserved, "left")
    requireNoReserved(right, reserved, "right")
    // the output appends matchedTsCol + rightPayload to the left schema —
    // enforce the documented disjointness instead of emitting duplicate
    // column names that fail far downstream as AMBIGUOUS_REFERENCE
    val dupOut = (matchedTsCol +: rightPayload).filter(left.columns.toSet)
    require(dupOut.isEmpty,
      s"output column name(s) ${dupOut.mkString(", ")} collide with left columns")
    val rStruct = struct(col(rightTs).as(matchedTsCol) +: rightPayload.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType

    val lSide = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    // a null-timestamped right row would sort NULLS FIRST and become
    // matchable by every left row — it can never be "at or before"; and
    // a null KEY must never match (Window.partitionBy groups nulls
    // together, but SQL equi-join/ASOF semantics never equate them —
    // null-key left rows still flow through with a null payload)
    val rSide = right.where(col(rightTs).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _)).select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    // right sorts BEFORE left at the same ts (side 0 < 1) so an
    // equal-timestamp right row is visible to the left row — ≤ semantics.
    // `__r` asc is the deterministic tiebreak among right rows sharing
    // (key, ts): `last` then always carries the greatest payload struct
    // (left rows sort among themselves by the all-null __r — harmless,
    // they only read the carry). Struct ordering is lexicographic by
    // field, nulls first — total, so no partition-order dependence.
    // Unorderable payloads (maps) can't be sort keys: drop the tiebreak
    // rather than failing analysis (ties revert to unspecified).
    val tiebreak =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(rType))
        Seq(col("__r").asc)
      else Seq.empty
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(Seq(col("__ts").asc, col("__side").asc) ++ tiebreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val gated = tolerance match {
      case Some(t) => carried.withColumn("__m",
        when(col(s"__m.$matchedTsCol") >= col("__ts") - expr(s"INTERVAL $t"),
          col("__m")))
      case None => carried
    }
    gated.select(left.columns.map(c => col(s"__l.$c").as(c)) ++
      (matchedTsCol +: rightPayload).map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Range join: pairs every `left` row whose `leftTs` falls INSIDE a
    * `right` row's `[rightStart, rightEnd]` interval (inclusive both
    * ends), equi-keyed on `keys`. Left and right column sets must be
    * disjoint apart from `keys`.
    *
    * `bandSeconds` is the bucket width — a PERFORMANCE knob, not a
    * correctness bound: every interval explodes into each band it
    * overlaps (correct for any span), so set it near the maximum
    * interval span to keep that explosion ≤ 2 rows. Each (point,
    * interval) pair meets in exactly one band (the point's own), so no
    * post-join dedup is needed. */
  def rangeBandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTs: String, rightStart: String, rightEnd: String,
                    bandSeconds: Long): DataFrame = {
    require(bandSeconds > 0, "bandSeconds must be positive")
    requireNoReserved(left, Set("__band"), "left")
    requireNoReserved(right, Set("__band"), "right")
    // fractional epoch seconds keep sub-second timestamps in the right band
    def band(c: String) = floor(col(c).cast("double") / bandSeconds).cast("long")
    val lB = left.withColumn("__band", band(leftTs))
    val rB = right.withColumn("__band",
      explode(sequence(band(rightStart), band(rightEnd))))
    lB.join(rB, keys :+ "__band")
      .where(col(leftTs) >= col(rightStart) && col(leftTs) <= col(rightEnd))
      .drop("__band")
  }

  private def requireNoReserved(df: DataFrame, reserved: Set[String],
                                side: String): Unit = {
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"$side input uses reserved column name(s) ${clash.mkString(", ")}")
  }
}
