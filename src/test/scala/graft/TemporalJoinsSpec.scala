package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest at-or-before per key, left-join nulls, tolerance gate") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after two purchases → latest wins
      (2L, 10L, ts("2024-01-01 08:30:00")), // between them → earlier one
      (3L, 10L, ts("2024-01-01 08:00:00")), // EXACTLY at a purchase → ≤ matches
      (4L, 10L, ts("2024-01-01 07:00:00")), // before all → null
      (5L, 20L, ts("2024-01-01 12:00:00"))  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 100L, 5.0),
      (10L, ts("2024-01-01 09:00:00"), 101L, 7.0)
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")

    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("purchase_id", "purchase_value"), matchedTsCol = "purchase_ts")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(r.fieldIndex("purchase_id"))), Option(r.get(r.fieldIndex("purchase_ts"))))).toMap
    assert(out(1L)._1.contains(101L))
    assert(out(2L)._1.contains(100L))
    assert(out(3L)._1.contains(100L)) // equal-ts right row is visible
    assert(out(4L)._1.isEmpty && out(4L)._2.isEmpty)
    assert(out(5L)._1.isEmpty)
    assert(out.size == 5) // every left row survives exactly once

    // a null-ts right row is never "at or before" anything — it must not
    // become a universal match for left rows with no earlier purchase
    val withNull = right.unionByName(Seq(
      (10L, Option.empty[Timestamp], 999L, 9.9)
    ).toDF("user_id", "ts", "purchase_id", "purchase_value"))
    val guarded = TemporalJoins.asofJoin(left, withNull, Seq("user_id"), "ts", "ts",
        Seq("purchase_id", "purchase_value"), matchedTsCol = "purchase_ts")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("purchase_id")))).toMap
    assert(guarded(4L).isEmpty && guarded(1L).contains(101L))

    // SQL equi-join semantics: null keys never match each other — a
    // null-key left row flows through with a NULL payload instead of
    // picking up a null-key right row
    val nkLeft = Seq((7L, Option.empty[Long], Some(ts("2024-01-01 10:00:00"))))
      .toDF("event_id", "user_id", "ts")
    val nkRight = Seq((Option.empty[Long], Some(ts("2024-01-01 09:00:00")), 500L, 1.0))
      .toDF("user_id", "ts", "purchase_id", "purchase_value")
    val nk = TemporalJoins.asofJoin(nkLeft, nkRight, Seq("user_id"), "ts", "ts",
        Seq("purchase_id", "purchase_value"), matchedTsCol = "purchase_ts")
      .collect()
    assert(nk.length == 1 && nk.head.isNullAt(nk.head.fieldIndex("purchase_id")))

    // reserved internal names are rejected loudly, not silently clobbered
    assertThrows[IllegalArgumentException] {
      TemporalJoins.asofJoin(left.withColumn("__side", lit(1)), right,
        Seq("user_id"), "ts", "ts", Seq("purchase_id"))
    }
    // output names colliding with left columns are rejected up front, not
    // left to fail downstream as AMBIGUOUS_REFERENCE
    assertThrows[IllegalArgumentException] {
      TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("purchase_id"), matchedTsCol = "ts")
    }
    assertThrows[IllegalArgumentException] {
      TemporalJoins.rangeBandJoin(left.withColumn("__band", lit(1L)), right,
        Seq("user_id"), "ts", "ts", "ts", 60L)
    }

    // tolerance: the 10:00 click is 60 min past the 09:00 purchase — a
    // 30-minute tolerance nulls it, the 08:30 one (30 min) survives
    val tol = TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("purchase_id", "purchase_value"), matchedTsCol = "purchase_ts",
        tolerance = Some("30 minutes"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("purchase_id")))).toMap
    assert(tol(1L).isEmpty)
    assert(tol(2L).contains(100L))
  }

  test("asofJoin: duplicate (key, ts) right rows resolve deterministically to the greatest payload") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    // three purchases at the SAME (user, ts) — the documented tiebreak
    // picks the greatest (matched_ts, payload...) struct: purchase 103
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 101L, 7.0),
      (10L, ts("2024-01-01 09:00:00"), 103L, 2.0),
      (10L, ts("2024-01-01 09:00:00"), 102L, 9.0)
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")
    // stable across partitionings/row orders — the flake ADVICE r6 warned
    // about: without the __r tiebreak the winner depended on sort arrival
    Seq(right, right.repartition(8), right.orderBy(col("purchase_value")),
        right.coalesce(1).orderBy(col("purchase_id").desc)).foreach { r =>
      val out = TemporalJoins.asofJoin(left, r, Seq("user_id"), "ts", "ts",
          Seq("purchase_id", "purchase_value"), matchedTsCol = "purchase_ts")
        .collect()
      assert(out.length == 1)
      assert(out.head.getAs[Long]("purchase_id") == 103L,
        s"tiebreak not deterministic: got ${out.head}")
    }
  }

  test("asofJoin: unorderable (map) payloads still join — tiebreak degrades, analysis does not fail") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), Map("k" -> "v")))
      .toDF("user_id", "ts", "attrs")
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("attrs"), matchedTsCol = "purchase_ts")
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Map[String, String]]("attrs") == Map("k" -> "v"))
  }

  test("rangeBandJoin: band-crossing intervals, inclusive endpoints, key isolation") {
    import spark.implicits._
    // band width 60 s; interval [09:59:30, 10:00:30] crosses the band edge
    val left = Seq(
      (1L, 10L, ts("2024-01-01 09:59:45")), // in-band start side
      (2L, 10L, ts("2024-01-01 10:00:15")), // in-band end side (crossed band)
      (3L, 10L, ts("2024-01-01 09:59:30")), // exactly at start → inclusive
      (4L, 10L, ts("2024-01-01 10:00:30")), // exactly at end → inclusive
      (5L, 10L, ts("2024-01-01 10:00:31")), // 1 s past end → out
      (6L, 99L, ts("2024-01-01 10:00:00"))  // wrong key → out
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 7L, ts("2024-01-01 09:59:30"), ts("2024-01-01 10:00:30"))
    ).toDF("user_id", "iv_id", "iv_start", "iv_end")

    val out = TemporalJoins.rangeBandJoin(left, right, Seq("user_id"),
        "ts", "iv_start", "iv_end", bandSeconds = 60L)
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L, 4L))
  }

  test("rangeBandJoin: no duplicate pairs when an interval spans many bands") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:05:00")))
      .toDF("event_id", "user_id", "ts")
    // 10-minute interval with a 60 s band → explodes into 11 bands; the
    // point must still pair with it exactly once
    val right = Seq((10L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("user_id", "iv_id", "iv_start", "iv_end")
    val out = TemporalJoins.rangeBandJoin(left, right, Seq("user_id"),
      "ts", "iv_start", "iv_end", bandSeconds = 60L)
    assert(out.count() == 1L)
  }
}
