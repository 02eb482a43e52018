package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Profile

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("profile: exact counts, null accounting, string-rendered extremes") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a"))
    ).toDF("k", "s")
    val p = Profile.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("k") == ((4L, 1L, 2L, "1", "2")))
    assert(p("s") == ((4L, 1L, 2L, "a", "c")))

    // an empty input profiles as zeros (not NULL n_nulls from sum-of-none)
    val e = Profile.profile(df.limit(0), Seq("k"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(e == ((0L, 0L, 0L)))
  }

  test("profile: approx twin matches shape and is within HLL tolerance") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i.toLong, s"v${i % 97}"))
      .toDF("k", "s")
    val exact = Profile.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profile(df, Seq("k", "s"), approx = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(2L, (n * 0.05).toLong),
        s"$c: approx ${approx(c)} vs exact $n")
    }
  }
}
