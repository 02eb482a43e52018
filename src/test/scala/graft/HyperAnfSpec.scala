package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.projection.TpchGraph
import graft.gx.HyperAnf

/** HyperANF neighborhood-function semantics: the per-vertex register
  * state after h rounds must equal the HLL sketch of the EXACT
  * out-ball(v, h) — verified by recomputing balls with a driver-side
  * BFS at sf0.001 and replaying the register/estimator recipe in plain
  * Scala — plus estimator-quality and effective-diameter consistency
  * gates. */
class HyperAnfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Driver-side replay of the register recipe (md5 → j, rho) — the
    * same arithmetic the operator and the DuckDB twin run. */
  private def regOf(member: Long): (Int, Int) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(member.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val j = Integer.parseInt(hex.substring(0, 2), 16) % HyperAnf.M
    val tail = hex.substring(2, 30)
    val strip = tail.dropWhile(_ == '0')
    val rho =
      if (strip.isEmpty) HyperAnf.RhoCap
      else {
        val lzd = strip.head match {
          case '1' => 3
          case '2' | '3' => 2
          case '4' | '5' | '6' | '7' => 1
          case _ => 0
        }
        math.min((28 - strip.length) * 4 + lzd + 1, HyperAnf.RhoCap)
      }
    (j, rho)
  }

  private def estOf(ball: Set[Long]): Long = {
    val regs = ball.toSeq.map(regOf).groupBy(_._1)
      .map { case (j, rs) => j -> rs.map(_._2).max }
    val q = regs.values.map(m => 1L << (HyperAnf.RhoCap - m)).sum +
      (HyperAnf.M - regs.size).toLong * (1L << HyperAnf.RhoCap)
    val raw = HyperAnf.RawNumerMicros / q
    val vEmpty = HyperAnf.M - regs.size
    if (vEmpty > 0 && raw <= HyperAnf.LcThresholdMicros) HyperAnf.LcMicros(vEmpty - 1)
    else raw
  }

  private lazy val (balls, ests) = {
    val snap = TpchGraph.snapshot(spark, dir)
    val edges = snap.edges
      .where(col("label").isin(HyperAnf.DagLabels: _*))
      .select(col("outV"), col("inV")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).toSet
    // exact out-balls by driver BFS, hops 1..3
    val balls = collection.mutable.Map[(Long, Int), Set[Long]]()
    verts.foreach { v =>
      var frontier = Set(v); var ball = Set(v)
      (1 to 3).foreach { h =>
        frontier = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- ball
        ball ++= frontier
        balls((v, h)) = ball
      }
    }
    val ests = HyperAnf.hyperAnfDF(spark, TpchGraph.snapshot(spark, dir))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (balls.toMap, ests)
  }

  test("register state = HLL of the exact out-ball: estimates replay bit-for-bit") {
    assert(ests.nonEmpty && balls.nonEmpty)
    assert(ests.keySet == balls.keySet) // same (vertex, hop) domain
    ests.foreach { case (key, est) =>
      assert(est == estOf(balls(key)), s"estimate mismatch at $key")
    }
  }

  test("estimator quality: median relative error on balls ≥ 50 within the m=64 band") {
    val errs = balls.collect {
      case (key, ball) if ball.size >= 50 =>
        math.abs(ests(key).toDouble / 1e6 - ball.size) / ball.size
    }.toSeq.sorted
    assert(errs.nonEmpty)
    val median = errs(errs.size / 2)
    assert(median <= 0.25, f"median rel err $median%.3f exceeds 0.25 (σ≈13%% at m=64)")
  }

  test("effective diameter row is consistent with the per-vertex estimates") {
    val row = HyperAnf.effectiveDiameterDF(spark, TpchGraph.snapshot(spark, dir))
      .collect().head
    val n = (1 to 3).map(h => ests.collect { case ((_, `h`), e) => e }.sum)
    assert((1 to 3).map(h => row.getLong(h - 1)) == n)
    val eff = (1 to 3).find(h => BigInt(n(h - 1)) * 10 >= BigInt(n(2)) * 9).get
    assert(row.getInt(3) == eff && eff >= 1 && eff <= 3)
    // balls only grow with h, and so must the aggregate estimate here
    assert(n(0) <= n(1) && n(1) <= n(2))
  }
}
