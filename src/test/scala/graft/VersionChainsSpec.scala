package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.GraftGraph
import graft.temporal.VersionChains

/** The set-oriented chain operators must agree with the per-handle
  * navigation over the same log. */
class VersionChainsSpec extends AnyFunSuite {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("chains/intervals/timeIds agree with handle navigation") {
    val g = new GraftGraph(TestSpark.spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex()
    v.setProperty("p", 1L)                                   // tx1 touch
    g.setTransactionTime(ts("2024-02-01 00:00:00"))
    val u = g.addVertex()
    g.addEdge(v, u, "knows")                                 // touches v and u
    g.setTransactionTime(ts("2024-03-01 00:00:00"))
    v.setProperty("p", 2L)

    val chains = VersionChains.chains(g.log)
      .collect().map(r => (r.getAs[Long]("e"), r.getAs[Long]("tx"),
        r.getAs[Long]("prevTx"), r.getAs[Any]("nextTx"))).toSet
    // v: touched at tx1 (setProp, prev=tx0 creation), tx3 (addEdge), tx5 (setProp)
    val vTouches = chains.filter(_._1 == v.id).toSeq.sortBy(_._2)
    assert(vTouches.map(_._3) == vTouches.map(_._2).scanLeft(-1L)((_, t) => t).init
      || vTouches.forall(t => t._3 < t._2)) // prevTx strictly before tx
    assert(vTouches.last._4 == null)        // head version open

    val timeIds = VersionChains.timeIds(g.log).collect()
      .map(r => r.getAs[Long]("e") -> r.getAs[Long]("timeId")).toMap
    assert(timeIds(v.id) == v.getTimeId)
    assert(timeIds(u.id) == u.getTimeId)

    val iv = VersionChains.intervals(g.log)
      .where(col("e") === v.id).orderBy(col("tx"))
      .collect().map(r => (r.getAs[Timestamp]("validFrom"), r.getAs[Timestamp]("validTo")))
    assert(iv.length == 3)
    assert(iv.head._1 == ts("2024-01-01 00:00:00") && iv.head._2 == ts("2024-02-01 00:00:00"))
    assert(iv.last._1 == ts("2024-03-01 00:00:00") && iv.last._2 == null)
    // handle API agrees on the head interval
    assert(v.getTimeInterval == (ts("2024-03-01 00:00:00"), null))
  }

  test("addEdge on a deleted endpoint is rejected") {
    val g = new GraftGraph(TestSpark.spark)
    val a = g.addVertex(); val b = g.addVertex()
    g.removeVertex(b)
    intercept[IllegalArgumentException](g.addEdge(a, b, "knows"))
  }
}
