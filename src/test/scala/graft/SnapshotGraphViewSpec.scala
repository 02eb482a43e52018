package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{GraftGraph, SnapshotGraphView}
import graft.snapshot.Snapshot

/** The read-only handle facade over a Snapshot must agree with the
  * driver-side API over the same log (API parity for bulk stores). */
class SnapshotGraphViewSpec extends AnyFunSuite {

  test("handles over a snapshot mirror the interactive API") {
    val g = new GraftGraph(TestSpark.spark)
    val a = g.addVertex(); a.setProperty("name", "a"); a.setProperty("n", 7L)
    val b = g.addVertex(); b.setProperty("name", "b")
    val c = g.addVertex(); c.setProperty("name", "c")
    val e1 = g.addEdge(a, b, "knows"); e1.setProperty("w", 0.5)
    g.addEdge(a, c, "likes")

    val view = new SnapshotGraphView(Snapshot.head(g.log))

    assert(view.vertices().map(_.id).toSet == Set(a.id, b.id, c.id))
    assert(view.edges().size == 2)
    assert(view.vertex(a.id).get.getProperty("name") == "a")
    assert(view.vertex(a.id).get.getProperty("n") == 7L)
    assert(view.vertex(999999L).isEmpty)

    val av = view.vertex(a.id).get
    assert(av.getEdges("out").map(_.label).toSet == Set("knows", "likes"))
    assert(av.getEdges("out", "knows").map(_.inV).toSeq == Seq(b.id))
    assert(av.getVertices("out", "likes").map(_.id).toSeq == Seq(c.id))
    assert(view.edge(e1.id).get.getProperty("w") == 0.5)
    assert(view.edge(e1.id).get.getVertex("in").id == b.id)
    assert(av.getPropertyKeys == Set("name", "n"))
  }

  test("typed decode parity: both read surfaces return the same types") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    v.setProperty("f", 1.5f)
    v.setProperty("bi", new java.math.BigInteger("12345678901234567890"))
    v.setProperty("bd", new java.math.BigDecimal("2.25"))
    v.setProperty("u", java.util.UUID.fromString("00000000-0000-0000-0000-000000000001"))
    v.setProperty("b", java.lang.Boolean.TRUE)
    val view = new SnapshotGraphView(Snapshot.head(g.log))
    val h = view.vertex(v.id).get
    for (k <- Seq("f", "bi", "bd", "u", "b")) {
      val drv = v.getProperty(k); val set = h.getProperty(k)
      assert(set.getClass == drv.getClass,
        s"key $k: facade gave ${set.getClass}, driver gave ${drv.getClass}")
      (set, drv) match {
        // decimals round-trip at the storage scale (38,18): equal value,
        // not necessarily equal scale — BigDecimal.equals is scale-aware
        case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
          assert(a.compareTo(b) == 0, s"key $k: $a != $b")
        case _ => assert(set == drv, s"key $k: $set != $drv")
      }
    }
  }
}
