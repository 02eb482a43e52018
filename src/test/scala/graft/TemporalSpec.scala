package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraftGraph

/** Temporal semantics — the reference's headline feature has NO tests in
  * its own repo (SURVEY §5); these encode the documented semantics of
  * TimeAwareGraph/TimeAwareElement (javadoc) + the touch rules
  * (FluxGraph.java:148-165,346-387). */
class TemporalSpec extends AnyFunSuite {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("touch semantics: addVertex versions nothing; setProperty versions the element") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    assert(v.getPreviousVersion == null) // creation is not a touch
    v.setProperty("p", 1L)
    val prev = v.getPreviousVersion
    assert(prev != null)             // version before the setProperty
    assert(prev.getProperty("p") == null)
    assert(prev.getPreviousVersion == null)
  }

  test("addEdge versions BOTH endpoint vertices, not the edge") {
    val g = new GraftGraph(TestSpark.spark)
    val a = g.addVertex(); val b = g.addVertex()
    val tidA = a.getTimeId; val tidB = b.getTimeId
    val e = g.addEdge(a, b, "knows")
    assert(a.getTimeId > tidA)
    assert(b.getTimeId > tidB)
    assert(a.getPreviousVersion != null)
    assert(e.getPreviousVersion == null) // edge chain starts at creation
  }

  test("removeEdge versions edge and both endpoints") {
    val g = new GraftGraph(TestSpark.spark)
    val a = g.addVertex(); val b = g.addVertex()
    val e = g.addEdge(a, b, "knows")
    val (ta, tb, te) = (a.getTimeId, b.getTimeId, e.getTimeId)
    g.removeEdge(e)
    assert(a.getTimeId > ta && b.getTimeId > tb)
    assert(e.getTimeId > te) // deleted but still versioned in history
  }

  test("previous version sees the old property value") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    v.setProperty("p", 1L)
    v.setProperty("p", 2L)
    v.setProperty("p", 3L)
    assert(v.getProperty("p") == 3L)
    val p1 = v.getPreviousVersion
    assert(p1.getProperty("p") == 2L)
    assert(!p1.isCurrentVersion)
    val p2 = p1.getPreviousVersion
    assert(p2.getProperty("p") == 1L)
    assert(v.getPreviousVersions.toSeq.size == 3) // p=2, p=1, pre-prop
  }

  test("next version walks forward and ends at the current handle") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    v.setProperty("p", 1L); v.setProperty("p", 2L)
    val first = v.getPreviousVersions.toSeq.last // earliest version
    val n1 = first.getNextVersion
    assert(n1.getProperty("p") == 1L)
    val n2 = n1.getNextVersion
    assert(n2.getProperty("p") == 2L)
    assert(n2.isCurrentVersion)      // head comes back unpinned
    assert(n2.getNextVersion == null)
  }

  test("previous versions are immutable") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    v.setProperty("p", 1L); v.setProperty("p", 2L)
    val prev = v.getPreviousVersion
    intercept[IllegalArgumentException](prev.setProperty("p", 9L))
  }

  test("backdated transactions and asOf checkpoint reads") {
    val g = new GraftGraph(TestSpark.spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex(); v.setProperty("p", 1L)
    g.setTransactionTime(ts("2024-02-01 00:00:00")); v.setProperty("p", 2L)
    g.setTransactionTime(ts("2024-03-01 00:00:00")); g.removeVertex(v)

    val jan = g.asOf(ts("2024-01-15 00:00:00"))
    assert(jan.vertex(v.id).getProperty("p") == 1L)
    val feb = g.asOf(ts("2024-02-15 00:00:00"))
    assert(feb.vertex(v.id).getProperty("p") == 2L)
    val mar = g.asOf(ts("2024-03-15 00:00:00"))
    assert(mar.vertex(v.id) == null)       // deleted
    val before = g.asOf(ts("2023-12-15 00:00:00"))
    assert(before.vertex(v.id) == null)    // not yet created
    assert(before.vertices.isEmpty)
  }

  test("getTimeInterval: [txInstant(this), txInstant(next)), open head (FluxElement.java:142-152)") {
    val g = new GraftGraph(TestSpark.spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex(); v.setProperty("p", 1L)
    g.setTransactionTime(ts("2024-02-01 00:00:00")); v.setProperty("p", 2L)
    val (s2, e2) = v.getTimeInterval
    assert(s2 == ts("2024-02-01 00:00:00") && e2 == null) // head open
    val (s1, e1) = v.getPreviousVersion.getTimeInterval
    assert(s1 == ts("2024-01-01 00:00:00") && e1 == ts("2024-02-01 00:00:00"))
  }

  test("TimeAwareFilter-style filtered version walk") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    (1L to 5L).foreach(i => v.setProperty("p", i))
    val evens = v.getPreviousVersions(e => e.getProperty("p") != null &&
      e.getProperty("p").asInstanceOf[Long] % 2 == 0).toSeq
    assert(evens.map(_.getProperty("p")) == Seq(4L, 2L))
  }

  test("difference of two graph states over a working set") {
    val g = new GraftGraph(TestSpark.spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex(); v.setProperty("p", 1L)
    val w = g.addVertex(); w.setProperty("q", 9L)
    g.setTransactionTime(ts("2024-02-01 00:00:00"))
    v.setProperty("p", 2L)
    // facts at Feb not present at Jan, ws = {v, w}
    val diff = g.difference(Seq(v.id, w.id), ts("2024-02-15 00:00:00"), ts("2024-01-15 00:00:00"))
    assert(diff.vertexIds == Seq(v.id))  // w unchanged → normalized away
    assert(diff.props(v.id, "p") == Seq(2L))
    // symmetric direction: the old value
    val diff2 = g.difference(Seq(v.id, w.id), ts("2024-01-15 00:00:00"), ts("2024-02-15 00:00:00"))
    assert(diff2.props(v.id, "p") == Seq(1L))
  }

  test("a DiffGraph is queryable through the standard engine stack") {
    val g = new GraftGraph(TestSpark.spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex(); v.setProperty("p", 1L); v.setProperty("name", "v")
    g.setTransactionTime(ts("2024-02-01 00:00:00"))
    v.setProperty("p", 2L)
    val diff = g.difference(Seq(v.id), ts("2024-02-15 00:00:00"), ts("2024-01-15 00:00:00"))
    val view = new graft.graph.SnapshotGraphView(
      graft.snapshot.Snapshot.head(diff.asStore(TestSpark.spark)))
    val h = view.vertex(v.id).get
    assert(h.getProperty("p") == 2L)     // only the changed fact survives
    assert(h.getProperty("name") == null) // unchanged fact not in the diff
  }

  test("set-oriented difference (DiffGraph.of) matches the driver-side path") {
    val spark = TestSpark.spark
    val g = new GraftGraph(spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex(); v.setProperty("p", 1L); v.setProperty("name", "v")
    val w = g.addVertex(); w.setProperty("q", 9L)
    val x = g.addVertex(); x.setProperty("r", 5L) // outside the working set
    g.setTransactionTime(ts("2024-02-01 00:00:00"))
    v.setProperty("p", 2L)
    x.setProperty("r", 6L)

    def key(f: graft.model.Fact) =
      (f.e, f.attr, f.vStr, f.vLong, f.vDouble, f.vDec, f.vBool, f.vTs, f.vRef)
    for ((d1, d2) <- Seq(
      ("2024-02-15 00:00:00", "2024-01-15 00:00:00"),
      ("2024-01-15 00:00:00", "2024-02-15 00:00:00"))) {
      val drv = g.difference(Seq(v.id, w.id), ts(d1), ts(d2))
      val head = graft.snapshot.Snapshot.head(g.log)
      import spark.implicits._
      val ws = Seq(v.id, w.id).toDF("e")
      val set = graft.graph.DiffGraph.of(
        head.asOf(ts(d1)), head.asOf(ts(d2)), Some(ws))
      assert(set.facts.map(key).toSet == drv.facts.map(key).toSet)
      assert(set.vertexIds == drv.vertexIds)
    }
    // unscoped set-oriented diff additionally sees x's change
    val all = graft.graph.DiffGraph.of(
      graft.snapshot.Snapshot.head(g.log).asOf(ts("2024-02-15 00:00:00")),
      graft.snapshot.Snapshot.head(g.log).asOf(ts("2024-01-15 00:00:00")))
    assert(all.vertexIds == Seq(v.id, x.id))
    assert(all.props(x.id, "r") == Seq(6L))
  }

  test("fused same-store difference matches the cross-store general path") {
    // same mutations as above: v changes inside the ws, w is unchanged,
    // x changes outside the ws; plus a retraction so the liveness edge
    // cases differ between the two pins
    val spark = TestSpark.spark
    val g = new GraftGraph(spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex(); v.setProperty("p", 1L); v.setProperty("name", "v")
    val w = g.addVertex(); w.setProperty("q", 9L)
    val x = g.addVertex(); x.setProperty("r", 5L)
    g.setTransactionTime(ts("2024-02-01 00:00:00"))
    v.setProperty("p", 2L)
    v.removeProperty("name") // live at Jan, retracted at Feb
    x.setProperty("r", 6L)

    val head = graft.snapshot.Snapshot.head(g.log)
    // a DISTINCT store instance with identical content forces the
    // cross-store general path (anti-join); same-store pins take the
    // fused single-aggregation path
    val copy = new graft.log.BulkFactStore(
      spark, g.log.factsDF, g.log.touchesDF, g.log.txsDF)
    val copyHead = graft.snapshot.Snapshot.head(copy)
    import spark.implicits._
    val ws = Seq(v.id, w.id).toDF("e")
    val cols = Seq("e", "attr", "vStr", "vLong", "vDouble", "vDec", "vBool", "vTs", "vRef")
    for ((d1, d2) <- Seq(
      ("2024-02-15 00:00:00", "2024-01-15 00:00:00"),
      ("2024-01-15 00:00:00", "2024-02-15 00:00:00"));
         scope <- Seq(None, Some(ws))) {
      val fused = head.asOf(ts(d1)).differenceFacts(head.asOf(ts(d2)), scope)
      val general = head.asOf(ts(d1)).differenceFacts(copyHead.asOf(ts(d2)), scope)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(cols.map(org.apache.spark.sql.functions.col): _*)
          .collect().map(_.toSeq).toSet
      assert(rows(fused) == rows(general), s"d1=$d1 d2=$d2 scoped=${scope.isDefined}")
    }
  }

  test("per-element difference of two versions") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    v.setProperty("p", 1L); v.setProperty("p", 2L)
    val facts = g.difference(v, v.getPreviousVersion)
    assert(facts.size == 1 && facts.head.vLong == 2L)
  }

  test("10k-version chain walk is index-backed (no O(chain^2) scans)") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    // build the chain through the log directly (each commit is O(1));
    // the interactive setProperty path re-reads properties per call and
    // is not the bulk-history ingestion route
    (1 to 10000).foreach { i =>
      g.log.commit(
        Seq(graft.model.Fact.of(v.id, "p.long.vertex", i.toLong, 0L)),
        touched = Seq(v.id))
    }
    val t0 = System.nanoTime()
    var n = 0
    var cur = v.getPreviousVersion
    var mid: g.Elem = null
    while (cur != null) {
      n += 1
      if (n == 5000) mid = cur
      cur = cur.getPreviousVersion
    }
    assert(n == 10000)
    val (start, end) = mid.getTimeInterval
    assert(start != null && end != null && !end.before(start))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 5.0, s"chain walk took ${secs}s — navigation degraded to a full-log scan per step")
  }

  test("isDeleted across time") {
    val g = new GraftGraph(TestSpark.spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex()
    g.setTransactionTime(ts("2024-02-01 00:00:00"))
    g.removeVertex(v)
    assert(v.isDeleted)
    assert(g.asOf(ts("2024-01-15 00:00:00")).vertex(v.id) != null)
  }
}
