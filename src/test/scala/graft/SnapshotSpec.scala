package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.GraftGraph
import graft.model.{A, PropType}
import graft.snapshot.Snapshot

/** The set-oriented Snapshot path must agree with the driver-side API over
  * the same MemFactLog — the two read paths of the engine. */
class SnapshotSpec extends AnyFunSuite {
  private def ts(s: String) = Timestamp.valueOf(s)

  test("vertices/edges views mirror the interactive API") {
    val g = new GraftGraph(TestSpark.spark)
    val a = g.addVertex(); a.setProperty("name", "a")
    val b = g.addVertex(); b.setProperty("name", "b")
    val e = g.addEdge(a, b, "knows")
    val snap = Snapshot.head(g.log)
    assert(snap.vertexIds.collect().map(_.getLong(0)).toSet == Set(a.id, b.id))
    val row = snap.edges.collect().head
    assert(row.getAs[Long]("id") == e.id && row.getAs[String]("label") == "knows" &&
      row.getAs[Long]("outV") == a.id && row.getAs[Long]("inV") == b.id)
    val props = snap.vertices.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Map[String, String]]("props")).toMap
    assert(props(a.id) == Map("name" -> "a"))
  }

  test("SQL surface: temp views over a snapshot answer spark.sql queries") {
    val spark = TestSpark.spark
    val g = new GraftGraph(spark)
    val a = g.addVertex(); a.setProperty("name", "alice")
    val b = g.addVertex(); b.setProperty("name", "bob")
    val c = g.addVertex(); c.setProperty("name", "carol")
    g.addEdge(a, b, "knows"); g.addEdge(a, c, "knows"); g.addEdge(b, c, "likes")
    Snapshot.head(g.log).createViews("gsql")
    assert(spark.sql("SELECT count(*) AS n FROM gsql_edges WHERE label = 'knows'")
      .head().getLong(0) == 2L)
    // relational traversal: alice's out-neighbors by name, pure SQL
    val names = spark.sql(
      """SELECT p2.vStr AS nb FROM gsql_edges e
        |JOIN gsql_vertex_props p1 ON p1.e = e.outV AND p1.key = 'name' AND p1.vStr = 'alice'
        |JOIN gsql_vertex_props p2 ON p2.e = e.inV AND p2.key = 'name'
        |WHERE e.label = 'knows'""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(names == Set("bob", "carol"))
  }

  test("retraction visibility: snapshot loses the fact, history keeps it") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    v.setProperty("p", 1L)
    v.removeProperty("p")
    val snap = Snapshot.head(g.log)
    assert(snap.prop("p", PropType.PLong, A.Vertex).count() == 0)
    val hist = snap.history.where(col("attr") === "p.long.vertex")
    assert(hist.count() == 2) // assertion + retraction both in history
    assert(snap.since(g.log.headTx - 1).count() >= 1)
  }

  test("asOf pins to resolved tx; latest-wins within tx uses seq") {
    val g = new GraftGraph(TestSpark.spark)
    g.setTransactionTime(ts("2024-01-01 00:00:00"))
    val v = g.addVertex(); v.setProperty("p", 1L)
    g.setTransactionTime(ts("2024-02-01 00:00:00"))
    // one tx writing p twice: latest statement wins (seq tiebreak)
    g.inTx { v.setProperty("p", 98L); v.setProperty("p", 99L) }
    val snap = Snapshot.head(g.log)
    def pAt(at: String): Seq[Long] =
      snap.asOf(ts(at)).prop("p", PropType.PLong, A.Vertex)
        .collect().map(_.getAs[Long]("v")).toSeq
    assert(pAt("2024-01-15 00:00:00") == Seq(1L))
    assert(pAt("2024-02-15 00:00:00") == Seq(99L))
    assert(pAt("2023-01-01 00:00:00").isEmpty)
  }

  test("elementsByProp pushes a typed equality filter") {
    val g = new GraftGraph(TestSpark.spark)
    val a = g.addVertex(); a.setProperty("color", "red")
    val b = g.addVertex(); b.setProperty("color", "blue")
    val snap = Snapshot.head(g.log)
    assert(snap.elementsByProp("color", PropType.PString, "red", A.Vertex)
      .collect().map(_.getLong(0)).toSeq == Seq(a.id))
  }

  test("inTx: elements created in the batch are usable within it") {
    val g = new GraftGraph(TestSpark.spark)
    val head0 = g.log.headTx
    val ((a, b), tx) = g.inTx {
      val a = g.addVertex()
      a.setProperty("name", "a")        // must see the buffered type fact
      val b = g.addVertex()
      g.addEdge(a, b, "knows")          // endpoints live only in the buffer
      (a, b)
    }
    assert(tx == head0 + 1)
    assert(a.getProperty("name") == "a")
    assert(a.getEdges("out", "knows").head.getVertex("in").id == b.id)
  }

  test("inTx: a throwing body rolls the buffer back") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    intercept[RuntimeException] {
      g.inTx { v.setProperty("p", 1L); throw new RuntimeException("boom") }
    }
    val head = g.log.headTx
    val w = g.addVertex()
    w.setProperty("q", 2L)
    // the failed batch's fact must NOT leak into later commits
    assert(v.getProperty("p") == null)
    assert(g.log.allFacts.forall(f => !(f.e == v.id && f.attr == "p.long.vertex")))
    assert(g.log.headTx == head + 2) // addVertex + setProperty only
  }

  test("inTx batching: one tx, atomic visibility") {
    val g = new GraftGraph(TestSpark.spark)
    val v = g.addVertex()
    val head0 = g.log.headTx
    g.inTx { v.setProperty("x", 1L); v.setProperty("y", 2L) }
    assert(g.log.headTx == head0 + 1)
    val snap = Snapshot.head(g.log).asOfTxId(head0)
    assert(snap.prop("x", PropType.PLong, A.Vertex).count() == 0)
  }
}
