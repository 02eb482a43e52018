package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraftGraph
import graft.serve.GraftViews
import graft.snapshot.Snapshot

/** The serving layer (Rexster analog): catalog views must answer plain
  * SQL identically to the DataFrame API, including pinned asOf views
  * served side by side with the head. */
class ServeSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("registered views answer SQL identically to the snapshot API") {
    val g = new GraftGraph(spark)
    val a = g.addVertex(); a.setProperty("name", "a")
    val b = g.addVertex(); b.setProperty("name", "b")
    val c = g.addVertex(); c.setProperty("name", "c")
    g.addEdge(a, b, "knows"); g.addEdge(a, c, "knows"); g.addEdge(b, c, "likes")
    val snap = Snapshot.head(g.log)

    val names = GraftViews.register(snap, "srv")
    assert(names.contains("srv_edges") && names.contains("srv_vertices"))

    val byLabel = spark.sql(
      "SELECT label, count(*) AS n FROM srv_edges GROUP BY label")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel == Map("knows" -> 2L, "likes" -> 1L))

    // cross-view join + map access: the props column serves through SQL
    val out = spark.sql(
      """SELECT v.props['name'] AS src, count(*) AS n
        |FROM srv_edges e JOIN srv_vertices v ON v.id = e.outV
        |GROUP BY v.props['name']""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))

    // long-form typed property view
    assert(spark.sql(
      "SELECT count(*) FROM srv_vertex_props WHERE key = 'name'")
      .head().getLong(0) == 3L)
  }

  test("asOf views serve a pinned checkpoint next to the head") {
    val g = new GraftGraph(spark)
    val a = g.addVertex(); val b = g.addVertex()
    g.addEdge(a, b, "knows")
    val txBefore = g.log.headTx
    val c = g.addVertex(); g.addEdge(a, c, "likes")
    val snap = Snapshot.head(g.log)

    GraftViews.register(snap, "head")
    GraftViews.registerAsOf(snap, txBefore, "past")

    assert(spark.sql("SELECT count(*) FROM head_edges").head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM past_edges").head().getLong(0) == 1L)
    // both prefixes resolve in ONE statement — a time-travel diff in SQL
    val newLabels = spark.sql(
      """SELECT h.label FROM head_edges h
        |LEFT ANTI JOIN past_edges p ON p.id = h.id""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(newLabels == Seq("likes"))
  }
}
