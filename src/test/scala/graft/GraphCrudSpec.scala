package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraftGraph

/** Blueprints-TCK-style conformance for the CRUD surface (the reference
  * runs VertexTestSuite/EdgeTestSuite/GraphTestSuite reflectively —
  * FluxGraphTest.java:27-43; these are the semantics they enforce). */
class GraphCrudSpec extends AnyFunSuite {
  private def g = new GraftGraph(TestSpark.spark)

  test("addVertex / getVertex / getVertices") {
    val graph = g
    val v1 = graph.addVertex()
    val v2 = graph.addVertex()
    assert(graph.getVertices().map(_.id).toSet == Set(v1.id, v2.id))
    assert(graph.getVertex(v1.id).id == v1.id)
    assert(graph.getVertex(999999L) == null)
  }

  test("addEdge endpoints, label, direction") {
    val graph = g
    val a = graph.addVertex(); val b = graph.addVertex()
    val e = graph.addEdge(a, b, "knows")
    assert(e.getLabel == "knows")
    assert(e.getVertex("out").id == a.id)
    assert(e.getVertex("in").id == b.id)
    assert(a.getEdges("out").map(_.id) == Seq(e.id))
    assert(a.getEdges("in").isEmpty)
    assert(b.getEdges("in").map(_.id) == Seq(e.id))
    assert(a.getVertices("out").map(_.id) == Seq(b.id))
    assert(a.getEdges("out", "knows").map(_.id) == Seq(e.id))
    assert(a.getEdges("out", "likes").isEmpty)
  }

  test("self-loops and duplicate edges are allowed (FluxGraph.java:51-52)") {
    val graph = g
    val a = graph.addVertex()
    val e1 = graph.addEdge(a, a, "self")
    val e2 = graph.addEdge(a, a, "self")
    assert(e1.id != e2.id)
    assert(a.getEdges("out").size == 2)
    assert(a.getEdges("both").size == 4) // out ++ in concat, bag semantics
  }

  test("property round-trip for all 10 reference types + timestamp") {
    val graph = g
    val v = graph.addVertex()
    val uuid = java.util.UUID.randomUUID()
    val uri = java.net.URI.create("http://example.org/x")
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    v.setProperty("s", "str"); assert(v.getProperty("s") == "str")
    v.setProperty("b", java.lang.Boolean.TRUE); assert(v.getProperty("b") == true)
    v.setProperty("l", 7L); assert(v.getProperty("l") == 7L)
    v.setProperty("i", 7: java.lang.Integer); assert(v.getProperty("i") == 7L) // Integer→long
    v.setProperty("bi", new java.math.BigInteger("123456789012345678"))
    assert(v.getProperty("bi") == new java.math.BigInteger("123456789012345678"))
    v.setProperty("f", 1.5f); assert(v.getProperty("f") == 1.5f)
    v.setProperty("d", 2.5d); assert(v.getProperty("d") == 2.5d)
    v.setProperty("bd", new java.math.BigDecimal("3.14"))
    assert(v.getProperty("bd").asInstanceOf[java.math.BigDecimal].compareTo(new java.math.BigDecimal("3.14")) == 0)
    v.setProperty("u", uuid); assert(v.getProperty("u") == uuid)
    v.setProperty("uri", uri); assert(v.getProperty("uri") == uri)
    v.setProperty("t", ts); assert(v.getProperty("t") == ts)
    assert(v.getPropertyKeys == Set("s", "b", "l", "i", "bi", "f", "d", "bd", "u", "uri", "t"))
  }

  test("same key different type: retract+add, single live attribute") {
    val graph = g
    val v = graph.addVertex()
    v.setProperty("x", 1: java.lang.Integer)
    v.setProperty("x", 2L)         // same "long" attr — overwrite
    assert(v.getProperty("x") == 2L)
    v.setProperty("x", "s")        // type change
    assert(v.getProperty("x") == "s")
    assert(v.getPropertyKeys == Set("x"))
  }

  test("removeProperty returns old value; missing key returns null") {
    val graph = g
    val v = graph.addVertex()
    v.setProperty("p", 5L)
    assert(v.removeProperty("p") == 5L)
    assert(v.getProperty("p") == null)
    assert(v.removeProperty("nope") == null)
  }

  test("reserved/empty property keys rejected") {
    val graph = g
    val v = graph.addVertex()
    intercept[IllegalArgumentException](v.setProperty("id", 1L))
    intercept[IllegalArgumentException](v.setProperty("label", "x"))
    intercept[IllegalArgumentException](v.setProperty("", "x"))
  }

  test("removeEdge removes only the edge") {
    val graph = g
    val a = graph.addVertex(); val b = graph.addVertex()
    val e = graph.addEdge(a, b, "knows")
    graph.removeEdge(e)
    assert(graph.getEdge(e.id) == null)
    assert(e.isDeleted)
    assert(graph.getVertices().size == 2)
    assert(a.getEdges("both").isEmpty)
  }

  test("removeVertex cascades to incident edges (FluxGraph.java:371-387)") {
    val graph = g
    val a = graph.addVertex(); val b = graph.addVertex(); val c = graph.addVertex()
    val e1 = graph.addEdge(a, b, "knows")
    val e2 = graph.addEdge(c, b, "knows")
    val e3 = graph.addEdge(a, c, "likes")
    graph.removeVertex(b)
    assert(graph.getVertex(b.id) == null)
    assert(graph.getEdge(e1.id) == null)
    assert(graph.getEdge(e2.id) == null)
    assert(graph.getEdge(e3.id).id == e3.id) // untouched
  }

  test("clear removes everything in one commit (FluxGraph.java:306-312)") {
    val graph = g
    val a = graph.addVertex(); val b = graph.addVertex()
    graph.addEdge(a, b, "knows")
    val headBefore = graph.log.headTx
    graph.clear()
    assert(graph.getVertices().isEmpty)
    assert(graph.getEdges().isEmpty)
    assert(graph.log.headTx == headBefore + 1)
  }

  test("attr-value scan and count (FluxIndex.java:60-126)") {
    val graph = g
    val a = graph.addVertex(); a.setProperty("color", "red")
    val b = graph.addVertex(); b.setProperty("color", "red")
    val c = graph.addVertex(); c.setProperty("color", "blue")
    val e = graph.addEdge(a, b, "knows"); e.setProperty("w", 1L)
    assert(graph.getVertices("color", "red").map(_.id).toSet == Set(a.id, b.id))
    assert(graph.countVertices("color", "red") == 2L)
    assert(graph.countVertices("color", "green") == 0L)
    assert(graph.getEdges("label", "knows").map(_.id) == Seq(e.id))
    assert(graph.getEdges("w", 1L).map(_.id) == Seq(e.id))
  }

  test("key index registry (FluxGraph.java:287-300)") {
    val graph = g
    graph.createKeyIndex("name", "vertex")
    graph.createKeyIndex("weight", "edge")
    assert(graph.getIndexedKeys("vertex") == Set("name"))
    assert(graph.getIndexedKeys("edge") == Set("weight"))
    graph.dropKeyIndex("name", "vertex")
    assert(graph.getIndexedKeys("vertex") == Set.empty)
  }

  test("TCK edge cases: bad edge id, deleted-element reads throw, indexed lookup") {
    val graph = g
    val a = graph.addVertex(); a.setProperty("name", "a")
    val b = graph.addVertex(); b.setProperty("name", "b")
    graph.addEdge(a, b, "knows")
    assert(graph.getEdge(999999L) == null) // bad id → null, no throw
    // lookup through a declared key index returns the same elements
    graph.createKeyIndex("name", "vertex")
    assert(graph.getVertices("name", "a").map(_.id) == Seq(a.id))
    // deleted-element property reads throw (FluxElement.java:60-78)
    graph.removeVertex(b)
    intercept[IllegalArgumentException](b.getProperty("name"))
    intercept[IllegalArgumentException](b.getPropertyKeys)
  }

  test("feature flags and manual-index stubs match the reference surface") {
    val graph = g
    val f = graph.getFeatures
    assert(f.supportsDuplicateEdges && f.supportsSelfLoops && f.ignoresSuppliedIds)
    assert(!f.supportsTransactions && !f.supportsIndices && f.supportsKeyIndices)
    val a = graph.addVertex(); a.setProperty("color", "red")
    val idx = graph.index("byColor", graft.model.A.Vertex)
    assert(idx.get("color", "red").map(_.id) == Seq(a.id))
    assert(idx.count("color", "red") == 1L)
    // put/remove/query are unsupported, as in FluxIndex.java:56-58,89-92,117-119
    intercept[UnsupportedOperationException](idx.put("color", "red", a))
    intercept[UnsupportedOperationException](idx.remove("color", "red", a))
    intercept[UnsupportedOperationException](idx.query("color", "r*"))
  }

  test("query builder: has / interval / labels / limit") {
    val graph = g
    val a = graph.addVertex()
    val b = graph.addVertex(); val c = graph.addVertex(); val d = graph.addVertex()
    graph.addEdge(a, b, "knows").setProperty("w", 1L)
    graph.addEdge(a, c, "knows").setProperty("w", 5L)
    graph.addEdge(a, d, "likes").setProperty("w", 5L)
    assert(a.query().labels("knows").count() == 2)
    assert(a.query().has("w", 5L).count() == 2)
    assert(a.query().labels("knows").has("w", 5L).vertices().map(_.id) == Seq(c.id))
    assert(a.query().interval("w",
      1L.asInstanceOf[Comparable[Any]], 5L.asInstanceOf[Comparable[Any]]).count() == 1) // [1,5)
    assert(a.query().limit(2).edges().size == 2)
    assert(a.query().direction("out").count() == 3)
  }

  test("query builder: NOT_EQUAL matches missing keys; limit composes with BOTH and filters") {
    val graph = g
    val a = graph.addVertex()
    val b = graph.addVertex(); val c = graph.addVertex(); val d = graph.addVertex()
    graph.addEdge(a, b, "knows").setProperty("w", 1L)
    graph.addEdge(a, c, "knows").setProperty("w", 5L)
    graph.addEdge(a, d, "likes") // NO w property
    graph.addEdge(b, a, "knows").setProperty("w", 5L) // incoming to a
    val five = 5L.asInstanceOf[Comparable[Any]]
    // Blueprints DefaultQuery.HasContainer semantics: NOT_EQUAL is
    // satisfied by edges MISSING the key, not only by differing values
    assert(a.query().direction("out").has("w", "<>", five).count() == 2) // w=1 and missing
    assert(a.query().has("w", "<>", five).count() == 2)                  // both dirs, two w=5 excluded
    // limit applies to the filtered BOTH concat (out edges first, then in)
    assert(a.query().count() == 4)                  // 3 out + 1 in
    assert(a.query().limit(3).edges().size == 3)
    assert(a.query().labels("knows").limit(2).count() == 2)
    assert(a.query().labels("knows").count() == 3)  // 2 out + 1 in
    // the BOTH neighbor bag resolves the OPPOSITE endpoint per edge
    assert(a.query().labels("knows").vertices().map(_.id).sorted == Seq(b.id, c.id, b.id).sorted)
  }
}
