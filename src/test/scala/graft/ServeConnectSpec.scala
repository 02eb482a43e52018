package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraftGraph
import graft.serve.{GraftConnectServer, GraftViews}
import graft.snapshot.Snapshot

/** End-to-end remote serving over Spark Connect (the wire-protocol
  * Rexster analog): a thin client session talks gRPC + Arrow to the
  * in-process Connect service and must see the published global views
  * — including a pinned asOf checkpoint — with answers identical to
  * the local DataFrame API. Connect hands every client an ISOLATED
  * server-side session, so this also proves the global_temp surface is
  * the right scope (plain temp views would be invisible remotely). */
class ServeConnectSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  // probe a free ephemeral port — a fixed one collides with whatever else
  // the host runs (or a leaked service from an aborted test JVM)
  private val port = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("thin client queries the published graph over gRPC") {
    val g = new GraftGraph(spark)
    val a = g.addVertex(); a.setProperty("name", "a")
    val b = g.addVertex(); b.setProperty("name", "b")
    val c = g.addVertex(); c.setProperty("name", "c")
    g.addEdge(a, b, "knows"); g.addEdge(a, c, "knows")
    val txBefore = g.log.headTx
    g.addEdge(b, c, "likes")
    val snap = Snapshot.head(g.log)

    val names = GraftViews.registerGlobal(snap, "wire")
    assert(names.contains("global_temp.wire_edges"))
    GraftViews.registerGlobalAsOf(snap, txBefore, "wire_past")

    GraftConnectServer.start(spark, port)
    val remote = GraftConnectServer.client(port)
    try {
      // the client session is NOT the server session: server-side state
      // is isolated per client, which is exactly why the surface is
      // global_temp
      val byLabel = remote.sql(
        "SELECT label, count(*) AS n FROM global_temp.wire_edges GROUP BY label")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byLabel == Map("knows" -> 2L, "likes" -> 1L))

      // cross-view join with map access arrives intact through Arrow
      val out = remote.sql(
        """SELECT v.props['name'] AS src, count(*) AS n
          |FROM global_temp.wire_edges e
          |JOIN global_temp.wire_vertices v ON v.id = e.outV
          |GROUP BY v.props['name']""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("a" -> 2L, "b" -> 1L))

      // remote time travel: head and pinned checkpoint in one statement
      val newLabels = remote.sql(
        """SELECT h.label FROM global_temp.wire_edges h
          |LEFT ANTI JOIN global_temp.wire_past_edges p ON p.id = h.id""".stripMargin)
        .collect().map(_.getString(0)).toSeq
      assert(newLabels == Seq("likes"))

      // remote answers == local answers on the same view text
      val local = spark.sql(
        "SELECT count(*) FROM global_temp.wire_edges").head().getLong(0)
      val wire = remote.sql(
        "SELECT count(*) FROM global_temp.wire_edges").head().getLong(0)
      assert(local == wire && wire == 3L)
    } finally {
      try remote.close() catch { case _: Throwable => () }
      GraftConnectServer.stop()
    }
  }

  test("concurrent clients: a pinned asOf session stays isolated from head mutations") {
    // the reference scopes checkpoints per THREAD (FluxGraph.java:37-41:
    // setCheckpointTime is a ThreadLocal) — the wire analog is one
    // client session reading a pinned asOf surface while another reads
    // the moving head, with interleaved queries never bleeding between
    // them. Connect gives each client an isolated server-side session;
    // the pinned GLOBAL view is a definition fixed at registration.
    val g = new GraftGraph(spark)
    val a = g.addVertex(); val b = g.addVertex(); val c = g.addVertex()
    g.addEdge(a, b, "knows")
    val txPin = g.log.headTx
    g.addEdge(a, c, "knows"); g.addEdge(b, c, "likes")
    val head = Snapshot.head(g.log)
    GraftViews.registerGlobal(head, "cc")
    GraftViews.registerGlobalAsOf(head, txPin, "cc_past")

    GraftConnectServer.start(spark, port)
    val pinned = GraftConnectServer.client(port) // session reading the checkpoint
    val live = GraftConnectServer.client(port)   // session reading the head
    def edgeCount(s: org.apache.spark.sql.connect.SparkSession, view: String): Long =
      s.sql(s"SELECT count(*) AS n FROM global_temp.${view}_edges").head().getLong(0)
    try {
      // interleaved sequential reads: both sessions answer from their
      // own surface
      assert(edgeCount(pinned, "cc_past") == 1L)
      assert(edgeCount(live, "cc") == 3L)
      assert(edgeCount(pinned, "cc_past") == 1L)

      // mutate the head and republish it — the pinned surface must not
      // move (its definition is fixed at txPin), the live one must
      g.addEdge(c, a, "follows")
      GraftViews.registerGlobal(Snapshot.head(g.log), "cc")
      assert(edgeCount(live, "cc") == 4L)
      assert(edgeCount(pinned, "cc_past") == 1L)

      // genuinely concurrent: both sessions fire 8 queries in parallel;
      // every answer must come from the right snapshot
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val ppin = Future { (1 to 8).map(_ => edgeCount(pinned, "cc_past")) }
      val plive = Future { (1 to 8).map(_ => edgeCount(live, "cc")) }
      assert(Await.result(ppin, 120.seconds).forall(_ == 1L))
      assert(Await.result(plive, 120.seconds).forall(_ == 4L))

      // and the pinned surface equals a local asOf recount — the wire
      // adds isolation, not drift
      val localPinned = Snapshot.head(g.log).asOfTxId(txPin).edges.count()
      assert(localPinned == 1L)
    } finally {
      try pinned.close() catch { case _: Throwable => () }
      try live.close() catch { case _: Throwable => () }
      GraftConnectServer.stop()
    }
  }
}
