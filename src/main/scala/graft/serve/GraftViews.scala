package graft.serve

import org.apache.spark.sql.DataFrame
import graft.model.A
import graft.snapshot.Snapshot

/**
 * The serving layer: register the engine's relations in the session
 * catalog so ANY standard Spark SQL endpoint can query the graph with
 * plain SQL — the Spark-native analog of the reference's Rexster REST
 * exposure (FluxGraphConfiguration.java:24-42). A native engine needs
 * its own serving daemon; a Spark library's serving surface is the
 * catalog plus whichever endpoint the deployment already runs:
 *
 *  - `spark-sql` / notebooks: call [[register]], query the views;
 *  - JDBC/ODBC: `HiveThriftServer2.startWithContext(spark.sqlContext)`
 *    after [[register]] serves them over Thrift;
 *  - Spark Connect: a connect server started on the same session
 *    exposes the views to remote thin clients.
 *
 * Views are DEFINITIONS, not copies: each query against them re-plans
 * against the snapshot's lazy DataFrames, so Catalyst still prunes
 * columns and pushes fact-table filters per query (the asOf bucket
 * prune included), and a registered view over a 100 TB fact log costs
 * nothing until queried. Time travel is first-class: [[registerAsOf]]
 * publishes the same surface pinned at a transaction, under its own
 * prefix — the SQL twin of `setCheckpointTime`.
 */
object GraftViews {

  /** Register the snapshot's relations as `<prefix>_*` temp views;
    * returns the registered names. Views: vertices (id, props map),
    * vertex_ids (id only — the NARROW navigation view: joins that only
    * need existence/ids must not pay the props-map pivot; Spark has no
    * left-join elimination to prune it out of `vertices` per query),
    * edges (id, label, outV, inV), facts (live latest-wins facts),
    * history (all facts ≤ the snapshot's tx), vertex_props/edge_props
    * (long-form typed property facts). */
  /** The one list of served relations — both registrars consume it, so
    * the local and remote (global_temp) surfaces cannot diverge. */
  private def viewDefs(snap: Snapshot, prefix: String): Seq[(String, DataFrame)] =
    Seq(
      s"${prefix}_vertices" -> snap.vertices,
      s"${prefix}_vertex_ids" -> snap.vertexIds,
      s"${prefix}_edges" -> snap.edges,
      s"${prefix}_facts" -> snap.currentFacts,
      s"${prefix}_history" -> snap.history,
      s"${prefix}_vertex_props" -> snap.propFacts(A.Vertex),
      s"${prefix}_edge_props" -> snap.propFacts(A.Edge))

  def register(snap: Snapshot, prefix: String = "graft"): Seq[String] = {
    val views = viewDefs(snap, prefix)
    views.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    views.map(_._1)
  }

  /** The same surface pinned as-of transaction `tx` (inclusive), under
    * `prefix` — lets one session serve the head and any number of
    * historical checkpoints side by side. */
  def registerAsOf(snap: Snapshot, tx: Long,
                   prefix: String = "graft_asof"): Seq[String] =
    register(snap.asOfTxId(tx), prefix)

  /** Register the same surface as GLOBAL temp views
    * (`global_temp.<prefix>_*`). Plain temp views are session-scoped,
    * and every multi-session endpoint — Spark Connect, the Thrift
    * JDBC/ODBC server — hands each remote client its OWN isolated
    * session, so the session-scoped surface would be invisible over
    * the wire. Global temp views live in the shared `global_temp`
    * database and are the cross-session serving surface; they are
    * still definitions (re-planned per query), not copies. */
  def registerGlobal(snap: Snapshot, prefix: String = "graft"): Seq[String] = {
    val views = viewDefs(snap, prefix)
    views.foreach { case (name, df) => df.createOrReplaceGlobalTempView(name) }
    views.map { case (name, _) => s"global_temp.$name" }
  }

  /** Global variant of [[registerAsOf]]: a pinned historical checkpoint
    * published beside the head for every remote session. */
  def registerGlobalAsOf(snap: Snapshot, tx: Long,
                         prefix: String = "graft_asof"): Seq[String] =
    registerGlobal(snap.asOfTxId(tx), prefix)
}
