package graft.gx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.snapshot.Snapshot

/** EVIDENCE TOOLING (r15, closing the r14 verdict's plan-evidence gap):
  * ONE un-fused round/step of each iterative operator, built over the
  * SAME shared checkpointed frames the real loops use, for PlanDump —
  * the registered queries' final plans show only a checkpointed result
  * scan, so the per-round Exchange placement (the thing the
  * partitionedCheckpoint layout-preservation claims are about) is
  * invisible without these. Each helper mirrors its loop body verbatim
  * (or calls the extracted body directly); none is registered as a
  * query and none is reachable from Bench/Verify. */
private[graft] object RoundSteps {

  private val DagLabels = Seq("placed", "contains", "supplied_by")
  private val Landmarks = Seq(4000001L, 4000002L, 4000003L)

  /** One relational PageRank round over the shared contribEdges /
    * vertexFrame checkpoints (mirrors pageRankRounds' loop body; ranks
    * seeded uniform like round 1 of the global variant). */
  def pagerankRound(spark: SparkSession, snap: Snapshot): DataFrame = {
    val contrib = GraphXTraversal.contribEdges(snap)
    val verts = GraphXTraversal.vertexFrame(snap)
    val ranks = verts.select(col("v"), lit(1.0).as("r")).localCheckpoint(true)
    val msg = contrib
      .join(ranks.where(col("r") =!= 0.0).select(col("v").as("u"), col("r")), "u")
      .groupBy(col("v")).agg(sum(col("r") * col("w")).as("s"))
    verts.join(msg, Seq("v"), "left_outer")
      .select(col("v"),
        (lit(0.15) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("r"))
  }

  /** One random-walk step over the partitioned edge checkpoint (mirrors
    * randomWalksDF's per-step body at t = 1). */
  def walkStep(spark: SparkSession, snap: Snapshot): DataFrame = {
    val edges = GraphXTraversal.partitionedCheckpoint(
      snap.edges.select(col("outV").as("v"), col("inV").as("u")), col("v"))
    val frontier = edges.select(col("v")).distinct()
      .where(col("v") >= 3000000L && col("v") < 4000000L)
      .select(col("v").as("walk_id"), col("v"))
      .localCheckpoint(true)
    frontier.join(edges, "v")
      .select(col("walk_id"), col("u"),
        md5(concat_ws(":", col("walk_id"), lit(1), col("u"))).as("h"))
      .groupBy(col("walk_id"))
      .agg(min(struct(col("h"), col("u"))).as("m"))
      .select(col("walk_id"), col("m.u").as("v"))
  }

  /** One synchronous LPA round over the lpaEdges frame (mirrors
    * lpaRounds' loop body with the round-0 labeling). */
  def lpaRound(spark: SparkSession, snap: Snapshot): DataFrame = {
    val g = GraphXTraversal.pairGraph(snap, 30.0)
    val pairs = spark.createDataFrame(
      g.edges.map(e => (e.srcId, e.dstId))).toDF("a", "b")
    val ed = GraphXTraversal.lpaEdges(pairs)
    val labels = ed.select(col("x").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
      .localCheckpoint(true)
    val counts = ed.join(labels.select(col("v").as("y"), col("lbl")), "y")
      .groupBy(col("x").as("v"), col("lbl"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("v"))
      .agg(min_by(col("lbl"),
        struct((-col("c")).as("nc"), col("lbl").as("l"))).as("lbl"))
  }

  /** One Bellman–Ford relaxation round over the memoized weighted edge
    * frame (mirrors ssspWeightedDF's loop body with the round-0 dist). */
  def ssspRound(spark: SparkSession, snap: Snapshot): DataFrame = {
    val edges = GraphXTraversal.weightedEdges(snap, DagLabels)
    val dist = edges.select(col("src").as("v"))
      .unionAll(edges.select(col("dst").as("v"))).distinct()
      .where(col("v").isin(Landmarks: _*))
      .select(col("v"), col("v").as("lm"), lit(0L).as("d"))
      .localCheckpoint(true)
    val relaxed = edges
      .join(dist.select(col("v").as("dst"), col("lm"), col("d")), "dst")
      .select(col("src").as("v"), col("lm"), (col("wt") + col("d")).as("d"))
    dist.unionAll(relaxed)
      .groupBy(col("v"), col("lm")).agg(min(col("d")).as("d"))
  }

  /** One HyperANF systolic round over the anfEdges frame and the
    * checkpointed round-0 registers (calls the extracted bodies). */
  def hyperanfRound(spark: SparkSession, snap: Snapshot): DataFrame = {
    val edges = HyperAnf.anfEdges(snap, DagLabels)
    val regs = HyperAnf.anfRegs0(edges).localCheckpoint(true)
    HyperAnf.anfRound(edges, regs)
  }

  /** One k-core peel round over the checkpointed pair-edge frame
    * (mirrors kCorePeel's loop body, k = 12). */
  def kcoreRound(spark: SparkSession, snap: Snapshot): DataFrame = {
    val g = GraphXTraversal.pairGraph(snap, 30.0)
    val pairs = spark.createDataFrame(
      g.edges.map(e => (e.srcId, e.dstId))).toDF("a", "b")
    val edges = pairs.select(col("a"), col("b")).localCheckpoint(true)
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val alive = deg.where(col("d") >= 12).select(col("v"))
    edges
      .join(alive.select(col("v").as("a")), Seq("a"), "left_semi")
      .join(alive.select(col("v").as("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
  }

  /** One k-truss support round over the checkpointed pair-edge frame
    * (kTrussPeel's per-round core is exactly edgeSupport). */
  def ktrussRound(spark: SparkSession, snap: Snapshot): DataFrame = {
    val g = GraphXTraversal.pairGraph(snap, 30.0)
    val pairs = spark.createDataFrame(
      g.edges.map(e => (e.srcId, e.dstId))).toDF("a", "b")
    val edges = pairs.select(col("a"), col("b")).localCheckpoint(true)
    GraphXTraversal.edgeSupport(edges)
      .where(col("support") >= 2).select(col("a"), col("b"))
  }

  /** One forward σ round of the landmark-betweenness sweep (mirrors
    * betweennessLandmarksDF's level-1 body over the persisted tree). */
  def betweennessRound(spark: SparkSession, snap: Snapshot): DataFrame = {
    val sp = GraphXTraversal.shortestPathsDF(spark, snap, Landmarks, DagLabels)
    val e = snap.edges.where(col("label").isin(DagLabels: _*))
      .select(col("outV").as("u"), col("inV").as("w"))
    val tree = e
      .join(sp.select(col("vertex_id").as("u"), col("landmark_id").as("lm"),
        col("dist").as("du")), "u")
      .join(sp.select(col("vertex_id").as("w2"), col("landmark_id").as("lm2"),
        col("dist").as("dw")),
        col("w") === col("w2") && col("lm") === col("lm2"))
      .where(col("dw") === col("du") - 1)
      .select(col("u"), col("w"), col("lm"), col("du"))
    val prev = sp.where(col("dist") === 0)
      .select(col("vertex_id").as("pw"), col("landmark_id").as("plm"),
        lit(1L).as("psigma"))
    tree.where(col("du") === 1)
      .join(prev, col("w") === col("pw") && col("lm") === col("plm"))
      .groupBy(col("u"), col("lm"))
      .agg(sum(col("psigma")).as("sigma"))
      .select(col("u").as("v"), col("lm"), col("sigma"))
  }

  /** Registry for PlanDump: name → round-step frame builder. */
  val steps: Map[String, (SparkSession, Snapshot) => DataFrame] = Map(
    "pagerank_round" -> pagerankRound,
    "walk_step" -> walkStep,
    "lpa_round" -> lpaRound,
    "sssp_round" -> ssspRound,
    "hyperanf_round" -> hyperanfRound,
    "kcore_round" -> kcoreRound,
    "ktruss_round" -> ktrussRound,
    "betweenness_round" -> betweennessRound)
}
