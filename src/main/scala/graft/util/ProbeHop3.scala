package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.graphx._
import org.apache.spark.rdd.RDD

/** Temporary diagnostic: per-hop timing of the hop3_graphx path. */
object ProbeHop3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val snap = graft.projection.TpchGraph.snapshot(spark, sfDir)
    time("snapshot warm") { snap.currentFacts.count(); snap.edges.count() }
    val g = time("cachedGraph build") {
      val g = graft.gx.GraphXTraversal.cachedGraph(snap)
      g.edges.count(); g
    }
    println(s"[probe] edge partitions: ${g.edges.getNumPartitions}, " +
      s"vertex partitions: ${g.vertices.getNumPartitions}, " +
      s"edges: ${g.numEdges}, vertices: ${g.numVertices}")
    (1 to 6).foreach { rep =>
      val df = time(s"rep$rep hop3 total") {
        val d = graft.gx.GraphXTraversal.hop3(spark, snap)
        d.collect()
      }
      println(s"[probe] rep$rep result=${df.mkString}")
      spark.sparkContext.getRDDStorageInfo
        .filter(_.memSize > 100L * 1024 * 1024).sortBy(-_.memSize)
        .foreach(i => println(f"[probe]   rdd ${i.id}%4d ${i.name}%-40s ${i.memSize / 1e9}%6.2f GB x${i.numCachedPartitions}"))
    }
    spark.stop()
  }
}
