package graft.serve

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connect.service.SparkConnectService

/**
 * Remote serving over Spark Connect — the wire-protocol analog of the
 * reference's Rexster REST server (FluxGraphConfiguration.java:24-42).
 * The reference ships its own daemon; the Spark-native equivalent is
 * the stock Spark Connect gRPC service started on the session that
 * holds the engine's registered views: thin clients (JVM, Python, Go,
 * JDBC) then query the graph over gRPC + Arrow with no engine code on
 * the client at all — the serving contract IS SQL over the published
 * `global_temp.graft_*` relations ([[GraftViews.registerGlobal]]).
 *
 * Scale note: in a real deployment this runs on the cluster's driver
 * (or a Connect-dedicated driver) and every client query plans on the
 * cluster — views are definitions, so a remote `WHERE id = ?` against
 * a 100 TB fact log still gets the full pushdown/prune path. Nothing
 * here is test-only scaffolding; the same three calls are the
 * production recipe.
 */
object GraftConnectServer {

  /** Port the JVM-global Connect service was started on by [[start]],
    * while running. The service is a singleton: a second start() is a
    * no-op inside Spark, so WE must refuse a conflicting port rather
    * than silently serve the old one. */
  @volatile private var boundPort: Option[Int] = None

  /** Start the in-process Spark Connect gRPC service on `port`.
    * The port key is read from the SparkContext conf at service start;
    * production deployments set `spark.connect.grpc.binding.port` on
    * the session builder — here it is injected into the live conf
    * (package-private in Scala, public in bytecode, hence reflection)
    * so a shared test session can pick a free port. */
  def start(spark: SparkSession, port: Int = 15002): Unit = synchronized {
    boundPort match {
      case Some(p) if p == port => return // idempotent re-start
      case Some(p) => throw new IllegalStateException(
        s"Spark Connect service is a JVM-global singleton already bound to port $p; " +
          s"cannot rebind to $port — stop() it first")
      case None => ()
    }
    val sc = spark.sparkContext
    val conf =
      try sc.getClass.getMethod("conf").invoke(sc)
        .asInstanceOf[org.apache.spark.SparkConf]
      catch {
        case e: ReflectiveOperationException => throw new IllegalStateException(
          "SparkContext.conf accessor not reachable on this Spark version — " +
            "set spark.connect.grpc.binding.port on the session builder instead", e)
      }
    conf.set("spark.connect.grpc.binding.port", port.toString)
    SparkConnectService.start(sc)
    boundPort = Some(port)
  }

  def stop(): Unit = synchronized {
    SparkConnectService.stop(None, None)
    boundPort = None
  }

  /** A thin client for `sc://localhost:port` — a REAL over-the-wire
    * session (gRPC channel, Arrow result batches, isolated server-side
    * session state), not a handle to the local one. */
  def client(port: Int = 15002): org.apache.spark.sql.connect.SparkSession =
    org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port").create()
}
