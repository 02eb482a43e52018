package graft.graph

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.model.{A, AttrCodec}
import graft.snapshot.Snapshot

/**
 * Read-only Blueprints-style handle facade over ANY [[Snapshot]] — the
 * scalable twin of [[GraftGraph]]'s driver-side handles: the same
 * getVertex/getEdges/getProperty surface a reference user expects, but
 * every read is a Spark job against the (possibly 100 TB, parquet-backed)
 * fact store, and scans hand back lazy iterators over
 * `Dataset.toLocalIterator` (the FluxIterable pattern, SURVEY §2.9 —
 * pull-based, never a full collect).
 *
 * Point lookups ride the snapshot's pushed-down filters (e = id /
 * attr = encoded-key equality reach the parquet scan); use the set-
 * oriented Snapshot views directly for analytics — this facade is for
 * API parity and exploratory access.
 */
final class SnapshotGraphView(val snap: Snapshot) {

  /** Lazy full scan (FluxGraph.getVertices, set-at-a-time underneath). */
  def vertices(): Iterator[VertexView] =
    snap.vertexIds.toLocalIterator().asScala.map(r => new VertexView(r.getLong(0)))

  def edges(): Iterator[EdgeView] =
    snap.edges.toLocalIterator().asScala.map(rowToEdge)

  def vertex(id: Long): Option[VertexView] =
    if (snap.vertexIds.where(col("id") === id).isEmpty) None
    else Some(new VertexView(id))

  def edge(id: Long): Option[EdgeView] =
    snap.edges.where(col("id") === id).collect().headOption.map(rowToEdge)

  private def rowToEdge(r: Row) = new EdgeView(r.getAs[Long]("id"),
    r.getAs[String]("label"), r.getAs[Long]("outV"), r.getAs[Long]("inV"))

  private implicit class IterWrap[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }

  /** Decode a prop-fact row to the reference's surface type using the
    * attr's embedded type name — read-path parity with
    * GraftGraph.decodeValue (a float-typed property comes back as Float,
    * bigint as BigInteger, on BOTH read surfaces). */
  private def decodeRow(r: Row): Any = r.getAs[String]("ptype") match {
    case "string"  => r.getAs[String]("vStr")
    case "uuid"    => java.util.UUID.fromString(r.getAs[String]("vStr"))
    case "uri"     => java.net.URI.create(r.getAs[String]("vStr"))
    case "boolean" => r.getAs[Any]("vBool")
    case "long"    => r.getAs[Any]("vLong")
    case "bigint"  => Option(r.getAs[java.math.BigDecimal]("vDec"))
      .map(_.toBigInteger).orNull
    case "float"   => Option(r.getAs[java.lang.Double]("vDouble"))
      .map(d => java.lang.Float.valueOf(d.floatValue)).orNull
    case "double"  => r.getAs[Any]("vDouble")
    case "bigdec"  => r.getAs[Any]("vDec")
    case "ts"      => r.getAs[Any]("vTs")
    case _         => r.getAs[Any]("vStr")
  }

  sealed abstract class ElemView(val id: Long, kind: String) {
    /** All live user properties of this element, decoded — computed once
      * per handle (the snapshot is immutable; a def would launch one
      * Spark job per getProperty call). */
    lazy val properties: Map[String, Any] =
      snap.propFacts(kind).where(col("e") === id).collect().map { r =>
        r.getAs[String]("key") -> decodeRow(r)
      }.toMap
    def getProperty(key: String): Any = properties.getOrElse(key, null)
    def getPropertyKeys: Set[String] = properties.keySet
  }

  final class VertexView(id0: Long) extends ElemView(id0, A.Vertex) {
    def getEdges(dir: String, labels: String*): Iterator[EdgeView] = {
      val base = dir match {
        case "out"  => snap.edges.where(col("outV") === id)
        case "in"   => snap.edges.where(col("inV") === id)
        case "both" => snap.edges.where(col("outV") === id || col("inV") === id)
      }
      val filtered = if (labels.isEmpty) base else base.where(col("label").isin(labels: _*))
      filtered.toLocalIterator().asScala.map(rowToEdge)
    }
    def getVertices(dir: String, labels: String*): Iterator[VertexView] =
      getEdges(dir, labels: _*).map(e => new VertexView(if (e.outV == id) e.inV else e.outV))
  }

  final class EdgeView(id0: Long, val label: String, val outV: Long, val inV: Long)
    extends ElemView(id0, A.Edge) {
    def getVertex(dir: String): VertexView = dir match {
      case "in"  => new VertexView(inV)
      case "out" => new VertexView(outV)
    }
  }
}
