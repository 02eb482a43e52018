package graft.io

import java.io.{InputStream, StringReader}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import graft.graph.GraftGraph

/**
 * Graph-format loaders — GraphML, GraphSON 1.0, GML — the reference's
 * source formats (TCK reader suites, FluxGraphTest.java:57-73; benchmark
 * fixture load at FluxBenchmarkTestSuite.java:24).
 *
 * Like the reference (which streams TinkerPop's readers into Blueprints
 * mutations), these parse on the driver and replay into the graph API;
 * supplied ids are ignored and engine ids assigned
 * (ignoresSuppliedIds=true, FluxGraph.java:59). Fixture files are
 * KB-scale; a 100 TB ingest path would not arrive as GraphML — it uses
 * the bulk projection route (graft.projection) instead.
 *
 * Values are typed per the GraphML key declarations / JSON value types /
 * GML literal shapes, mapping onto the reference's property type system.
 */
object GraphReaders {

  /** Load a GraphML document (TinkerPop flavor: <key> decls, <node>,
    * <edge source target label>, <data key=…>). Returns supplied-id →
    * engine VertexHandle map. */
  def inputGraphML(g: GraftGraph, in: InputStream): Map[String, g.VertexHandle] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(in)

    // key id → (attr.name, attr.type)
    val keys = mutable.Map.empty[String, (String, String)]
    val vertices = mutable.Map.empty[String, g.VertexHandle]
    // buffered edges: (source, target, label, props)
    val edges = mutable.ArrayBuffer.empty[(String, String, String, Seq[(String, Any)])]

    var curKind: String = null          // "node" | "edge"
    var curId, curSource, curTarget, curLabel: String = null
    var curProps = mutable.ArrayBuffer.empty[(String, Any)]
    var curDataKey: String = null
    val text = new StringBuilder

    def typed(t: String, s: String): Any = t match {
      case "int"          => java.lang.Integer.valueOf(s.trim)
      case "long"         => java.lang.Long.valueOf(s.trim)
      case "float"        => java.lang.Float.valueOf(s.trim)
      case "double"       => java.lang.Double.valueOf(s.trim)
      case "boolean"      => java.lang.Boolean.valueOf(s.trim)
      case _              => s
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "key" =>
              val id = r.getAttributeValue(null, "id")
              val name = Option(r.getAttributeValue(null, "attr.name")).getOrElse(id)
              val t = Option(r.getAttributeValue(null, "attr.type")).getOrElse("string")
              keys(id) = (name, t)
            case "node" =>
              curKind = "node"; curId = r.getAttributeValue(null, "id")
              curProps = mutable.ArrayBuffer.empty
            case "edge" =>
              curKind = "edge"
              curSource = r.getAttributeValue(null, "source")
              curTarget = r.getAttributeValue(null, "target")
              curLabel = Option(r.getAttributeValue(null, "label")).getOrElse("")
              curProps = mutable.ArrayBuffer.empty
            case "data" =>
              curDataKey = r.getAttributeValue(null, "key"); text.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (curDataKey != null) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "data" if curDataKey != null =>
              val (name, t) = keys.getOrElse(curDataKey, (curDataKey, "string"))
              // GraphML edge <data key="label"> may carry the label
              if (curKind == "edge" && name == "label") curLabel = text.toString
              else curProps += (name -> typed(t, text.toString))
              curDataKey = null
            case "node" =>
              val v = g.addVertex()
              curProps.foreach { case (k, x) => v.setProperty(k, x) }
              vertices(curId) = v
              curKind = null
            case "edge" =>
              edges += ((curSource, curTarget, curLabel, curProps.toSeq))
              curKind = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    edges.foreach { case (src, dst, label, props) =>
      val e = g.addEdge(vertices(src), vertices(dst), label)
      props.foreach { case (k, x) => e.setProperty(k, x) }
    }
    vertices.toMap
  }

  /** Load Blueprints GraphSON 1.0 (mode NORMAL/ANY: `_id`, `_type`,
    * `_outV`, `_inV`, `_label`, flat property fields). Uses jackson (on
    * the Spark classpath). */
  def inputGraphSON(g: GraftGraph, json: String): Map[String, g.VertexHandle] = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper().readTree(json)
    val graph = if (root.has("graph")) root.get("graph") else root

    def value(n: JsonNode): Any =
      if (n.isBoolean) java.lang.Boolean.valueOf(n.asBoolean())
      else if (n.isIntegralNumber) java.lang.Long.valueOf(n.asLong())
      else if (n.isFloatingPointNumber) java.lang.Double.valueOf(n.asDouble())
      else n.asText()

    val meta = Set("_id", "_type", "_outV", "_inV", "_label")
    val vertices = mutable.Map.empty[String, g.VertexHandle]
    Option(graph.get("vertices")).toSeq.flatMap(_.elements().asScala).foreach { vn =>
      val v = g.addVertex()
      vn.properties().asScala.foreach { e =>
        if (!meta(e.getKey)) v.setProperty(e.getKey, value(e.getValue))
      }
      vertices(vn.get("_id").asText()) = v
    }
    Option(graph.get("edges")).toSeq.flatMap(_.elements().asScala).foreach { en =>
      val e = g.addEdge(vertices(en.get("_outV").asText()),
        vertices(en.get("_inV").asText()), en.get("_label").asText())
      en.properties().asScala.foreach { p =>
        if (!meta(p.getKey)) e.setProperty(p.getKey, value(p.getValue))
      }
    }
    vertices.toMap
  }

  /** Load GML: `graph [ node [ id 1 k v … ] edge [ source 1 target 2
    * label "x" … ] ]`. Minimal recursive-descent over the token stream. */
  def inputGML(g: GraftGraph, gml: String): Map[String, g.VertexHandle] = {
    // tokenize: words, numbers, quoted strings, brackets
    val tok = mutable.ArrayBuffer.empty[String]
    val m = java.util.regex.Pattern
      .compile("\"([^\"]*)\"|\\[|\\]|[^\\s\\[\\]]+").matcher(gml)
    // decode the GML-spec HTML entities GraphWriters emits for quotes
    def unescape(s: String): String =
      s.replace("&quot;", "\"").replace("&amp;", "&")
    while (m.find()) tok += (if (m.group(1) != null) "\"" + unescape(m.group(1)) else m.group())

    var i = 0
    def parseBlock(): Seq[(String, Any)] = {
      val kvs = mutable.ArrayBuffer.empty[(String, Any)]
      while (i < tok.length && tok(i) != "]") {
        val key = tok(i); i += 1
        val v: Any = tok(i) match {
          case "[" => i += 1; val b = parseBlock(); i += 1; b
          case s if s.startsWith("\"") => i += 1; s.substring(1)
          case s if s.matches("-?\\d+") => i += 1; java.lang.Long.valueOf(s)
          case s if s.matches("-?\\d*\\.\\d+([eE][+-]?\\d+)?") => i += 1; java.lang.Double.valueOf(s)
          case s => i += 1; s
        }
        kvs += (key -> v)
      }
      kvs.toSeq
    }

    // find 'graph ['
    while (i < tok.length && tok(i) != "graph") i += 1
    require(i < tok.length, "no graph block in GML input")
    i += 2 // skip 'graph' '['
    val body = parseBlock()

    val vertices = mutable.Map.empty[String, g.VertexHandle]
    body.foreach {
      case ("node", kvs: Seq[(String, Any)] @unchecked) =>
        val id = kvs.collectFirst { case ("id", x) => x.toString }
          .getOrElse(throw new IllegalArgumentException("GML node without id"))
        val v = g.addVertex()
        kvs.foreach { case (k, x) => if (k != "id") v.setProperty(k, x) }
        vertices(id) = v
      case _ =>
    }
    body.foreach {
      case ("edge", kvs: Seq[(String, Any)] @unchecked) =>
        val src = kvs.collectFirst { case ("source", x) => x.toString }.get
        val dst = kvs.collectFirst { case ("target", x) => x.toString }.get
        val label = kvs.collectFirst { case ("label", x: String) => x }.getOrElse("")
        val e = g.addEdge(vertices(src), vertices(dst), label)
        kvs.foreach { case (k, x) =>
          if (!Set("source", "target", "label", "id")(k)) e.setProperty(k, x)
        }
      case _ =>
    }
    vertices.toMap
  }
}
