package graft.io

import graft.graph.GraftGraph

/**
 * Graph-format writers — the output twins of [[GraphReaders]], so a graft
 * graph round-trips through GraphML / GraphSON 1.0 / GML (the reference
 * delegates the same job to TinkerPop's GraphMLWriter et al.; we emit the
 * same dialects our readers parse, asserted by round-trip specs).
 *
 * Driver-side string building over the interactive API — fixture-scale by
 * design, like the readers: a 100 TB export is a parquet write of the
 * fact log ([[graft.log.MemFactLog.save]]), not a GraphML document.
 *
 * Property typing: values are emitted with the GraphML `attr.type` (or
 * native JSON/GML literal shape) that the readers map back onto the same
 * reference property type, so a write→read cycle preserves types within
 * each format's type system (GraphML int/long/float/double/boolean/string;
 * GraphSON long/double/boolean/string; GML long/double/string).
 */
object GraphWriters {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def attrType(v: Any): String = v match {
    case _: java.lang.Boolean => "boolean"
    case _: java.lang.Long    => "long"
    case _: java.lang.Float   => "float"
    case _: java.lang.Double  => "double"
    case _                    => "string"
  }

  /** Emit TinkerPop-flavor GraphML (the dialect [[GraphReaders.inputGraphML]]
    * parses: key decls, node/edge elements, data values). Key decl ids are
    * qualified by (kind, type) — the SAME key name on nodes and edges (or
    * under two value types) must not collide in the reader's id-keyed decl
    * map, or values parse with the wrong type. */
  def outputGraphML(g: GraftGraph): String = {
    val vs = g.getVertices().sortBy(_.id)
    // bulk edge read: per-handle getLabel/getVertex re-derive the whole
    // edge table each call — linear per edge, quadratic per export
    val es = g.edgeTuples().sortBy(_._1)
    def keyId(kind: String, k: String, t: String) = s"${kind}_${t}_$k"
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">\n"
    // one key decl per (kind, key, type) actually present, unique id each
    def keyDecls(kind: String, elems: Seq[(Long, Map[String, Any])]): Unit =
      elems.flatMap { case (_, props) => props.toSeq }
        .map { case (k, v) => (k, attrType(v)) }.distinct.sortBy(p => (p._1, p._2))
        .foreach { case (k, t) =>
          sb ++= s"""  <key id="${xmlEscape(keyId(kind, k, t))}" for="$kind" attr.name="${xmlEscape(k)}" attr.type="$t"/>\n"""
        }
    val vProps = vs.map(v => v.id -> v.getPropertyKeys.map(k => k -> v.getProperty(k)).toMap)
    val eProps = es.map { case (id, _, _, _) =>
      val h = g.getEdge(id)
      id -> h.getPropertyKeys.map(k => k -> h.getProperty(k)).toMap
    }
    val ePropsMap = eProps.toMap
    keyDecls("node", vProps)
    keyDecls("edge", eProps)
    sb ++= "  <graph id=\"G\" edgedefault=\"directed\">\n"
    def dataEls(kind: String, props: Map[String, Any]): Unit =
      props.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb ++= s"""<data key="${xmlEscape(keyId(kind, k, attrType(v)))}">${xmlEscape(v.toString)}</data>""" }
    vProps.foreach { case (id, props) =>
      sb ++= s"""    <node id="$id">"""
      dataEls("node", props)
      sb ++= "</node>\n"
    }
    es.foreach { case (id, label, outV, inV) =>
      sb ++= s"""    <edge id="$id" source="$outV" target="$inV" label="${xmlEscape(label)}">"""
      dataEls("edge", ePropsMap(id))
      sb ++= "</edge>\n"
    }
    sb ++= "  </graph>\n</graphml>\n"
    sb.toString
  }

  /** Full JSON string escaping — quotes, backslashes AND control chars
    * (an unescaped newline makes jackson reject the round-trip). */
  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    (sb += '"').toString
  }

  private def jsonValue(v: Any): String = v match {
    case b: java.lang.Boolean => b.toString
    case n: java.lang.Long    => n.toString
    case n: java.lang.Double  => n.toString
    case n: java.lang.Float   => n.toString
    case other                => jsonString(other.toString)
  }

  /** Emit Blueprints GraphSON 1.0, mode NORMAL (the dialect
    * [[GraphReaders.inputGraphSON]] parses). */
  def outputGraphSON(g: GraftGraph): String = {
    def propsJson(keys: Set[String], get: String => Any): String =
      keys.toSeq.sorted.map(k => s"${jsonString(k)}: ${jsonValue(get(k))}") match {
        case Nil => ""
        case xs => xs.mkString(", ", ", ", "")
      }
    val vs = g.getVertices().sortBy(_.id).map { v =>
      s"""    {"_id": "${v.id}", "_type": "vertex"${propsJson(v.getPropertyKeys, v.getProperty)}}"""
    }
    val es = g.edgeTuples().sortBy(_._1).map { case (id, label, outV, inV) =>
      val h = g.getEdge(id)
      s"""    {"_id": "$id", "_type": "edge", "_outV": "$outV", "_inV": "$inV", "_label": ${jsonValue(label)}${propsJson(h.getPropertyKeys, h.getProperty)}}"""
    }
    s"""{"graph": {"mode": "NORMAL",
       |  "vertices": [
       |${vs.mkString(",\n")}
       |  ],
       |  "edges": [
       |${es.mkString(",\n")}
       |  ]}}""".stripMargin
  }

  private def gmlValue(v: Any): String = v match {
    case n: java.lang.Long   => n.toString
    case n: java.lang.Double => n.toString
    case n: java.lang.Float  => n.toString
    // GML escapes quotes as HTML entities (&quot; per the GML spec);
    // inputGML decodes them back, so the round-trip is value-preserving
    case other => "\"" + other.toString
      .replace("&", "&amp;").replace("\"", "&quot;") + "\""
  }

  /** Emit GML (the dialect [[GraphReaders.inputGML]] parses). */
  def outputGML(g: GraftGraph): String = {
    val sb = new StringBuilder
    sb ++= "Creator \"graft\"\ngraph [\n  directed 1\n"
    g.getVertices().sortBy(_.id).foreach { v =>
      sb ++= s"  node [ id ${v.id}"
      v.getPropertyKeys.toSeq.sorted.foreach(k => sb ++= s" $k ${gmlValue(v.getProperty(k))}")
      sb ++= " ]\n"
    }
    g.edgeTuples().sortBy(_._1).foreach { case (id, label, outV, inV) =>
      val h = g.getEdge(id)
      sb ++= s"""  edge [ source $outV target $inV label ${gmlValue(label)}"""
      h.getPropertyKeys.toSeq.sorted.foreach(k => sb ++= s" $k ${gmlValue(h.getProperty(k))}")
      sb ++= " ]\n"
    }
    sb ++= "]\n"
    sb.toString
  }
}
