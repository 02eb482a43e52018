package graft.model

import java.sql.Timestamp

/**
 * Core data model of the graft temporal property-graph engine.
 *
 * The storage abstraction mirrors the reference's Datomic datom
 * (entity, attribute, value, tx, op) 5-tuple — see
 * /root/reference (FluxGraph.java, SURVEY.md §1.1) — re-expressed as a
 * columnar Spark row. Instead of a dynamically typed `v`, the value is
 * spread over one nullable column per supported primitive type
 * (SURVEY §1.4), which keeps the fact log a flat, codegen- and
 * Parquet-stats-friendly schema: equality/range predicates on values
 * push down to the scan, and no per-row boxing/variant decode happens
 * in the hot path.
 *
 * Reference value types (FluxUtil.java:17-33): String, Boolean, Long,
 * Integer(→Long), BigInteger(→Decimal), Float(→Double), Double,
 * BigDecimal(→Decimal via vDec), UUID(→String), URI(→String).
 */
final case class Fact(
    e: Long,              // entity id
    attr: String,         // attribute name (type-qualified, see AttrCodec)
    vStr: String,         // String / UUID / URI
    vLong: java.lang.Long,    // Long / Integer
    vDouble: java.lang.Double, // Double / Float
    vDec: java.math.BigDecimal, // BigDecimal(38,18) / BigInteger
    vBool: java.lang.Boolean, // Boolean
    vTs: Timestamp,       // timestamp values (graft extension)
    vRef: java.lang.Long, // entity reference (edge endpoints)
    tx: Long,             // transaction id (monotonic)
    seq: Long,            // position within the tx (latest-wins tiebreak)
    added: Boolean        // true = assertion, false = retraction
)

object Fact {
  /** Column names, in schema order. */
  val valueCols: Seq[String] =
    Seq("vStr", "vLong", "vDouble", "vDec", "vBool", "vTs", "vRef")

  /** Convenience constructor: route `v` to the column for its [[PropType]]. */
  def of(e: Long, attr: String, v: Any, tx: Long, added: Boolean = true): Fact = {
    var (s, l, d, dec, b, ts, r) = (null: String, null: java.lang.Long,
      null: java.lang.Double, null: java.math.BigDecimal,
      null: java.lang.Boolean, null: Timestamp, null: java.lang.Long)
    PropType.of(v) match {
      case PropType.PString  => s = v.asInstanceOf[String]
      case PropType.PUuid    => s = v.toString
      case PropType.PUri     => s = v.toString
      case PropType.PBoolean => b = v.asInstanceOf[java.lang.Boolean]
      case PropType.PLong    => l = v.asInstanceOf[java.lang.Long]
      case PropType.PInteger => l = java.lang.Long.valueOf(v.asInstanceOf[java.lang.Integer].longValue)
      case PropType.PBigInteger =>
        dec = new java.math.BigDecimal(v.asInstanceOf[java.math.BigInteger])
      case PropType.PBigDecimal => dec = v match {
        case x: java.math.BigDecimal  => x
        case x: scala.math.BigDecimal => x.bigDecimal
      }
      case PropType.PFloat   => d = java.lang.Double.valueOf(v.asInstanceOf[java.lang.Float].doubleValue)
      case PropType.PDouble  => d = v.asInstanceOf[java.lang.Double]
      case PropType.PTimestamp => ts = v.asInstanceOf[Timestamp]
    }
    Fact(e, attr, s, l, d, dec, b, ts, r, tx, 0L, added)
  }

  /** A reference fact: value is an entity id (edge endpoints). */
  def ref(e: Long, attr: String, target: Long, tx: Long, added: Boolean = true): Fact =
    Fact(e, attr, null, null, null, null, null, null, java.lang.Long.valueOf(target), tx, 0L, added)
}

/** Transaction metadata: id + wall-clock instant.
 *  Mirrors the Datomic tx entity's :db/txInstant (FluxGraph.java:325-340);
 *  `txInstant` may be backdated (valid-time) by the writer. */
final case class TxMeta(tx: Long, txInstant: Timestamp)

/** Version-chain touch record: transaction `tx` created a new version of
 *  element `e`, whose previous version was `prevTx` (-1 = first version).
 *  Mirrors the reference's reified :graph.element/previousTransaction
 *  chain written by the :add-transaction-info db fn
 *  (FluxGraph.java:443-476, SURVEY §2.6). */
final case class Touch(e: Long, tx: Long, prevTx: Long)

/** Reserved attribute names (the graph meta-schema,
 *  FluxGraph.java:397-486). User property attributes are type-qualified
 *  via [[AttrCodec]] and never collide with these. */
object A {
  val ElementType = ":graph.element/type" // vStr: "vertex" | "edge"
  val EdgeLabel   = ":graph.edge/label"   // vStr
  val EdgeOut     = ":graph.edge/outVertex" // vRef
  val EdgeIn      = ":graph.edge/inVertex"  // vRef
  val Vertex = "vertex"
  val Edge   = "edge"
  val reserved: Set[String] = Set(ElementType, EdgeLabel, EdgeOut, EdgeIn)
}

/** The 10 reference property types (FluxUtil.java:17-33) and which fact
 *  column each is stored in. PTimestamp is a graft extension beyond the
 *  reference's 10 types (FluxUtil has no Date/Timestamp property type;
 *  timestamps there appear only as tx :db/txInstant).
 *
 *  Note Integer shares the type name "long" with Long: the reference maps
 *  Integer to :db.type/long (FluxUtil.java:26), so an Int write and a Long
 *  write of the same key hit the SAME attribute. */
sealed abstract class PropType(val name: String, val col: String)
object PropType {
  case object PString     extends PropType("string", "vStr")
  case object PBoolean    extends PropType("boolean", "vBool")
  case object PLong       extends PropType("long", "vLong")
  case object PInteger    extends PropType("long", "vLong")
  case object PBigInteger extends PropType("bigint", "vDec")
  case object PFloat      extends PropType("float", "vDouble")
  case object PDouble     extends PropType("double", "vDouble")
  case object PBigDecimal extends PropType("bigdec", "vDec")
  case object PUuid       extends PropType("uuid", "vStr")
  case object PUri        extends PropType("uri", "vStr")
  case object PTimestamp  extends PropType("ts", "vTs")

  /** Distinct attribute type names (PInteger aliases PLong's "long"). */
  val all: Seq[PropType] = Seq(PString, PBoolean, PLong, PBigInteger,
    PFloat, PDouble, PBigDecimal, PUuid, PUri, PTimestamp)

  def of(v: Any): PropType = v match {
    case _: String               => PString
    case _: java.lang.Boolean    => PBoolean
    case _: java.lang.Long       => PLong
    case _: java.lang.Integer    => PInteger
    case _: java.math.BigInteger => PBigInteger
    case _: java.lang.Float      => PFloat
    case _: java.lang.Double     => PDouble
    case _: java.math.BigDecimal => PBigDecimal
    case _: scala.math.BigDecimal => PBigDecimal
    case _: java.util.UUID       => PUuid
    case _: java.net.URI         => PUri
    case _: Timestamp            => PTimestamp
    case other => throw new IllegalArgumentException(
      s"unsupported property type: ${other.getClass.getName}")
  }
}

/**
 * Attribute-name codec. The reference lazily creates one Datomic
 * attribute per (user key, value type, element kind), encoded
 * `<key _→$>.<type>.<vertex|edge>` (FluxUtil.java:160-167) so that the
 * same key bound with a different runtime type is a *different*
 * attribute. We reproduce the scheme (it is user-visible through
 * property-key round-trips and the difference/diff graphs).
 */
object AttrCodec {
  def encode(key: String, t: PropType, kind: String): String =
    key.replace("_", "$") + "." + t.name + "." + kind

  /** Decode back to the user key (FluxUtil.java:41-47). Returns null for
   *  attribute names with no '.' — the reference's getPropertyName guards
   *  with contains(".") and returns null (FluxUtil.java:43-46). */
  def decode(attr: String): String = {
    val i = attr.indexOf('.')
    if (i < 0) null else attr.substring(0, i).replace("$", "_")
  }

  def isVertexAttr(attr: String): Boolean = attr.endsWith("." + A.Vertex)
  def isEdgeAttr(attr: String): Boolean   = attr.endsWith("." + A.Edge)
}
