package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Engine-PORTABLE HyperLogLog — `graft_hll(item, p)` — the
 * distinct-count sketch whose whole state is replayable in any engine
 * with an md5 function, unlike Spark's HLL++ (whose register layout is
 * implementation-private, which is why `approx_count_distinct` can
 * only ever be rows-only under a cross-engine oracle).
 *
 * Contract (mirrored bit-for-bit by the DuckDB twin):
 *  - h = first 64 bits of md5(utf8(item)), big-endian;
 *  - register index = top `p` bits; tail = remaining 64−p bits;
 *  - rank = leading zeros of the tail within its 64−p-bit window + 1
 *    (= nlz64(tail) − p + 1, which is 64−p+1 when the tail is 0);
 *  - register_j = max rank over items hashing to j — a commutative,
 *    idempotent fold, so the state is independent of row order,
 *    partitioning, and merge shape (the §28 doctrine: exact integers
 *    until one final shared double expression);
 *  - eval emits (nonzero, rank_sum, est): the integer register summary
 *    (rank_sum = Σ register_j is a checksum of the full state — any
 *    single-register divergence shifts it) and the classic estimate
 *    alpha_m·m²∕Z with linear-counting fallback below 2.5·m, computed
 *    as ONE fixed arithmetic sequence both engines repeat verbatim.
 *
 * Scale shape: the aggregation buffer is m = 2^p bytes per group
 * regardless of cardinality (4 KB at p=12), map-side partials merge by
 * elementwise max, and the shuffle ships one m-byte row per partition
 * per group — vs the exact form's one row per DISTINCT item (the full
 * vocabulary at 100 TB). Mergeability is exact, not approximate-exact:
 * sketch(A ∪ B) == merge(sketch(A), sketch(B)) bit-for-bit.
 *
 * Reference: Flajolet et al., "HyperLogLog: the analysis of a
 * near-optimal cardinality estimation algorithm" (AofA 2007); the
 * m ≥ 128 alpha approximation 0.7213∕(1 + 1.079∕m).
 */
case class HllSketchAgg(
    itemExpr: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 7 && p <= 16, s"graft_hll: p must be in [7, 16], got $p")
  private def m: Int = 1 << p
  /** Max rank: tail is 64−p bits wide, all-zero tail ranks 64−p+1. */
  private def maxRank: Int = 64 - p + 1

  override def checkInputDataTypes(): TypeCheckResult =
    itemExpr.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hll expects (string, p), got ${other.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("nonzero", LongType, nullable = false),
    StructField("rank_sum", LongType, nullable = false),
    StructField("est", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(itemExpr)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  @transient private lazy val md5 = MessageDigest.getInstance("MD5")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = itemExpr.eval(input)
    if (v != null) {
      md5.reset()
      val d = md5.digest(v.asInstanceOf[UTF8String].getBytes)
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      val idx = (h >>> (64 - p)).toInt
      val tail = h & ((1L << (64 - p)) - 1)
      // nlz64 counts the p index bits as zeros too; subtracting p yields
      // leading zeros within the tail window; all-zero tail → maxRank
      val rank = java.lang.Long.numberOfLeadingZeros(tail) - p + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var nonzero = 0L
    var rankSum = 0L
    var s = BigInt(0)
    var i = 0
    while (i < m) {
      val r = buf(i) & 0xFF
      if (r > 0) { nonzero += 1; rankSum += r }
      // Z·2^maxRank as an exact integer: Σ 2^(maxRank − register)
      s += BigInt(1) << (maxRank - r)
      i += 1
    }
    // ONE shared double sequence (left-assoc, identical in the SQL twin):
    // ((0.7213 / (1 + 1.079/m)) * m * m * 2^maxRank) / S
    val raw = 0.7213 / (1.0 + 1.079 / m.toDouble) * m.toDouble * m.toDouble *
      (1L << maxRank).toDouble / s.toDouble
    val zeros = m - nonzero
    val est =
      if (zeros > 0 && raw <= 2.5 * m) m.toDouble * math.log(m.toDouble / zeros)
      else raw
    InternalRow(nonzero, rankSum, est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}
