package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native bounded KMV (bottom-k-by-hash) sample aggregate:
 * `graft_bottomk(hash, value, k)` keeps the ≤k entries with the
 * lexicographically SMALLEST `hash` per aggregation buffer, carrying
 * `value` alongside. With a uniform hash (md5 of a unique key) the
 * kept set is a deterministic uniform k-sample of the group — the KMV
 * construction — so any statistic over it (quantiles, means, distinct
 * estimates) is a pure function of the data, reproducible by any
 * engine with the same hash.
 *
 * Merge is union-then-truncate: commutative and associative, which is
 * exactly the partial-fold contract BOTH map-side partial aggregation
 * and Structured Streaming state updates require — micro-batches fold
 * into standing state in any order and the sample is still THE
 * bottom-k of everything seen (the HllSketchAgg property, for order
 * statistics). State is O(k) per group regardless of group size; the
 * shuffle moves ≤ partitions·k rows per group.
 *
 * Eval emits `array<struct<h string, v double>>` sorted by hash asc —
 * deterministic, so downstream quantile selection (sort by (v, h),
 * pick integer ranks) is engine-exact. Null hashes/values are skipped
 * like `max` skips nulls; k is a literal fixed at plan time.
 */
case class BottomKAgg(
    hashExpr: Expression,
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKAgg.Buf] {

  import BottomKAgg.Buf

  require(k > 0, s"graft_bottomk: k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (hashExpr.dataType, valueExpr.dataType) match {
      case (StringType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"graft_bottomk expects (string, double, k), got (${h.sql}, ${v.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", StringType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr, valueExpr)

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    if (h != null && v != null)
      buf.add(h.asInstanceOf[UTF8String].getBytes, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    var i = 0
    while (i < other.size) { buf.add(other.hashes(i), other.values(i)); i += 1 }
    buf
  }

  override def eval(buf: Buf): Any = {
    val idx = (0 until buf.size).sortBy(i => buf.hashes(i))(
      BottomKAgg.bytesOrdering)
    new GenericArrayData(idx.map(i => InternalRow(
      UTF8String.fromBytes(buf.hashes(i)), buf.values(i))).toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buf.size) { bytes += 4 + buf.hashes(i).length + 8; i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putInt(buf.hashes(i).length); bb.put(buf.hashes(i))
      bb.putDouble(buf.values(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Buf(k)
    var i = 0
    while (i < n) {
      val hl = bb.getInt(); val h = new Array[Byte](hl); bb.get(h)
      buf.add(h, bb.getDouble()); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren(0), valueExpr = newChildren(1))
}

object BottomKAgg {

  /** Unsigned-lexicographic byte ordering — for ASCII md5 hex this is
    * exactly string order, so the kept set matches a SQL `ORDER BY h`. */
  val bytesOrdering: Ordering[Array[Byte]] = new Ordering[Array[Byte]] {
    def compare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xFF) - (b(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** Bounded max-heap keyed largest-hash-at-root: a new entry displaces
    * the root only when its hash is strictly smaller — O(log k) per
    * row, O(k) state regardless of group size (the TopKAgg heap with
    * the comparison flipped to keep the SMALLEST hashes). */
  final class Buf(val k: Int) {
    var size = 0
    val hashes = new Array[Array[Byte]](k)
    val values = new Array[Double](k)

    /** entry at i is "weaker" (more evictable) than h: its hash sorts LATER. */
    private def weakerThan(i: Int, h: Array[Byte]): Boolean =
      bytesOrdering.compare(hashes(i), h) > 0

    private def weaker(i: Int, j: Int): Boolean = weakerThan(i, hashes(j))

    private def swap(i: Int, j: Int): Unit = {
      val th = hashes(i); hashes(i) = hashes(j); hashes(j) = th
      val tv = values(i); values(i) = values(j); values(j) = tv
    }

    def add(h: Array[Byte], v: Double): Unit = {
      if (size < k) {
        hashes(size) = h; values(size) = v; size += 1
        var i = size - 1
        while (i > 0 && weaker(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
      } else if (weakerThan(0, h)) {
        hashes(0) = h; values(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var w = i
          if (l < size && weaker(l, w)) w = l
          if (r < size && weaker(r, w)) w = r
          if (w == i) done = true else { swap(i, w); i = w }
        }
      }
    }
  }
}
