package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitters sketch — `graft_topfreq(item, capacity)`
 * keeps at most `capacity` (item, counter) pairs per aggregation buffer
 * and returns the surviving items with their (under-)estimated counts,
 * ranked (est desc, item asc).
 *
 * This is the bounded-memory twin of "groupBy(item).count() + top-k":
 * the exact form shuffles one row PER DISTINCT ITEM per group (the full
 * vocabulary at 100 TB); the sketch's map-side partials are each ≤
 * `capacity` entries, merge by counter addition + the mergeable-summary
 * truncation (subtract the (capacity+1)-th largest counter from all,
 * keep positives — Agarwal et al., "Mergeable Summaries", PODS'12),
 * and ship O(capacity) rows per partition regardless of vocabulary.
 *
 * Guarantees (the classic MG bound, spec-gated in PipelineSpec):
 * est(x) ≤ true(x), and true(x) − est(x) ≤ (n − Σ est)/(capacity + 1)
 * where n = group row count — so every item with true frequency >
 * n/(capacity+1) is guaranteed to survive. When a group's distinct-item
 * count never exceeds `capacity`, the sketch is EXACT.
 *
 * Null items are skipped (like `count(col)`); capacity is a literal
 * fixed at plan time.
 */
case class FreqSketchAgg(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketchAgg.Buf] {

  import FreqSketchAgg.Buf

  require(capacity > 0, s"graft_topfreq: capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    itemExpr.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_topfreq expects (string, capacity), got ${other.sql}")
    }

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("est",
          org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(itemExpr)

  override def createAggregationBuffer(): Buf = new Buf(capacity)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = itemExpr.eval(input)
    // clone: the input row's UTF8String is backed by a reused buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone(), 1L)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.counts.foreach { case (item, c) => buf.addMerge(item, c) }
    buf.truncate()
    buf
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.counts.toSeq.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c) }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.counts.toSeq
    val byteLen = entries.map { case (i, _) => 4 + i.numBytes() + 8 }.sum
    val bb = ByteBuffer.allocate(4 + byteLen)
    bb.putInt(entries.size)
    entries.foreach { case (item, c) =>
      val b = item.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Buf(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len); bb.get(b)
      buf.counts.update(UTF8String.fromBytes(b), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

object FreqSketchAgg {
  /** The MG counter map. UTF8String keys hash/compare by bytes. */
  final class Buf(val capacity: Int) {
    val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

    /** Streaming update: increment, insert, or decrement-all (the
      * classic MG step — amortized O(1): each decrement cancels a prior
      * increment). */
    def add(item: UTF8String, by: Long): Unit = {
      counts.get(item) match {
        case Some(c) => counts.update(item, c + by)
        case None if counts.size < capacity => counts.update(item, by)
        case None =>
          // decrement all by min(by, smallest counter) repeatedly is
          // equivalent to: subtract d, drop zeros, insert remainder
          val d = math.min(by, counts.valuesIterator.min)
          mapSubtract(d)
          if (by > d) counts.update(item, by - d)
      }
    }

    /** Merge-side insert: counters ADD (no decrement); [[truncate]]
      * restores the size bound afterwards. */
    def addMerge(item: UTF8String, by: Long): Unit =
      counts.update(item, counts.getOrElse(item, 0L) + by)

    /** Mergeable-summaries truncation: subtract the (capacity+1)-th
      * largest counter from every entry, keep positives. */
    def truncate(): Unit = if (counts.size > capacity) {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      mapSubtract(cut)
    }

    private def mapSubtract(d: Long): Unit = {
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counts.keysIterator.foreach { k =>
        val nv = counts(k) - d
        if (nv <= 0) dead += k else counts.update(k, nv)
      }
      dead.foreach(counts.remove)
    }
  }
}
