package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native element-wise mean over an `array<double>` column — the
 * TypedImperativeAggregate the centroid/embedding-stats operators need at
 * scale. The composed alternative (`posexplode` → groupBy(key, i) →
 * regroup) shuffles rows×dims (position, value) pairs; this aggregate
 * keeps ONE running `(count, sums[dims])` buffer per group, combined
 * map-side and merged as 16 + 8·dims bytes per (partition, group) — at
 * 100 TB the difference between shuffling 10¹² exploded rows and
 * shuffling |groups|·|partitions| small buffers.
 *
 * Null arrays are skipped (like `avg` skips nulls); null ELEMENTS poison
 * their group to NULL (an element-wise mean with a hole has no honest
 * value); a dims mismatch within a group throws — silently mixing
 * embedding spaces is a data bug upstream.
 */
case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanAgg.Buf] {

  import VectorMeanAgg.Buf

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_mean expects array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Buf = new Buf(0L, null, false)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null || buf.poisoned) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.sums == null) buf.sums = new Array[Double](n)
    else if (buf.sums.length != n) throw new IllegalStateException(
      s"graft_vec_mean: mixed dims in one group (${buf.sums.length} vs $n)")
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { buf.poisoned = true; return buf }
      buf.sums(i) += arr.getDouble(i)
      i += 1
    }
    buf.count += 1
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    if (other.poisoned) { buf.poisoned = true; return buf }
    if (other.sums == null) return buf
    if (buf.sums == null) { buf.sums = other.sums; buf.count = other.count; return buf }
    if (buf.sums.length != other.sums.length) throw new IllegalStateException(
      s"graft_vec_mean: mixed dims across partitions (${buf.sums.length} vs ${other.sums.length})")
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
    buf.count += other.count
    buf
  }

  override def eval(buf: Buf): Any =
    if (buf.poisoned || buf.count == 0L) null
    else new GenericArrayData(buf.sums.map(_ / buf.count))

  override def serialize(buf: Buf): Array[Byte] = {
    // dims = -1 encodes "no data seen" (sums == null); 0 is a LEGAL dims
    // value (a group of empty arrays) and must round-trip as an empty
    // array, not null — otherwise merge would drop that side's count
    val dims = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 1 + 4 + 8 * math.max(dims, 0))
    bb.putLong(buf.count)
    bb.put(if (buf.poisoned) 1.toByte else 0.toByte)
    bb.putInt(dims)
    var i = 0
    while (i < dims) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val poisoned = bb.get() == 1.toByte
    val dims = bb.getInt()
    val sums = if (dims < 0) null else {
      val a = new Array[Double](dims)
      var i = 0
      while (i < dims) { a(i) = bb.getDouble(); i += 1 }
      a
    }
    new Buf(count, sums, poisoned)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorMeanAgg {
  /** Mutable aggregation state: running count + element-wise sums;
    * `sums` stays null until the first non-null row fixes the dims. */
  final class Buf(var count: Long, var sums: Array[Double], var poisoned: Boolean)
}
