package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Native bounded grouped top-k — the two-phase shortlist the ANN ADC
 * stage needs at scale. `graft_topk(score, id, k)` keeps a ≤k min-heap
 * of (score, id) pairs per aggregation buffer, so the PARTIAL (map-side)
 * aggregation already truncates each partition's candidates to k before
 * anything shuffles: the exchange moves ≤ partitions×k rows per group
 * instead of funnelling every candidate of a group through one reducer
 * sort the way a `row_number() OVER (PARTITION BY group)` window does.
 * Final merge re-truncates, eval emits the pairs ranked
 * (score desc, id asc) — the same deterministic order the window
 * variant produced, so results are bit-identical.
 *
 * Null scores/ids are skipped (like `max` skips nulls). k is a literal
 * fixed at plan time.
 */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] {

  import TopKAgg.Buf

  require(k > 0, s"graft_topk: k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (double, bigint, k), got (${s.sql}, ${i.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    // NaN is skipped like null: every comparison against NaN is false, so
    // one at the heap root would permanently block stronger candidates
    if (s != null && id != null && !s.asInstanceOf[Double].isNaN)
      buf.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    var i = 0
    while (i < other.size) { buf.add(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: Buf): Any = {
    val idx = (0 until buf.size).sortBy(i => (-buf.scores(i), buf.ids(i)))
    new GenericArrayData(idx.map(i =>
      InternalRow(buf.scores(i), buf.ids(i))).toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Buf(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  /** Bounded min-heap keyed weakest-at-root by (score asc, id desc):
    * a new pair displaces the root only when it is strictly stronger
    * under the (score desc, id asc) ranking — O(log k) per row, O(k)
    * state regardless of group size. */
  final class Buf(val k: Int) {
    var size = 0
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)

    /** pair at i is weaker than (s, id) under (score desc, id asc). */
    private def weakerThan(i: Int, s: Double, id: Long): Boolean =
      scores(i) < s || (scores(i) == s && ids(i) > id)

    /** pair at i is weaker than pair at j. */
    private def weaker(i: Int, j: Int): Boolean =
      weakerThan(i, scores(j), ids(j))

    private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    def add(s: Double, id: Long): Unit = {
      if (size < k) {
        scores(size) = s; ids(size) = id; size += 1
        // sift up: keep the weakest pair at the root
        var i = size - 1
        while (i > 0 && weaker(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
      } else if (weakerThan(0, s, id)) {
        scores(0) = s; ids(0) = id
        // sift down toward the weaker child
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
