package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs per
  * group in a fixed-size sorted buffer — a `TypedImperativeAggregate` like
  * [[HllSketch]], so the buffer rides partial (map-side) aggregation and
  * merge is a k-way selection of two sorted lists.
  *
  * This is the state contract streaming similarity search needs: per-group
  * state is O(k) — 16 bytes per kept entry — NOT O(corpus) the way
  * `collect_list` + `array_sort` + `slice` would be. At 100 TB the partial
  * buffers cap every exchange and every state-store row at k entries.
  *
  * Output: `array<struct<cand bigint, score double>>` in rank order.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      // fail at ANALYSIS: without the check a mistyped column passes
      // planning and every task dies in update() with a raw ClassCastException
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score needs (double score, bigint id), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeFrom(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var j = 0
    while (j < buf.size) {
      rows(j) = new GenericInternalRow(Array[Any](buf.ids(j), buf.scores(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cand", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = "top_k_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Sorted (score desc, id asc) fixed-capacity buffer; arrays never exceed k
  * entries — the bound the aggregate's state contract promises. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  private def beats(s: Double, i: Long, j: Int): Boolean =
    s > scores(j) || (s == scores(j) && i < ids(j))

  def insert(s: Double, i: Long): Unit = {
    if (size == k && !beats(s, i, size - 1)) return
    // find insertion point (k is small; linear from the tail)
    var pos = if (size == k) size - 1 else size
    while (pos > 0 && beats(s, i, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = i
    if (size < k) size += 1
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var j = 0
    val n = other.size
    // snapshot: insert mutates this, other is independent storage
    while (j < n) { insert(other.scores(j), other.ids(j)); j += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var j = 0
    while (j < size) { bb.putDouble(scores(j)); bb.putLong(ids(j)); j += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble(); val i = bb.getLong()
      // entries arrive already sorted; insert keeps the invariant regardless
      buf.insert(s, i)
      j += 1
    }
    buf
  }
}

object TopKAgg {
  /** Aggregate Column: per-group top-k (score desc, id asc) →
    * `array<struct<cand, score>>` in rank order, state bounded at k. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKByScore(
      GraftBridge.expression(score), GraftBridge.expression(id), k).toAggregateExpression())
}
