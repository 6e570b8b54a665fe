package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded min-k string aggregate: keeps the k lexicographically-smallest
  * strings per group in a fixed-size sorted buffer — [[TopKByScore]]'s
  * sibling for ORDERED string selection (the per-host frontier-cycle quota
  * in web_politeness: "the Q next URLs of this host", with per-group state
  * O(k) instead of the O(host-size) a rank window would buffer).
  *
  * Ordering is UTF8String binary compare — identical to Spark SQL's string
  * sort order and DuckDB's default memcmp collation, so quota cuts are
  * bit-identical cross-engine. Inputs are COPIED on insert (Spark reuses
  * the input row's backing buffer across update() calls).
  *
  * Output: `array<string>` ascending, ≤ k entries.
  */
case class MinKStrings(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"min_k_strings needs a string column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: MinKBuffer, b: MinKBuffer): MinKBuffer = { a.mergeFrom(b); a }

  override def eval(buf: MinKBuffer): Any =
    new GenericArrayData(buf.values.take(buf.size).asInstanceOf[Array[Any]])

  override def serialize(buf: MinKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MinKBuffer = MinKBuffer.fromBytes(k, bytes)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "min_k_strings"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKStrings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Sorted-ascending fixed-capacity string buffer; never exceeds k entries. */
final class MinKBuffer(val k: Int) {
  val values = new Array[UTF8String](k)
  var size: Int = 0

  def insert(s0: UTF8String): Unit = {
    if (size == k && s0.compareTo(values(size - 1)) >= 0) return
    val s = s0.clone() // detach from the reused input buffer
    var pos = if (size == k) size - 1 else size
    while (pos > 0 && s.compareTo(values(pos - 1)) < 0) {
      values(pos) = values(pos - 1); pos -= 1
    }
    values(pos) = s
    if (size < k) size += 1
  }

  def mergeFrom(other: MinKBuffer): Unit = {
    var j = 0
    val n = other.size
    while (j < n) { insert(other.values(j)); j += 1 }
  }

  def toBytes: Array[Byte] = {
    var len = 4
    var j = 0
    while (j < size) { len += 4 + values(j).numBytes(); j += 1 }
    val bb = ByteBuffer.allocate(len)
    bb.putInt(size)
    j = 0
    while (j < size) {
      val b = values(j).getBytes
      bb.putInt(b.length); bb.put(b)
      j += 1
    }
    bb.array()
  }
}

object MinKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): MinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new MinKBuffer(k)
    var j = 0
    while (j < n) {
      val b = new Array[Byte](bb.getInt())
      bb.get(b)
      buf.insert(UTF8String.fromBytes(b))
      j += 1
    }
    buf
  }
}

object MinKAgg {
  /** Aggregate Column: per-group k smallest strings → `array<string>`
    * ascending, state bounded at k. */
  def minK(s: Column, k: Int): Column =
    GraftBridge.column(MinKStrings(
      GraftBridge.expression(s), k).toAggregateExpression())
}
