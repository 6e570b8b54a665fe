package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Self-anchoring activity bitmap as a `TypedImperativeAggregate` — the
  * per-key LIFECYCLE bitmap (bit i = active on day first_seen + i) built in
  * one pass without knowing any key's first day up front.
  *
  * `ev_bitmap` anchors every user at the CORPUS start (one broadcast scalar,
  * fine in batch where a pre-scan is cheap). The streaming/lifecycle form
  * can't pre-scan: a user's anchor is their OWN first active day, which may
  * arrive late and out of order. This aggregate carries (anchor, bits) and
  * RE-ANCHORS on the fly — when a smaller day arrives, existing bits shift
  * left by the anchor delta; days ≥ anchor+62 saturate into bit 62. The
  * representation is canonical for the day SET it has absorbed (bits 0..61
  * exact, bit 62 = "any day ≥ anchor+62"), so update/merge are
  * order-invariant under any partitioning or micro-batch arrival order —
  * the mergeability contract every sketch under a shuffle or state store
  * needs. 17 bytes per key on the wire; merge is two shifted ORs.
  *
  * Output struct: (first_day, bitmap). Days are epoch days (ts_us DIV 86.4e9).
  */
case class ShiftingBitmap(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"shifting_bitmap needs a bigint day number (cast explicitly), got ${other.simpleString}")
  }

  // buf(0) = anchor day (Long.MaxValue = empty), buf(1) = bitmap
  override def createAggregationBuffer(): Array[Long] = Array(Long.MaxValue, 0L)

  /** Shift `bits` left by `s`, saturating anything past bit 62 into bit 62.
    * Bit 63 is never used, so the saturation test reads the top s bits of
    * the 0..62 payload. */
  private def shiftSat(bits: Long, s: Long): Long =
    if (bits == 0L || s == 0L) bits
    else if (s >= 63L) 1L << 62
    else {
      val within = (bits & ((1L << (63 - s)) - 1)) << s
      if ((bits >>> (63 - s)) != 0L) within | (1L << 62) else within
    }

  private def bitFor(off: Long): Long = 1L << math.min(off, 62L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Long]
      if (buf(0) == Long.MaxValue) { buf(0) = d; buf(1) = 1L }
      else if (d >= buf(0)) buf(1) |= bitFor(d - buf(0))
      else { // earlier day arrived: re-anchor, shift history up
        buf(1) = shiftSat(buf(1), buf(0) - d) | 1L
        buf(0) = d
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b(0) != Long.MaxValue) {
      if (a(0) == Long.MaxValue) { a(0) = b(0); a(1) = b(1) }
      else {
        val m = math.min(a(0), b(0))
        a(1) = shiftSat(a(1), a(0) - m) | shiftSat(b(1), b(0) - m)
        a(0) = m
      }
    }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(0) == Long.MaxValue) null
    else new GenericInternalRow(Array[Any](buf(0), buf(1)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(buf(0)); bb.putLong(buf(1))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getLong, bb.getLong)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("first_day", LongType, nullable = false),
    StructField("bitmap", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "shifting_bitmap"

  override def withNewMutableAggBufferOffset(newOffset: Int): ShiftingBitmap =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ShiftingBitmap =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ShiftingBitmap {
  /** (first_day, bitmap) lifecycle struct for a bigint epoch-day column. */
  def of(day: Column): Column =
    GraftBridge.column(ShiftingBitmap(GraftBridge.expression(day)).toAggregateExpression())
}
