package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog register sketch as a `TypedImperativeAggregate` — the
  * mergeable-buffer extension point for distributed sketches (the path
  * Spark's own `approx_count_distinct` uses).
  *
  * PORTABLE by construction: registers derive from the engine's md5-prefix
  * hash ([[ShingleHashes.hash64]], 60 bits), bucket = low 6 bits, rank =
  * 55 − bitlength(remaining 54 bits) — every step integer-exact, so an
  * oracle can replay the identical algorithm in SQL and the estimate
  * hash-matches bit-for-bit (unlike vendor sketches, which differ by hash).
  *
  * Scale shape: the 64-byte buffer rides partial aggregation — each
  * partition sketches locally, merge is a per-register max, and only
  * 64 bytes per group cross the wire regardless of input size.
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  val m = 64 // registers; error ~1.04/sqrt(64) = 13%; same algorithm at any m
  // (changing m must update HllSketch.estimate: α and m² live there, and
  // the oracle replay's `% 64` bucket width in EventOps.hllReplayCtes)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        // the portable-hash contract is BYTES-OF-STRING: an implicit cast
        // would silently desync from the oracle, and no cast at all dies in
        // update() with a raw ClassCastException mid-job
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hll_registers needs a string input (cast explicitly), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = ShingleHashes.hash64(v.asInstanceOf[UTF8String].toString)
      val b = (h & (m - 1)).toInt
      val w = h >>> 6 // remaining 54 bits
      val rank = (55 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rank > buf(b)) buf(b) = rank
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_registers"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllSketch {
  /** Estimate from a [[registers]] output column (by name) — the harmonic
    * derivation lives here only, shared by the batch and streaming
    * queries. Registers are 0..55; empty registers contribute 2^55.
    * Constants are m-derived: α₆₄ = 0.709 and m² = 4096 for m = 64 (the
    * sketch's register count) — both must move with `m`. */
  private val alphaM = 0.709 // α for m = 64
  private val mSquared = 64 * 64

  def estimate(regsCol: String): Column =
    org.apache.spark.sql.functions.expr(
      s"round(CAST($alphaM AS DOUBLE) * $mSquared * power(2.0, 55) / " +
        s"aggregate(transform($regsCol, r -> shiftleft(CAST(1 AS BIGINT), 55 - r)), " +
        s"CAST(0 AS BIGINT), (acc, x) -> acc + x), 4)")

  def registers(c: Column): Column =
    GraftBridge.column(HllSketch(GraftBridge.expression(c)).toAggregateExpression())
}
