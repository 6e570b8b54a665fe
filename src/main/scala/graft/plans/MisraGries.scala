package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.collection.mutable

/** Misra–Gries heavy-hitter summary as a `TypedImperativeAggregate` — the
  * bounded-state candidate generator for frequent-item detection at corpus
  * scale (the "heavy hitters" pass a training-data pipeline runs to find
  * dominant sources/buckets/keys before deciding sampling weights).
  *
  * Guarantee (the whole point): after summarizing a stream of n items with
  * k counters, EVERY item with true frequency > n/(k+1) is present in the
  * summary — no false negatives, ever. False positives are allowed; the
  * production shape is therefore TWO-PASS: sketch → ≤k candidate keys →
  * one exact recount restricted to candidates. Both passes are a single
  * corpus scan with O(k) state; the exact global `groupBy(key)` they
  * replace shuffles the full key cardinality.
  *
  * The merge implements the mergeable-summary construction of Agarwal et
  * al. (PODS'12, "Mergeable Summaries"): pointwise counter sum, then
  * subtract the (k+1)-th largest count from every counter and drop the
  * non-positives — the error bounds add, so partial aggregation over any
  * partitioning preserves the n/(k+1) guarantee.
  *
  * Scale shape: each partition summarizes locally (update), only k
  * (key, count) pairs per group cross the wire (serialize is 4 + 16k
  * bytes max), merge is O(k log k). Reference analog: the per-key match
  * counting the reference accumulates in rules.rs:126-158, generalized to
  * unbounded key domains.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k > 0, "misra_gries needs k > 0 counters")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      // keys are raw int64 (bucket ids, hashed keys); an implicit cast would
      // silently change which domain the n/(k+1) guarantee applies to
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries needs a bigint key (cast explicitly), got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      val cur = buf.getOrElse(key, 0L)
      if (cur > 0L) buf.update(key, cur + 1L)
      else if (buf.size < k) buf.update(key, 1L)
      else {
        // classic MG decrement step: one unit off every counter (amortized
        // O(1) per input unit — each decrement "pays for" k+1 arrivals)
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (kk, c) => if (c == 1L) dead += kk else buf.update(kk, c - 1L) }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.LongMap[Long], b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreachEntry { (kk, c) => a.update(kk, a.getOrElse(kk, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything (Agarwal et al.)
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[Long]
      a.foreachEntry { (kk, c) => if (c - cut <= 0L) dead += kk else a.update(kk, c - cut) }
      dead.foreach(a.remove)
    }
    a
  }

  /** Surviving candidate keys, ascending — deterministic under any
    * partitioning is NOT claimed for the residual counts (they depend on
    * merge order), so only the keys leave the sketch; the exact pass owns
    * the numbers. */
  override def eval(buf: mutable.LongMap[Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (kk, c) => bb.putLong(kk); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Candidate heavy-hitter keys (sorted bigint array): every key with
    * frequency > n/(k+1) is guaranteed present. */
  def candidates(c: Column, k: Int): Column =
    GraftBridge.column(MisraGries(GraftBridge.expression(c), k).toAggregateExpression())
}
