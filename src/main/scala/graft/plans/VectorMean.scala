package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise mean of equal-length `array<double>` rows — the per-cluster
  * centroid fold of Lloyd's iterations as ONE partial-aggregable aggregate
  * (r9 OPT, guide §2.3/§2.4): the previous shape posexploded every vector
  * into (key, dim, x) rows and paid TWO exchanges per mean step (dim-level
  * aggregate + collect_list repack); this buffers one (count, Σ per dim)
  * pair per group, so the exchange carries K buffers of d doubles and the
  * repack disappears. Float caveat is unchanged from the avg() it
  * replaces: the sum order is partial-aggregation order on both forms, and
  * every consumer rounds the mean at 6dp — far above 1e-13 addend noise
  * (the kmMeans convention).
  *
  * Rows must share one length (Lloyd subvectors do by construction);
  * a mismatch fails loudly rather than silently truncating. Output:
  * `array<double>` of UNROUNDED means — callers apply their own rounding.
  */
case class VectorMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuffer] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_mean needs array<double>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): VecMeanBuffer = new VecMeanBuffer

  override def update(buf: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      else require(buf.sums.length == n,
        s"vector_mean: ragged input (${buf.sums.length} vs $n dims)")
      var i = 0
      // r10 fix (r9 ADVICE): a null ELEMENT previously read as 0.0 while
      // the row still counted — silently diverging from the per-dim
      // null-skipping avg() this aggregate replaced. No consumer produces
      // null elements (Lloyd subvectors are dense by construction), so
      // match the ragged-input posture: fail loudly, never silently.
      while (i < n) {
        require(!arr.isNullAt(i),
          s"vector_mean: null element at dim $i — dense array<double> required")
        buf.sums(i) += arr.getDouble(i); i += 1
      }
      buf.count += 1L
    }
    buf
  }

  override def merge(a: VecMeanBuffer, b: VecMeanBuffer): VecMeanBuffer = {
    if (b.sums != null) {
      if (a.sums == null) { a.sums = b.sums.clone(); a.count = b.count }
      else {
        require(a.sums.length == b.sums.length,
          s"vector_mean: ragged merge (${a.sums.length} vs ${b.sums.length} dims)")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        a.count += b.count
      }
    }
    a
  }

  override def eval(buf: VecMeanBuffer): Any =
    if (buf.sums == null) null
    else {
      val out = new Array[Any](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VecMeanBuffer): Array[Byte] = {
    val n = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(4 + 8 + math.max(0, n) * 8)
    bb.putInt(n).putLong(buf.count)
    if (n > 0) { var i = 0; while (i < n) { bb.putDouble(buf.sums(i)); i += 1 } }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new VecMeanBuffer
    buf.count = bb.getLong()
    if (n >= 0) {
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getDouble(); i += 1 }
    }
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vector_mean"

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

final class VecMeanBuffer {
  var sums: Array[Double] = null
  var count: Long = 0L
}

object VectorMean {
  /** Aggregate Column: elementwise mean of array<double> rows (unrounded). */
  def vectorMean(v: Column): Column =
    GraftBridge.column(VectorMean(
      GraftBridge.expression(v)).toAggregateExpression())
}
