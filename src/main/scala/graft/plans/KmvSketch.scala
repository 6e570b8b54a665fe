package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) theta sketch as a `TypedImperativeAggregate`.
  *
  * Keeps the k smallest DISTINCT 60-bit hashes of the input — a uniform
  * sample of the hash space below a data-adaptive threshold θ (the kth
  * minimum). Unlike HLL ([[HllSketch]]), KMV supports SET ALGEBRA: two
  * sketches intersect by comparing their sample sets below min(θ_a, θ_b),
  * which is how "distinct users who did BOTH A and B" stays a sketch-sized
  * problem at 100 TB (Beyer et al., SIGMOD'07; the θ-sketch framing is
  * Dasgupta et al. 2016).
  *
  * PORTABLE by construction: hashes are the engine-wide md5-prefix
  * [[ShingleHashes.hash64]] (60 bits), selection is exact integer order, and
  * the estimators divide once in double — an oracle replaying the same
  * algorithm in SQL hash-matches the estimate bit-for-bit.
  *
  * Scale shape: O(k) buffer rides partial aggregation (per-partition sketch,
  * merge = sorted-set union truncated to k); only ≤ k longs cross the wire
  * per group regardless of input size.
  */
case class KmvSketch(
    child: Expression,
    k: Int = KmvSketch.defaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        // bytes-of-string is the portable-hash contract (see HllSketch)
        TypeCheckResult.TypeCheckFailure(
          s"kmv_sketch needs a string input (cast explicitly), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, ShingleHashes.hash64(v.asInstanceOf[UTF8String].toString))
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  /** Sorted ascending — element k IS θ when the sketch is full. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) out.add(bb.getLong)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** k = 256 → RSE ≈ 1/√(k−2) ≈ 6.3%. The oracle replay (EventOps
    * `thetaKmv*Sql`) hard-codes the same k — they must move together. */
  val defaultK = 256

  /** Hash-space size as an exact double (2^60; hash64 yields [0, 2^60)). */
  val hashSpace = "power(2.0, 60)"

  def sketch(c: Column): Column =
    GraftBridge.column(KmvSketch(GraftBridge.expression(c)).toAggregateExpression())

  /** θ for a sketch column: kth minimum when full, else the whole space
    * (a not-full sketch IS its complete distinct hash set). */
  def thetaSql(sk: String): String =
    s"CASE WHEN size($sk) < $defaultK THEN CAST($hashSpace AS BIGINT) " +
      s"ELSE element_at($sk, $defaultK) END"

  /** Distinct-count estimate from one sketch: exact below k, else the
    * classic (k−1)·U/θ unbiased KMV estimator. */
  def estimate(sk: String): Column =
    expr(s"CASE WHEN size($sk) < $defaultK THEN CAST(size($sk) AS DOUBLE) " +
      s"ELSE round(CAST(${defaultK - 1} AS DOUBLE) * $hashSpace / ${thetaSql(sk)}, 4) END")

  /** Intersection estimate of two sketch columns: count common samples below
    * θ = min(θ_a, θ_b), scale by the sampled fraction θ/U. When both
    * sketches are not-full this degenerates to the EXACT intersection. */
  def intersectEstimate(skA: String, skB: String): Column = {
    val theta = s"least(${thetaSql(skA)}, ${thetaSql(skB)})"
    expr(s"round(CAST(size(filter(array_intersect($skA, $skB), h -> h < $theta)) AS DOUBLE)" +
      s" * $hashSpace / $theta, 4)")
  }
}
