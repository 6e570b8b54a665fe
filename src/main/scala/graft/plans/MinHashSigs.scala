package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature in one pass: `array<long>` of shingle hashes → the
  * `array<long>` of per-hash-function minima of `(h mod p)·a_j + b_j mod p`.
  *
  * Semantically identical to `explode` → `groupBy(doc).agg(min(h_j)…)` but
  * with NO exploded rows and NO aggregation shuffle: the signature is
  * per-row column math, so the whole MinHash pipeline up to the band
  * self-join is shuffle-free. At 100 TB that removes the largest exchange
  * in the dedup path (the exploded inverted index is ~shingles-per-doc ×
  * corpus rows; signatures are 16 longs per doc).
  *
  * Empty input arrays yield minima of Long.MaxValue — callers filter
  * zero-shingle docs first (mirrors the absent-group semantics of the
  * aggregation form).
  */
case class MinHashSigs(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSigs.sigs(input.asInstanceOf[ArrayData], as, bs, p))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.MinHashSigs.sigs($c, $asRef, $bsRef, ${p}L));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {

  /** The fused min loop, callable from generated code. */
  def sigs(arr: ArrayData, as: Array[Long], bs: Array[Long], p: Long): Array[Long] = {
    val nh = as.length
    val out = new Array[Long](nh)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h32 = arr.getLong(i) % p
      var j = 0
      while (j < nh) {
        val v = (h32 * as(j) + bs(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }

  def apply(c: Column, ab: Seq[(Long, Long)], p: Long): Column =
    GraftBridge.column(MinHashSigs(GraftBridge.expression(c),
      ab.map(_._1).toArray, ab.map(_._2).toArray, p))
}
