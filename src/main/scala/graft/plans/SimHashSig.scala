package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash signature in one pass: `array<long>` of (distinct) token hashes →
  * the `bits`-wide majority-vote signature as a long.
  *
  * Semantically identical to `explode` → 64 conditional-sum votes →
  * bit assembly, but per-row column math: NO exploded token rows, NO
  * 64-column aggregation shuffle. The signature stage of the SimHash dedup
  * pipeline becomes shuffle-free; the first exchange is the band-bucket
  * self-join. Vote rule matches the aggregation form exactly: bit j set iff
  * strictly more hashes have bit j set than clear.
  */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimHashSig.sig(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashSig.sig($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {

  /** The fused vote loop, callable from generated code. */
  def sig(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def apply(c: Column, bits: Int): Column =
    GraftBridge.column(SimHashSig(GraftBridge.expression(c), bits))
}
