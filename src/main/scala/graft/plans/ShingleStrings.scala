package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle / word-chunk extraction (the string twin of
  * [[ShingleHashes]]): `text → array<string>` of the document's word
  * k-grams. Same loop, no hashing — for the operators that need the gram
  * itself (corpus n-gram stats, paragraph chunking) rather than a sketch
  * key. ~10× over the interpreted `transform(sequence(...),
  * concat_ws(...))` chain.
  *
  * `stride = 1` gives overlapping shingles; `stride = k` non-overlapping
  * chunks. `partial = true` also emits the trailing sub-k chunk (paragraph
  * semantics); `false` drops it (shingle semantics). */
case class ShingleStrings(child: Expression, k: Int, distinct: Boolean,
    stride: Int = 1, partial: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_strings"

  override def nullSafeEval(input: Any): Any =
    ShingleStrings.evalText(input.asInstanceOf[UTF8String], k, distinct, stride, partial)

  /** Generated code calls the static loop — stays in WholeStageCodegen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.plans.ShingleStrings.evalText($c, $k, $distinct, $stride, $partial);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {

  /** The single-pass chunk/shingle loop, callable from generated code. */
  def evalText(input: UTF8String, k: Int, distinct: Boolean,
      stride: Int, partial: Boolean): GenericArrayData = {
    val words = ShingleHashes.splitWords(input.toString)
    val last = if (partial) words.length - 1 else words.length - k
    if (last < 0) return new GenericArrayData(Array.empty[Any])
    val out = Array.newBuilder[Any]
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < k && i + j < words.length) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out += UTF8String.fromString(sb.toString)
      i += stride
    }
    val arr = out.result()
    new GenericArrayData(if (distinct) arr.distinct else arr)
  }
  def apply(c: Column, k: Int, distinct: Boolean): Column =
    GraftBridge.column(ShingleStrings(GraftBridge.expression(c), k, distinct))

  /** Non-overlapping `k`-word chunks incl. the trailing partial one. */
  def chunks(c: Column, k: Int): Column =
    GraftBridge.column(ShingleStrings(GraftBridge.expression(c), k,
      distinct = false, stride = k, partial = true))
}
