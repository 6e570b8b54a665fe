package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle extraction (the string twin of
  * [[ShingleHashes]]): `text → array<string>` of the document's distinct
  * word k-grams. Same loop, no hashing — for the operators that need the
  * gram itself (corpus n-gram stats) rather than a sketch key. ~10× over
  * the interpreted `transform(sequence(...), concat_ws(...))` chain. */
case class ShingleStrings(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingle_strings"

  override def nullSafeEval(input: Any): Any = {
    val words = ShingleHashes.splitWords(input.asInstanceOf[UTF8String].toString)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val n = words.length - k + 1
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(if (distinct) out.distinct else out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {
  def apply(c: Column, k: Int, distinct: Boolean): Column =
    GraftBridge.column(ShingleStrings(GraftBridge.expression(c), k, distinct))
}
