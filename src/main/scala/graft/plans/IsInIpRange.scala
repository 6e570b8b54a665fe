package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** `is_in_ip_range(ip, lo, hi)` — dotted-quad range predicate for rule
  * authors, the SQL-criterion analog of the reference's Lua `isInIpRange`
  * helper (lua.rs:85-100).
  *
  * A real Catalyst `TernaryExpression` (not a Column-DSL composition) so it
  * registers cleanly in the function registry and codegens inline. A
  * malformed address evaluates to false (it is inside no range) rather than
  * erroring — rule predicates must never kill the pipeline on dirty input,
  * matching the reference's lookup-failure-logs-and-continues posture.
  */
case class IsInIpRange(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_in_ip_range"

  // NB: every operand must parse — a malformed BOUND fails closed too
  // (lo = -1 would otherwise sit below every valid address and the
  // predicate would degrade to `v <= hi`, matching almost everything).
  override def nullSafeEval(ip: Any, lo: Any, hi: Any): Any = {
    val v = IsInIpRange.ipOrNeg(ip.asInstanceOf[UTF8String])
    val l = IsInIpRange.ipOrNeg(lo.asInstanceOf[UTF8String])
    val h = IsInIpRange.ipOrNeg(hi.asInstanceOf[UTF8String])
    v >= 0 && l >= 0 && h >= 0 && v >= l && v <= h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ip, lo, hi) => {
      val v = ctx.freshName("ipVal")
      val l = ctx.freshName("loVal")
      val h = ctx.freshName("hiVal")
      s"""
         |long $v = graft.plans.IsInIpRange.ipOrNeg($ip);
         |long $l = graft.plans.IsInIpRange.ipOrNeg($lo);
         |long $h = graft.plans.IsInIpRange.ipOrNeg($hi);
         |${ev.value} = $v >= 0 && $l >= 0 && $h >= 0 && $v >= $l && $v <= $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object IsInIpRange {
  /** Dotted-quad → long, or -1 for anything malformed (-1 is below every
    * valid range, so malformed input never matches). */
  def ipOrNeg(s: UTF8String): Long = {
    if (s == null) return -1L
    val str = s.toString
    var acc = 0L
    var octet = 0L
    var digits = 0
    var dots = 0
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        octet = octet * 10 + (c - '0')
        digits += 1
        if (octet > 255 || digits > 3) return -1L
      } else if (c == '.') {
        if (digits == 0) return -1L
        acc = acc * 256 + octet
        octet = 0; digits = 0; dots += 1
        if (dots > 3) return -1L
      } else return -1L
      i += 1
    }
    if (dots != 3 || digits == 0) return -1L
    acc * 256 + octet
  }
}
