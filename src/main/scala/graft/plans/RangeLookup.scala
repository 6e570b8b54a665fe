package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Binary-search range lookup: `key → index of the [lo, hi] interval
  * containing it`, or null when no interval does.
  *
  * The scalable replacement for the O(R)-per-row BroadcastNestedLoopJoin a
  * non-equi `BETWEEN` join plans to (the GeoIP shape, SURVEY §2a #17): a
  * range dim that qualifies for broadcast is by definition small enough to
  * embed sorted in the expression, so each probe is O(log R) against two
  * primitive arrays — and the location attributes come back via
  * `element_at` on literal arrays, no join node at all. Intervals must be
  * non-overlapping and sorted by `lo` (MaxMind's are); [[GeoIp.enrichFast]]
  * validates at build time.
  */
case class RangeLookup(child: Expression, los: Array[Long], his: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "range_lookup"

  override def nullSafeEval(input: Any): Any = {
    val key = input.asInstanceOf[Long]
    var lo = 0
    var hi = los.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (key < los(mid)) hi = mid - 1
      else if (key > his(mid)) lo = mid + 1
      else return mid + 1 // 1-based for element_at
    }
    null
  }

  /** Inline binary search in generated code; the sorted bound arrays ride
    * as expression references. A miss sets the result null (the generated
    * block owns null-out, not just child-null propagation). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("rangeLos", los, "long[]")
    val hisRef = ctx.addReferenceObj("rangeHis", his, "long[]")
    nullSafeCodeGen(ctx, ev, key => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val found = ctx.freshName("found")
      s"""
         |int $lo = 0;
         |int $hi = $losRef.length - 1;
         |boolean $found = false;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($key < $losRef[$mid]) { $hi = $mid - 1; }
         |  else if ($key > $hisRef[$mid]) { $lo = $mid + 1; }
         |  else { ${ev.value} = $mid + 1; $found = true; break; }
         |}
         |if (!$found) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RangeLookup {
  /** 1-based interval index of `key`, null if outside every interval. */
  def apply(key: Column, los: Array[Long], his: Array[Long]): Column = {
    require(los.length == his.length, "lo/hi arrays must align")
    var i = 1
    while (i < los.length) {
      require(los(i) > his(i - 1), s"intervals must be sorted and disjoint at $i")
      i += 1
    }
    GraftBridge.column(RangeLookup(GraftBridge.expression(key), los, his))
  }
}
