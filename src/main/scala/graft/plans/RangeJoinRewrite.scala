package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: turn a BETWEEN range join against a plan-time interval
  * dim into the O(log R)-per-row [[RangeLookup]] projection.
  *
  * Catalyst plans `fact JOIN dim ON k >= lo AND k <= hi` as a
  * BroadcastNestedLoopJoin — O(R) predicate evaluations per fact row. When
  * the dim is a `LocalRelation` (plan-time rows: a `toDF` literal dim, the
  * shape GeoIP / threshold / calendar tables take) with sorted DISJOINT
  * [lo, hi] intervals, the join is a function lookup, not a join: rewrite
  * to a projection that binary-searches the embedded bounds and fetches
  * the dim's columns via `element_at` on literal arrays — NO join node in
  * the plan at all. This is the automatic form of `GeoIp.enrichFast`: SQL
  * users write the natural join and get the lookup plan.
  *
  * Fires only when provably safe, otherwise leaves the join untouched:
  * inner join; condition is EXACTLY the two range bounds; key is a
  * left-side Long expression; lo/hi are Long dim columns; intervals
  * validate sorted + disjoint (at most one match per row, so inner-join
  * multiplicity is preserved); dim is a LocalRelation of ≤ `maxRanges`
  * rows. Registered via [[GraftExtensions]]
  * (`spark.experimental.extraOptimizations`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val maxRanges = 1 << 16

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      rewrite(left, right, cond).getOrElse(j)
  }

  // no SubqueryAlias case: EliminateSubqueryAliases runs in the optimizer's
  // first batch, before either injection point, so aliases are already gone
  private def localRelation(p: LogicalPlan): Option[LocalRelation] = p match {
    case lr: LocalRelation => Some(lr)
    case _ => None
  }

  /** Pull (key, loAttr, hiAttr) out of `k >= lo AND k <= hi` in any
    * orientation/order, with lo/hi attributes of the dim side. */
  private def rangeBounds(cond: Expression, leftOut: AttributeSet,
      rightOut: AttributeSet): Option[(Expression, Attribute, Attribute)] = {
    def half(e: Expression): Option[(Expression, Attribute, Boolean)] = e match {
      // (key, boundAttr, boundIsLower)
      case GreaterThanOrEqual(k, a: AttributeReference) if eligible(k, a, leftOut, rightOut) =>
        Some((k, a, true))
      case LessThanOrEqual(a: AttributeReference, k) if eligible(k, a, leftOut, rightOut) =>
        Some((k, a, true))
      case LessThanOrEqual(k, a: AttributeReference) if eligible(k, a, leftOut, rightOut) =>
        Some((k, a, false))
      case GreaterThanOrEqual(a: AttributeReference, k) if eligible(k, a, leftOut, rightOut) =>
        Some((k, a, false))
      case _ => None
    }
    cond match {
      case And(x, y) =>
        (half(x), half(y)) match {
          case (Some((k1, lo, true)), Some((k2, hi, false))) if k1.semanticEquals(k2) =>
            Some((k1, lo, hi))
          case (Some((k1, hi, false)), Some((k2, lo, true))) if k1.semanticEquals(k2) =>
            Some((k1, lo, hi))
          case _ => None
        }
      case _ => None
    }
  }

  private def eligible(k: Expression, a: AttributeReference,
      leftOut: AttributeSet, rightOut: AttributeSet): Boolean =
    k.dataType == LongType && a.dataType == LongType &&
      rightOut.contains(a) && k.references.subsetOf(leftOut) && k.deterministic

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    for {
      lr <- localRelation(right)
      if lr.data.nonEmpty && lr.data.length <= maxRanges
      (key, loAttr, hiAttr) <- rangeBounds(cond, left.outputSet, lr.outputSet)
      sorted <- sortedDisjointRows(lr, loAttr, hiAttr)
    } yield {
      val (los, his, rows) = sorted
      val idxAlias = Alias(RangeLookup(key, los, his), "__range_idx")()
      val idxRef = idxAlias.toAttribute
      val probed = Filter(IsNotNull(idxRef), Project(left.output :+ idxAlias, left))
      // dim columns come back as element_at over literal arrays, ALIASED TO
      // THE ORIGINAL ATTRIBUTE IDS so downstream references keep resolving
      val dimCols = lr.output.zipWithIndex.map { case (attr, i) =>
        val values = rows.map(_.get(i, attr.dataType))
        val arr = Literal.create(new GenericArrayData(values.toArray),
          ArrayType(attr.dataType, containsNull = values.contains(null)))
        Alias(ElementAt(arr, idxRef), attr.name)(exprId = attr.exprId,
          qualifier = attr.qualifier)
      }
      Project(left.output ++ dimCols, probed)
    }
  }

  /** Dim rows sorted by lo; None unless intervals are disjoint (overlap
    * would change inner-join multiplicity — bail out, keep the join). */
  private def sortedDisjointRows(lr: LocalRelation, loAttr: Attribute,
      hiAttr: Attribute): Option[(Array[Long], Array[Long], Seq[InternalRow])] = {
    val loIdx = lr.output.indexWhere(_.exprId == loAttr.exprId)
    val hiIdx = lr.output.indexWhere(_.exprId == hiAttr.exprId)
    if (loIdx < 0 || hiIdx < 0) return None
    if (lr.data.exists(r => r.isNullAt(loIdx) || r.isNullAt(hiIdx))) return None
    val rows = lr.data.map(_.copy()).sortBy(_.getLong(loIdx))
    val los = rows.map(_.getLong(loIdx)).toArray
    val his = rows.map(_.getLong(hiIdx)).toArray
    var i = 0
    while (i < los.length) {
      if (his(i) < los(i)) return None
      if (i > 0 && los(i) <= his(i - 1)) return None
      i += 1
    }
    Some((los, his, rows))
  }
}
