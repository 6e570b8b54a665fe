package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: interleaves the low 16 bits of two longs into one
  * 32-bit space-filling-curve value.
  *
  * This is the data-layout primitive for multi-dimensional data skipping at
  * scale: `repartitionByRange` + `sortWithinPartitions` on the z-key lays
  * parquet files out so each file covers a small RECTANGLE in (x, y) space,
  * making per-file min/max stats selective for predicates on EITHER
  * dimension — a linear sort on one key can only ever skip on that key.
  *
  * Bit-spread is the classic mask-shift cascade (4 ops per dimension, no
  * loop, no branch), identical in `nullSafeEval` and the generated Java, and
  * re-derivable in ANSI SQL with the same integer ops — so the oracle can
  * replay it exactly. Stays inside WholeStageCodegen: pure scalar math.
  */
case class ZorderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def nullSafeEval(a: Any, b: Any): Any = {
    ZorderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val px = ctx.freshName("px")
      val py = ctx.freshName("py")
      // same cascade as ZorderKey.interleave, inlined so the key math stays
      // in the enclosing codegen span
      s"""
         |long $px = $a & 0xFFFFL;
         |long $py = $b & 0xFFFFL;
         |$px = ($px | ($px << 8)) & 0x00FF00FFL;
         |$px = ($px | ($px << 4)) & 0x0F0F0F0FL;
         |$px = ($px | ($px << 2)) & 0x33333333L;
         |$px = ($px | ($px << 1)) & 0x55555555L;
         |$py = ($py | ($py << 8)) & 0x00FF00FFL;
         |$py = ($py | ($py << 4)) & 0x0F0F0F0FL;
         |$py = ($py | ($py << 2)) & 0x33333333L;
         |$py = ($py | ($py << 1)) & 0x55555555L;
         |${ev.value} = $px | ($py << 1);
       """.stripMargin
    })

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"zorder_key needs two bigint inputs, got ${left.dataType} / ${right.dataType}")
    }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZorderKey {
  /** Spread 16 bits to the even positions of a 32-bit value. */
  private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** x bits land on even positions, y bits on odd. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  def apply(x: Column, y: Column): Column =
    GraftBridge.column(ZorderKey(GraftBridge.expression(x), GraftBridge.expression(y)))
}
