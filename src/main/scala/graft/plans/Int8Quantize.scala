package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Symmetric int8 quantization of a double vector in ONE fused pass:
  * `q_i = round(127 · v_i / max|v|)` (max-abs floored at 1e-30), emitted as
  * `array<double>` so the quantized vectors feed [[VectorDot]] unchanged.
  *
  * Replaces `transform(v, x -> round(x / amax * 127))` where
  * `amax = greatest(array_max(transform(v, abs)), 1e-30)`: after
  * CollapseProject, Catalyst inlines the `amax` subtree into the lambda
  * body, so the interpreted max-abs fold re-runs once per ELEMENT — O(d²)
  * interpreted work per row (measured 8.4 s on the sf0.1 quantized-ANN
  * scan; fused loop ~1 s). Rounding goes through BigDecimal HALF_UP — the
  * exact semantics of Spark's `round`, which the DuckDB oracle's `round`
  * matches on this data — so fusing changes the plan, not the values.
  *
  * Full `doGenCode`: both loops compile into the enclosing
  * WholeStageCodegen span.
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var amax = 1e-30
    var i = 0
    while (i < n) {
      val ax = math.abs(v.getDouble(i))
      // NaN poisons the max (list_max semantics in the reference HOF
      // form): `ax > amax` is false for NaN, so propagate it explicitly —
      // once amax is NaN it stays NaN and every output becomes NaN
      if (ax != ax) amax = ax else if (ax > amax) amax = ax
      i += 1
    }
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val r = v.getDouble(i) / amax * 127.0
      // BigDecimal(double) throws on non-finite input; propagate NaN/±Inf
      // like the HOF round() this replaces (null elements read as 0.0)
      out(i) =
        if (java.lang.Double.isFinite(r))
          new java.math.BigDecimal(r)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        else r
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val amax = ctx.freshName("amax")
      val ax = ctx.freshName("ax")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $amax = 1e-30;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ax = java.lang.Math.abs($a.getDouble($i));
         |  if ($ax != $ax) { $amax = $ax; } else if ($ax > $amax) { $amax = $ax; }
         |}
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ax = $a.getDouble($i) / $amax * 127.0;
         |  $out[$i] = java.lang.Double.isFinite($ax)
         |    ? new java.math.BigDecimal($ax)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
         |    : $ax;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quantize needs an array<double> input, got $other")
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Int8Quantize {
  def apply(v: Column): Column =
    GraftBridge.column(Int8Quantize(GraftBridge.expression(v)))
}
