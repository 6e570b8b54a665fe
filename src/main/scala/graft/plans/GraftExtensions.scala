package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** Registers the engine's custom expressions as SQL functions:
  *
  *   shingle_hashes(text, k, distinct, salt) → array<bigint>
  *   vector_dot(a, b)                        → double
  *   int8_quantize(v)                        → array<double>
  *   is_in_ip_range(ip, lo, hi)              → boolean
  *   zorder_key(x, y)                        → bigint
  *
  * plus the [[RangeJoinRewrite]] optimizer rule (BETWEEN joins against
  * plan-time interval dims → RangeLookup projections).
  *
  * Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; [[GraftExtensions.install]]
  * registers the same functions on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.shingleHashesFn)
    ext.injectFunction(GraftExtensions.shingleStringsFn)
    ext.injectFunction(GraftExtensions.vectorDotFn)
    ext.injectFunction(GraftExtensions.int8QuantizeFn)
    ext.injectFunction(GraftExtensions.isInIpRangeFn)
    ext.injectFunction(GraftExtensions.zorderKeyFn)
    GraftExtensions.webFns.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
  }
}

object GraftExtensions {

  // config args must be LITERALS at function-resolution time (they shape
  // the expression itself): fail with a usable message instead of silently
  // hashing with a garbage Expression.toString salt or dying in a raw
  // ClassCastException on `1 + 2`
  private def str(e: Expression): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case Literal(null, _) => ""
    case other => throw new IllegalArgumentException(
      s"argument must be a string literal, got: $other")
  }
  private def int(e: Expression): Int = e match {
    case Literal(v: Number, _) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"argument must be an integer literal, got: $other")
  }
  private def bool(e: Expression): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"argument must be a boolean literal, got: $other")
  }

  val shingleHashesFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    { args =>
      val k = if (args.length > 1) int(args(1)) else 3
      val distinct = if (args.length > 2) bool(args(2)) else true
      val salt = if (args.length > 3) str(args(3)) else ""
      ShingleHashes(args.head, k, distinct, salt)
    })

  val shingleStringsFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_strings"),
    new ExpressionInfo(classOf[ShingleStrings].getName, "shingle_strings"),
    { args =>
      val k = if (args.length > 1) int(args(1)) else 3
      val distinct = if (args.length > 2) bool(args(2)) else true
      ShingleStrings(args.head, k, distinct)
    })

  /** Arity gate for SQL-registered builders (round-7 advice): a wrong
    * argument count fails at ANALYSIS with the function's name and
    * expected arity — not an opaque IndexOutOfBounds/NoSuchElement from
    * a positional `args(i)` inside the builder. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new IllegalArgumentException(
          s"function $name expects exactly $n argument(s), got ${args.length}")
      build(args)
    }

  val vectorDotFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    arity("vector_dot", 2)(args => VectorDot(args(0), args(1))))

  val int8QuantizeFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("int8_quantize"),
    new ExpressionInfo(classOf[Int8Quantize].getName, "int8_quantize"),
    arity("int8_quantize", 1)(args => Int8Quantize(args.head)))

  val isInIpRangeFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("is_in_ip_range"),
    new ExpressionInfo(classOf[IsInIpRange].getName, "is_in_ip_range"),
    arity("is_in_ip_range", 3)(args => IsInIpRange(args(0), args(1), args(2))))

  val zorderKeyFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder_key"),
    new ExpressionInfo(classOf[ZorderKey].getName, "zorder_key"),
    arity("zorder_key", 2)(args => ZorderKey(args(0), args(1))))

  /** The web-curation expression family as SQL functions — the full
    * WebOps surface is reachable from `spark.sql` without Scala:
    *
    *   url_canonical(url)      → string (crawl-frontier key)
    *   url_resolve(base, ref)  → string or null (RFC 3986 merge)
    *   html_links(html)        → array<string> (href harvest)
    *   html_anchors(html)      → array<struct<href,txt>> (closed anchors)
    *   html_to_text(html)      → string (WET conversion) */
  val webFns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("url_canonical"),
      new ExpressionInfo(classOf[graft.web.UrlCanonicalize].getName, "url_canonical"),
      arity("url_canonical", 1)(args => graft.web.UrlCanonicalize(args.head))),
    (FunctionIdentifier("url_resolve"),
      new ExpressionInfo(classOf[graft.web.UrlResolve].getName, "url_resolve"),
      arity("url_resolve", 2)(args => graft.web.UrlResolve(args(0), args(1)))),
    (FunctionIdentifier("html_links"),
      new ExpressionInfo(classOf[graft.web.HtmlLinks].getName, "html_links"),
      arity("html_links", 1)(args => graft.web.HtmlLinks(args.head))),
    (FunctionIdentifier("html_anchors"),
      new ExpressionInfo(classOf[graft.web.HtmlAnchors].getName, "html_anchors"),
      arity("html_anchors", 1)(args => graft.web.HtmlAnchors(args.head))),
    (FunctionIdentifier("html_to_text"),
      new ExpressionInfo(classOf[graft.web.HtmlToText].getName, "html_to_text"),
      arity("html_to_text", 1)(args => graft.web.HtmlToText(args.head))))

  /** Register on a live session (the extensions path needs builder-time
    * configuration; this covers driver-provided sessions). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("shingle_hashes", shingleHashesFn._3, "scala_udf")
    reg.createOrReplaceTempFunction("shingle_strings", shingleStringsFn._3, "scala_udf")
    reg.createOrReplaceTempFunction("vector_dot", vectorDotFn._3, "scala_udf")
    reg.createOrReplaceTempFunction("int8_quantize", int8QuantizeFn._3, "scala_udf")
    reg.createOrReplaceTempFunction("is_in_ip_range", isInIpRangeFn._3, "scala_udf")
    reg.createOrReplaceTempFunction("zorder_key", zorderKeyFn._3, "scala_udf")
    webFns.foreach { case (id, _, builder) =>
      reg.createOrReplaceTempFunction(id.funcName, builder, "scala_udf") }
    // optimizer rules can't be injected on a live session through the
    // extensions API — experimental.extraOptimizations is the public hook
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
  }
}
