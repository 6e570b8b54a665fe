package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Bloom-filter probe: `key → maybe-member` in ONE md5 digest plus
  * integer math per row.
  *
  * Semantically identical to [[graft.functions.BloomFilter.mayContainHex]]'s
  * column formulation (Kirsch–Mitzenmacher double hashing over the two
  * 60-bit halves of md5("bloomKM:" ‖ key), k bit tests against a literal
  * word array) — but the column form CANNOT cache the digest: Catalyst
  * inlines projected columns back into pushed-down filter predicates
  * (CollapseProject/PushDownPredicate), so every conjunct re-digests the
  * key (measured: the md5s were ~60% of the whole bloom-pruned join at
  * bench scale). A fused expression holds the digest in a local, the way
  * [[ShingleHashes]] fuses the shingle loop. The filter words ride as a
  * compiled-in reference object — no giant source literal, and the
  * generated source is identical for any filter content, so codegen caches
  * across filter rebuilds.
  */
case class BloomProbe(child: Expression, filterWords: Array[Long], numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(input: Any): Any =
    BloomProbe.probe(input.asInstanceOf[UTF8String], filterWords, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val wordsRef = ctx.addReferenceObj("bloomWords", filterWords, "long[]")
      s"""${ev.value} = graft.plans.BloomProbe.probe($c, $wordsRef, $numHashes);"""
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbe {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit half of an md5 digest starting at byte `off`: bytes off..off+6
    * whole, plus the high nibble of byte off+7 — exactly the value of
    * `conv(substring(hex, off*2+1, 15), 16, 10)`. */
  private def half(bytes: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 7) {
      v = (v << 8) | (bytes(i) & 0xffL)
      i += 1
    }
    (v << 4) | ((bytes(off + 7) & 0xf0L) >> 4)
  }

  /** One digest, k Kirsch–Mitzenmacher bit tests. Callable from codegen. */
  def probe(key: UTF8String, words: Array[Long], numHashes: Int): Boolean = {
    val md = digest.get()
    md.reset()
    md.update("bloomKM:".getBytes(StandardCharsets.UTF_8))
    val bytes = md.digest(key.getBytes)
    val h1 = half(bytes, 0)
    val h2 = half(bytes, 8)
    val bits = words.length * 63L
    var j = 0
    while (j < numHashes) {
      val p = (h1 + j * h2) % bits
      if (((words((p / 63).toInt) >>> (p % 63).toInt) & 1L) == 0L) return false
      j += 1
    }
    true
  }

  def apply(c: Column, filterWords: Array[Long], numHashes: Int): Column =
    GraftBridge.column(BloomProbe(GraftBridge.expression(c), filterWords, numHashes))
}
