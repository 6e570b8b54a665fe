package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenization (Kudo 2018 — the SentencePiece default),
  * completing the tokenizer triad next to byte-level BPE ([[Bpe]]) and
  * WordPiece ([[WordPiece]]): per whitespace-word VITERBI segmentation
  * minimizing total piece cost (cost = −log p in exact integer
  * milli-nats — no float DP, so both engines and the oracle agree
  * bit-for-bit). A character not covered by the vocabulary falls back to a
  * single-char piece at `unkCost`.
  *
  * Tie-break (deterministic, documented): among equal-cost segmentations
  * the LONGEST final piece wins at every DP cell (ascending split-point
  * scan with strict improvement keeps the smallest split). The built-in
  * vocabulary is designed with unique optima anyway; a real SentencePiece
  * model's `piece → -log p` table drops in via [[UnigramLm.vocab]] with
  * costs pre-scaled to milli-nats. */
object UnigramLm {

  final case class UgVocab(cost: Map[String, Long], maxLen: Int,
      unkCost: Long) extends Serializable

  def vocab(pieces: Map[String, Long], unkCost: Long = 1000L): UgVocab =
    UgVocab(pieces, pieces.keys.map(_.length).max, unkCost)

  /** Built-in: all singles at 100, multi-char pieces priced so greedy and
    * Viterbi DISAGREE somewhere (see the "abase" fixture — greedy
    * longest-prefix would take "ab", Viterbi pays for "a"+"base"). */
  val builtinPieces: Map[String, Long] =
    (('a' to 'z').map(c => c.toString -> 100L) ++ Seq(
      "da" -> 90L, "ta" -> 90L, "data" -> 150L, "bas" -> 140L,
      "base" -> 150L, "database" -> 240L, "se" -> 95L, "ab" -> 95L,
      "un" -> 80L)).toMap

  lazy val builtin: UgVocab = vocab(builtinPieces)

  /** Viterbi over one word: minimal-cost cover; returns pieces + cost. */
  private[text] def segment(word: String, v: UgVocab): (Array[String], Long) = {
    val n = word.length
    if (n == 0) return (Array.empty, 0L)
    val best = Array.fill(n + 1)(Long.MaxValue)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - v.maxLen)
      while (j < i) {
        if (best(j) != Long.MaxValue) {
          val pc = v.cost.get(word.substring(j, i)) match {
            case Some(c) => c
            case None => if (i - j == 1) v.unkCost else Long.MaxValue
          }
          if (pc != Long.MaxValue && best(j) + pc < best(i)) {
            best(i) = best(j) + pc
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(back(p), p); p = back(p) }
    (out.reverseIterator.toArray, best(n))
  }

  def encode(text: String, v: UgVocab): (Array[String], Long) = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var cost = 0L
    words.foreach { w =>
      val (t, c) = segment(w, v)
      toks ++= t; cost += c
    }
    (toks.toArray, cost)
  }

  def evalStruct(input: UTF8String, v: UgVocab): InternalRow = {
    val (toks, cost) = encode(input.toString, v)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(toks.map(UTF8String.fromString(_)): Array[Any]),
      cost))
  }

  def tokens(c: Column, v: UgVocab = builtin): Column =
    GraftBridge.column(UnigramTokens(GraftBridge.expression(c), v))
}

/** `text → struct(toks array<string>, cost_milli bigint)` — one Viterbi
  * pass serves both outputs (tokens and the exact segmentation cost). */
case class UnigramTokens(child: Expression, v: UnigramLm.UgVocab)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cost_milli", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_tokens"

  override def nullSafeEval(input: Any): Any =
    UnigramLm.evalStruct(input.asInstanceOf[UTF8String], v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ugVocab", v, "graft.text.UnigramLm.UgVocab")
      s"""${ev.value} = graft.text.UnigramLm.evalStruct($c, $ref);"""
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Driver row (tx_unigram): fixtures where single-char, multi-piece, and
  * whole-word segmentations compete; hand-traced Viterbi costs. */
object UnigramQueries {
  import org.apache.spark.sql.functions.{array_join, col, size}

  val corpus: Seq[String] = Seq(
    "data",       // 0: data(150) beats da+ta(180) and singles(400)
    "database",   // 1: whole piece 240 beats data+base 300
    "databases",  // 2: database+s 340 beats data+base+s 400
    "dada",       // 3: da+da 180
    "abase",      // 4: a+base 250 — GREEDY would take ab(95)+a+se = 290
    "sese xyz",   // 5: se+se 190 | x+y+z 300
    "q!",         // 6: q 100 + unk '!' 1000
    "")           // 7: zero tokens, zero cost

  def unigram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("sid", "text")
      .select(col("sid"), UnigramLm.tokens(col("text")).as("u"))
      .select(col("sid"),
        size(col("u.toks")).cast("long").as("n_tokens"),
        array_join(col("u.toks"), "|").as("tokens"),
        col("u.cost_milli"))
  }

  /** Hand-traced Viterbi: each row's runner-up segmentation and its cost
    * are listed in the corpus comments above. */
  val unigramSql: String =
    """SELECT CAST(sid AS BIGINT) AS sid, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  tokens, CAST(cost_milli AS BIGINT) AS cost_milli
      |FROM (VALUES
      |  (0, 1, 'data', 150),
      |  (1, 1, 'database', 240),
      |  (2, 2, 'database|s', 340),
      |  (3, 2, 'da|da', 180),
      |  (4, 2, 'a|base', 250),
      |  (5, 5, 'se|se|x|y|z', 490),
      |  (6, 2, 'q|!', 1100),
      |  (7, 0, '', 0)
      |) t(sid, n_tokens, tokens, cost_milli)""".stripMargin
}
