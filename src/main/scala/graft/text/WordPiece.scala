package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization — the BERT tokenizer family, complementing the
  * GPT-2-style byte-level BPE in [[Bpe]]: per whitespace-word GREEDY
  * longest-prefix match against a vocabulary whose word-internal pieces
  * carry a `##` continuation prefix; a word with any unmatchable remainder
  * tokenizes to a single `[UNK]` (whole-word fallback — the published
  * algorithm, not per-character salvage). Case-sensitive: vocab lookups are
  * exact (a cased BERT; uncased variants lowercase upstream).
  *
  * The vocabulary is a plain piece list — any BERT-format `vocab.txt` loads
  * via [[WordPiece.vocab]]; [[WordPiece.builtin]] ships a small
  * deterministic list (no network in the build environment; a production
  * deployment points at the real 30k-piece file and nothing else changes).
  */
object WordPiece {

  final val Unk = "[UNK]"

  /** Built-in vocabulary: all lowercase letters + digits in both bare and
    * `##` form, plus multi-char pieces exercising greedy-longest-match and
    * continuation chains. */
  val builtinPieces: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    singles ++ singles.map("##" + _) ++ Seq(
      "the", "run", "##ning", "quer", "##y", "##ying", "data", "##base",
      "##bases", "un", "##believ", "##able", "123", "##45", "store", "##s")
  }

  lazy val builtin: WpVocab = vocab(builtinPieces)

  def vocab(pieces: Seq[String]): WpVocab =
    WpVocab(pieces.toSet, pieces.map(_.length).max)

  /** Greedy longest-prefix match for one whitespace-delimited word. */
  private def wpWord(word: String, v: WpVocab): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      val prefix = if (start > 0) "##" else ""
      var end = math.min(word.length, start + v.maxLen - prefix.length)
      var hit: String = null
      while (hit == null && end > start) {
        val p = prefix + word.substring(start, end)
        if (v.pieces.contains(p)) hit = p else end -= 1
      }
      if (hit == null) return Array(Unk)
      out += hit
      start = end
    }
    out.toArray
  }

  def encode(text: String, v: WpVocab): Array[String] =
    text.split("\\s+").filter(_.nonEmpty).flatMap(wpWord(_, v))

  def evalTokens(input: UTF8String, v: WpVocab): GenericArrayData =
    new GenericArrayData(
      encode(input.toString, v).map(UTF8String.fromString(_)): Array[Any])

  def tokens(c: Column, v: WpVocab = builtin): Column =
    GraftBridge.column(WordPieceTokens(GraftBridge.expression(c), v))
}

/** Vocabulary carried as a codegen reference object ([[BpeTable]]'s
  * pattern); `maxLen` bounds the greedy scan per position. */
final case class WpVocab(pieces: Set[String], maxLen: Int) extends Serializable

/** `text → array<string>` of WordPiece tokens. */
case class WordPieceTokens(child: Expression, v: WpVocab) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "wordpiece_tokens"

  override def nullSafeEval(input: Any): Any =
    WordPiece.evalTokens(input.asInstanceOf[UTF8String], v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("wpVocab", v, "graft.text.WpVocab")
      s"""${ev.value} = graft.text.WordPiece.evalTokens($c, $ref);"""
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Driver-checkable WordPiece row (tx_wordpiece): fixtures covering greedy
  * longest-match, continuation chains, digit pieces, whole-word [UNK] on
  * unmatchable characters, and case sensitivity; hand-traced VALUES
  * oracle (cmd_parse pattern). */
object WordPieceQueries {
  import org.apache.spark.sql.functions.{array_join, col, size}

  val corpus: Seq[String] = Seq(
    "the database",     // 0: exact word + longest-prefix continuation
    "running queries",  // 1: run ##ning | quer + ##i ##e ##s singles
    "querying 12345",   // 2: quer ##ying | 123 ##45
    "unbelievable",     // 3: three-piece chain
    "theatre stores",   // 4: the ##a ##t ##r ##e | store ##s
    "xyz zy!",          // 5: single letters | whole-word [UNK] ('!' unmatchable)
    "The data",         // 6: case-sensitive: 'T' not in vocab -> [UNK]
    "")                 // 7: empty -> zero tokens

  def wordpiece(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("sid", "text")
      .select(col("sid"),
        size(WordPiece.tokens(col("text"))).cast("long").as("n_tokens"),
        array_join(WordPiece.tokens(col("text")), "|").as("tokens"))
  }

  /** Expected tokens, hand-traced through the greedy matcher against
    * [[WordPiece.builtinPieces]]. Note "queries": quer + ##i? '##ie' not in
    * vocab — greedy takes ##i, ##e, ##s singles. */
  val wordpieceSql: String =
    """SELECT CAST(sid AS BIGINT) AS sid, CAST(n_tokens AS BIGINT) AS n_tokens, tokens
      |FROM (VALUES
      |  (0, 3, 'the|data|##base'),
      |  (1, 6, 'run|##ning|quer|##i|##e|##s'),
      |  (2, 4, 'quer|##ying|123|##45'),
      |  (3, 3, 'un|##believ|##able'),
      |  (4, 7, 'the|##a|##t|##r|##e|store|##s'),
      |  (5, 4, 'x|##y|##z|[UNK]'),
      |  (6, 2, '[UNK]|data'),
      |  (7, 0, '')
      |) t(sid, n_tokens, tokens)""".stripMargin
}
