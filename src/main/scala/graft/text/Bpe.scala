package graft.text

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A parsed byte-pair-encoding merge table (GPT-2 `merges.txt` semantics):
  * `ranks` maps an adjacent symbol pair to its merge priority (lower wins).
  * The table is a bounded dim — it rides into generated code as a compiled
  * reference object, one instance per executor JVM. A per-thread LRU caches
  * pre-token → tokens: natural-language corpora repeat words heavily, so
  * the cache turns the merge loop into a hash lookup for the hot tail
  * (same trick as the published GPT-2 encoder). */
final case class BpeTable(ranks: Map[(String, String), Int]) {
  @transient private lazy val caches =
    new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
      override def initialValue(): java.util.LinkedHashMap[String, Array[String]] =
        new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 8192
        }
    }
  private[text] def cached(word: String)(compute: => Array[String]): Array[String] = {
    val c = caches.get()
    var v = c.get(word)
    if (v == null) { v = compute; c.put(word, v) }
    v
  }
}

/** Byte-level BPE tokenization (the GPT-2 scheme, from the published
  * algorithm): pre-tokenize with the GPT-2 regex, map each pre-token's
  * UTF-8 bytes through the printable-unicode byte alphabet, then greedily
  * apply the lowest-ranked adjacent-pair merge until none applies. Any
  * GPT-2-format `merges.txt` loads via [[Bpe.parseMerges]]; [[Bpe.builtin]]
  * ships a small deterministic table in the same format (no network in the
  * build environment — a production deployment points at the real 50k-merge
  * file and nothing else changes). Token budgets downstream (tx_pack's
  * bins) consume [[BpeTokenCount]] — real merge-rank tokenization, not a
  * whitespace approximation.
  */
object Bpe {

  /** GPT-2's pre-tokenizer: contractions, optional-space letter runs,
    * digit runs, punctuation runs, then whitespace (trailing-whitespace
    * lookahead keeps one space attached to the following word). Single
    * source of truth — the distributed trainer (tx_bpe_train) splits with
    * this same string, so trainer and encoder cannot desynchronize. */
  val preTokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  private val preTokenRe = java.util.regex.Pattern.compile(preTokenPattern)

  /** The byte → printable-unicode alphabet (public GPT-2 construction):
    * visible latin-1 bytes map to themselves; the rest shift above U+0100
    * in order, so every byte is a distinct printable char and merges never
    * collide with raw whitespace (space becomes 'Ġ' = U+0120). */
  private[graft] val byteToUnicode: Array[Char] = {
    val out = new Array[Char](256)
    val printable = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val isPrintable = printable.toSet
    var shift = 0
    (0 until 256).foreach { b =>
      if (isPrintable(b)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
    }
    out
  }

  /** Parse GPT-2 `merges.txt` content: optional `#...` header lines, then
    * one `left right` pair per line; rank = position. */
  def parseMerges(mergesTxt: String): BpeTable = {
    val pairs = mergesTxt.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && i < l.length - 1, s"malformed merges line: '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }
      .toSeq
    BpeTable(pairs.zipWithIndex.toMap)
  }

  /** Built-in merge table (GPT-2 file format, deterministic): common
    * English pair chains — enough depth that multi-step merges (t+h → th,
    * th+e → the, Ġ+the) and partial merges both occur on real text. */
  val builtinMergesTxt: String =
    """#version: 0.2 (graft built-in)
      |t h
      |th e
      |i n
      |a n
      |r e
      |o n
      |e r
      |a t
      |e s
      |o r
      |e n
      |a l
      |Ġ t
      |Ġ a
      |Ġ s
      |Ġ d
      |Ġ the
      |an d
      |Ġ and
      |in g
      |e d
      |s t
      |a r
      |o u
      |l e
      |c h
      |o f
      |Ġ of
      |t o
      |Ġ to
      |q u
      |qu er
      |quer y
      |d at
      |dat a
      |1 2
      |12 3
      |' s
      |r y
      |er s
      |a s
      |Ġ in
      |""".stripMargin

  lazy val builtin: BpeTable = parseMerges(builtinMergesTxt)

  /** Merge loop for one byte-unicode-mapped pre-token: repeatedly find the
    * lowest-ranked adjacent pair and fuse every occurrence (left to right),
    * until no pair has a rank — the published BPE apply step. */
  private def bpeWord(word: String, table: BpeTable): Array[String] = table.cached(word) {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = table.ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val (a, b) = (syms(bi), syms(bi + 1))
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += a + b; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.toArray
        done = syms.length < 2
      }
    }
    syms
  }

  /** Tokenize: pre-token split → byte→unicode map → merge loop. Tokens are
    * in byte-unicode space (spaces appear as 'Ġ', exactly as GPT-2 prints
    * them). */
  def encode(text: String, table: BpeTable): Array[String] = {
    if (text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = preTokenRe.matcher(text)
    while (m.find()) {
      val bytes = m.group().getBytes(StandardCharsets.UTF_8)
      val mapped = new Array[Char](bytes.length)
      var i = 0
      while (i < bytes.length) { mapped(i) = byteToUnicode(bytes(i) & 0xff); i += 1 }
      out ++= bpeWord(new String(mapped), table)
    }
    out.toArray
  }

  /** Learn `k` merges from pre-token frequencies — the standard BPE
    * trainer: count adjacent symbol pairs weighted by pre-token frequency,
    * fuse the most frequent everywhere (ties: lexicographically smallest
    * pair, so training is deterministic and input-order-independent),
    * repeat. Input pre-tokens are RAW text (the byte→unicode mapping
    * happens here), so the learned pairs drop straight into [[BpeTable]]
    * and [[encode]] consumes them unchanged — the tokenizer twin of
    * ann_kmeans' trained-centroid contract. */
  def trainMerges(preTokenFreqs: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    var words: Seq[(Array[String], Long)] = preTokenFreqs.map { case (w, f) =>
      val bytes = w.getBytes(StandardCharsets.UTF_8)
      (bytes.map(b => String.valueOf(byteToUnicode(b & 0xff))), f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        words = words.map { case (syms, f) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              merged += best._1 + best._2; i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toArray, f)
        }
      }
    }
    out.toSeq
  }

  // ---- static entry points for generated code ------------------------------

  def evalTokens(input: UTF8String, table: BpeTable): GenericArrayData =
    new GenericArrayData(
      encode(input.toString, table).map(UTF8String.fromString(_)): Array[Any])

  def evalCount(input: UTF8String, table: BpeTable): Long = {
    // Count without collecting a token array: sum per-pre-token merge-result
    // lengths straight off bpeWord's cache.
    val text = input.toString
    if (text.isEmpty) return 0L
    var n = 0L
    val m = preTokenRe.matcher(text)
    while (m.find()) {
      val bytes = m.group().getBytes(StandardCharsets.UTF_8)
      val mapped = new Array[Char](bytes.length)
      var i = 0
      while (i < bytes.length) { mapped(i) = byteToUnicode(bytes(i) & 0xff); i += 1 }
      n += bpeWord(new String(mapped), table).length
    }
    n
  }

  def tokens(c: Column, table: BpeTable = builtin): Column =
    GraftBridge.column(BpeTokens(GraftBridge.expression(c), table))

  def tokenCount(c: Column, table: BpeTable = builtin): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(c), table))
}

/** Driver-checkable BPE row (tx_bpe_tokens): a fixed corpus covering merge
  * chaining, contractions, digit runs, punctuation, multi-space framing,
  * case sensitivity, and multi-byte UTF-8 — tokenized by the fused
  * expressions, compared against a hand-verified VALUES oracle (expected
  * tokens derived by hand-tracing the merge table and cross-checked with an
  * independent implementation of the published algorithm — the cmd_parse
  * oracle pattern, [[graft.commands.CommandQueries]]). */
object BpeQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{array_join, col, count, explode, lit, regexp_extract_all}

  val corpus: Seq[String] = Seq(
    "the theatre",
    "querying 123 databases",
    "it's done",
    "to the store and back",
    "UPPER Case Text",
    "data of the era",
    "  leading and trailing  ",
    "naïve café Ω",
    "on-line, off-line!",
    "12345 12 123")

  def bpeTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("sid", "text")
      .select(col("sid"),
        Bpe.tokenCount(col("text")).as("n_tokens"),
        array_join(Bpe.tokens(col("text")), "|").as("tokens"))
  }

  // ---- BPE merge training (tx_bpe_train) -----------------------------------

  /** Fixed training corpus (th-heavy so merge chains go deep quickly). */
  val trainCorpus: Seq[String] = Seq(
    "the theme of the thesis is thin",
    "then the theory of the thermal threshold",
    "this thin thing is the thing",
    "in the inn the innkeeper sings",
    "a thing of things and the rest")

  val trainK = 12

  /** BPE merge training as a query: DISTRIBUTED pre-token counting (the
    * corpus-sized pass — `regexp_extract_all` explode + one hash agg, the
    * shape that runs at 100 TB), then driver-side merge learning over the
    * BOUNDED vocab (Zipf-small — the MaxMind-dim-loader collect pattern;
    * real BPE trainers work exactly this way: one corpus pass to word
    * frequencies, then local iteration). Output: the learned (rank, lhs,
    * rhs) merge list — [[Bpe.trainMerges]]'s contract means it drops into
    * [[BpeTable]] unchanged (spec'd). */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wf = trainCorpus.toDF("text")
      .select(explode(regexp_extract_all(
        col("text"), lit(Bpe.preTokenPattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .collect() // bounded: pre-token vocab, not the corpus
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    Bpe.trainMerges(wf, trainK).zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("merge_rank", "lhs", "rhs")
  }

  /** Expected merge sequence, derived with an independent implementation of
    * the published trainer over the same corpus (ties: count desc, then
    * lexicographic pair). */
  val bpeTrainSql: String =
    """SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lhs, rhs
      |FROM (VALUES
      |  (0, 't', 'h'),
      |  (1, 'Ġ', 'th'),
      |  (2, 'Ġth', 'e'),
      |  (3, 'i', 'n'),
      |  (4, 'Ġth', 'in'),
      |  (5, 'i', 's'),
      |  (6, 'Ġthin', 'g'),
      |  (7, 'o', 'f'),
      |  (8, 'Ġ', 'of'),
      |  (9, 'e', 's'),
      |  (10, 'in', 'n'),
      |  (11, 'r', 'es')
      |) t(merge_rank, lhs, rhs)""".stripMargin

  /** Expected tokenizations, hand-verified against the merge table (tokens
    * print in byte-unicode space: 'Ġ' = space, 'Ã¯' = the UTF-8 bytes of
    * 'ï'). */
  val bpeTokensSql: String =
    """SELECT CAST(sid AS BIGINT) AS sid, CAST(n_tokens AS BIGINT) AS n_tokens, tokens
      |FROM (VALUES
      |  (0, 4, 'the|Ġthe|at|re'),
      |  (1, 10, 'query|ing|Ġ|123|Ġd|at|a|b|as|es'),
      |  (2, 6, 'i|t|''s|Ġd|on|e'),
      |  (3, 11, 'to|Ġthe|Ġs|to|re|Ġand|Ġ|b|a|c|k'),
      |  (4, 14, 'U|P|P|E|R|Ġ|C|as|e|Ġ|T|e|x|t'),
      |  (5, 6, 'data|Ġof|Ġthe|Ġ|er|a'),
      |  (6, 15, 'Ġ|Ġ|le|a|d|ing|Ġand|Ġt|r|a|i|l|ing|Ġ|Ġ'),
      |  (7, 15, 'n|a|Ã|¯|v|e|Ġ|c|a|f|Ã|©|Ġ|Î|©'),
      |  (8, 13, 'on|-|l|in|e|,|Ġof|f|-|l|in|e|!'),
      |  (9, 7, '123|4|5|Ġ|12|Ġ|123')
      |) t(sid, n_tokens, tokens)""".stripMargin
}

/** `text → array<string>` of BPE tokens (byte-unicode space). */
case class BpeTokens(child: Expression, table: BpeTable) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_tokens"

  override def nullSafeEval(input: Any): Any =
    Bpe.evalTokens(input.asInstanceOf[UTF8String], table)

  /** Static-call codegen (ShingleHashes' pattern): the merge table rides as
    * a compiled-in reference object; the expression stays inside the
    * WholeStageCodegen span. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeTable", table, "graft.text.BpeTable")
      s"""${ev.value} = graft.text.Bpe.evalTokens($c, $ref);"""
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `text → bigint` BPE token count — the budget unit for packing/mixing. */
case class BpeTokenCount(child: Expression, table: BpeTable) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    Bpe.evalCount(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeTable", table, "graft.text.BpeTable")
      s"""${ev.value} = graft.text.Bpe.evalCount($c, $ref);"""
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
