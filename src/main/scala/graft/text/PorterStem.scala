package graft.text

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Porter stemmer (Porter 1980, "An algorithm for suffix stripping") —
  * the ORIGINAL published rule set, not one of the later revisions: the
  * canonical index/dedup normalizer (search keys, vocabulary folding before
  * n-gram/TF-IDF stages).
  *
  * Implementation notes pinned to the paper:
  *  - a letter is a consonant unless it is a/e/i/o/u, or a `y` preceded by
  *    a consonant; `m` counts VC sequences in the `[C](VC)^m[V]` form;
  *  - within a step the LONGEST matching suffix wins, and if its condition
  *    fails the step is a no-op (no fallback to shorter suffixes — this is
  *    what sends `rational` through step 4, not step 2);
  *  - conditions (`m`, `*v*`, `*d`, `*o`) are evaluated on the STEM;
  *  - words of length ≤ 2 pass through untouched.
  * Input is lowercased first; non-letter inputs pass through unchanged
  * apart from that fold.
  */
object PorterStem {

  private def isVowelAt(w: Array[Char], i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** m of w[0, len): VC-sequence count. */
  private def measure(w: Array[Char], len: Int): Int = {
    var m = 0
    var i = 0
    while (i < len && !isVowelAt(w, i)) i += 1 // skip [C]
    while (i < len) {
      while (i < len && isVowelAt(w, i)) i += 1 // V run
      if (i < len) { m += 1; while (i < len && !isVowelAt(w, i)) i += 1 } // C run
    }
    m
  }

  private def hasVowel(w: Array[Char], len: Int): Boolean =
    (0 until len).exists(isVowelAt(w, _))

  private def doubleC(w: Array[Char], len: Int): Boolean =
    len >= 2 && w(len - 1) == w(len - 2) && !isVowelAt(w, len - 1)

  /** *o: stem ends cvc, final c not w/x/y. */
  private def cvc(w: Array[Char], len: Int): Boolean =
    len >= 3 && !isVowelAt(w, len - 3) && isVowelAt(w, len - 2) &&
      !isVowelAt(w, len - 1) &&
      w(len - 1) != 'w' && w(len - 1) != 'x' && w(len - 1) != 'y'

  private def endsWith(w: Array[Char], len: Int, s: String): Boolean =
    len >= s.length && {
      var i = 0
      var ok = true
      while (ok && i < s.length) {
        ok = w(len - s.length + i) == s.charAt(i); i += 1
      }
      ok
    }

  /** Longest-match rule table application: returns the new length after
    * replacing the matched suffix (condition checked on the stem), or -1
    * if no suffix matched / the longest match's condition failed. Rules
    * are (suffix, replacement, minM). */
  private def applyTable(w: Array[Char], len: Int,
      rules: Seq[(String, String, Int)]): Int = {
    val best = rules.filter(r => endsWith(w, len, r._1))
      .sortBy(-_._1.length).headOption
    best match {
      case None => -1
      case Some((suf, rep, minM)) =>
        val stemLen = len - suf.length
        if (measure(w, stemLen) <= minM) -1
        else {
          var i = 0
          while (i < rep.length) { w(stemLen + i) = rep.charAt(i); i += 1 }
          stemLen + rep.length
        }
    }
  }

  private val step2Rules = Seq(
    ("ational", "ate", 0), ("tional", "tion", 0), ("enci", "ence", 0),
    ("anci", "ance", 0), ("izer", "ize", 0), ("abli", "able", 0),
    ("alli", "al", 0), ("entli", "ent", 0), ("eli", "e", 0),
    ("ousli", "ous", 0), ("ization", "ize", 0), ("ation", "ate", 0),
    ("ator", "ate", 0), ("alism", "al", 0), ("iveness", "ive", 0),
    ("fulness", "ful", 0), ("ousness", "ous", 0), ("aliti", "al", 0),
    ("iviti", "ive", 0), ("biliti", "ble", 0))

  private val step3Rules = Seq(
    ("icate", "ic", 0), ("ative", "", 0), ("alize", "al", 0),
    ("iciti", "ic", 0), ("ical", "ic", 0), ("ful", "", 0), ("ness", "", 0))

  private val step4Plain = Seq(
    ("al", "", 1), ("ance", "", 1), ("ence", "", 1), ("er", "", 1),
    ("ic", "", 1), ("able", "", 1), ("ible", "", 1), ("ant", "", 1),
    ("ement", "", 1), ("ment", "", 1), ("ent", "", 1), ("ou", "", 1),
    ("ism", "", 1), ("ate", "", 1), ("iti", "", 1), ("ous", "", 1),
    ("ive", "", 1), ("ize", "", 1))

  def stem(word: String): String = {
    val lower = word.toLowerCase(java.util.Locale.ROOT)
    if (lower.length <= 2) return lower
    val w = new Array[Char](lower.length + 1) // +1: step-1b fixups may add 'e'
    lower.getChars(0, lower.length, w, 0)
    var len = lower.length

    // step 1a
    if (endsWith(w, len, "sses")) len -= 2
    else if (endsWith(w, len, "ies")) len -= 2
    else if (!endsWith(w, len, "ss") && endsWith(w, len, "s")) len -= 1

    // step 1b
    var fix1b = false
    if (endsWith(w, len, "eed")) {
      if (measure(w, len - 3) > 0) len -= 1
    } else if (endsWith(w, len, "ed") && hasVowel(w, len - 2)) {
      len -= 2; fix1b = true
    } else if (endsWith(w, len, "ing") && hasVowel(w, len - 3)) {
      len -= 3; fix1b = true
    }
    if (fix1b) {
      if (endsWith(w, len, "at") || endsWith(w, len, "bl") ||
          endsWith(w, len, "iz")) { w(len) = 'e'; len += 1 }
      else if (doubleC(w, len) && w(len - 1) != 'l' && w(len - 1) != 's' &&
          w(len - 1) != 'z') len -= 1
      else if (measure(w, len) == 1 && cvc(w, len)) { w(len) = 'e'; len += 1 }
    }

    // step 1c
    if (endsWith(w, len, "y") && hasVowel(w, len - 1)) w(len - 1) = 'i'

    // steps 2, 3
    applyTable(w, len, step2Rules) match { case -1 => (); case n => len = n }
    applyTable(w, len, step3Rules) match { case -1 => (); case n => len = n }

    // step 4: "ion" needs the extra s/t stem check; it competes on length
    // with the plain rules, so pick the longest matcher across both forms
    val ionMatch = endsWith(w, len, "ion")
    val plainBest = step4Plain.filter(r => endsWith(w, len, r._1))
      .map(_._1.length).sorted.lastOption.getOrElse(0)
    if (ionMatch && 3 >= plainBest) {
      val stemLen = len - 3
      if (stemLen > 0 && (w(stemLen - 1) == 's' || w(stemLen - 1) == 't') &&
        measure(w, stemLen) > 1) len = stemLen
    } else {
      applyTable(w, len, step4Plain) match { case -1 => (); case n => len = n }
    }

    // step 5a
    if (endsWith(w, len, "e")) {
      val m = measure(w, len - 1)
      if (m > 1 || (m == 1 && !cvc(w, len - 1))) len -= 1
    }
    // step 5b
    if (measure(w, len) > 1 && doubleC(w, len) && w(len - 1) == 'l') len -= 1

    new String(w, 0, len)
  }

  def evalStem(input: UTF8String): UTF8String =
    UTF8String.fromString(stem(input.toString))

  /** Fixture corpus for the driver row — each stem is independently pinned
    * by PorterStemSpec against the paper vocabulary; the relational/relate/
    * relating triple demonstrates vocabulary folding (three surface forms,
    * one stem). */
  val stemCorpus: Seq[String] = Seq(
    "caresses", "ponies", "relational", "relate", "relating", "conditional",
    "rational", "hopping", "sized", "happy", "electrical", "triplicate",
    "formative", "adjustable", "replacement", "adoption", "communism",
    "activate", "effective", "allowance", "inference", "probate")

  /** Vocabulary folding over the fixture: surface form → stem, plus the
    * per-stem fold width (how many forms share the stem) — zero-shuffle
    * stem math + one bounded window. */
  def stemQuery(spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("stem"))
    stemCorpus.toDF("word")
      .select(col("word"), PorterStem(col("word")).as("stem"))
      .withColumn("n_forms", count(lit(1)).over(w))
  }

  /** Hand-pinned stems (same values PorterStemSpec asserts). */
  val stemQuerySql: String =
    """WITH s AS (SELECT * FROM (VALUES
      |  ('caresses', 'caress'), ('ponies', 'poni'), ('relational', 'relat'),
      |  ('relate', 'relat'), ('relating', 'relat'), ('conditional', 'condit'),
      |  ('rational', 'ration'), ('hopping', 'hop'), ('sized', 'size'),
      |  ('happy', 'happi'), ('electrical', 'electr'), ('triplicate', 'triplic'),
      |  ('formative', 'form'), ('adjustable', 'adjust'),
      |  ('replacement', 'replac'), ('adoption', 'adopt'),
      |  ('communism', 'commun'), ('activate', 'activ'),
      |  ('effective', 'effect'), ('allowance', 'allow'),
      |  ('inference', 'infer'), ('probate', 'probat')) t(word, stem))
      |SELECT word, stem,
      |  CAST(count(*) OVER (PARTITION BY stem) AS BIGINT) AS n_forms
      |FROM s""".stripMargin

  def apply(c: Column): Column =
    GraftBridge.column(PorterStemExpr(GraftBridge.expression(c)))
}

/** `word → porter stem` (static-call codegen; rules in [[PorterStem.stem]]). */
case class PorterStemExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "porter_stem"

  override def nullSafeEval(input: Any): Any =
    PorterStem.evalStem(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.text.PorterStem.evalStem($c);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
