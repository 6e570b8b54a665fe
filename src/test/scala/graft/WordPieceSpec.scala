package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.text.WordPiece

/** WordPiece greedy-longest-match invariants. */
class WordPieceSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), p)
    assert(res.passed, res.status.toString)
  }

  test("tokens reconstruct each word exactly unless the word is [UNK]") {
    val word = Gen.listOf(Gen.frequency(
      9 -> Gen.alphaLowerChar, 2 -> Gen.numChar, 1 -> Gen.const('!')))
      .map(_.mkString).suchThat(_.nonEmpty)
    check(Prop.forAll(word) { w =>
      val toks = WordPiece.encode(w, WordPiece.builtin)
      if (toks.sameElements(Array(WordPiece.Unk))) true
      else {
        val rebuilt = toks.head + toks.tail.map(_.stripPrefix("##")).mkString
        rebuilt == w && toks.tail.forall(_.startsWith("##")) &&
          !toks.head.startsWith("##")
      }
    })
  }

  test("a word with any unmatchable char is a single whole-word [UNK]") {
    Seq("ab!cd", "!", "abc?", "Tea").foreach { w =>
      assert(WordPiece.encode(w, WordPiece.builtin).toSeq == Seq(WordPiece.Unk), w)
    }
  }

  test("greedy takes the longest piece at each position") {
    // "database": "data" beats "d"/"da"/"dat"; "##base" beats "##b"…
    assert(WordPiece.encode("database", WordPiece.builtin).toSeq ==
      Seq("data", "##base"))
    // "databases": "##bases" (longer) beats "##base"+"##s"
    assert(WordPiece.encode("databases", WordPiece.builtin).toSeq ==
      Seq("data", "##bases"))
  }

  test("whitespace splitting: multi-space and empty input") {
    assert(WordPiece.encode("  the   data  ", WordPiece.builtin).toSeq ==
      Seq("the", "data"))
    assert(WordPiece.encode("", WordPiece.builtin).isEmpty)
  }

  test("tx_oov: engine [UNK] count equals the vocab-closure recount; rate reassembles") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTest.spark
    import spark.implicits._
    // adversarial fixture: cased words, punctuation, unicode, digits, empty
    val docs = Seq(
      (0L, "the database stores 12345"),        // all in-vocab: 0 OOV
      (1L, "The DATABASE st\u00f6res caf\u00e9"),        // all 4 OOV (case + unicode)
      (2L, "a-b c! d@e 99"),                    // 3 OOV (punct), '99' fine
      (3L, ""),                                  // empty: 0 words, null rate
      (4L, "xyz")                                // singles-decomposable: 0 OOV
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("oov_fixture")
    val got = docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.filter(
          org.apache.spark.sql.functions.split(col("text"), "\\s+"), w =>
            org.apache.spark.sql.functions.length(w) > 0)).cast("long").as("n_words"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.filter(
          text.WordPiece.tokens(col("text")), t =>
            t === text.WordPiece.Unk)).cast("long").as("n_oov"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == ((4L, 0L)))
    assert(got(1L) == ((4L, 4L)))
    assert(got(2L) == ((4L, 3L)))
    assert(got(3L) == ((0L, 0L)))
    assert(got(4L) == ((1L, 0L)))
    // the closure property the oracle relies on: a raw word falls back to
    // [UNK] iff it has any char outside [a-z0-9]
    got.keys.foreach { id =>
      val textv = Seq("the database stores 12345", "The DATABASE st\u00f6res caf\u00e9",
        "a-b c! d@e 99", "", "xyz")(id.toInt)
      val words = textv.split("\\s+").filter(_.nonEmpty)
      val byRegex = words.count(w => !w.matches("[a-z0-9]+"))
      assert(byRegex.toLong == got(id)._2, s"doc $id closure mismatch")
    }
  }
}
