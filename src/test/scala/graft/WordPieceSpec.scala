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
}
