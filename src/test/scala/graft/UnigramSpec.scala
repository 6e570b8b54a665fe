package graft

import org.scalatest.funsuite.AnyFunSuite

/** tx_unigram_train — the Viterbi-EM unigram trainer's determinism
  * contract: fewest pieces, then largest total score, then earliest
  * split; exact integer counts end to end. */
class UnigramSpec extends AnyFunSuite {
  import SparkTest._
  import graft.text.UnigramLm

  test("viterbi: fewest pieces wins over any score") {
    // "abab" as one in-vocab 4-gram beats two high-scoring "ab"s
    val c = UnigramLm.viterbiCounts(Seq(("ababab", 1L)),
      Map("abab" -> 1L, "ab" -> 1000L))
    assert(c == Map("abab" -> 1L, "ab" -> 1L))
  }

  test("viterbi: among equal piece counts, larger total score wins") {
    // (a)(bc) sf=9 beats (ab)(c) sf=5
    val c = UnigramLm.viterbiCounts(Seq(("abc", 2L)),
      Map("ab" -> 5L, "bc" -> 9L))
    assert(c == Map("a" -> 2L, "bc" -> 2L))
  }

  test("viterbi: singles always segment (UNK-free), scoring 0 when unscored") {
    val c = UnigramLm.viterbiCounts(Seq(("xyz", 3L)), Map.empty)
    assert(c == Map("x" -> 3L, "y" -> 3L, "z" -> 3L))
  }

  test("unigramTrain: char mass conserved; prune bound respected; oracle-shape output") {
    import org.apache.spark.sql.functions._
    val out = UnigramLm.unigramTrain(spark, sf).collect()
    assert(out.nonEmpty)
    // every piece's freq·len sums to the truncated corpus char count —
    // segmentation is a partition of every word, nothing dropped, no UNK
    val pieceChars = out.map(r => r.getAs[Long]("freq") * r.getAs[Long]("n_chars")).sum
    val corpusChars = Tables(spark, sf).documents
      .select(explode(graft.functions.Portable.words(col("text"))).as("w"))
      .select(length(substring(col("w"), 1, UnigramLm.maxWordLen)).cast("long").as("l"))
      .agg(sum(col("l"))).head().getLong(0)
    assert(pieceChars == corpusChars)
    // the EM prune bounds the multi-char vocabulary
    assert(out.count(_.getAs[Long]("n_chars") >= 2) <= UnigramLm.pruneK)
    out.foreach { r =>
      assert(r.getAs[Long]("freq") > 0 &&
        r.getAs[String]("piece").length == r.getAs[Long]("n_chars"))
    }
  }
}
