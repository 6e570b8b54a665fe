package graft.text

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-family, Kudo 2018) tokenizer TRAINING — the
  * third production tokenizer trainer next to BPE (tx_bpe_train) and
  * WordPiece (tx_wordpiece): seed a large candidate vocabulary from corpus
  * substrings, alternate (E) segment the corpus under the current piece
  * scores with (M) re-score + prune to the best pieces, and emit the
  * surviving vocabulary with its usage counts.
  *
  * Determinism contract (what makes the row hash-checkable cross-engine):
  * the published trainer is soft-EM over float log-probs — float sums in a
  * nondeterministic reduction order cannot hash-match, so this uses the
  * HARD-EM (Viterbi) variant with an integer-exact objective: segment each
  * word into the FEWEST pieces, breaking ties by the LARGEST total piece
  * score (exact BIGINT sums), then by earliest split point. Scores are
  * exact integer corpus counts throughout (seed pass: substring occurrence
  * counts; EM pass: Viterbi usage counts), and every prune is an (score
  * DESC, piece ASC) top-K — total order, no RNG, no floats anywhere.
  *
  * Scale shape (the tx_bpe_train posture, which is also how production
  * trainers work — one corpus-sized counting pass, then local iteration
  * over the bounded vocabulary): the DISTRIBUTED work is the word-frequency
  * aggregation (explode + one hash agg — the only corpus-sized pass, runs
  * at 100 TB); the collected (word, freq) table is capped at [[vocabCap]]
  * rows by construction (top-N by freq — see the constant's scaladoc; Zipf
  * alone is NOT a bound on a web corpus), and the Viterbi-EM loop runs
  * driver-side over it. Words are
  * truncated to [[maxWordLen]] chars before counting (identically in the
  * oracle; the corpus is ASCII so char/byte/codepoint semantics agree
  * across engines).
  */
object UnigramLm {

  /** Words are truncated to this many chars before counting (bounds the
    * DP and the oracle's unrolled SQL alike). */
  val maxWordLen = 12
  /** Candidate pieces are substrings up to this length (single chars are
    * always segmentable, vocab or not — the UNK-free guarantee). */
  val maxPieceLen = 4
  /** Seed vocabulary: top-K multi-char substrings by occurrence count. */
  val seedK = 120
  /** EM prune: multi-char pieces surviving into the final vocabulary. */
  val pruneK = 48
  /** Driver-state cap: the (word, freq) table collected for the EM loop
    * keeps only the top [[vocabCap]] words by (freq DESC, word ASC) — the
    * SentencePiece seed-candidate convention (its trainer seeds from a
    * capped candidate set, not the raw vocabulary). Zipf bounds the
    * distinct-word count at fixture scale, but a 100 TB web corpus has
    * 10⁸-10⁹ distinct "words" (typos, URL fragments, code identifiers);
    * without the cap the collect is a driver OOM. The cap is a
    * TakeOrderedAndProject (per-partition heads, no global sort) applied
    * IDENTICALLY in the DuckDB oracle, so capped and uncapped corpora
    * alike hash-match cross-engine; the dropped tail is the rare-word
    * mass the trainer's piece scores could not distinguish from noise. */
  val vocabCap = 1 << 16

  /** Viterbi segmentation of one word under a scored vocab: fewest pieces
    * → largest total score → earliest split, each piece either in-vocab or
    * a single char (score 0 if an unscored single). */
  private[graft] def segment(w: String, voc: Map[String, Long]): Seq[String] = {
    val L = w.length
    // dp(j) = (pieces, totalScore, backPointer) for the best prefix cut
    val np = new Array[Int](L + 1)
    val sf = new Array[Long](L + 1)
    val bi = new Array[Int](L + 1)
    var j = 1
    while (j <= L) {
      var bestNp = Int.MaxValue; var bestSf = Long.MinValue; var bestBi = -1
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        val i = j - l
        val piece = w.substring(i, j)
        val pf: Option[Long] =
          if (l == 1) Some(voc.getOrElse(piece, 0L)) else voc.get(piece)
        pf.foreach { s =>
          val cNp = np(i) + 1; val cSf = sf(i) + s
          // (np ASC, sf DESC, bi ASC) — bi ASC means the LOWER i wins a
          // full tie, and we scan l ascending ⇒ i descending, so strict
          // improvement OR equal-key-lower-i replacement
          if (cNp < bestNp || (cNp == bestNp && (cSf > bestSf ||
              (cSf == bestSf && i < bestBi))))
            { bestNp = cNp; bestSf = cSf; bestBi = i }
        }
        l += 1
      }
      np(j) = bestNp; sf(j) = bestSf; bi(j) = bestBi
      j += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var cur = L
    while (cur > 0) {
      val i = bi(cur)
      w.substring(i, cur) +=: out
      cur = i
    }
    out.toList
  }

  /** One Viterbi segmentation pass over the word table: per-piece usage
    * counts weighted by word frequency. */
  private[graft] def viterbiCounts(wf: Seq[(String, Long)],
      voc: Map[String, Long]): Map[String, Long] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    wf.foreach { case (w, f) =>
      segment(w, voc).foreach { piece =>
        counts(piece) = counts.getOrElse(piece, 0L) + f
      }
    }
    counts.toMap
  }

  /** Deterministic (score DESC, piece ASC) top-K. */
  private def topK(m: Iterable[(String, Long)], k: Int): Seq[(String, Long)] =
    m.toSeq.sortBy { case (p, s) => (-s, p) }.take(k)

  /** Seed → segment → prune: the TRAINED (piece → score) vocabulary the
    * final pass (and the inference row) segments under. */
  private[graft] def trainedVocab(wf: Seq[(String, Long)]): Map[String, Long] = {
    // seed scores: exact substring occurrence counts over the corpus
    val seedCounts = scala.collection.mutable.Map.empty[String, Long]
    val charCounts = scala.collection.mutable.Map.empty[String, Long]
    wf.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        charCounts(w.substring(i, i + 1)) =
          charCounts.getOrElse(w.substring(i, i + 1), 0L) + f
        var l = 2
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          seedCounts(p) = seedCounts.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val voc1 = (topK(seedCounts, seedK) ++ charCounts.toSeq).toMap
    val cnt1 = viterbiCounts(wf, voc1)
    // M-step prune: best multis by pass-1 usage; singles always survive,
    // re-scored to their pass-1 usage (0 if the segmentation never chose
    // them standalone)
    (topK(cnt1.filter(_._1.length >= 2), pruneK) ++
      charCounts.keys.map(c => c -> cnt1.getOrElse(c, 0L))).toMap
  }

  /** The full trainer over a (word, freq) table: seed → segment → prune →
    * re-segment; returns the final (piece, usageCount) vocabulary. */
  private[graft] def train(wf: Seq[(String, Long)]): Seq[(String, Long)] =
    viterbiCounts(wf, trainedVocab(wf)).toSeq.sortBy { case (p, c) => (-c, p) }

  /** The distributed word-frequency pass — the one corpus-sized scan;
    * shared by the trainer and the inference row. Driver state is bounded
    * BY CONSTRUCTION: the collect happens after a top-[[vocabCap]]
    * TakeOrderedAndProject, never on the raw distinct-word table.
    * Exposed over any (text) frame so the cap is spec-testable on an
    * adversarial many-unique-words corpus (the fixture's vocab is tiny). */
  private[graft] def wordFreqsOf(docs: DataFrame,
      cap: Int = vocabCap): Seq[(String, Long)] =
    docs
      .select(explode(Portable.words(col("text"))).as("w0"))
      .select(substring(col("w0"), 1, maxWordLen).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc).limit(cap)
      .collect() // bounded: ≤ cap rows by construction
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  private def wordFreqs(spark: SparkSession, sfDir: String): Seq[(String, Long)] =
    wordFreqsOf(graft.Tables(spark, sfDir).documents)

  /** The registered row: distributed word-frequency pass over `documents`,
    * then the driver-side Viterbi-EM over the bounded vocab. */
  def unigramTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    train(wordFreqs(spark, sfDir)).map { case (p, c) => (p, p.length.toLong, c) }
      .toDF("piece", "n_chars", "freq")
  }

  /** Unigram tokenizer INFERENCE at corpus scale — consumes the TRAINED
    * vocabulary the way ann_ivf_trained consumes ann_kmeans centroids:
    * train once, precompute each distinct word's Viterbi piece count over
    * the bounded vocab, BROADCAST that (word → n_pieces) dim, and the
    * corpus-sized pass is explode + broadcast equi-join + one per-doc sum
    * (no DP ever runs per occurrence; the dim is Zipf-bounded). Output per
    * doc: whitespace word count and unigram token count — the "how many
    * tokens is this corpus under MY tokenizer" budgeting query every
    * pre-training run prices first. */
  def unigramTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wf = wordFreqs(spark, sfDir)
    val voc = trainedVocab(wf)
    val dim = wf.map { case (w, _) => (w, segment(w, voc).length.toLong) }
      .toDF("w", "np_w")
    graft.Tables(spark, sfDir).documents
      .select(col("doc_id"), explode(Portable.words(col("text"))).as("w0"))
      .select(col("doc_id"), substring(col("w0"), 1, maxWordLen).as("w"))
      .join(broadcast(dim), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("np_w")).as("n_pieces"))
  }

  // ---- the DuckDB oracle: the same trainer, unrolled ------------------------

  /** One Viterbi pass as generated SQL: DP CTEs `b<tag>_1..L` (argmin per
    * prefix), the collected back-pointer table, the unrolled backtrack,
    * and the usage-count CTE `cnt<tag>`. `vocCte` must expose
    * (piece, sc). */
  private def viterbiCtes(tag: String, vocCte: String): String = {
    val cand =
      s"""cand$tag AS MATERIALIZED (
         |  SELECT c.w, c.i, c.j, c.piece,
         |    CASE WHEN c.l = 1 THEN coalesce(v.sc, 0) ELSE v.sc END AS pf
         |  FROM (
         |    SELECT wf.w, j - l AS i, j, substr(wf.w, j - l + 1, l) AS piece, l
         |    FROM wf,
         |      LATERAL unnest(range(1, len(w) + 1)) tj(j),
         |      LATERAL unnest(range(1, ${maxPieceLen + 1})) tl(l)
         |    WHERE l <= j) c
         |  LEFT JOIN $vocCte v ON v.piece = c.piece
         |  WHERE c.l = 1 OR v.sc IS NOT NULL)""".stripMargin
    val b0 = s"b${tag}_0 AS MATERIALIZED (SELECT w, 0 AS np, CAST(0 AS BIGINT) AS sf, -1 AS bi FROM wf)"
    val bs = (1 to maxWordLen).map { j =>
      val arms = (math.max(0, j - maxPieceLen) until j).map { jp =>
        s"""    SELECT c.w, p.np + 1 AS np, p.sf + c.pf AS sf, c.i AS bi
           |    FROM cand$tag c JOIN b${tag}_$jp p ON p.w = c.w
           |    WHERE c.j = $j AND c.i = $jp""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""b${tag}_$j AS MATERIALIZED (
         |  SELECT w, np, sf, bi FROM (
         |    SELECT u.*, row_number() OVER (PARTITION BY u.w
         |      ORDER BY u.np ASC, u.sf DESC, u.bi ASC) AS rn
         |    FROM (
         |$arms) u) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val ball = s"ball$tag AS MATERIALIZED (" + (1 to maxWordLen)
      .map(j => s"SELECT w, $j AS pos, bi FROM b${tag}_$j")
      .mkString("\n  UNION ALL ") + ")"
    val t0 = s"t${tag}_0 AS MATERIALIZED (SELECT w, len(w) AS cur FROM wf)"
    val steps = (1 to maxWordLen).map { k =>
      s"""p${tag}_$k AS MATERIALIZED (
         |  SELECT t.w, substr(t.w, b.bi + 1, t.cur - b.bi) AS piece, b.bi
         |  FROM t${tag}_${k - 1} t JOIN ball$tag b ON b.w = t.w AND b.pos = t.cur
         |  WHERE t.cur > 0),
         |t${tag}_$k AS MATERIALIZED (SELECT w, bi AS cur FROM p${tag}_$k)""".stripMargin
    }.mkString(",\n")
    val pieces = s"pieces$tag AS MATERIALIZED (" + (1 to maxWordLen)
      .map(k => s"SELECT w, piece FROM p${tag}_$k")
      .mkString("\n  UNION ALL ") + ")"
    val cnt =
      s"""cnt$tag AS MATERIALIZED (
         |  SELECT p.piece, CAST(sum(wf.f) AS BIGINT) AS c
         |  FROM pieces$tag p JOIN wf ON wf.w = p.w GROUP BY 1)""".stripMargin
    Seq(cand, b0, bs, ball, t0, steps, pieces, cnt).mkString(",\n")
  }

  /** The full trainer CTE chain (word freqs → seed → Viterbi pass 1 →
    * prune → Viterbi pass 2) — the single source both oracles extend. */
  private val trainerCtes: String =
    s"""wf AS MATERIALIZED (
       |  SELECT w, f FROM (
       |    SELECT substr(w0, 1, $maxWordLen) AS w, CAST(count(*) AS BIGINT) AS f
       |    FROM (SELECT unnest(${Portable.wordsSql}) AS w0 FROM documents)
       |    GROUP BY 1)
       |  ORDER BY f DESC, w ASC LIMIT $vocabCap),
       |subs AS MATERIALIZED (
       |  SELECT substr(w, i, l) AS piece, f
       |  FROM wf,
       |    LATERAL unnest(range(1, len(w) + 1)) t1(i),
       |    LATERAL unnest(range(2, ${maxPieceLen + 1})) t2(l)
       |  WHERE i + l - 1 <= len(w)),
       |seedm AS MATERIALIZED (
       |  SELECT piece, CAST(sum(f) AS BIGINT) AS sc FROM subs GROUP BY 1
       |  ORDER BY sc DESC, piece ASC LIMIT $seedK),
       |chars0 AS MATERIALIZED (
       |  SELECT substr(w, i, 1) AS piece, CAST(sum(f) AS BIGINT) AS sc
       |  FROM wf, LATERAL unnest(range(1, len(w) + 1)) t(i) GROUP BY 1),
       |voc1 AS MATERIALIZED (SELECT piece, sc FROM seedm
       |         UNION ALL SELECT piece, sc FROM chars0),
       |${viterbiCtes("1", "voc1")},
       |voc2 AS MATERIALIZED (
       |  SELECT piece, c AS sc FROM (
       |    SELECT piece, c FROM cnt1 WHERE len(piece) >= 2
       |    ORDER BY c DESC, piece ASC LIMIT $pruneK)
       |  UNION ALL
       |  SELECT c0.piece, coalesce(c1.c, 0) AS sc
       |  FROM chars0 c0 LEFT JOIN cnt1 c1
       |    ON c1.piece = c0.piece AND len(c1.piece) = 1),
       |${viterbiCtes("2", "voc2")}""".stripMargin

  /** Independent replay of the whole trainer in DuckDB: word freqs, seed
    * scores, Viterbi pass 1, prune, Viterbi pass 2, final counts. */
  val unigramTrainSql: String =
    s"""WITH $trainerCtes
       |SELECT piece, CAST(len(piece) AS BIGINT) AS n_chars, c AS freq
       |FROM cnt2""".stripMargin

  /** Inference oracle: each word's piece count is the pass-2 DP value at
    * its own length (`b2_len(w)` row), joined back under every occurrence. */
  val unigramTokensSql: String = {
    val wnp = (1 to maxWordLen)
      .map(j => s"SELECT w, np FROM b2_$j WHERE len(w) = $j")
      .mkString("\n  UNION ALL ")
    s"""WITH $trainerCtes,
       |wnp AS MATERIALIZED ($wnp),
       |dw AS (
       |  SELECT doc_id, substr(w0, 1, $maxWordLen) AS w
       |  FROM (SELECT doc_id, unnest(${Portable.wordsSql}) AS w0 FROM documents))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(wnp.np) AS BIGINT) AS n_pieces
       |FROM dw JOIN wnp ON wnp.w = dw.w
       |GROUP BY 1""".stripMargin
  }
}
