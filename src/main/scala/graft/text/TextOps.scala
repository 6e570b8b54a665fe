package graft.text

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over `documents` (SURVEY §2e): language ID, quality
  * scoring, token counting, winnowing fingerprints. All pure column math —
  * whole-stage codegen, zero UDFs; every ratio is a single int/int double
  * division (bit-identical across engines), so only composite scores carry a
  * 6dp rounding guard.
  */
object TextOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).documents

  // ---- #29 language ID (stopword-profile n-gram heuristic) ----------------

  /** Per-language marker-word profiles (the n-gram-profile method with word
    * unigrams; real deployments load trained profiles as this same dim). */
  val profiles: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "fast", "en" -> "key", "en" -> "small",
    "es" -> "data", "es" -> "table", "es" -> "row", "es" -> "order",
    "de" -> "scan", "de" -> "merge", "de" -> "hash", "de" -> "join",
    "fr" -> "filter", "fr" -> "group", "fr" -> "sort", "fr" -> "window",
    "zh" -> "spark", "zh" -> "query", "zh" -> "batch", "zh" -> "stream")

  def profilesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    profiles.toDF("plang", "pword")
  }

  val profilesValuesSql: String =
    "profiles(plang, pword) AS (VALUES " +
      profiles.map { case (l, w) =>
        s"('${l.replace("'", "''")}', '${w.replace("'", "''")}')"
      }.mkString(", ") + ")"

  /** Fused literal-profile scoring: when the profile dim is a plan-time
    * literal (the compiled-in [[profiles]] — tiny by construction), each
    * language's score compiles to per-row column math
    * (`array_contains` presence sums over the doc's word array) and the
    * argmax to a when-chain in plang-ASC order (= the generic path's
    * `score DESC, plang ASC` tie-break). The corpus-sized explode +
    * broadcast join + (doc, lang) aggregation of the generic path
    * disappear entirely — language ID becomes a ZERO-shuffle scan
    * projection, which is also why the downstream gates (tx_filter,
    * pipe_curate, samp_mixture) can carry `lang_pred` without a doc_id
    * re-join. Returns (lang_pred, score); score 0 ⇔ no profile word
    * present ⇔ the generic inner join would emit nothing. */
  def langIdCols(textCol: Column): (Column, Column) = {
    val w = Portable.words(textCol)
    val scored = profiles.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, ws) =>
      l -> ws.map { case (_, word) =>
        when(array_contains(w, word), 1).otherwise(0)
      }.reduce(_ + _)
    }
    val best = greatest(scored.map(_._2): _*)
    val pred = scored.foldRight(lit(null).cast("string")) { case ((l, s), acc) =>
      when(s === best, l).otherwise(acc)
    }
    (pred, best.cast("long"))
  }

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val (pred, score) = langIdCols(col("text"))
    docs(spark, sfDir)
      .select(col("doc_id"), pred.as("lang_pred"), score.as("score"))
      .filter(col("score") > 0)
  }

  /** Language ID against an arbitrary profile dim `(plang, pword)` — the
    * built-in [[profiles]], or one trained in-engine by [[profileTrain]]
    * (`select(lang as plang, word as pword)`). */
  def langIdWith(spark: SparkSession, sfDir: String, profileDim: DataFrame): DataFrame = {
    val wordsTable = docs(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(Portable.words(col("text")))).as("word"))
    val scores = wordsTable.join(broadcast(profileDim), col("word") === col("pword"))
      .groupBy(col("doc_id"), col("plang")).agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("plang").asc)
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("plang").as("lang_pred"), col("score"))
  }

  /** CTE chain ending in `preds(doc_id, lang_pred, score)` — shared by the
    * langid oracle and the evaluation oracle so the tie-break rule
    * (score desc, lang asc) exists in exactly one SQL place. */
  val langIdCtes: String =
    s"""$profilesValuesSql,
       |wt AS (SELECT doc_id, unnest(list_distinct(${Portable.wordsSql})) AS word FROM documents),
       |scores AS (
       |  SELECT doc_id, plang, count(*) AS score
       |  FROM wt JOIN profiles ON word = pword GROUP BY 1, 2),
       |preds AS (
       |  SELECT doc_id, plang AS lang_pred, score FROM (
       |    SELECT doc_id, plang, score,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang ASC) AS rn
       |    FROM scores) t
       |  WHERE rn = 1)""".stripMargin

  val langIdSql: String =
    s"""WITH $langIdCtes
       |SELECT doc_id, lang_pred, score FROM preds""".stripMargin

  /** Language-ID evaluation — the quality readout every corpus-curation run
    * publishes next to its classifier: per TRUE label, scored-doc count,
    * correct count, recall, and the top confusion target (which language
    * absorbs this one's misclassifications — the signal that says whether
    * to fix profiles or thresholds). Scale shape: the per-doc prediction is
    * the fused zero-shuffle langid scan; everything after runs over the
    * |langs|² confusion matrix. Recall is ONE division of exact ints. */
  def lidEval(spark: SparkSession, sfDir: String): DataFrame = {
    val m = docs(spark, sfDir).select(col("doc_id"), col("lang"))
      .join(langId(spark, sfDir), "doc_id")
      .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
    val tot = m.groupBy(col("lang")).agg(sum(col("n")).as("n_scored"),
      sum(when(col("lang_pred") === col("lang"), col("n")).otherwise(0L))
        .as("n_correct"))
    val wConf = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("lang_pred").asc)
    val conf = m.filter(col("lang_pred") =!= col("lang"))
      .withColumn("rn", row_number().over(wConf)).filter(col("rn") === 1)
      .select(col("lang"), col("lang_pred").as("top_confusion"))
    tot.join(conf, Seq("lang"), "left")
      .select(col("lang"), col("n_scored"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_scored"), 6).as("recall"),
        col("top_confusion"))
  }

  val lidEvalSql: String =
    s"""WITH $langIdCtes,
       |j AS (SELECT d.lang, p.lang_pred FROM documents d
       |      JOIN preds p ON p.doc_id = d.doc_id),
       |m AS (SELECT lang, lang_pred, count(*) AS n FROM j GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_scored,
       |          CAST(sum(CASE WHEN lang_pred = lang THEN n ELSE 0 END) AS BIGINT)
       |            AS n_correct
       |        FROM m GROUP BY 1),
       |conf AS (SELECT lang, lang_pred AS top_confusion FROM (
       |           SELECT lang, lang_pred,
       |             row_number() OVER (PARTITION BY lang ORDER BY n DESC, lang_pred ASC) AS rn
       |           FROM m WHERE lang_pred <> lang) t
       |         WHERE rn = 1)
       |SELECT t.lang, t.n_scored, t.n_correct,
       |  round(CAST(t.n_correct AS DOUBLE) / t.n_scored, 6) AS recall,
       |  c.top_confusion
       |FROM tot t LEFT JOIN conf c ON c.lang = t.lang""".stripMargin

  // ---- classifier calibration audit -----------------------------------------

  /** Calibration audit of the langid classifier — lidEval answers "how
    * often is it right", this answers "can its CONFIDENCE be trusted"
    * (Guo et al. ICML'17 — the reliability-diagram + expected-calibration-
    * error readout every production classifier ships with): per confidence
    * level (marker-hit score 1..4, confidence = score/4), the empirical
    * accuracy against the `lang` truth column, plus the ECE
    * Σ_b (n_b/N)·|acc_b − conf_b| — the number that says whether a
    * downstream confidence threshold (tx_filter's gate, samp_mixture's
    * weights) means what it claims. ONE-row pivot readout: the per-level
    * cells are exact-BIGINT counts off the zero-shuffle fused langid scan
    * + one bounded agg; acc/ECE are double expressions of exact operands
    * in one fixed textual order (conf_b = b/4 exact dyadics), so the 6dp
    * values are engine-stable. Levels the corpus never emits read null
    * accuracy and contribute zero ECE mass. */
  def calibration(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = docs(spark, sfDir).select(col("doc_id"), col("lang"))
    val lvl = langId(spark, sfDir).join(truth, "doc_id")
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang_pred") === col("lang"), 1L).otherwise(0L)).as("nc"))
    val cells = (1 to 4).flatMap { i =>
      Seq(max(when(col("score") === i, col("n"))).as(s"n_$i"),
        max(when(col("score") === i, col("nc"))).as(s"nc_$i"))
    }
    val p = lvl.agg(cells.head, cells.tail: _*)
    def acc(i: Int) =
      round(col(s"nc_$i").cast("double") / col(s"n_$i"), 6).as(s"acc_$i")
    def term(i: Int) =
      when(col(s"n_$i").isNull, lit(0d))
        .otherwise(abs(col(s"nc_$i").cast("double") / col(s"n_$i") - lit(i / 4d))
          * col(s"n_$i"))
    p.withColumn("n_scored",
        (1 to 4).map(i => coalesce(col(s"n_$i"), lit(0L))).reduce(_ + _))
      .select(col("n_1") +: acc(1) +: col("n_2") +: acc(2) +:
        col("n_3") +: acc(3) +: col("n_4") +: acc(4) +: col("n_scored") +:
        round((term(1) + term(2) + term(3) + term(4)) / col("n_scored"), 6)
          .as("ece") +: Nil: _*)
  }

  val calibrationSql: String = {
    val cells = (1 to 4).map { i =>
      s"""    max(CASE WHEN score = $i THEN n END) AS n_$i,
         |    max(CASE WHEN score = $i THEN nc END) AS nc_$i""".stripMargin
    }.mkString(",\n")
    val accs = (1 to 4).map(i =>
      s"round(CAST(nc_$i AS DOUBLE) / n_$i, 6) AS acc_$i")
    val terms = (1 to 4).map(i =>
      s"CASE WHEN n_$i IS NULL THEN CAST(0 AS DOUBLE) " +
        s"ELSE abs(CAST(nc_$i AS DOUBLE) / n_$i - ${i / 4d}) * n_$i END")
    val nScored = (1 to 4).map(i => s"coalesce(n_$i, 0)").mkString(" + ")
    s"""WITH $langIdCtes,
       |j AS (
       |  SELECT p.score,
       |    CASE WHEN p.lang_pred = d.lang THEN 1 ELSE 0 END AS ok
       |  FROM preds p JOIN documents d ON d.doc_id = p.doc_id),
       |lvl AS (
       |  SELECT score, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(ok) AS BIGINT) AS nc
       |  FROM j GROUP BY 1),
       |pv AS (
       |  SELECT
       |$cells
       |  FROM lvl),
       |ns AS (SELECT *, CAST($nScored AS BIGINT) AS n_scored FROM pv)
       |SELECT n_1, ${accs(0)}, n_2, ${accs(1)}, n_3, ${accs(2)},
       |  n_4, ${accs(3)}, n_scored,
       |  round((${terms.mkString("\n    + ")}) / n_scored, 6) AS ece
       |FROM ns""".stripMargin
  }

  // ---- hashing-trick feature vectorizer --------------------------------------

  /** Hashed feature dimensions (tiny for auditability; production uses
    * 2¹⁸+ — the construction is dimension-count-agnostic). */
  val fhDims = 16

  /** Hashing-trick text vectorizer (Weinberger et al. ICML'09 — the
    * fixed-width featurization every vocabulary-free large-scale text
    * model front-ends with): each word hashes to a dimension, a second
    * independent hash gives it a ±1 sign (making the estimator unbiased
    * and collisions cancel in expectation), and the doc's vector is the
    * signed term-frequency sum per dimension. No vocabulary, no fitting,
    * no dictionary broadcast — the property that lets it run on a corpus
    * of ANY size in one pass. Exactness: the vector is all-BIGINT (signed
    * integer counts, no floats anywhere). Scale shape: ZERO-shuffle scan
    * projection — the per-word (dim, sign) pairs and the 16 dimension
    * folds are per-row higher-order-function column math (one MD5 pair
    * per word, then O(dims·words) integer adds), the tx_langid fusion
    * posture; downstream consumers (ann_* cosine, dedup banding) take the
    * vector without any re-join. */
  /** Library API: the hashed vector kept array-typed (`array<bigint>`) —
    * what in-engine consumers (ann_* cosine, dedup banding) compose over. */
  def featureHashVec(spark: SparkSession, sfDir: String): DataFrame = {
    val ds = transform(Portable.words(col("text")), w => struct(
      pmod(Portable.hash64(w, "fh"), lit(fhDims.toLong)).as("d"),
      when(pmod(Portable.hash64(w, "fhs"), lit(2L)) === 0L, 1L).otherwise(-1L).as("s")))
    val v = transform(sequence(lit(0), lit(fhDims - 1)), i =>
      aggregate(col("ds"), lit(0L), (acc, x) =>
        acc + when(x.getField("d") === i.cast("long"), x.getField("s")).otherwise(0L)))
    docs(spark, sfDir)
      .withColumn("ds", ds)
      .select(col("doc_id"), v.as("v"))
      .withColumn("nnz", size(filter(col("v"), x => x =!= 0L)).cast("long"))
  }

  /** Query output serializes the vector ('|'-joined) — the driver's pandas
    * compare cannot sort array cells (the mm_features posture); callers
    * wanting vectors use [[featureHashVec]]. */
  def featureHash(spark: SparkSession, sfDir: String): DataFrame =
    featureHashVec(spark, sfDir)
      .select(col("doc_id"),
        array_join(col("v").cast("array<string>"), "|").as("v"),
        col("nnz"))

  val featureHashSql: String = {
    def h(salt: String) = graft.functions.Portable.hash64Sql("w", salt)
    s"""WITH ws AS (
       |  SELECT doc_id, list_transform(${Portable.wordsSql},
       |    w -> struct_pack(
       |      d := ${h("fh")} % $fhDims,
       |      s := CASE WHEN ${h("fhs")} % 2 = 0 THEN 1 ELSE -1 END)) AS ds
       |  FROM documents),
       |vec AS (
       |  SELECT doc_id, list_transform(range(0, $fhDims), i ->
       |      CAST(coalesce(list_sum(list_transform(ds,
       |        x -> CASE WHEN x.d = i THEN x.s ELSE 0 END)), 0) AS BIGINT)) AS v
       |  FROM ws)
       |SELECT doc_id, array_to_string(v, '|') AS v,
       |  CAST(len(list_filter(v, x -> x <> 0)) AS BIGINT) AS nnz
       |FROM vec""".stripMargin
  }

  // ---- language-profile training ------------------------------------------

  val profileTopK = 4
  val profileMinDf = 3

  /** Trains the [[profiles]] dim from labeled documents — the in-engine
    * counterpart of `ann_kmeans` for the langid operator ("real deployments
    * load trained profiles as this same dim"): per (lang, word) document
    * frequency, scored by the share of the word's documents carrying the
    * label (`df_lang / df_all` — exact int-operand division, no logs), top-k
    * per language. Shapes: per-doc distinct words → two vocab-sized partial
    * aggs (Zipf-small at any corpus size) → per-lang window top-k. A
    * min-support floor keeps hapax noise out of the profile. */
  def profileTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val words = docs(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(Portable.words(col("text")))).as("word"))
    val dfAll = words.groupBy(col("word")).agg(count(lit(1)).as("df_all"))
    val dfLang = words.groupBy(col("lang"), col("word")).agg(count(lit(1)).as("df_lang"))
    val ranked = dfLang.join(dfAll, "word")
      .filter(col("df_lang") >= profileMinDf)
      .withColumn("score", round(col("df_lang").cast("double") / col("df_all"), 6))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("df_lang").desc, col("word").asc)
    ranked.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= profileTopK)
      .select(col("lang"), col("word"), col("df_lang"), col("df_all"),
        col("score"), col("rank"))
  }

  val profileTrainSql: String =
    s"""WITH wt AS (
       |  SELECT doc_id, lang, unnest(list_distinct(${Portable.wordsSql})) AS word
       |  FROM documents),
       |df_all AS (SELECT word, count(*) AS df_all FROM wt GROUP BY 1),
       |df_lang AS (SELECT lang, word, count(*) AS df_lang FROM wt GROUP BY 1, 2),
       |ranked AS (
       |  SELECT lang, df_lang.word, df_lang, df_all,
       |    round(CAST(df_lang AS DOUBLE) / df_all, 6) AS score
       |  FROM df_lang JOIN df_all ON df_lang.word = df_all.word
       |  WHERE df_lang >= $profileMinDf)
       |SELECT lang, word, df_lang, df_all, score, rank FROM (
       |  SELECT lang, word, df_lang, df_all, score,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY score DESC, df_lang DESC, word ASC) AS BIGINT) AS rank
       |  FROM ranked) t
       |WHERE rank <= $profileTopK""".stripMargin

  // ---- #30 quality scoring ------------------------------------------------

  val stopwords: Seq[String] = Seq("the", "a", "or", "and", "of")

  /** Quality metrics as a PROJECTION over any frame with a `text` column.
    * The gates are per-row column math, so composition carries them for
    * free — a quality "table" joined back on doc_id would spend a
    * full-corpus shuffle at 100 TB on values the scan already had in hand. */
  def withQualityCols(d: DataFrame): DataFrame = {
    val w = Portable.words(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val nW = size(w).cast("double")
    val alphaRatio = length(regexp_replace(lower(col("text")), "[^a-z]", ""))
      .cast("double") / length(col("text"))
    val stopRatio = size(filter(w, x => array_contains(stopArr, x))).cast("double") / nW
    val lenScore = least(nW / 200.0, lit(1.0))
    d.withColumn("n_words", size(w))
      .withColumn("alpha_ratio", round(alphaRatio, 6))
      .withColumn("stop_ratio", round(stopRatio, 6))
      .withColumn("quality",
        round(alphaRatio * 0.4 + stopRatio * 0.3 + lenScore * 0.3, 6))
  }

  def quality(spark: SparkSession, sfDir: String): DataFrame =
    withQualityCols(docs(spark, sfDir))
      .select(col("doc_id"), col("n_words"), col("alpha_ratio"),
        col("stop_ratio"), col("quality"))

  val qualitySql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, text, ${Portable.wordsSql} AS w FROM documents),
       |m AS (
       |  SELECT doc_id, len(w) AS n_words,
       |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
       |    CAST(len(list_filter(w, x -> list_contains([$stopList], x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stop_ratio,
       |    least(CAST(len(w) AS DOUBLE) / 200.0, 1.0) AS len_score
       |  FROM base)
       |SELECT doc_id, n_words, round(alpha_ratio, 6) AS alpha_ratio,
       |  round(stop_ratio, 6) AS stop_ratio,
       |  round(alpha_ratio * 0.4 + stop_ratio * 0.3 + len_score * 0.3, 6) AS quality
       |FROM m""".stripMargin
  }

  // ---- readability scoring -------------------------------------------------

  /** Flesch reading-ease + Flesch-Kincaid grade — the classic readability
    * prior corpus filters stack next to the Gopher/C4 gates. Heuristics,
    * documented exactly: syllables = vowel-group (`[aeiouy]+`) runs over
    * the lowercased text, floored at 1; sentences = `[.!?]+` runs, floored
    * at 1. Pure per-row column math (zero shuffle); both engines evaluate
    * the SAME literal arithmetic in the same operation order, so the
    * doubles agree bit-for-bit before the 4dp round. */
  def readability(spark: SparkSession, sfDir: String): DataFrame = {
    val base = docs(spark, sfDir)
      .select(col("doc_id"),
        size(Portable.words(col("text"))).cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
            .cast("long")).as("n_syllables"),
        greatest(lit(1L),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long")).as("n_sentences"))
      .filter(col("n_words") > 0)
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    base.select(col("doc_id"), col("n_words"), col("n_syllables"), col("n_sentences"),
      round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4).as("flesch"),
      round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4).as("fk_grade"))
  }

  val readabilitySql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(len(${Portable.wordsSql}) AS BIGINT) AS n_words,
       |    greatest(1, CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)) AS n_syllables,
       |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_words, n_syllables, n_sentences,
       |    CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) AS wps,
       |    CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE) AS spw
       |  FROM m WHERE n_words > 0)
       |SELECT doc_id, n_words, n_syllables, n_sentences,
       |  round(206.835 - 1.015 * wps - 84.6 * spw, 4) AS flesch,
       |  round(0.39 * wps + 11.8 * spw - 15.59, 4) AS fk_grade
       |FROM r""".stripMargin

  // ---- #31 token counting -------------------------------------------------

  val bpeRegex = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"),
      size(Portable.words(col("text"))).as("ws_tokens"),
      regexp_count(lower(col("text")), lit(bpeRegex)).as("bpe_est"))

  val tokensSql: String =
    s"""SELECT doc_id,
       |  len(${Portable.wordsSql}) AS ws_tokens,
       |  len(regexp_extract_all(lower(text), '$bpeRegex')) AS bpe_est
       |FROM documents""".stripMargin

  // ---- #32 winnowing fingerprint ------------------------------------------

  val winnowWindow = 4

  /** Classic winnowing as a distinct (doc_id, fingerprint) SET per
    * document: hash every positional word 3-gram, take the min of each
    * sliding window of 4 hashes, keep the distinct minima. Positional
    * explode + windowed min + distinct agg — the distinct aggregates under
    * the window's existing HashPartitioning(doc_id) (keys ⊇ partitioning),
    * so no extra exchange; both `tx_fingerprint` and `tx_winnow_pairs`
    * consume this frame. */
  def fingerprintSets(spark: SparkSession, sfDir: String): DataFrame = {
    val kgrams = docs(spark, sfDir)
      .select(col("doc_id"), posexplode(
        graft.plans.ShingleHashes(col("text"), 3, distinct = false, salt = "fp")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "h")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(0, winnowWindow - 1)
    kgrams.withColumn("fp", min(col("h")).over(w))
      .select(col("doc_id"), col("fp")).distinct()
  }

  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    fingerprintSets(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(count(col("fp")).as("n_fp"), min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))

  /** Shared CTE chain ending in `sets` = distinct (doc_id, fp) — the single
    * SQL source of the winnowing pipeline for both fingerprint queries. */
  private val fingerprintSetsCtes: String =
    s"""base AS (
       |  SELECT doc_id, ${Portable.wordsSql} AS w FROM documents),
       |kg AS (
       |  SELECT doc_id,
       |    unnest(range(1, len(w) - 1)) AS i
       |  FROM base WHERE len(w) >= 3),
       |hashed AS (
       |  SELECT kg.doc_id, kg.i,
       |    ${Portable.hash64Sql("w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]", "fp")} AS h
       |  FROM kg JOIN base ON kg.doc_id = base.doc_id),
       |fps AS (
       |  SELECT doc_id,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND ${winnowWindow - 1} FOLLOWING) AS fp
       |  FROM hashed),
       |sets AS (SELECT DISTINCT doc_id, fp FROM fps)""".stripMargin

  val fingerprintSql: String =
    s"""WITH $fingerprintSetsCtes
       |SELECT doc_id, count(fp) AS n_fp, min(fp) AS min_fp, max(fp) AS max_fp
       |FROM sets GROUP BY 1""".stripMargin

  // ---- fingerprint-overlap near-dup (the MOSS report) ---------------------

  val winnowMaxDf = 50
  val winnowMinShared = 3

  /** Document pairs sharing ≥ `winnowMinShared` winnowing fingerprints —
    * MOSS-style containment/plagiarism detection. Same df-capped
    * inverted-index shape as dd_ngram_jacc, but over the winnowing SAMPLE of
    * the gram stream (~2/(w+1) of positions survive the window-min), so the
    * index this op ships to the shuffle is ~3× smaller than the full
    * shingle index at identical corpus size — the cheap first near-dup
    * screen at 100 TB. The df cap bounds hot-fingerprint pair blowup to
    * O(cap²) per fingerprint; every shuffle in the plan moves only the
    * winnowed index, never the gram stream. */
  def winnowPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sets = fingerprintSets(spark, sfDir)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("df").between(2, winnowMaxDf))
      .persist() // both self-join sides
    sets.as("a").join(sets.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= winnowMinShared)
  }

  val winnowPairsSql: String =
    s"""WITH $fingerprintSetsCtes,
       |fdf AS (SELECT fp, count(*) AS df FROM sets GROUP BY 1),
       |inf AS (
       |  SELECT sets.doc_id, sets.fp FROM sets JOIN fdf ON sets.fp = fdf.fp
       |  WHERE fdf.df BETWEEN 2 AND $winnowMaxDf)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |FROM inf a JOIN inf b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $winnowMinShared""".stripMargin

  // ---- corpus-level top-k n-grams -----------------------------------------

  val topNgrams = 20

  /** Global top-k word-3-grams by document frequency (per-doc distinct
    * shingles, so a gram spamming one doc doesn't dominate) — the
    * vocabulary/contamination report every corpus build runs. Partial-agg
    * counts then `TakeOrderedAndProject` partial top-k: no global sort at
    * any scale. Deterministic total order via (df desc, gram asc). */
  def topKNgrams(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(explode(graft.plans.ShingleStrings(col("text"), 3, distinct = true)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("gram").asc)
      .limit(topNgrams)

  val topKNgramsSql: String =
    s"""WITH w AS (SELECT doc_id, ${Portable.wordsSql} AS w FROM documents),
       |shd AS (SELECT doc_id, ${Portable.shinglesSql()} AS sh FROM w)
       |SELECT sh AS gram, count(*) AS df
       |FROM (SELECT doc_id, unnest(sh) AS sh FROM shd)
       |GROUP BY 1 ORDER BY df DESC, gram ASC LIMIT $topNgrams""".stripMargin

  // ---- retention filter (the C4-style keep/drop pass) ---------------------

  /** The composed corpus filter every web-scale dataset build runs: language
    * agreement, quality floor, length floor — first failing gate recorded as
    * the drop verdict. Pure composition of the langid/quality operators (one
    * broadcast profile join + column math); at scale this is the map-side
    * pass that decides what the expensive downstream (dedup, embedding)
    * ever sees. */
  def filterPass(spark: SparkSession, sfDir: String): DataFrame =
    filterPassCarrying(spark, sfDir, Nil)

  /** The retention pass with extra document columns carried through
    * (e.g. `source` for mixture planning) — carrying beats re-joining the
    * verdict table back to `documents` on doc_id, which is a second
    * full-corpus shuffle for columns the gate scan already read. Quality
    * gates ride the scan as a projection; only langid (a genuine per-doc
    * aggregation) costs a join. */
  def filterPassCarrying(spark: SparkSession, sfDir: String,
      carry: Seq[String]): DataFrame = {
    val (pred, score) = langIdCols(col("text"))
    withQualityCols(docs(spark, sfDir))
      // fused langid rides the same scan (score 0 ⇒ null, the generic
      // path's left-join miss) — the verdict table needs no join at all
      .withColumn("lang_pred", when(score > 0, pred))
      .select(Seq(col("doc_id"), col("lang"), col("lang_pred"),
        col("n_words"), col("quality")) ++ carry.map(col) :+
        when(col("lang_pred").isNull || col("lang_pred") =!= col("lang"), "lang")
          .when(col("quality") < 0.5, "quality")
          .when(col("n_words") < 20, "short")
          .otherwise("keep").as("verdict"): _*)
  }

  val filterPassSql: String =
    s"""SELECT d.doc_id, d.lang, l.lang_pred, q.n_words, q.quality,
       |  CASE WHEN l.lang_pred IS NULL OR l.lang_pred <> d.lang THEN 'lang'
       |       WHEN q.quality < 0.5 THEN 'quality'
       |       WHEN q.n_words < 20 THEN 'short'
       |       ELSE 'keep' END AS verdict
       |FROM documents d
       |JOIN ($qualitySql) q ON q.doc_id = d.doc_id
       |LEFT JOIN ($langIdSql) l ON l.doc_id = d.doc_id""".stripMargin

  // ---- LM quality gate (CCNet-style, corpus-trained bigram model) ---------

  /** Smoothed bigram-LM document scoring — the CCNet/KenLM quality gate
    * reshaped for engine parity: per-doc score = avg over bigrams of the
    * Laplace-smoothed conditional likelihood `(c(w1 w2)+1)/(c(w1)+V)`.
    * RATIONAL likelihoods instead of log-probs on purpose: `ln` is libm-
    * dependent (Spark JVM vs oracle's libm can differ in the last ulp), a
    * sum of exact-operand divisions is not. The "LM" is trained on the
    * corpus itself (the dim tables are aggregations); production swaps in
    * externally trained count tables through the same joins. Shapes: two
    * count aggregations + one shuffle join on the bigram key — the count
    * dims are Zipf-small relative to the corpus at any scale. */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val grams = d.select(col("doc_id"),
      explode(graft.plans.ShingleStrings(col("text"), 2, distinct = false)).as("gram"))
    val uni = d.select(explode(Portable.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val bi = grams.groupBy(col("gram")).agg(count(lit(1)).as("c2"))
    val v = uni.agg(count(lit(1)).as("vocab"))
    grams
      .join(bi, "gram")
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .join(uni, col("w1") === col("w"))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg((col("c2") + 1.0) / (col("c1") + col("vocab"))), 6).as("lm_score"))
  }

  val lmScoreSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, ${Portable.wordsSql} AS w FROM documents),
       |grams AS (
       |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
       |  FROM base, LATERAL unnest(range(1, greatest(len(w) - 1, 0) + 1)) t(i)),
       |uni AS (
       |  SELECT word AS w, count(*) AS c1
       |  FROM (SELECT unnest(w) AS word FROM base) GROUP BY 1),
       |bi AS (SELECT gram, count(*) AS c2 FROM grams GROUP BY 1),
       |v AS (SELECT count(*) AS vocab FROM uni)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  round(avg((c2 + 1.0) / (c1 + vocab)), 6) AS lm_score
       |FROM grams
       |JOIN bi USING (gram)
       |JOIN uni ON string_split(gram, ' ')[1] = uni.w
       |CROSS JOIN v
       |GROUP BY doc_id""".stripMargin

  // ---- CCNet perplexity bucketing (head/middle/tail) ----------------------

  /** CCNet's defining output shape (Wenzek et al. 2020): per-language
    * head/middle/tail buckets by LM quality — head feeds pre-training
    * directly, middle is kept for diversity, tail is dropped or re-filtered.
    * Cutoff-based on purpose: CCNet derives PERCENTILE CUTOFFS from the
    * score distribution and assigns by comparison, which is also the only
    * shape that scales — an exact per-language ntile needs a per-language
    * TOTAL SORT of the corpus, while cutoffs are one aggregation (exact
    * `percentile` here; `approx_percentile` is the 100 TB drop-in, the
    * ev_quantiles trade) broadcast back over a second scan. Higher
    * likelihood = better modeled = head. Cutoffs and scores are both
    * 6dp-rounded before comparison so the bucket verdict can never flip on
    * a last-ulp interpolation difference between engines. */
  def ccnetBucket(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = lmScore(spark, sfDir).select(col("doc_id"), col("lm_score"))
      .join(docs(spark, sfDir).select(col("doc_id"), col("lang")), Seq("doc_id"))
    val cuts = scored.groupBy(col("lang")).agg(
      round(expr("percentile(lm_score, CAST(1 AS DOUBLE)/3)"), 6).as("cut33"),
      round(expr("percentile(lm_score, CAST(2 AS DOUBLE)/3)"), 6).as("cut66"))
    scored.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("lm_score") > col("cut66"), "head")
          .when(col("lm_score") > col("cut33"), "middle")
          .otherwise("tail").as("bucket"))
  }

  val ccnetBucketSql: String =
    s"""WITH lm AS (${lmScoreSql.replace("\n", "\n  ")}),
       |scored AS (
       |  SELECT lm.doc_id, d.lang, lm.lm_score
       |  FROM lm JOIN documents d ON lm.doc_id = d.doc_id),
       |cuts AS (
       |  SELECT lang,
       |    round(quantile_cont(lm_score, CAST(1 AS DOUBLE)/3), 6) AS cut33,
       |    round(quantile_cont(lm_score, CAST(2 AS DOUBLE)/3), 6) AS cut66
       |  FROM scored GROUP BY lang)
       |SELECT doc_id, scored.lang, lm_score,
       |  CASE WHEN lm_score > cut66 THEN 'head'
       |       WHEN lm_score > cut33 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM scored JOIN cuts ON scored.lang = cuts.lang""".stripMargin

  // ---- collocation mining (phrase detection) ------------------------------

  val collocMinCount = 10L
  val collocTopK = 30

  /** PMI-style collocation mining — the phrase-detection pass (the
    * word2vec phrase pass) that decides which adjacent word pairs become
    * single tokens before tokenizer/vocab training. The score is the
    * RATIONAL PMI core (c12·N)/(c1·c2): exact-integer operands, no libm
    * log (the tx_lm_score parity trick — both engines divide the same two
    * exactly-representable doubles). Shapes: the same two Zipf-small count
    * dims as the bigram LM, joins keyed on the gram's words, top-k via
    * TakeOrderedAndProject — no global sort, and the corpus-sized gram
    * stream collapses into the count dims before any join. */
  def colloc(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val grams = d.select(
      explode(graft.plans.ShingleStrings(col("text"), 2, distinct = false)).as("gram"))
    // ONE corpus-wide gram aggregation serves both the pair counts and the
    // total (n_bi = Σc12): a separate grams.count() would re-run the
    // bigram explode over the whole corpus for a single number
    val gramCounts = grams.groupBy(col("gram")).agg(count(lit(1)).as("c12"))
    val bi = gramCounts.filter(col("c12") >= collocMinCount)
    val uni = d.select(explode(Portable.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val n = gramCounts.agg(sum(col("c12")).as("n_bi"))
    bi
      .withColumn("w1", split(col("gram"), " ").getItem(0))
      .withColumn("w2", split(col("gram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c1").as("ca")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").as("cb")), "w2")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("c12").cast("double") * col("n_bi") /
        (col("ca").cast("double") * col("cb")), 6))
      .orderBy(col("score").desc, col("gram").asc)
      .limit(collocTopK)
      .select(col("gram"), col("c12"), col("ca"), col("cb"), col("score"))
  }

  val collocSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, ${Portable.wordsSql} AS w FROM documents),
       |grams AS (
       |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
       |  FROM base, LATERAL unnest(range(1, greatest(len(w) - 1, 0) + 1)) t(i)),
       |cnt AS (SELECT gram, count(*) AS c12 FROM grams GROUP BY 1),
       |bi AS (SELECT * FROM cnt WHERE c12 >= $collocMinCount),
       |uni AS (
       |  SELECT word AS w, count(*) AS c1
       |  FROM (SELECT unnest(w) AS word FROM base) GROUP BY 1),
       |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bi FROM cnt)
       |SELECT gram, c12, ua.c1 AS ca, ub.c1 AS cb,
       |  round(CAST(c12 AS DOUBLE) * n_bi / (CAST(ua.c1 AS DOUBLE) * ub.c1), 6) AS score
       |FROM bi
       |JOIN uni ua ON string_split(gram, ' ')[1] = ua.w
       |JOIN uni ub ON string_split(gram, ' ')[2] = ub.w
       |CROSS JOIN n
       |ORDER BY score DESC, gram ASC LIMIT $collocTopK""".stripMargin

  // ---- repetition metrics (the Gopher repetition filters) -----------------

  /** Per-document repetition metrics — the Gopher/MassiveText repetition
    * filters (Rae et al. 2021 §A1.1): duplicate-word fraction, duplicate
    * 3-gram fraction, and the fraction of characters covered by the single
    * most frequent word 2-gram. ZERO shuffles: the gram lists are per-row
    * `ShingleStrings` output, the dup fractions are size-vs-distinct-size
    * column math, and the mode 2-gram is a sort + run-length fold over the
    * row's own gram array (O(g log g) per doc, map-side) instead of an
    * explode + groupBy over the corpus token stream. At 100 TB this pass is
    * a pure scan. */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val w = Portable.words(col("text"))
    val g2 = graft.plans.ShingleStrings(col("text"), 2, distinct = false)
    val g3 = graft.plans.ShingleStrings(col("text"), 3, distinct = false)
    val nW = size(w)
    val n3 = size(g3)
    // run-length fold over the sorted 2-gram list: (prev, run, best, bestg);
    // strict > keeps the FIRST gram of a tied run — i.e. the
    // lexicographically smallest, matching the oracle's (cnt DESC, gram ASC)
    val acc0 = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"), lit("").as("bestg"))
    val folded = aggregate(array_sort(g2), acc0, (acc, x) => {
      val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"),
        when(run > acc.getField("best"), run).otherwise(acc.getField("best")).as("best"),
        when(run > acc.getField("best"), x).otherwise(acc.getField("bestg")).as("bestg"))
    })
    d.select(col("doc_id"), nW.as("n_words"),
        round(when(nW > 0, (nW - size(array_distinct(w))).cast("double") / nW)
          .otherwise(0.0), 6).as("dup_word_frac"),
        round(when(n3 > 0, (n3 - size(array_distinct(g3)))
          .cast("double") / n3).otherwise(0.0), 6).as("dup3_frac"),
        folded.getField("best").as("top2_cnt"),
        folded.getField("bestg").as("top2_gram"),
        col("n_chars"))
      .select(col("doc_id"), col("n_words"), col("dup_word_frac"), col("dup3_frac"),
        col("top2_cnt"), col("top2_gram"),
        // capped at 1: overlapping occurrences of a self-repeating gram
        // ("a a a a") would otherwise claim more characters than exist
        round(least((col("top2_cnt") * length(col("top2_gram"))).cast("double")
          / col("n_chars"), lit(1.0)), 6).as("top2_frac"))
  }

  val repetitionSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, n_chars, ${Portable.wordsSql} AS w FROM documents),
       |g2 AS (
       |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
       |  FROM base, LATERAL unnest(range(1, greatest(len(w) - 1, 0) + 1)) t(i)),
       |md AS (
       |  SELECT doc_id, gram, cnt FROM (
       |    SELECT doc_id, gram, count(*) AS cnt,
       |      row_number() OVER (PARTITION BY doc_id
       |        ORDER BY count(*) DESC, gram ASC) AS rn
       |    FROM g2 GROUP BY doc_id, gram) t
       |  WHERE rn = 1),
       |g3 AS (
       |  SELECT doc_id,
       |    greatest(len(w) - 2, 0) AS n3,
       |    len(list_distinct(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
       |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS n3d
       |  FROM base)
       |SELECT b.doc_id, len(w) AS n_words,
       |  round(CASE WHEN len(w) > 0
       |    THEN CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w)
       |    ELSE 0.0 END, 6) AS dup_word_frac,
       |  round(CASE WHEN g3.n3 > 0
       |    THEN CAST(g3.n3 - g3.n3d AS DOUBLE) / g3.n3 ELSE 0.0 END, 6) AS dup3_frac,
       |  coalesce(md.cnt, 0) AS top2_cnt,
       |  coalesce(md.gram, '') AS top2_gram,
       |  round(least(CAST(coalesce(md.cnt, 0) * length(coalesce(md.gram, '')) AS DOUBLE)
       |    / b.n_chars, CAST(1.0 AS DOUBLE)), 6) AS top2_frac
       |FROM base b
       |JOIN g3 ON g3.doc_id = b.doc_id
       |LEFT JOIN md ON md.doc_id = b.doc_id""".stripMargin

  // ---- Gopher quality gate ------------------------------------------------

  /** The Gopher/MassiveText rule-based quality gate (Rae et al. 2021 §A1.1),
    * first-failing-gate verdict: word-count bounds, mean word length in
    * [3, 10], ≥80% alphabetic words, ≥2 distinct stop words present. Word
    * bounds scaled to the synthetic corpus (20 vs Gopher's 50 floor); the
    * thresholds are the published ones otherwise. Pure per-row column math —
    * all exact int/int divisions, zero shuffles, whole-stage codegen. */
  def gopher(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val w = Portable.words(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val nW = size(w)
    val meanLen = when(nW > 0,
      aggregate(w, lit(0L), (a, x) => a + length(x)).cast("double") / nW).otherwise(0.0)
    val fracAlpha = when(nW > 0,
      size(filter(w, x => x.rlike("^[a-z]+$"))).cast("double") / nW).otherwise(0.0)
    val stopHits = size(filter(stopArr, s => array_contains(w, s)))
    d.select(col("doc_id"), nW.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(fracAlpha, 6).as("frac_alpha_words"),
      stopHits.as("n_stop_hits"),
      when(nW < 20, "too_short")
        .when(nW > 100000, "too_long")
        .when(meanLen < 3.0 || meanLen > 10.0, "word_len")
        .when(fracAlpha < 0.8, "alpha")
        .when(stopHits < 2, "low_stop")
        .otherwise("keep").as("verdict"))
  }

  val gopherSql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, ${Portable.wordsSql} AS w FROM documents),
       |m AS (
       |  SELECT doc_id, len(w) AS n_words,
       |    CASE WHEN len(w) > 0
       |      THEN CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w)
       |      ELSE 0.0 END AS mean_word_len,
       |    CASE WHEN len(w) > 0
       |      THEN CAST(len(list_filter(w, x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE)
       |        / len(w)
       |      ELSE 0.0 END AS frac_alpha_words,
       |    len(list_filter([$stopList], s -> list_contains(w, s))) AS n_stop_hits
       |  FROM base)
       |SELECT doc_id, n_words,
       |  round(mean_word_len, 6) AS mean_word_len,
       |  round(frac_alpha_words, 6) AS frac_alpha_words,
       |  n_stop_hits,
       |  CASE WHEN n_words < 20 THEN 'too_short'
       |       WHEN n_words > 100000 THEN 'too_long'
       |       WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_len'
       |       WHEN frac_alpha_words < 0.8 THEN 'alpha'
       |       WHEN n_stop_hits < 2 THEN 'low_stop'
       |       ELSE 'keep' END AS verdict
       |FROM m""".stripMargin
  }

  // ---- sequence packing (training-batch assembly) -------------------------

  /** Token budget per packed training sequence (scaled to the synthetic
    * docs; production uses the model context length). */
  val packBudget = 256

  /** Sequence packing: concatenate documents in id order and cut every
    * `packBudget` tokens — each doc lands in the bin where it starts (the
    * concat-and-chunk packing every pre-training run performs). Packing is
    * PER SOURCE, not global: a global ordered cumsum is a single-partition
    * bottleneck, while per-shard packing (what real pipelines do — each
    * writer packs its own shard) keeps every partition independent. One
    * shuffle on source; the cumsum is a within-partition running sum. */
  /** Packing with a pluggable token accounting: `tokCol` is the per-doc
    * token count the bins budget against — whitespace words for the
    * SQL-oracled tx_pack row, [[Bpe.tokenCount]] for real BPE budgets
    * (packWithBpe; parity-spec'd, not SQL-expressible). */
  def packWith(spark: SparkSession, sfDir: String, tokCol: Column): DataFrame = {
    val d = docs(spark, sfDir).select(col("doc_id"), col("source"),
      tokCol.cast("long").as("tok"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("tok")).over(w))
      .groupBy(col("source"), expr(s"(cum - tok) DIV $packBudget").as("bin"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc_id"),
        sum(col("tok")).as("total_tokens"))
  }

  def pack(spark: SparkSession, sfDir: String): DataFrame =
    packWith(spark, sfDir, size(Portable.words(col("text"))))

  /** tx_pack with REAL tokenization: bins budget against BPE token counts
    * ([[Bpe.tokenCount]], merge-rank tokenization) instead of the
    * whitespace-word approximation. Same plan shape — the fused count
    * expression evaluates inside the scan projection, so the only extra
    * cost is the (cached) merge loop itself. */
  def packWithBpe(spark: SparkSession, sfDir: String): DataFrame =
    packWith(spark, sfDir, Bpe.tokenCount(col("text")))

  val packSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, CAST(len(${Portable.wordsSql}) AS BIGINT) AS tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, tok,
       |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d)
       |SELECT source, CAST((cum - tok) // $packBudget AS BIGINT) AS bin,
       |  count(*) AS n_docs, min(doc_id) AS first_doc_id,
       |  CAST(sum(tok) AS BIGINT) AS total_tokens
       |FROM c GROUP BY 1, 2""".stripMargin

  // ---- vocabulary coverage (OOV audit) -------------------------------------

  /** Vocabulary-coverage audit — the dial an operator reads BEFORE
    * committing a tokenizer at corpus scale: per document, how many
    * whitespace words the WordPiece vocab cannot tokenize at all (the
    * whole-word `[UNK]` fallback — each such word is a token the model
    * literally cannot see). The engine counts REAL `[UNK]` emissions from
    * the [[WordPiece]] greedy matcher; the oracle independently derives
    * the same verdict from the fixture vocab's closure property (every
    * `[a-z0-9]` single is a piece, so exactly the words with any other
    * character fall back) — two derivations agreeing is the check.
    * Case-sensitive split (the tokenizer's own), NOT the lowercased
    * [[Portable.words]]. Scale shape: ZERO-shuffle scan projection — one
    * fused tokenizer expression per row, counts and the rate are per-row
    * column math (the tx_langid fusion posture). */
  def oov(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = filter(split(col("text"), "\\s+"), w => length(w) > 0)
    docs(spark, sfDir)
      .select(col("doc_id"),
        size(ws).cast("long").as("n_words"),
        size(filter(WordPiece.tokens(col("text")), t => t === WordPiece.Unk))
          .cast("long").as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_words") > 0,
          round(col("n_oov").cast("double") / col("n_words"), 6)))
  }

  val oovSql: String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS ws
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_words,
       |  CAST(len(list_filter(ws, x -> NOT regexp_matches(x, '^[a-z0-9]+$$')))
       |    AS BIGINT) AS n_oov,
       |  CASE WHEN len(ws) > 0 THEN
       |    round(CAST(len(list_filter(ws, x -> NOT regexp_matches(x, '^[a-z0-9]+$$')))
       |      AS DOUBLE) / len(ws), 6) END AS oov_rate
       |FROM w""".stripMargin

  // ---- corpus length statistics -------------------------------------------

  /** Log2-bucketed document-length histogram — the corpus-shape report every
    * pipeline runs before setting filter thresholds. One partial-agg pass. */
  def lenHist(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select((floor(log2(greatest(col("n_chars"), lit(1)))).cast("long")).as("log2_len"))
      .groupBy(col("log2_len"))
      .agg(count(lit(1)).as("n_docs"))

  val lenHistSql: String =
    """SELECT CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS log2_len,
      |  count(*) AS n_docs
      |FROM documents GROUP BY 1""".stripMargin

  // ---- PII scrub (the pre-training redaction pass) ------------------------

  /** PII detection + redaction — the scrub every corpus runs before
    * training: find email addresses and dotted-quad IPs in free text,
    * count them, and replace with placeholder tokens. Patterns are
    * RE2-safe (no lookaround/backtracking) so Spark's Java regex and the
    * oracle's RE2 agree; both `regexp_replace`s are global. The text under
    * scrub is the signup contact blob (the synthetic corpus has no embedded
    * PII; signups carry the real shapes). Pure codegen'd column ops. */
  def pii(spark: SparkSession, sfDir: String): DataFrame = {
    val s = graft.events.Signups.derive(spark, sfDir)
    val blob = concat_ws(" ", lit("user"), col("username"), lit("wrote: contact"),
      col("email"), lit("or visit"), col("ip"))
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    s.select(col("event_id"),
      regexp_count(blob, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(blob, lit(ipRe)).cast("long").as("n_ips"),
      regexp_replace(regexp_replace(blob, lit(emailRe), lit("<EMAIL>")),
        lit(ipRe), lit("<IP>")).as("redacted"))
  }

  val piiSql: String = {
    val blob = "'user ' || username || ' wrote: contact ' || email || ' or visit ' || ip"
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    graft.events.Signups.sqlCte +
      s"""SELECT event_id,
         |  CAST(len(regexp_extract_all($blob, '$emailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all($blob, '$ipRe')) AS BIGINT) AS n_ips,
         |  regexp_replace(regexp_replace($blob, '$emailRe', '<EMAIL>', 'g'),
         |    '$ipRe', '<IP>', 'g') AS redacted
         |FROM signups""".stripMargin
  }

  // ---- TF-IDF keyword retrieval -------------------------------------------

  /** Demo query terms; production passes any term list — the plan shape is
    * term-count-independent (one column per term, still zero shuffles). */
  val searchTerms: Seq[String] = Seq("spark", "window", "vector")

  /** TF-IDF keyword retrieval: top-k documents for a small term set.
    * Scale shape: term frequencies are per-row `regexp_count` columns (ZERO
    * shuffle — no corpus token explode, no inverted index build for an
    * ad-hoc query); corpus stats collapse to ONE row (N + per-term df)
    * broadcast back; the score is a FIXED-ORDER fold of tf_i · (N/df_i)
    * (exact-int operands each step, so both engines fold identical doubles);
    * top-k is TakeOrderedAndProject with a doc_id tie-break — no global
    * sort. idf uses the raw rational N/df rather than log(N/df): order-
    * preserving for single-term queries, libm-free, and exactly portable —
    * the log variant needs only a `log()` wrap at ranking time. */
  /** Term → literal-safe regex: backslash-escape every non-alphanumeric.
    * (Not `Pattern.quote` — its \Q..\E envelope is Java-only, and the
    * oracle's RE2 would treat it literally.) Keeps "c++"-style terms from
    * being regex syntax on either engine. */
  private def reEscape(t: String): String =
    t.replaceAll("([^A-Za-z0-9])", "\\\\$1")

  def search(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val tf = d.select(
      col("doc_id") +: searchTerms.indices.map(i =>
        regexp_count(col("text"), lit("\\b" + reEscape(searchTerms(i)) + "\\b"))
          .cast("long").as(s"tf$i")): _*)
    val stats = tf.agg(
      count(lit(1)).as("n_docs"),
      searchTerms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
    val score = searchTerms.indices.map(i =>
        col(s"tf$i") * (col("n_docs") / greatest(col(s"df$i"), lit(1L))))
      .reduce(_ + _)
    tf.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
  }

  val searchSql: String = {
    // regex-escaped AND SQL-quote-doubled: a term is user input twice over
    val tfCols = searchTerms.indices.map { i =>
      val t = reEscape(searchTerms(i)).replace("'", "''")
      s"len(regexp_extract_all(text, '\\b$t\\b')) AS tf$i"
    }.mkString(",\n    ")
    val dfCols = searchTerms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i").mkString(",\n    ")
    val score = searchTerms.indices.map(i =>
      s"tf$i * (n_docs / greatest(df$i, 1))").mkString(" + ")
    s"""WITH tf AS (
       |  SELECT doc_id,
       |    $tfCols
       |  FROM documents),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |    $dfCols
       |  FROM tf)
       |SELECT doc_id, round($score, 6) AS score
       |FROM tf CROSS JOIN stats
       |WHERE round($score, 6) > 0
       |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin
  }

  // ---- encoding sanity (mojibake filter) ------------------------------------

  /** Dirty fixture rows unioned under negative ids: the corpus is clean
    * ASCII, so the detector's failure branches need these to be exercised
    * (U+FFFD replacement chars from a bad transcode, control-character
    * soup from binary-as-text, a clean multilingual row that must PASS). */
  val charsetDirty: Seq[(Long, String)] = Seq(
    (-1L, "broken transcode �� here and � there"),
    (-2L, "binary\u0001soup\u0007with\u0013controls"),
    (-3L, "clean multilingual café 日本語 text"))

  /** Encoding-sanity filter — the mojibake gate every web-text pipeline
    * runs before tokenization (bad transcodes surface as U+FFFD
    * replacement characters; binary-as-text surfaces as C0 control
    * characters; both poison tokenizers and dedup): per doc, the
    * replacement-char count, control-char count (tab/newline exempt), and
    * their combined ratio, gated at 1%. Pure per-row column math (regex
    * counts + one exact-int-operand division), ZERO shuffles at any corpus
    * size; a clean non-ASCII row passes — the gate measures BREAKAGE, not
    * foreignness (the C4 trap of equating non-ASCII with noise). */
  def charset(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, sfDir).select(col("doc_id"), col("text"))
      .unionAll(charsetDirty.toDF("doc_id", "text"))
    base.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        regexp_count(col("text"), lit("�")).cast("long").as("n_repl"),
        regexp_count(col("text"), lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"))
          .cast("long").as("n_ctrl"))
      .withColumn("bad_ratio",
        round((col("n_repl") + col("n_ctrl")).cast("double")
          / greatest(col("n_chars"), lit(1L)), 6))
      .withColumn("verdict",
        when(col("bad_ratio") <= 0.01, "keep").otherwise("drop"))
  }

  val charsetSql: String = {
    // control chars spelled via chr() — a raw \x01 inside a SQL literal
    // would have to survive JSON + parser round-trips on the driver side
    val dirtyRows =
      "(-1, 'broken transcode ' || chr(65533) || chr(65533) || ' here and ' || chr(65533) || ' there'), " +
        "(-2, 'binary' || chr(1) || 'soup' || chr(7) || 'with' || chr(19) || 'controls'), " +
        "(-3, 'clean multilingual caf' || chr(233) || ' ' || chr(26085) || chr(26412) || chr(35486) || ' text')"
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT * FROM (VALUES $dirtyRows) d(doc_id, text)),
       |m AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(length(text) - length(regexp_replace(text, '\\x{fffd}', '', 'g'))
       |      AS BIGINT) AS n_repl,
       |    CAST(length(text) - length(regexp_replace(text,
       |      '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS BIGINT) AS n_ctrl
       |  FROM base)
       |SELECT doc_id, n_chars, n_repl, n_ctrl,
       |  round(CAST(n_repl + n_ctrl AS DOUBLE) / greatest(n_chars, 1), 6)
       |    AS bad_ratio,
       |  CASE WHEN round(CAST(n_repl + n_ctrl AS DOUBLE) / greatest(n_chars, 1), 6)
       |    <= 0.01 THEN 'keep' ELSE 'drop' END AS verdict
       |FROM m""".stripMargin
  }

  // ---- dictionary entity tagging (gazetteer) -------------------------------

  /** Gazetteer: phrase → entity type. Multi-word entries are what make
    * dictionary tagging non-trivial (longest match must win over its
    * constituent words). A production gazetteer is 10⁴-10⁶ entries —
    * swap the literal arrays for a broadcast dim join on the same token
    * stream; the plan shape below doesn't change. */
  val gazetteerDict: Seq[(String, String)] = Seq(
    "table scan" -> "ACCESS_PATH", "hash join" -> "JOIN_ALGO",
    "sort merge" -> "JOIN_ALGO", "batch stream" -> "RUNTIME",
    "spark" -> "ENGINE", "join" -> "OPERATOR", "merge" -> "OPERATOR",
    "scan" -> "OPERATOR", "window" -> "OPERATOR", "filter" -> "OPERATOR",
    "customer" -> "ENTITY", "vector" -> "TYPE")

  /** Dictionary-based entity tagging — the gazetteer/PII-list pass every
    * curation pipeline runs (Aho-Corasick at scale): emit every MAXIMAL
    * dictionary match with per-doc count and first position. Semantics:
    * all bigram occurrences match; a unigram occurrence matches unless it
    * is a constituent of SOME bigram occurrence (starts one, or the word
    * before it starts one) — deterministic, order-free, and exactly
    * replayable relationally. The plan is the token-index shape: per-row
    * array math builds (word, next, prev-pair) WITHOUT any window (the
    * neighbors come from the un-exploded array), the literal dict fuses to
    * `array_contains` scan math (the tx_langid fusion pattern — zero
    * joins), and ONE aggregation on (doc, phrase) with map-side partials
    * collapses the token stream. */
  def gazetteer(spark: SparkSession, sfDir: String): DataFrame = {
    val bigrams = gazetteerDict.filter(_._1.contains(' ')).map(_._1)
    val unigrams = gazetteerDict.filterNot(_._1.contains(' ')).map(_._1)
    val bgArr = array(bigrams.map(lit): _*)
    val uniArr = array(unigrams.map(lit): _*)
    val etype = gazetteerDict.tail.foldLeft(
      when(col("phrase") === gazetteerDict.head._1, gazetteerDict.head._2)) {
      case (acc, (p, t)) => acc.when(col("phrase") === p, t)
    }
    docs(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"), posexplode(col("ws")))
      .withColumnRenamed("pos", "pos0").withColumnRenamed("col", "w")
      // neighbors from the carried array — no per-doc window needed
      .withColumn("p2",
        concat(col("w"), lit(" "), try_element_at(col("ws"), col("pos0") + 2)))
      .withColumn("pprev",
        when(col("pos0") >= 1,
          concat(element_at(col("ws"), col("pos0")), lit(" "), col("w"))))
      .withColumn("m2", coalesce(array_contains(bgArr, col("p2")), lit(false)))
      .withColumn("covered", coalesce(array_contains(bgArr, col("pprev")), lit(false)))
      .filter(col("m2") ||
        (array_contains(uniArr, col("w")) && !col("m2") && !col("covered")))
      .select(col("doc_id"),
        when(col("m2"), col("p2")).otherwise(col("w")).as("phrase"),
        col("pos0").cast("long").as("pos"))
      .withColumn("etype", etype)
      .groupBy(col("doc_id"), col("phrase"), col("etype"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("first_pos"))
  }

  val gazetteerSql: String = {
    val bgIn = gazetteerDict.filter(_._1.contains(' '))
      .map(p => s"'${p._1}'").mkString(", ")
    val uniIn = gazetteerDict.filterNot(_._1.contains(' '))
      .map(p => s"'${p._1}'").mkString(", ")
    val typeCase = gazetteerDict
      .map { case (p, t) => s"WHEN '$p' THEN '$t'" }.mkString(" ")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |tok AS (
       |  SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS pos, ws[t.i] AS w,
       |    ws[t.i] || ' ' || ws[t.i+1] AS p2,
       |    CASE WHEN t.i > 1 THEN ws[t.i-1] || ' ' || ws[t.i] END AS pprev
       |  FROM w, unnest(range(1, len(ws)+1)) AS t(i)),
       |m AS (
       |  SELECT doc_id, pos, w, p2,
       |    coalesce(p2 IN ($bgIn), false) AS m2,
       |    coalesce(pprev IN ($bgIn), false) AS covered
       |  FROM tok),
       |sel AS (
       |  SELECT doc_id, CASE WHEN m2 THEN p2 ELSE w END AS phrase, pos
       |  FROM m
       |  WHERE m2 OR (w IN ($uniIn) AND NOT m2 AND NOT covered))
       |SELECT doc_id, phrase, CASE phrase $typeCase END AS etype,
       |  count(*) AS n, min(pos) AS first_pos
       |FROM sel GROUP BY 1, 2, 3""".stripMargin
  }

  // ---- per-document TF-IDF keyword extraction ------------------------------

  val keywordsK = 3

  /** Per-document top-k keyword EXTRACTION — the inverse direction of
    * tx_search's query→docs retrieval: tag EVERY document with its most
    * distinctive terms (the metadata pass a pretraining pipeline runs to
    * build topic facets / dedup features). Scale shape: ONE doc_id exchange
    * serves the (doc, term) tf aggregation AND the per-doc top-k window
    * (HashPartitioning(doc_id) satisfies both — the token explode never
    * re-shuffles); df derives FROM the tf frame (the token stream is
    * scanned once); N is a one-row broadcast; the df join keys on term
    * (AQE broadcasts it when the vocab fits). idf is the raw rational
    * N/df (the tx_search parity trick — order-preserving, libm-free):
    * score = (tf·N)/df is ONE double division of exact-int operands, so
    * both engines rank identical doubles; ties break on term asc.
    * WindowGroupLimit pushes rk ≤ k below the window exchange. */
  def keywords(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val tf = d
      .select(col("doc_id"), explode(Portable.words(col("text"))).as("term"))
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = d.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dft, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= keywordsK)
      .select(col("doc_id"), col("term"), col("tf"), col("score"))
  }

  val keywordsSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(${Portable.wordsSql}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |t AS (SELECT count(*) AS n_docs FROM documents),
       |s AS (
       |  SELECT doc_id, tf.term, tf,
       |    CAST(tf * n_docs AS DOUBLE) / df AS score,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY CAST(tf * n_docs AS DOUBLE) / df DESC, tf.term) AS rk
       |  FROM tf JOIN dft USING (term), t)
       |SELECT doc_id, term, tf, score FROM s WHERE rk <= $keywordsK""".stripMargin

  // ---- Zipf rank-frequency audit ------------------------------------------

  val zipfTopK = 100

  /** Zipf rank-frequency audit — the corpus-statistics health check run on
    * every new pretraining source: natural text follows cnt·rank ≈ const
    * (Zipf's law), so a source whose top-of-vocabulary DEVIATES (boilerplate
    * loops, template spam, machine-generated filler) shows up as a
    * `zipf_ratio` drifting far from 1 within the first hundred ranks.
    * Output per rank ≤ [[zipfTopK]]: the word, its exact count, its share of
    * all tokens, and cnt·rank/c1 (the Zipf deviation, 1.0 = perfect fit).
    *
    * Scale shape: ONE token-count aggregation (map-side partials over the
    * explode — the only corpus shuffle), top-k via TakeOrderedAndProject
    * (per-partition heads, never a global sort), and the two scalars the
    * ratios need (total tokens, rank-1 count) ride in as one-row
    * broadcasts — total comes from a zero-shuffle `sum(size(words))` scan,
    * NOT a second pass over the vocabulary. All inputs exact BIGINT; each
    * emitted double is a single division rounded at source. */
  def zipf(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val top = d.select(explode(Portable.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(zipfTopK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("w").asc)).cast("long"))
    val tot = d.agg(sum(size(Portable.words(col("text"))).cast("long")).as("total"))
    val c1 = top.filter(col("rank") === 1L).select(col("cnt").as("c1"))
    top.crossJoin(broadcast(tot)).crossJoin(broadcast(c1))
      .select(col("rank"), col("w"), col("cnt"),
        round(col("cnt").cast("double") / col("total").cast("double"), 6).as("share"),
        round((col("cnt") * col("rank")).cast("double") / col("c1").cast("double"), 4)
          .as("zipf_ratio"))
  }

  val zipfSql: String =
    s"""WITH w AS (SELECT unnest(${Portable.wordsSql}) AS w FROM documents),
       |c AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
       |r AS (
       |  SELECT w, cnt,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, w ASC) AS BIGINT) AS rank
       |  FROM c QUALIFY rank <= $zipfTopK),
       |t AS (SELECT CAST(sum(len(${Portable.wordsSql})) AS BIGINT) AS total FROM documents),
       |c1 AS (SELECT cnt AS c1 FROM r WHERE rank = 1)
       |SELECT rank, w, cnt,
       |  round(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       |  round(CAST(cnt * rank AS DOUBLE) / CAST(c1 AS DOUBLE), 4) AS zipf_ratio
       |FROM r, t, c1""".stripMargin

  // ---- classifier AUC (sort-free) -------------------------------------------

  /** Exact ROC-AUC of the tx_classify score against a ground-truth label
    * (lang = 'en') — the eval every model-based filter ships with
    * (tx_lid_eval gives accuracy/confusions; ranking filters are judged
    * by AUC because the keep-threshold is chosen AFTER training). The
    * textbook computation global-sorts all scores for ranks — one task
    * owns the corpus; the engine computes the Mann–Whitney statistic
    * SORT-FREE from the score HISTOGRAM: per distinct score, (pos, neg)
    * counts (one map-side-heavy agg); ties contribute ½ via the integer
    * identity 2·U = Σ_s pos(s)·(2·neg_below(s) + neg(s)); the cumulative
    * runs over the BOUNDED score dim. AUC = U/(npos·nneg) is ONE 6dp
    * division of exact BIGINTs. */
  def auc(spark: SparkSession, sfDir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val scored = Classify.classify(spark, sfDir)
      .select(col("doc_id"), col("score_milli"))
      .join(docs(spark, sfDir).select(col("doc_id"),
        (col("lang") === "en").as("truth")), "doc_id")
    val hist = scored.groupBy(col("score_milli"))
      .agg(sum(when(col("truth"), 1L).otherwise(0L)).as("pos"),
        sum(when(!col("truth"), 1L).otherwise(0L)).as("neg"))
    val wb = W.orderBy(col("score_milli")).rowsBetween(W.unboundedPreceding, -1)
    val terms = hist
      .withColumn("neg_below", coalesce(sum(col("neg")).over(wb), lit(0L)))
      .select(col("pos"), col("neg"),
        (col("pos") * (lit(2L) * col("neg_below") + col("neg"))).as("u2"))
    terms.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("u2")).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("u2").cast("double")
          / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6).as("auc"),
        round(col("u2").cast("double")
          / (col("n_pos") * col("n_neg")).cast("double") - 1.0, 6).as("gini"))
  }

  val aucSql: String =
    s"""WITH sc AS (${Classify.classifySql}),
       |lab AS (
       |  SELECT sc.doc_id, score_milli, d.lang = 'en' AS truth
       |  FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
       |hist AS (
       |  SELECT score_milli,
       |    CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS pos,
       |    CAST(sum(CASE WHEN truth THEN 0 ELSE 1 END) AS BIGINT) AS neg
       |  FROM lab GROUP BY 1),
       |t AS (
       |  SELECT pos, neg,
       |    pos * (2 * coalesce(CAST(sum(neg) OVER (ORDER BY score_milli
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
       |      + neg) AS u2
       |  FROM hist),
       |a AS (
       |  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
       |    CAST(sum(neg) AS BIGINT) AS n_neg, CAST(sum(u2) AS BIGINT) AS u2
       |  FROM t)
       |SELECT n_pos, n_neg,
       |  round(CAST(u2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE), 6) AS auc,
       |  round(CAST(u2 AS DOUBLE) / CAST(n_pos * n_neg AS DOUBLE) - 1.0, 6) AS gini
       |FROM a""".stripMargin

  // ---- code-vs-prose routing ------------------------------------------------

  /** Code-detector fixture: real code shapes (none occur in the synthetic
    * prose corpus) so the detector's positive path is driver-gated too.
    * No quotes/newlines — the rows embed verbatim in the oracle VALUES. */
  val codeFixture: Seq[(Long, String)] = Seq(
    -1L -> ("def quality_gate(doc): import re; total = 0; " +
      "for tok in doc.split(): total += 1 if re.match(tok) else 0; return total"),
    -2L -> ("const fooBar = function(x) { var minValue = 0; " +
      "for (i = 0; i < x.len; i++) { if (x[i] <= minValue) { minValue = x[i]; } } " +
      "return minValue; }"),
    -3L -> ("the quick brown fox jumps over the lazy dog and keeps running " +
      "through the quiet field until sunset while nothing else moves"))

  private val codeSymRe = "[{}();=<>\\[\\]]"
  private val codeKwRe =
    "\\b(def|class|import|return|function|var|const|for|while|if|else)\\b"
  private val codeCamelRe = "\\b[a-z]+[A-Z][A-Za-z]*"

  /** Code-vs-prose routing — the corpus-composition gate every LLM data
    * pipeline runs before mixing sources (code wants different dedup,
    * quality, and tokenizer treatment than prose; misrouted code poisons
    * prose quality stats and vice versa). Signals are the standard cheap
    * cascade run before any learned classifier: structural-symbol count,
    * code-keyword hits, camelCase identifiers. The verdict is INTEGER
    * cross-multiplied (sym·1000 ≥ 20·n_chars AND kw ≥ 2 — i.e. ≥2%
    * symbol density plus keyword support), so no float can flip it between
    * engines; the reported density is one 6dp-rounded division of exact
    * ints. Pure per-row regexp_count scan math — zero shuffles at any
    * corpus size (the tx_langid shape). Runs over documents ∪ an embedded
    * code fixture (the synthetic corpus is all prose — the fixture makes
    * the detector's POSITIVE path oracle-checkable). */
  def code(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fixture = codeFixture.toDF("doc_id", "text")
    val base = docs(spark, sfDir).select(col("doc_id"), col("text"))
      .unionAll(fixture)
    base.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        regexp_count(col("text"), lit(codeSymRe)).cast("long").as("sym"),
        regexp_count(col("text"), lit(codeKwRe)).cast("long").as("kw"),
        regexp_count(col("text"), lit(codeCamelRe)).cast("long").as("camel"))
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"), col("sym"), col("kw"), col("camel"),
        round(col("sym").cast("double") / col("n_chars").cast("double"), 6)
          .as("sym_density"),
        (col("sym") * 1000 >= col("n_chars") * 20 && col("kw") >= 2).as("is_code"))
  }

  val codeSql: String = {
    val values = codeFixture
      .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT * FROM (VALUES $values) AS fx(doc_id, text)),
       |m AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(regexp_extract_all(text, '[{}();=<>\\[\\]]')) AS BIGINT) AS sym,
       |    CAST(len(regexp_extract_all(text,
       |      '\\b(def|class|import|return|function|var|const|for|while|if|else)\\b'))
       |      AS BIGINT) AS kw,
       |    CAST(len(regexp_extract_all(text, '\\b[a-z]+[A-Z][A-Za-z]*')) AS BIGINT)
       |      AS camel
       |  FROM base)
       |SELECT doc_id, n_chars, sym, kw, camel,
       |  round(CAST(sym AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS sym_density,
       |  (sym * 1000 >= n_chars * 20 AND kw >= 2) AS is_code
       |FROM m WHERE n_chars > 0""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_code" -> (code _),
    "tx_auc" -> (auc _),
    "tx_zipf" -> (zipf _),
    "tx_keywords" -> (keywords _),
    "tx_charset" -> (charset _),
    "tx_gazetteer" -> (gazetteer _),
    "tx_search" -> (search _),
    "tx_langid" -> (langId _),
    "tx_lid_eval" -> (lidEval _),
    "tx_calibration" -> (calibration _),
    "tx_feature_hash" -> (featureHash _),
    "tx_quality" -> (quality _),
    "tx_tokens" -> (tokens _),
    "tx_fingerprint" -> (fingerprint _),
    "tx_winnow_pairs" -> (winnowPairs _),
    "tx_top_ngrams" -> (topKNgrams _),
    "tx_colloc" -> (colloc _),
    "tx_filter" -> (filterPass _),
    "tx_pii" -> (pii _),
    "tx_lm_score" -> (lmScore _),
    "tx_ccnet_bucket" -> (ccnetBucket _),
    "tx_len_hist" -> (lenHist _),
    "tx_repetition" -> (repetition _),
    "tx_gopher" -> (gopher _),
    "tx_pack" -> (pack _),
    "tx_profile_train" -> (profileTrain _),
    "tx_bpe_tokens" -> (BpeQueries.bpeTokens _),
    "tx_bpe_train" -> (BpeQueries.bpeTrain _),
    "tx_unigram_train" -> (UnigramLm.unigramTrain _),
    "tx_unigram_tokens" -> (UnigramLm.unigramTokens _),
    "tx_wordpiece" -> (WordPieceQueries.wordpiece _),
    "tx_oov" -> (oov _),
    "tx_readability" -> (readability _),
    "tx_stem" -> (PorterStem.stemQuery _),
    "tx_classify" -> (Classify.classify _),
    "tx_textrank" -> (TextRank.textrank _))

  def oracleSql: Map[String, String] = Map(
    "tx_code" -> codeSql,
    "tx_auc" -> aucSql,
    "tx_zipf" -> zipfSql,
    "tx_keywords" -> keywordsSql,
    "tx_charset" -> charsetSql,
    "tx_gazetteer" -> gazetteerSql,
    "tx_search" -> searchSql,
    "tx_langid" -> langIdSql,
    "tx_lid_eval" -> lidEvalSql,
    "tx_calibration" -> calibrationSql,
    "tx_feature_hash" -> featureHashSql,
    "tx_quality" -> qualitySql,
    "tx_tokens" -> tokensSql,
    "tx_fingerprint" -> fingerprintSql,
    "tx_winnow_pairs" -> winnowPairsSql,
    "tx_top_ngrams" -> topKNgramsSql,
    "tx_colloc" -> collocSql,
    "tx_filter" -> filterPassSql,
    "tx_pii" -> piiSql,
    "tx_lm_score" -> lmScoreSql,
    "tx_ccnet_bucket" -> ccnetBucketSql,
    "tx_len_hist" -> lenHistSql,
    "tx_repetition" -> repetitionSql,
    "tx_gopher" -> gopherSql,
    "tx_pack" -> packSql,
    "tx_profile_train" -> profileTrainSql,
    "tx_bpe_tokens" -> BpeQueries.bpeTokensSql,
    "tx_bpe_train" -> BpeQueries.bpeTrainSql,
    "tx_unigram_train" -> UnigramLm.unigramTrainSql,
    "tx_unigram_tokens" -> UnigramLm.unigramTokensSql,
    "tx_wordpiece" -> WordPieceQueries.wordpieceSql,
    "tx_oov" -> oovSql,
    "tx_readability" -> readabilitySql,
    "tx_stem" -> PorterStem.stemQuerySql,
    "tx_classify" -> Classify.classifySql,
    "tx_textrank" -> TextRank.textrankSql)
}
