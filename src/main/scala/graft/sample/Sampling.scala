package graft.sample

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators (SURVEY §2e addendum) — the
  * class-balancing passes a training-data pipeline runs over a mixed corpus.
  *
  * Both are HASH-deterministic, not RNG-based: the keep decision is a pure
  * function of the row key, so (a) the sample is reproducible across runs,
  * engines, and cluster sizes — no seed plumbing, no partition-order
  * dependence; (b) it needs no shuffle for the rate filter (the hash is
  * map-side column math) and exactly one for the per-stratum top-K.
  * This is the production idiom (hash-mod sampling) rather than
  * `DataFrame.sample`, whose output depends on partitioning.
  */
object Sampling {

  /** Per-language keep-rates (percent) — downsample the dominant class,
    * keep the tails: the class-rebalancing dial. Rates are a dim table;
    * production swaps in computed rates (target_count / class_count). */
  val rates: Seq[(String, Int)] = Seq(
    "en" -> 10, "es" -> 50, "de" -> 50, "fr" -> 25, "zh" -> 20)

  def ratesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rates.toDF("rlang", "rate")
  }

  val ratesValuesSql: String =
    "rates(rlang, rate) AS (VALUES " +
      rates.map { case (l, r) => s"('$l', $r)" }.mkString(", ") + ")"

  /** Hash bucket in [0, 100): the engine's portable 60-bit hash of the
    * salted doc_id, mod 100 — identical on both engines. */
  private def bucket = pmod(
    Portable.hash64(col("doc_id").cast("string"), salt = "samp"), lit(100L))

  private val bucketSql =
    s"""${Portable.hash64Sql("CAST(doc_id AS VARCHAR)", "samp")} % 100"""

  // ---- stratified rate sampling -------------------------------------------

  /** Keep a per-stratum fraction: bucket < rate[lang]. Zero shuffles — the
    * rate dim broadcasts and the filter is map-side; at 100 TB this is a
    * pushdown-friendly scan transform, not a sampling JOB. */
  def stratified(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).documents
      .join(broadcast(ratesDf(spark)), col("lang") === col("rlang"))
      .withColumn("bucket", bucket)
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"), col("bucket"))

  val stratifiedSql: String =
    s"""WITH $ratesValuesSql
       |SELECT doc_id, lang, $bucketSql AS bucket
       |FROM documents JOIN rates ON lang = rlang
       |WHERE $bucketSql < rate""".stripMargin

  // ---- per-stratum reservoir (exact-K) ------------------------------------

  val reservoirK = 20

  /** Exactly K rows per stratum, chosen by hash order — the batch-
    * deterministic analog of per-class reservoir sampling (same marginal:
    * every row equally likely under the hash's uniformity, but stable).
    * One shuffle on lang; per-partition partial top-K feeds the window. */
  def reservoir(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("bucket").asc, col("hash_tb").asc)
    Tables(spark, sfDir).documents
      .withColumn("bucket", bucket)
      .withColumn("hash_tb", Portable.hash64(col("doc_id").cast("string"), salt = "tb"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= reservoirK)
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
  }

  val reservoirSql: String =
    s"""SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY $bucketSql ASC,
       |        ${Portable.hash64Sql("CAST(doc_id AS VARCHAR)", "tb")} ASC) AS rn
       |  FROM documents) t
       |WHERE rn <= $reservoirK""".stripMargin

  // ---- source-mixture table (quality-derived sampling plan) ---------------

  /** Docs each source should contribute per epoch of the mix. */
  val mixTarget = 20

  /** The mixture table a corpus build derives before sampling: per source,
    * how many docs survive the retention gate ([[graft.text.TextOps
    * .filterPass]]) and how many repeats ("epochs", `target / n_keep`) are
    * needed to hit the per-source target — upweighting scarce clean sources,
    * downweighting plentiful ones. All divisions are exact-int-operand
    * doubles (bit-identical across engines). One agg on source; the gate
    * itself is the map-side scan pass. */
  def mixture(spark: SparkSession, sfDir: String): DataFrame = {
    // source rides the gate scan (filterPassCarrying) — joining the verdict
    // table back to documents on doc_id would re-shuffle the full corpus
    // for a column the scan already read
    graft.text.TextOps.filterPassCarrying(spark, sfDir, Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("verdict") === "keep", 1L).otherwise(0L)).as("n_keep"))
      .withColumn("keep_rate", round(col("n_keep").cast("double") / col("n_docs"), 6))
      .withColumn("epochs", when(col("n_keep") > 0,
        round(lit(mixTarget).cast("double") / col("n_keep"), 6)))
  }

  val mixtureSql: String =
    s"""WITH f AS (${graft.text.TextOps.filterPassSql})
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN f.verdict = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  round(CAST(sum(CASE WHEN f.verdict = 'keep' THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS keep_rate,
       |  CASE WHEN sum(CASE WHEN f.verdict = 'keep' THEN 1 ELSE 0 END) > 0
       |    THEN round(CAST($mixTarget AS DOUBLE)
       |      / sum(CASE WHEN f.verdict = 'keep' THEN 1 ELSE 0 END), 6)
       |  END AS epochs
       |FROM documents d JOIN f ON f.doc_id = d.doc_id
       |GROUP BY 1""".stripMargin

  // ---- temperature-scaled mixture weights ---------------------------------

  /** UniMax/multilingual-style temperature rebalancing of the source
    * mixture: sampling shares ∝ mass^(1/T) with T = 2, i.e. sqrt-scaled —
    * large sources damped, scarce sources boosted, without the hard
    * per-source target `mixture` uses. Mass is the per-source CHARACTER
    * count (UniMax weighs languages by token counts, not doc counts — a
    * source of long documents deserves proportionally more sampling mass).
    * sqrt (unlike a general pow) is IEEE-754 correctly-rounded on every
    * engine, so the weights differ only in the final sum's addend order —
    * guarded by the engine's standard 6dp rounding. The global normalizer
    * is a window over the SOURCE dim (bounded by construction — ~20 rows
    * at any corpus size), never over the corpus. */
  def temperature(spark: SparkSession, sfDir: String): DataFrame = {
    val perSource = Tables(spark, sfDir).documents
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("mass"))
    val all = Window.partitionBy()
    perSource
      .withColumn("raw_share",
        round(col("mass").cast("double") / sum(col("mass")).over(all), 6))
      .withColumn("temp_share",
        round(sqrt(col("mass").cast("double")) /
          sum(sqrt(col("mass").cast("double"))).over(all), 6))
      .withColumn("boost", round(col("temp_share") / col("raw_share"), 6))
  }

  val temperatureSql: String =
    """WITH k AS (
      |  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS mass
      |  FROM documents GROUP BY 1)
      |SELECT source, n_docs, mass,
      |  round(CAST(mass AS DOUBLE) / sum(mass) OVER (), 6) AS raw_share,
      |  round(sqrt(CAST(mass AS DOUBLE)) /
      |    sum(sqrt(CAST(mass AS DOUBLE))) OVER (), 6) AS temp_share,
      |  round(round(sqrt(CAST(mass AS DOUBLE)) /
      |      sum(sqrt(CAST(mass AS DOUBLE))) OVER (), 6)
      |    / round(CAST(mass AS DOUBLE) / sum(mass) OVER (), 6), 6) AS boost
      |FROM k""".stripMargin

  // ---- DSIR importance weighting (target-domain likelihood ratio) ---------

  /** Sources standing in for the target domain (production feeds a real
    * target corpus — its counts flow through the same dims). */
  val dsirTargetSources: Seq[String] = Seq("src0", "src1")

  /** Data Selection via Importance Resampling (Xie et al. 2023): weight
    * every document by how much more likely its tokens are under the
    * TARGET domain's unigram LM than under the whole-corpus LM — the
    * principled version of "upsample what looks like the good stuff".
    * Per-token ratio = ((ct+1)·(Nc+V)) / ((cc+1)·(Nt+V)) with Laplace
    * smoothing: both operands are exact integer products (< 2^53 at bench
    * scales — the 100 TB continuation moves to log-space sums), so each
    * token contributes ONE portable double division; the document weight
    * is their mean (tx_lm_score's rational-mean analog of the log-sum).
    * Shapes: two Zipf-small count dims joined to the token stream, totals
    * as a broadcast single row, one groupBy(doc_id) — same plan family as
    * tx_lm_score. Sampling on the weight is [[stratified]]'s hash gate. */
  def dsir(spark: SparkSession, sfDir: String): DataFrame = {
    val words = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), explode(Portable.words(col("text"))).as("w"))
    val corpus = words.groupBy(col("w")).agg(count(lit(1)).as("cc"))
    val target = words.filter(col("source").isin(dsirTargetSources: _*))
      .groupBy(col("w")).agg(count(lit(1)).as("ct"))
    val totals = corpus.agg(sum(col("cc")).as("nc"), count(lit(1)).as("v"))
      .crossJoin(target.agg(sum(col("ct")).as("nt")))
    words
      .join(corpus, "w")
      .join(target, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        round(avg(((coalesce(col("ct"), lit(0L)) + 1L) * (col("nc") + col("v"))) /
          ((col("cc") + 1L) * (col("nt") + col("v")))), 6).as("dsir_weight"))
  }

  val dsirSql: String = {
    val tgt = dsirTargetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, source, unnest(${Portable.wordsSql}) AS w FROM documents),
       |cc AS (SELECT w, count(*) AS cc FROM w GROUP BY 1),
       |ct AS (SELECT w, count(*) AS ct FROM w WHERE source IN ($tgt) GROUP BY 1),
       |tot AS (SELECT
       |  (SELECT CAST(sum(cc) AS BIGINT) FROM cc) AS nc,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cc) AS v,
       |  (SELECT CAST(sum(ct) AS BIGINT) FROM ct) AS nt)
       |SELECT doc_id, count(*) AS n_words,
       |  round(avg(((coalesce(ct, 0) + 1) * (nc + v)) /
       |    ((cc + 1) * (nt + v))), 6) AS dsir_weight
       |FROM w JOIN cc USING (w) LEFT JOIN ct USING (w) CROSS JOIN tot
       |GROUP BY doc_id""".stripMargin
  }

  // ---- deterministic train/valid/test split -------------------------------

  /** Percent of the hash space per split: train 90 / valid 5 / test 5. */
  val splitTrainPct = 90
  val splitValidPct = 95 // upper bound; test takes the rest

  /** Reproducible corpus split: every doc's split is a pure function of its
    * id under the portable hash (salt "split" — independent of the sampling
    * salt, so split membership never correlates with sample membership).
    * Zero shuffles, no seed plumbing, stable under corpus growth and
    * re-partitioning — the property that keeps eval sets honest when the
    * pipeline reruns at 100 TB: a doc can never migrate between train and
    * test because an upstream stage changed its partition. */
  def split(spark: SparkSession, sfDir: String): DataFrame = {
    val b = pmod(Portable.hash64(col("doc_id").cast("string"), salt = "split"), lit(100L))
    Tables(spark, sfDir).documents
      .select(col("doc_id"), b.as("bucket"))
      .withColumn("split",
        when(col("bucket") < splitTrainPct, "train")
          .when(col("bucket") < splitValidPct, "valid")
          .otherwise("test"))
  }

  val splitSql: String = {
    val b = s"""${Portable.hash64Sql("CAST(doc_id AS VARCHAR)", "split")} % 100"""
    s"""SELECT doc_id, $b AS bucket,
       |  CASE WHEN $b < $splitTrainPct THEN 'train'
       |       WHEN $b < $splitValidPct THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  // ---- epoch materialization (repeat-and-shuffle) --------------------------

  /** Materialize the temperature mixture into an actual repeated-copy
    * stream — the "repeat and shuffle" step a pre-training data loader
    * consumes after the weights are decided (UniMax epochs made concrete).
    * Per-source boost = temp_share/raw_share; each doc replicates
    * floor(boost) times plus one more iff its salted hash falls under the
    * fractional part (samp_stratified's gate — deterministic across runs,
    * partitionings, and engines; boosts < 1 downsample the same way).
    * The copy explosion is per-row `sequence` math (output rows ∝ boost,
    * never corpus²); the readout aggregates per source so the contract —
    * achieved ratio ≈ boost — is itself the query result. Fractional
    * parts quantize through an explicit floor(·×10⁶) so no
    * double-rounding divergence can flip a copy decision. */
  def upsample(spark: SparkSession, sfDir: String): DataFrame = {
    val boosts = temperature(spark, sfDir)
      .select(col("source"), col("n_docs").as("n_docs_orig"), col("boost"))
    Tables(spark, sfDir).documents.select(col("doc_id"), col("source"))
      .join(broadcast(boosts), "source")
      .withColumn("base", floor(col("boost")).cast("long"))
      .withColumn("fracm",
        floor((col("boost") - floor(col("boost"))) * 1000000).cast("long"))
      .withColumn("n_copies", col("base") +
        when(Portable.hash64(col("doc_id").cast("string"), salt = "ups") % 1000000
          < col("fracm"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("source"), col("doc_id"), col("n_docs_orig"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_id"))
      .groupBy(col("source"))
      .agg(max(col("n_docs_orig")).as("n_docs_orig"),
        countDistinct(col("doc_id")).as("n_docs_kept"),
        count(lit(1)).as("n_rows"),
        sum(col("copy_id")).as("copy_checksum"))
      .withColumn("achieved",
        round(col("n_rows").cast("double") / col("n_docs_orig"), 6))
  }

  val upsampleSql: String =
    s"""WITH k AS (
       |  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS mass
       |  FROM documents GROUP BY 1),
       |b AS (
       |  SELECT source, n_docs AS n_docs_orig,
       |    round(round(sqrt(CAST(mass AS DOUBLE)) /
       |        sum(sqrt(CAST(mass AS DOUBLE))) OVER (), 6)
       |      / round(CAST(mass AS DOUBLE) / sum(mass) OVER (), 6), 6) AS boost
       |  FROM k),
       |d AS (
       |  SELECT doc_id, dd.source, n_docs_orig,
       |    CAST(floor(boost) AS BIGINT)
       |      + CASE WHEN ${Portable.hash64Sql("CAST(doc_id AS VARCHAR)", "ups")} % 1000000
       |          < CAST(floor((boost - floor(boost)) * 1000000) AS BIGINT)
       |        THEN 1 ELSE 0 END AS n_copies
       |  FROM documents dd JOIN b ON dd.source = b.source),
       |e AS (
       |  SELECT source, doc_id, n_docs_orig, CAST(t.copy_id AS BIGINT) AS copy_id
       |  FROM d, unnest(range(1, n_copies + 1)) AS t(copy_id)
       |  WHERE n_copies > 0)
       |SELECT source, max(n_docs_orig) AS n_docs_orig,
       |  count(DISTINCT doc_id) AS n_docs_kept, count(*) AS n_rows,
       |  CAST(sum(copy_id) AS BIGINT) AS copy_checksum,
       |  round(CAST(count(*) AS DOUBLE) / max(n_docs_orig), 6) AS achieved
       |FROM e GROUP BY 1""".stripMargin

  // ---- train/test near-dup leakage audit -----------------------------------

  /** Cross-split near-duplicate leakage — the eval-integrity audit exact
    * splitting CANNOT give you: samp_split guarantees no document sits in
    * two splits, but a NEAR-duplicate pair straddling train and test leaks
    * the answer into training anyway (the quiet eval-inflation bug; why
    * dedup-then-split is the production order). Composition row: the
    * MinHash-LSH candidate pairs (dd_minhash's bounded band join) join the
    * split assignment (zero-shuffle hash math) twice on the pair ends; the
    * readout aggregates to the ≤6-cell (split, split) matrix with the
    * dd_source_matrix least/greatest canonicalization. At 100 TB this
    * costs the band join the dedup pass already runs — the audit is one
    * extra broadcast-sized join family over its output. */
  def leakage(spark: SparkSession, sfDir: String): DataFrame = {
    val s = split(spark, sfDir).select(col("doc_id"), col("split"))
    graft.dedup.Dedup.minhashLsh(spark, sfDir)
      .join(s.select(col("doc_id").as("id_a"), col("split").as("split_a")), "id_a")
      .join(s.select(col("doc_id").as("id_b"), col("split").as("split_b")), "id_b")
      .select(least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaky", col("split_lo") =!= col("split_hi"))
  }

  def leakageSql: String =
    s"""WITH ${graft.dedup.Dedup.minhashCappedCtes},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bandsc a JOIN bandsc b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sp AS (
       |  ${splitSql.replace("\n", "\n  ")}),
       |j AS (
       |  SELECT least(sa.split, sb.split) AS split_lo,
       |    greatest(sa.split, sb.split) AS split_hi
       |  FROM pairs
       |  JOIN sp sa ON pairs.id_a = sa.doc_id
       |  JOIN sp sb ON pairs.id_b = sb.doc_id)
       |SELECT split_lo, split_hi, count(*) AS n_pairs,
       |  split_lo <> split_hi AS leaky
       |FROM j GROUP BY 1, 2""".stripMargin

  // ---- systematic PPS (probability-proportional-to-size) sampling ---------

  /** Target draw count for [[pps]]. */
  val ppsK = 50

  /** Number of range blocks for the two-level prefix sum in [[pps]] when
    * the session doesn't configure shuffle partitions higher. */
  val ppsMinBlocks = 32

  /** Systematic PPS sampling — each document's selection probability is
    * proportional to its LENGTH (n_chars), the survey-sampling classic
    * (Madow 1949) and the right default when one "draw" should represent a
    * fixed token budget rather than a fixed doc count. Walk the cumulative
    * weight axis in strides of W/k; a doc is hit once per stride boundary
    * inside its weight interval, so a doc longer than one stride is drawn
    * MULTIPLE times (its multiplicity rides along, as unequal-probability
    * estimators require). ALL math is integer (cumsum, floor-div stride
    * crossings) — deterministic on both engines with no RNG and no floats.
    * Scale shape: the corpus-order prefix sum runs as the ev_disorder
    * two-level decomposition, with blocks defined by a RANGE SHUFFLE on
    * doc_id (`repartitionByRange` + `spark_partition_id`) rather than
    * `doc_id DIV span` — range boundaries come from sampling, so the
    * blocks stay balanced for dense, sparse, or clustered id spaces alike
    * (the round-6 caveat: DIV-blocking skews back toward one fat window
    * partition when ids cluster). Per-block totals aggregate locally, the
    * cross-block exclusive prefix runs over the BOUNDED block dim and
    * broadcasts back, the in-block cumsum is a window whose partitions are
    * the range blocks. The block id is an execution detail — the resulting
    * corpus-order cumsum is blocking-invariant, so the oracle replays a
    * plain global cumsum. The frame is persisted so the offsets pass and
    * the cumsum pass read ONE materialized block assignment. No single
    * task ever owns the whole corpus ordering. Then a map-side crossing
    * test; output is k rows. */
  def pps(spark: SparkSession, sfDir: String): DataFrame = {
    val nBlocks = math.max(ppsMinBlocks, spark.sessionState.conf.numShufflePartitions)
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("n_chars"))
      .repartitionByRange(nBlocks, col("doc_id"))
      .withColumn("blk", spark_partition_id().cast("long"))
      .persist()
    val offsets = docs.groupBy(col("blk")).agg(sum(col("n_chars")).as("bs"))
      .withColumn("off", coalesce(
        sum(col("bs")).over(Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("blk"), col("off"))
    val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = docs.join(broadcast(offsets), "blk")
      .withColumn("cum", col("off") + sum(col("n_chars")).over(wIn))
    val total = docs.agg(sum(col("n_chars"))).head().getLong(0)
    val stride = total / ppsK
    withCum
      .withColumn("n_hits",
        expr(s"cum DIV $stride - (cum - n_chars) DIV $stride"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("n_chars"), col("n_hits"))
  }

  // CAST AS BIGINT throughout: DuckDB window sums return HUGEINT, which
  // pandas reads as float64 (1.0 vs Spark's 1) and the value hash diverges.
  val ppsSql: String =
    s"""WITH c AS (
       |  SELECT doc_id, n_chars,
       |    CAST(sum(n_chars) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM documents),
       |s AS (SELECT max(cum) // $ppsK AS stride FROM c)
       |SELECT doc_id, n_chars,
       |  CAST(cum // (SELECT stride FROM s)
       |    - (cum - n_chars) // (SELECT stride FROM s) AS BIGINT) AS n_hits
       |FROM c
       |WHERE cum // (SELECT stride FROM s) - (cum - n_chars) // (SELECT stride FROM s) > 0""".stripMargin

  // ---- Neyman optimal stratified allocation -------------------------------

  /** Total sample budget allocated across strata by [[neyman]]. */
  val neymanK = 1000

  /** Neyman optimal allocation (Neyman 1934) — the stratified-sampling
    * budget split that minimizes estimator variance: n_h ∝ N_h·σ_h, so
    * big AND internally-diverse strata get the samples, uniform strata
    * almost none. The float trap is σ (a sqrt) inside a cross-strata sum;
    * the identity N_h·σ_h = √(N_h·ΣX² − (ΣX)²) reduces the weight to the
    * INTEGER square root of an exact integer moment — every weight, the
    * total, and the largest-remainder rounding (which lands the allocation
    * on exactly K) are integer arithmetic, bit-identical on both engines
    * at any partitioning. Scale shape: one corpus agg to |strata| moment
    * rows; the allocation runs entirely over that dim. */
  def neyman(spark: SparkSession, sfDir: String): DataFrame = {
    val moments = Tables(spark, sfDir).documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("s1"),
        sum(col("n_chars") * col("n_chars")).as("s2"))
      // N·σ = isqrt(N·S2 − S1²): exact for num < 2^52 (doc'd moment bound)
      .withColumn("w", floor(sqrt((col("n_docs") * col("s2") -
        col("s1") * col("s1")).cast("double"))).cast("long"))
    val wTot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = moments
      .withColumn("w_total", greatest(sum(col("w")).over(wTot), lit(1L)))
      .withColumn("base", expr(s"($neymanK * w) DIV w_total"))
      .withColumn("rem", expr(s"($neymanK * w) % w_total"))
      .withColumn("deficit", lit(neymanK) - sum(col("base")).over(wTot))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("lang").asc)))
    ranked.select(col("lang"), col("n_docs"), col("w"),
      (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
        .as("alloc"))
  }

  val neymanSql: String =
    s"""WITH m AS (
       |  SELECT lang, count(*) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS s1,
       |    CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
       |  FROM documents GROUP BY 1),
       |w AS (SELECT lang, n_docs,
       |        CAST(floor(sqrt(CAST(n_docs * s2 - s1 * s1 AS DOUBLE))) AS BIGINT) AS w
       |      FROM m),
       |t AS (SELECT *, greatest((SELECT sum(w) FROM w), 1) AS w_total FROM w),
       |b AS (SELECT *, ($neymanK * w) // w_total AS base,
       |        ($neymanK * w) % w_total AS rem FROM t),
       |r AS (SELECT *, $neymanK - (SELECT sum(base) FROM b) AS deficit,
       |        row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk FROM b)
       |SELECT lang, n_docs, w,
       |  CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |FROM r""".stripMargin

  // ---- deterministic Poisson bootstrap ------------------------------------

  /** Bootstrap replicate count. */
  val bootstrapB = 32

  /** Poisson(1) CDF × 10⁶ (floored): mult = k iff the hash bucket lands in
    * [thr(k−1), thr(k)); the tail past 7 copies (< 1e-4 mass) caps at 7. */
  private val poisson1CdfM = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
    999405L, 999916L)

  /** Poisson bootstrap (Efron's bootstrap in its streaming form — Chamandy
    * et al. 2012, "Estimating uncertainty for massive data streams"): each
    * of B replicates draws every document Poisson(1) times, approximating
    * multinomial resampling without needing n up front — THE bootstrap that
    * works in one pass over a distributed corpus. This engine's twist is
    * determinism: the multiplicity is the inverse-CDF of a 10⁶-bucket hash
    * of (doc_id, replicate), integer-threshold math on both engines — no
    * RNG, no partition-order dependence, reproducible CIs. Per-replicate
    * statistic: draw count and mean doc length (exact-int sums; ONE
    * portable double division each). Scale shape: the B× row inflation is
    * map-local arithmetic that partial-agg collapses to ≤B rows per
    * partition BEFORE the exchange — one shuffle of B·partitions tiny
    * rows; output B rows. The replicate spread IS the standard error a
    * 100 TB pipeline reports next to its point estimates. */
  def bootstrap(spark: SparkSession, sfDir: String): DataFrame = {
    val u = pmod(Portable.hash64(
      concat_ws(":", col("doc_id").cast("string"), col("rep").cast("string")),
      salt = "boot"), lit(1000000L))
    val mult = poisson1CdfM.zipWithIndex
      .foldLeft(when(lit(false), 0L)) { case (acc, (thr, k)) =>
        acc.when(u < thr, k.toLong) }
      .otherwise(7L)
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(0L), lit(bootstrapB - 1L))).as("rep"))
      .withColumn("mult", mult)
      .filter(col("mult") > 0)
      .groupBy(col("rep"))
      .agg(sum(col("mult")).as("n_draws"),
        round(sum(col("mult") * col("n_chars")).cast("double") /
          sum(col("mult")), 6).as("mean_chars"))
  }

  val bootstrapSql: String = {
    val u = s"""${Portable.hash64Sql(
      "(CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR))", "boot")} % 1000000"""
    val caseArm = poisson1CdfM.zipWithIndex
      .map { case (thr, k) => s"WHEN u < $thr THEN $k" }.mkString(" ")
    s"""WITH r AS (SELECT CAST(t.rep AS BIGINT) AS rep FROM range(0, $bootstrapB) t(rep)),
       |d AS (
       |  SELECT rep, n_chars, $u AS u
       |  FROM documents CROSS JOIN r),
       |m AS (SELECT rep, n_chars, CASE $caseArm ELSE 7 END AS mult FROM d)
       |SELECT rep, CAST(sum(mult) AS BIGINT) AS n_draws,
       |  round(CAST(sum(mult * n_chars) AS DOUBLE) / sum(mult), 6) AS mean_chars
       |FROM m WHERE mult > 0 GROUP BY 1""".stripMargin
  }

  // ---- importance-weight health audit (effective sample size) -------------

  /** Effective-sample-size audit of the corpus's importance-weighting
    * schemes — the check run BEFORE trusting a weighted or resampled
    * corpus (Kong 1992's ESS = (Σw)²/Σw²; ess/n is the standard
    * weight-degeneracy dial): an ESS collapsing toward 1 means the
    * weighted corpus is effectively ONE document no matter how many rows
    * it has, and the concentration column (max w / Σw) quantifies the
    * worst offender's share. Three production schemes side by side:
    *   - `dsir_mean`    — [[dsir]]'s per-token mean ratio (near-flat by
    *                      construction: the sanity baseline);
    *   - `dsir_product` — the Xie et al. 2023 document likelihood ratio
    *                      (Π token ratios), the weight DSIR actually
    *                      resamples on — computed in log space with the
    *                      max-subtraction trick, the only stable form at
    *                      corpus scale;
    *   - `quality`      — [[graft.text.TextOps.quality]]'s score used as
    *                      a sampling weight (quality-weighted mixing).
    * Portability (round-7 advice closed — the folds are now EXACT, not
    * merely round-guarded): every folded term is quantized to an integer
    * grid BEFORE summation — per-token log-ratios at 1e-6
    * (BIGINT sums), per-doc normalized weights at 1e-6 (DECIMAL sums, no
    * overflow at any corpus size) — so every aggregate is
    * order/partition-invariant BY CONSTRUCTION and the ESS the audit
    * reports is the ESS of the quantized weights on both engines
    * identically (the grid sits 2-3 decades below the output rounding).
    * Scale shape: the dsir token plan + one groupBy(doc_id) per scheme,
    * then a single-row aggregate each — three map-side-combinable
    * exchanges over O(docs) rows, unioned as a 3-row audit dim. */
  def ess(spark: SparkSession, sfDir: String): DataFrame = {
    def essOf(scheme: String, weighted: DataFrame): DataFrame = {
      // `weighted` has (doc_id, lw) with lw = ln(weight) on the 1e-6 grid;
      // the max-subtract keeps every exp() in [0, 1] regardless of scale.
      // e is quantized to the 1e-6 grid and summed as DECIMAL — S and Q
      // are exact integers, ess = (Σe)²/Σe² = S²/Q (grids cancel),
      // wmax_share = 1/Σe = 1e6/S (the max doc's e quantizes to exactly
      // 1e6).
      // (r9 note: persisting `weighted` for the max-subtract's second read
      // MEASURED 3× slower — materialization beats the recompute that
      // exchange reuse already dedups; left un-persisted deliberately.)
      val m = weighted.agg(max(col("lw")).as("m"))
      weighted.crossJoin(broadcast(m))
        .select(round(exp(col("lw") - col("m")) * 1e6, 0)
          .cast("decimal(20,0)").as("ei"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ei")).cast("double").as("s"),
          sum(col("ei") * col("ei")).cast("double").as("q"))
        .select(lit(scheme).as("scheme"), col("n_docs"),
          round(col("s") * col("s") / col("q"), 3).as("ess"),
          round(col("s") * col("s") / col("q") / col("n_docs"), 6).as("ess_ratio"),
          round(lit(1e6) / col("s"), 6).as("wmax_share"))
    }
    val words = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"),
        explode(Portable.words(col("text"))).as("w"))
    val corpus = words.groupBy(col("w")).agg(count(lit(1)).as("cc"))
    val target = words.filter(col("source").isin(dsirTargetSources: _*))
      .groupBy(col("w")).agg(count(lit(1)).as("ct"))
    val totals = corpus.agg(sum(col("cc")).as("nc"), count(lit(1)).as("v"))
      .crossJoin(target.agg(sum(col("ct")).as("nt")))
    // per-token log-ratio quantized to the 1e-6 grid BEFORE the per-doc
    // fold: BIGINT sums are partition-order exact (|term| ≤ ~30×1e6,
    // ≤1e5 tokens/doc — no overflow); lw = sum/1e6, exact at 6dp
    val prodLw = words
      .join(corpus, "w").join(target, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        round(log(((coalesce(col("ct"), lit(0L)) + 1L) * (col("nc") + col("v"))) /
          ((col("cc") + 1L) * (col("nt") + col("v")))) * 1e6, 0).cast("long").as("t"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("t")).cast("double") / 1e6, 6).as("lw"))
    val meanLw = dsir(spark, sfDir)
      .select(col("doc_id"), round(log(col("dsir_weight")), 6).as("lw"))
    val qualLw = graft.text.TextOps.quality(spark, sfDir)
      .select(col("doc_id"), round(log(col("quality")), 6).as("lw"))
    essOf("dsir_mean", meanLw)
      .unionAll(essOf("dsir_product", prodLw))
      .unionAll(essOf("quality", qualLw))
  }

  val essSql: String = {
    def essOf(scheme: String, lwCte: String): String =
      s"""SELECT '$scheme' AS scheme, n_docs,
         |  round(s * s / q, 3) AS ess,
         |  round(s * s / q / n_docs, 6) AS ess_ratio,
         |  round(1e6 / s, 6) AS wmax_share
         |FROM (
         |  SELECT count(*) AS n_docs,
         |    CAST(sum(ei) AS DOUBLE) AS s, CAST(sum(ei * ei) AS DOUBLE) AS q
         |  FROM (SELECT CAST(round(exp(lw - (SELECT max(lw) FROM $lwCte)) * 1e6)
         |               AS BIGINT) AS ei
         |        FROM $lwCte) x) y""".stripMargin
    val tgt = dsirTargetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, source, unnest(${Portable.wordsSql}) AS w FROM documents),
       |cc AS (SELECT w, count(*) AS cc FROM w GROUP BY 1),
       |ct AS (SELECT w, count(*) AS ct FROM w WHERE source IN ($tgt) GROUP BY 1),
       |tot AS (SELECT
       |  (SELECT CAST(sum(cc) AS BIGINT) FROM cc) AS nc,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cc) AS v,
       |  (SELECT CAST(sum(ct) AS BIGINT) FROM ct) AS nt),
       |prod_lw AS (
       |  SELECT doc_id, round(CAST(sum(t) AS DOUBLE) / 1e6, 6) AS lw
       |  FROM (SELECT doc_id,
       |          CAST(round(ln(((coalesce(ct, 0) + 1) * (nc + v)) /
       |            ((cc + 1) * (nt + v))) * 1e6) AS BIGINT) AS t
       |        FROM w JOIN cc USING (w) LEFT JOIN ct USING (w) CROSS JOIN tot) z
       |  GROUP BY doc_id),
       |mean_lw AS (
       |  SELECT doc_id, round(ln(dsir_weight), 6) AS lw
       |  FROM (${dsirSql.replace("\n", "\n  ")}) d),
       |qual_lw AS (
       |  SELECT doc_id, round(ln(quality), 6) AS lw
       |  FROM (${graft.text.TextOps.qualitySql.replace("\n", "\n  ")}) q)
       |${essOf("dsir_mean", "mean_lw")}
       |UNION ALL
       |${essOf("dsir_product", "prod_lw")}
       |UNION ALL
       |${essOf("quality", "qual_lw")}""".stripMargin
  }

  /** Labeling-batch size for [[uncertainty]]. */
  val uncertaintyK = 50

  /** Uncertainty sampling — the active-learning loop's selection step
    * (Lewis & Gale, SIGIR'94; the labeling-budget allocator behind every
    * classifier-in-the-pipeline: route the HUMAN labels to the documents
    * the model is least sure about): the K documents whose tx_classify
    * margin |score| is smallest, i.e. nearest the decision boundary.
    * Deterministic total order (margin asc, doc_id asc) so the selected
    * batch is reproducible. Scale shape: scoring is the classify plan
    * (broadcast weights, one agg exchange); the selection is a bounded
    * top-K via TakeOrderedAndProject — each task ships only its local K,
    * no global sort of the corpus. */
  def uncertainty(spark: SparkSession, sfDir: String): DataFrame =
    graft.text.Classify.classify(spark, sfDir)
      .select(col("doc_id"), col("score_milli"),
        abs(col("score_milli")).as("margin_milli"))
      .orderBy(col("margin_milli").asc, col("doc_id").asc)
      .limit(uncertaintyK)

  val uncertaintySql: String =
    s"""WITH sc AS (${graft.text.Classify.classifySql})
       |SELECT doc_id, score_milli, abs(score_milli) AS margin_milli
       |FROM sc
       |ORDER BY margin_milli ASC, doc_id ASC
       |LIMIT $uncertaintyK""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "samp_uncertainty" -> (uncertainty _),
    "samp_bootstrap" -> (bootstrap _),
    "samp_neyman" -> (neyman _),
    "samp_pps" -> (pps _),
    "samp_leakage" -> (leakage _),
    "samp_upsample" -> (upsample _),
    "samp_split" -> (split _),
    "samp_stratified" -> (stratified _),
    "samp_reservoir" -> (reservoir _),
    "samp_mixture" -> (mixture _),
    "samp_temperature" -> (temperature _),
    "samp_dsir" -> (dsir _),
    "samp_ess" -> (ess _))

  def oracleSql: Map[String, String] = Map(
    "samp_uncertainty" -> uncertaintySql,
    "samp_bootstrap" -> bootstrapSql,
    "samp_neyman" -> neymanSql,
    "samp_pps" -> ppsSql,
    "samp_leakage" -> leakageSql,
    "samp_upsample" -> upsampleSql,
    "samp_split" -> splitSql,
    "samp_stratified" -> stratifiedSql,
    "samp_reservoir" -> reservoirSql,
    "samp_mixture" -> mixtureSql,
    "samp_temperature" -> temperatureSql,
    "samp_dsir" -> dsirSql,
    "samp_ess" -> essSql)
}
