package graft.pipeline

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end curation pipeline as ONE declarative plan (SURVEY §2 —
  * the composition proof for the training-data operators): quality gate →
  * normalized-exact dedup → benchmark decontamination → reproducible split
  * → sequence packing, producing the train-shard manifest a pre-training
  * run consumes. Every stage is the already-verified operator, composed as
  * a subtree rather than re-run over materialized intermediates — Catalyst
  * sees the whole lineage, so the gate's scan projection serves every
  * stage, the dedup window rides the gated (smaller) corpus, and the only
  * full-corpus shuffles are the ones the stages individually need (langid
  * join, norm-hash window, pack-source window; the contamination dim stays
  * broadcast). At 100 TB this single-plan form is what lets AQE size every
  * exchange off real post-gate statistics instead of pre-gate estimates.
  */
object Curate {

  /** Quality floor for THIS corpus: its composite scores cluster in
    * 0.37-0.48, so 0.4 drops the bottom quartile — the pipeline gate is a
    * corpus-calibrated percentile, where tx_filter keeps the absolute
    * C4-style gates (which retain nothing on the synthetic corpus —
    * a vacuous composition would verify nothing). */
  val qualityFloor = 0.4
  val minWords = 20

  // The shared stage expressions — ONE definition each, used by both the
  // manifest chain (stages) and the funnel's flag columns, so the audit can
  // never report a different pipeline than curate ships.
  /** Dedup keeper window: first doc per normalized-text group. */
  private def dedupWindow = Window.partitionBy(md5(graft.dedup.Dedup.normKey(col("text"))))
  /** Distinct contaminated doc ids (bounded by the benchmark's reach). */
  private def contamFrame(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.Dedup.contaminate(spark, sfDir).select(col("doc_id")).distinct()
  /** Reproducible split bucket: pure hash of doc_id, salt-isolated. */
  private def splitBucket: Column =
    pmod(Portable.hash64(col("doc_id").cast("string"), salt = "split"), lit(100L))

  /** The four survivor frames, in pipeline order — shared by the manifest
    * ([[curate]]) and the audit funnel ([[funnel]]) so both queries are the
    * same subtrees. */
  def stages(spark: SparkSession, sfDir: String): Seq[(String, DataFrame)] = {
    import graft.dedup.Dedup
    // 1. retention gate (quality + length floors) — a PROJECTION riding the
    //    scan (withQualityCols), so no verdict table is joined back
    // n_words is carried through as the token count — the pack stage must
    // not re-run the word split the gate already paid for
    val gated = graft.text.TextOps.withQualityCols(
        graft.Tables(spark, sfDir).documents)
      .filter(col("quality") >= qualityFloor && col("n_words") >= minWords)
      .select(col("doc_id"), col("text"), col("source"),
        col("n_words").cast("long").as("tok"))
    // 2. normalized-exact keeper over the GATED corpus (dedup after
    //    filtering — the cheap gate shrinks what the dedup shuffle carries)
    val deduped = gated.withColumn("keep_id", min(col("doc_id")).over(dedupWindow))
      .filter(col("doc_id") === col("keep_id"))
    // 3. decontamination: drop the benchmark docs themselves and every
    //    training doc sharing n-grams with one (broadcast anti-join —
    //    the contaminated set is bounded by the benchmark's reach)
    val clean = deduped.filter(col("doc_id") >= Dedup.contamBenchDocs)
      .join(broadcast(contamFrame(spark, sfDir)), Seq("doc_id"), "left_anti")
    // 4. reproducible split: keep the train bucket (pure hash of doc_id —
    //    no seed, no shuffle, stable under corpus growth)
    val train = clean.filter(splitBucket < graft.sample.Sampling.splitTrainPct)
    Seq("gated" -> gated, "deduped" -> deduped, "clean" -> clean, "train" -> train)
  }

  /** Survivor manifest: gated, deduped, decontaminated train-split docs
    * with their per-source pack bin. */
  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    val train = stages(spark, sfDir).last._2
    // 5. per-source sequence packing of the survivors — tok was computed by
    //    the gate's projection; drop the fat text column here, before the
    //    pack shuffle carries it
    val toks = train.select(col("doc_id"), col("source"), col("tok"))
    val cw = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.withColumn("cum", sum(col("tok")).over(cw))
      .select(col("doc_id"), col("source"), col("tok"),
        expr(s"(cum - tok) DIV ${graft.text.TextOps.packBudget}").as("bin"))
  }

  /** The audit funnel every production pipeline logs next to its output:
    * document and token counts surviving each stage (plus the raw corpus),
    * in pipeline order. NOT a union of per-stage aggregates — that would
    * re-execute the gate/dedup/decontamination chain once per row. Instead
    * every stage's membership rides the gated frame as a FLAG column
    * (later stages are conjunctions of earlier ones), ONE aggregation
    * computes all four (docs, tokens) pairs, and a 4-struct explode of
    * that single row yields the report: the whole funnel costs one pass
    * over the gated corpus + the raw-corpus count. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.dedup.Dedup
    val raw = graft.Tables(spark, sfDir).documents
      .agg(count(lit(1)).as("n_docs"), sum(size(Portable.words(col("text"))))
        .cast("long").as("n_tokens"))
      .select(lit(0L).as("stage"), lit("raw").as("name"), col("n_docs"), col("n_tokens"))
    val gated = stages(spark, sfDir).head._2
    val contam = contamFrame(spark, sfDir).withColumn("contaminated", lit(true))
    val flagged = gated
      .withColumn("is_dedup", col("doc_id") === min(col("doc_id")).over(dedupWindow))
      .join(broadcast(contam), Seq("doc_id"), "left")
      .withColumn("is_clean", col("is_dedup") &&
        col("doc_id") >= Dedup.contamBenchDocs && col("contaminated").isNull)
      .withColumn("is_train", col("is_clean") && splitBucket < graft.sample.Sampling.splitTrainPct)
    def pair(flag: Column): (Column, Column) = (
      coalesce(sum(when(flag, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(flag, col("tok")).otherwise(0L)), lit(0L)))
    val (d1, t1) = (count(lit(1)).cast("long"), coalesce(sum(col("tok")), lit(0L)))
    val (d2, t2) = pair(col("is_dedup"))
    val (d3, t3) = pair(col("is_clean"))
    val (d4, t4) = pair(col("is_train"))
    val one = flagged.agg(d1.as("d1"), t1.as("t1"), d2.as("d2"), t2.as("t2"),
      d3.as("d3"), t3.as("t3"), d4.as("d4"), t4.as("t4"))
    val staged = one.select(explode(array(
        struct(lit(1L).as("stage"), lit("gated").as("name"),
          col("d1").as("n_docs"), col("t1").as("n_tokens")),
        struct(lit(2L).as("stage"), lit("deduped").as("name"),
          col("d2").as("n_docs"), col("t2").as("n_tokens")),
        struct(lit(3L).as("stage"), lit("clean").as("name"),
          col("d3").as("n_docs"), col("t3").as("n_tokens")),
        struct(lit(4L).as("stage"), lit("train").as("name"),
          col("d4").as("n_docs"), col("t4").as("n_tokens")))).as("r"))
      .select(col("r.stage"), col("r.name"), col("r.n_docs"), col("r.n_tokens"))
    raw.unionAll(staged)
  }

  val curateSql: String =
    s"""WITH $stageCtes,
       |c AS (
       |  SELECT doc_id, source, tok,
       |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM trn)
       |SELECT doc_id, source, tok,
       |  CAST((cum - tok) // ${graft.text.TextOps.packBudget} AS BIGINT) AS bin
       |FROM c""".stripMargin

  /** Shared DuckDB CTE chain ending in the train survivors `trn
    * (doc_id, text, source, tok)` — the oracle twin of [[stages]]. */
  private lazy val stageCtes: String = {
    import graft.dedup.Dedup
    val normMd5 = s"md5(${Dedup.normKeySql})"
    val bucket = s"""${Portable.hash64Sql("CAST(doc_id AS VARCHAR)", "split")} % 100"""
    s"""q AS (${graft.text.TextOps.qualitySql}),
       |gated AS (
       |  SELECT d.doc_id, d.text, d.source, CAST(q.n_words AS BIGINT) AS tok
       |  FROM documents d
       |  JOIN q ON q.doc_id = d.doc_id
       |  WHERE q.quality >= $qualityFloor AND q.n_words >= $minWords),
       |dd AS (
       |  SELECT doc_id, text, source, tok FROM (
       |    SELECT doc_id, text, source, tok,
       |      min(doc_id) OVER (PARTITION BY $normMd5) AS keep_id
       |    FROM gated) n
       |  WHERE doc_id = keep_id),
       |contam AS (SELECT DISTINCT doc_id FROM (${Dedup.contaminateSql}) c0),
       |cln AS (
       |  SELECT dd.doc_id, dd.text, dd.source, dd.tok FROM dd
       |  WHERE dd.doc_id >= ${Dedup.contamBenchDocs}
       |    AND dd.doc_id NOT IN (SELECT doc_id FROM contam)),
       |trn AS (SELECT * FROM cln WHERE $bucket < ${graft.sample.Sampling.splitTrainPct})""".stripMargin
  }

  val funnelSql: String =
    s"""WITH $stageCtes
       |SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS name, count(*) AS n_docs,
       |  CAST(sum(len(${Portable.wordsSql})) AS BIGINT) AS n_tokens FROM documents
       |UNION ALL SELECT CAST(1 AS BIGINT), 'gated', count(*),
       |  CAST(coalesce(sum(tok), 0) AS BIGINT) FROM gated
       |UNION ALL SELECT CAST(2 AS BIGINT), 'deduped', count(*),
       |  CAST(coalesce(sum(tok), 0) AS BIGINT) FROM dd
       |UNION ALL SELECT CAST(3 AS BIGINT), 'clean', count(*),
       |  CAST(coalesce(sum(tok), 0) AS BIGINT) FROM cln
       |UNION ALL SELECT CAST(4 AS BIGINT), 'train', count(*),
       |  CAST(coalesce(sum(tok), 0) AS BIGINT) FROM trn""".stripMargin

  // ---- incremental curation (delta-only refresh) ---------------------------

  /** Incremental pipeline refresh — the run a production corpus does DAILY,
    * where pipe_curate is the run it does once: only the DELTA (docs above
    * the last-run watermark; here the top fifth of the id space stands in
    * for "arrived since") flows through gate → dedup → decontamination →
    * split, and cross-batch dedup consults the prior corpus only through
    * its normalized-key INDEX (in production a staged table the previous
    * run wrote — the same staged-band-index posture as dd_incremental).
    * Order inside the delta: intra-delta keeper window first, THEN the
    * index anti-join, so two new copies of the same doc can't both slip
    * past an index that predates them. Scale shape: the watermark predicate
    * is pushed to the scan (O(delta) read), the old side contributes one
    * key-projected distinct, and every join keys on the 128-bit norm hash —
    * the full-corpus text column never moves. Output: the delta's train
    * manifest, ready to append to the prior run's. */
  def incr(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.dedup.Dedup
    val base = graft.Tables(spark, sfDir).documents
    val cut = base.agg(max(col("doc_id"))).head().getLong(0) * 4 / 5
    def gate(df: DataFrame): DataFrame =
      graft.text.TextOps.withQualityCols(df)
        .filter(col("quality") >= qualityFloor && col("n_words") >= minWords)
        .select(col("doc_id"), col("source"),
          col("n_words").cast("long").as("tok"),
          md5(Dedup.normKey(col("text"))).as("nk"))
    val oldKeys = gate(base.filter(col("doc_id") < cut)).select(col("nk")).distinct()
    val delta = gate(base.filter(col("doc_id") >= cut))
    val intra = delta
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("nk"))))
      .filter(col("doc_id") === col("keep_id"))
    val fresh = intra.join(oldKeys, Seq("nk"), "left_anti")
    fresh.filter(col("doc_id") >= Dedup.contamBenchDocs)
      .join(broadcast(contamFrame(spark, sfDir)), Seq("doc_id"), "left_anti")
      .filter(splitBucket < graft.sample.Sampling.splitTrainPct)
      .select(col("doc_id"), col("source"), col("tok"))
  }

  val incrSql: String = {
    import graft.dedup.Dedup
    val normMd5 = s"md5(${Dedup.normKeySql})"
    val bucket = s"""${Portable.hash64Sql("CAST(doc_id AS VARCHAR)", "split")} % 100"""
    s"""WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
       |q AS (${graft.text.TextOps.qualitySql}),
       |g AS (
       |  SELECT d.doc_id, d.source, CAST(q.n_words AS BIGINT) AS tok, $normMd5 AS nk
       |  FROM documents d JOIN q ON q.doc_id = d.doc_id
       |  WHERE q.quality >= $qualityFloor AND q.n_words >= $minWords),
       |oldk AS (SELECT DISTINCT nk FROM g WHERE doc_id < (SELECT c FROM cut)),
       |delta AS (SELECT * FROM g WHERE doc_id >= (SELECT c FROM cut)),
       |dd AS (
       |  SELECT doc_id, source, tok, nk FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY nk) AS keep_id FROM delta) t
       |  WHERE doc_id = keep_id),
       |frs AS (SELECT * FROM dd WHERE nk NOT IN (SELECT nk FROM oldk)),
       |contam AS (SELECT DISTINCT doc_id FROM (${Dedup.contaminateSql}) c0),
       |cln AS (
       |  SELECT doc_id, source, tok FROM frs
       |  WHERE doc_id >= ${Dedup.contamBenchDocs}
       |    AND doc_id NOT IN (SELECT doc_id FROM contam))
       |SELECT doc_id, source, tok FROM cln
       |WHERE $bucket < ${graft.sample.Sampling.splitTrainPct}""".stripMargin
  }

  // ---- the production dedup pipeline end-to-end ----------------------------

  /** The dedup pipeline as ONE composed flow — what pipe_curate is to the
    * quality gates, this is to near-dup removal: minhash signatures → band
    * rows → bucket-min ownership edges → connected components → keep-BEST
    * survivor per cluster, over the WHOLE corpus (singletons survive as
    * their own cluster), producing the survivor manifest a training run
    * reads. Every stage is the already-verified operator composed as a
    * subtree, and the fat `text` column dies inside the scan projection:
    * [[graft.dedup.Dedup.shingleArrays]] folds it to hash arrays in the
    * scan stage and the signature expression folds those per-row, so the
    * (band, key) exchange — the pipeline's first shuffle — carries three
    * ints per row and nothing else (plan-pinned in DedupPipeSpec). The
    * quality join is doc_id-co-partitioned; the keep-best window rides the
    * component labels. At 100 TB: O(n·bands) edges (no per-bucket cap, no
    * pairwise blowup — the [[graft.dedup.Dedup.ownershipEdges]] contract),
    * one bounded component pass, one survivor row per doc. */
  def dedupPipe(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.dedup.Dedup
    val edges = Dedup.ownershipEdges(
      Dedup.bandRows(Dedup.shingleArrays(spark, sfDir)))
    val clu = Dedup.clustersOf(edges, spark, Dedup.smallGraphMaxEdges)
    val q = graft.text.TextOps.quality(spark, sfDir)
      .select(col("doc_id"), col("quality"))
    val members = q.join(clu, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    // the dd_keep_best move: argmax + count as one partial-aggregable
    // max_by agg — no cluster ever sorts in a single task
    members
      .groupBy(col("cluster_id"))
      .agg(
        max_by(struct(col("doc_id"), col("quality")),
          struct(col("quality"), (-col("doc_id")).as("nd"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("best.doc_id").as("keep_id"),
        col("best.quality").as("keep_quality"), col("n_members"))
  }

  val dedupPipeSql: String =
    s"""WITH RECURSIVE ${graft.dedup.Dedup.clusterChainCte},
       |clu AS (
       |  SELECT node AS doc_id, min(lbl) AS cluster_id
       |  FROM reach GROUP BY node),
       |qual AS (
       |  SELECT doc_id, quality
       |  FROM (${graft.text.TextOps.qualitySql.replace("\n", "\n  ")}) qq),
       |m AS (
       |  SELECT q.doc_id, coalesce(c.cluster_id, q.doc_id) AS cluster_id,
       |    q.quality
       |  FROM qual q LEFT JOIN clu c ON c.doc_id = q.doc_id)
       |SELECT cluster_id, keep_id, keep_quality, n_members FROM (
       |  SELECT cluster_id, doc_id AS keep_id, quality AS keep_quality,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_members,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY quality DESC, doc_id ASC) AS rk
       |  FROM m) t
       |WHERE rk = 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_curate" -> (curate _),
    "pipe_incr" -> (incr _),
    "pipe_dedup" -> (dedupPipe _),
    "pipe_funnel" -> (funnel _))

  def oracleSql: Map[String, String] = Map(
    "pipe_curate" -> curateSql,
    "pipe_incr" -> incrSql,
    "pipe_dedup" -> dedupPipeSql,
    "pipe_funnel" -> funnelSql)
}
