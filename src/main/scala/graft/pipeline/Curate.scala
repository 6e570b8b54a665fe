package graft.pipeline

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Survivor manifest: gated, deduped, decontaminated train-split docs
    * with their per-source pack bin. */
  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.dedup.Dedup
    // 1. retention gate (quality + length floors) — a PROJECTION riding the
    //    scan (withQualityCols), so no verdict table is joined back
    // n_words is carried through as the token count — stage 5 must not
    // re-run the word split the gate already paid for
    val gated = graft.text.TextOps.withQualityCols(
        graft.Tables(spark, sfDir).documents)
      .filter(col("quality") >= qualityFloor && col("n_words") >= minWords)
      .select(col("doc_id"), col("text"), col("source"),
        col("n_words").cast("long").as("tok"))
    // 2. normalized-exact keeper over the GATED corpus (dedup after
    //    filtering — the cheap gate shrinks what the dedup shuffle carries)
    val w = Window.partitionBy(md5(Dedup.normKey(col("text"))))
    val deduped = gated.withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
    // 3. decontamination: drop the benchmark docs themselves and every
    //    training doc sharing n-grams with one (broadcast anti-join —
    //    the contaminated set is bounded by the benchmark's reach)
    val contam = Dedup.contaminate(spark, sfDir).select(col("doc_id")).distinct()
    val clean = deduped.filter(col("doc_id") >= Dedup.contamBenchDocs)
      .join(broadcast(contam), Seq("doc_id"), "left_anti")
    // 4. reproducible split: keep the train bucket (pure hash of doc_id —
    //    no seed, no shuffle, stable under corpus growth)
    val bucket = pmod(Portable.hash64(col("doc_id").cast("string"), salt = "split"), lit(100L))
    val train = clean.filter(bucket < graft.sample.Sampling.splitTrainPct)
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

  val curateSql: String = {
    import graft.dedup.Dedup
    val normMd5 = s"md5(${Dedup.normKeySql})"
    val bucket = s"""${Portable.hash64Sql("CAST(doc_id AS VARCHAR)", "split")} % 100"""
    s"""WITH q AS (${graft.text.TextOps.qualitySql}),
       |gated AS (
       |  SELECT d.doc_id, d.text, d.source FROM documents d
       |  JOIN q ON q.doc_id = d.doc_id
       |  WHERE q.quality >= $qualityFloor AND q.n_words >= $minWords),
       |dd AS (
       |  SELECT doc_id, text, source FROM (
       |    SELECT doc_id, text, source,
       |      min(doc_id) OVER (PARTITION BY $normMd5) AS keep_id
       |    FROM gated) n
       |  WHERE doc_id = keep_id),
       |contam AS (SELECT DISTINCT doc_id FROM (${Dedup.contaminateSql}) c0),
       |cln AS (
       |  SELECT dd.doc_id, dd.text, dd.source FROM dd
       |  WHERE dd.doc_id >= ${Dedup.contamBenchDocs}
       |    AND dd.doc_id NOT IN (SELECT doc_id FROM contam)),
       |trn AS (SELECT * FROM cln WHERE $bucket < ${graft.sample.Sampling.splitTrainPct}),
       |toks AS (
       |  SELECT doc_id, source, CAST(len(${Portable.wordsSql}) AS BIGINT) AS tok
       |  FROM trn),
       |c AS (
       |  SELECT doc_id, source, tok,
       |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM toks)
       |SELECT doc_id, source, tok,
       |  CAST((cum - tok) // ${graft.text.TextOps.packBudget} AS BIGINT) AS bin
       |FROM c""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_curate" -> (curate _))

  def oracleSql: Map[String, String] = Map(
    "pipe_curate" -> curateSql)
}
