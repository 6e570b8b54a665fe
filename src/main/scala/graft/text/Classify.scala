package graft.text

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Linear text-classifier INFERENCE (the fastText-shaped quality/topic
  * filter every LLM data pipeline runs over its corpus): hashed
  * bag-of-words features → broadcast weight-vector join → per-document
  * score and label.
  *
  * The inference shape at 100 TB: per-row feature hashing (codegen'd
  * column math), the model as a BROADCAST dim (weight tables are KB-MB —
  * never shuffle the corpus against a model), and ONE partial-agg shuffle
  * on doc_id for the score sum. Weights here are a deterministic dim
  * (`(b·37) mod 21 − 10` milli-units over 64 buckets, bias +3) so the
  * oracle can rebuild the identical model relationally — a trained model
  * drops in as a real table with zero plan change. All score arithmetic
  * is exact BIGINT milli-units: both engines fold identically in any
  * order. */
object Classify {

  val buckets = 64
  val biasMilli = 3L

  def classify(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = Tables(spark, sfDir).documents
      .select(col("doc_id"), explode(Portable.words(col("text"))).as("word"))
      .select(col("doc_id"),
        pmod(Portable.hash64(col("word"), "clf"), lit(buckets.toLong)).as("b"))
    val weights = spark.range(buckets)
      .select(col("id").as("b"), ((col("id") * 37) % 21 - 10).as("w"))
    feats.join(broadcast(weights), "b")
      .groupBy(col("doc_id")).agg(sum(col("w")).as("s"))
      .select(col("doc_id"),
        (col("s") + biasMilli).as("score_milli"),
        (col("s") + biasMilli >= 0).as("label"))
  }

  val classifySql: String =
    s"""WITH wl AS (
       |  SELECT doc_id, unnest(${Portable.wordsSql}) AS word FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    ${Portable.hash64Sql("word", "clf")} % $buckets AS b
       |  FROM wl),
       |wt AS (SELECT b, (b * 37) % 21 - 10 AS w FROM range(0, $buckets) t(b)),
       |s AS (
       |  SELECT doc_id, sum(f2.w) AS sc
       |  FROM f JOIN wt f2 USING (b) GROUP BY doc_id)
       |SELECT doc_id, CAST(sc + $biasMilli AS BIGINT) AS score_milli,
       |  (sc + $biasMilli) >= 0 AS label
       |FROM s""".stripMargin
}
