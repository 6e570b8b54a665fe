package graft.sim

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (SURVEY §2d) + embedding near-dup
  * (§2c #26).
  *
  * Cosines are ordered folds over double arrays; outputs are rounded to 6dp
  * because engine summation order differs at the 1e-16 level. Scale shapes:
  *  - brute force: query set broadcast against the corpus scan — O(n·q) map
  *    work, one shuffle for the per-query top-k (partial top-k per
  *    partition via window over a small rank domain).
  *  - LSH: 4 anchor hyperplanes → 16 sign buckets; candidates only join
  *    within a bucket. Anchors are corpus rows (deterministic, portable);
  *    production swaps in learned/random hyperplanes + multi-probe.
  */
object Similarity {

  private def emb(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    // norms once per row; every cosine is then one VectorDot + one divide
    base.withColumn("nrm", sqrt(graft.plans.VectorDot(col("v"), col("v"))))
  }

  private val embCte: String =
    "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  val numAnchors = 4

  /** Sign-pattern bucket of `v` against the first 4 corpus vectors. */
  private def bucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val anchors = e.filter(col("vec_id") < numAnchors)
      .select(col("vec_id").as("aid"), col("v").as("av"))
    e.crossJoin(broadcast(anchors))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(when(graft.plans.VectorDot(col("v"), col("av")) > 0,
        pow(lit(2.0), col("aid")).cast("long")).otherwise(0L)).as("bucket"))
  }

  private val bucketedCte: String =
    s"""anchors AS (SELECT vec_id AS aid, v AS av FROM e WHERE vec_id < $numAnchors),
       |buckets AS (
       |  SELECT e.vec_id, e.label,
       |    sum(CASE WHEN ${Portable.cosineSql("e.v", "av")} > 0
       |      THEN CAST(2 ** aid AS BIGINT) ELSE 0 END) AS bucket
       |  FROM e CROSS JOIN anchors GROUP BY 1, 2)""".stripMargin

  // NB: bucket sign uses cosine (not raw dot) on the SQL side and dot on the
  // Spark side — identical signs since norms are positive. Kept as cosine in
  // SQL to reuse the helper.

  // ---- #27 brute-force top-k ----------------------------------------------

  val topK = 5
  val numQueries = 10

  def bruteTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val q = e.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        round(graft.plans.VectorDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  val bruteTopKSql: String =
    s"""WITH $embCte,
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT qid, e.vec_id AS cand,
       |    round(${Portable.cosineSql("e.v", "qv")}, 6) AS cos
       |  FROM e CROSS JOIN q WHERE e.vec_id <> qid)
       |SELECT qid, cand, cos, rank FROM (
       |  SELECT qid, cand, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand ASC) AS rank
       |  FROM scored) t
       |WHERE rank <= $topK""".stripMargin

  // ---- #28 LSH-bucketed top-k ---------------------------------------------

  def lshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val b = bucketed(spark, sfDir).select(col("vec_id"), col("bucket"))
    val eb = e.join(b, "vec_id").persist() // feeds query side + candidate side
    val q = eb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        col("bucket").as("qb"))
    val scored = eb.join(broadcast(q),
        col("bucket") === col("qb") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        round(graft.plans.VectorDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
  }

  val lshTopKSql: String =
    s"""WITH $embCte,
       |$bucketedCte,
       |eb AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b ON e.vec_id = b.vec_id),
       |q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM eb WHERE vec_id < $numQueries),
       |scored AS (
       |  SELECT qid, eb.vec_id AS cand,
       |    round(${Portable.cosineSql("eb.v", "qv")}, 6) AS cos
       |  FROM eb JOIN q ON eb.bucket = qb AND eb.vec_id <> qid)
       |SELECT qid, cand, cos, rank FROM (
       |  SELECT qid, cand, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand ASC) AS rank
       |  FROM scored) t
       |WHERE rank <= 3""".stripMargin

  // ---- #26 embedding-cosine near-dup (bucketed self-join) -----------------

  def embedNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val b = bucketed(spark, sfDir).select(col("vec_id"), col("bucket"))
    val eb = e.join(b, "vec_id").select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
      .persist() // both self-join sides
    eb.as("a").join(eb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(graft.plans.VectorDot(col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .filter(col("cos") >= 0.3)
  }

  val embedNearDupSql: String =
    s"""WITH $embCte,
       |$bucketedCte,
       |eb AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b ON e.vec_id = b.vec_id)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${Portable.cosineSql("a.v", "b.v")}, 6) AS cos
       |FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE round(${Portable.cosineSql("a.v", "b.v")}, 6) >= 0.3""".stripMargin

  // ---- IVF-style ANN: coarse quantize to centroids, probe nearest lists ---

  val nprobe = 2

  /** IVF coarse-quantizer size: a CONSTANT independent of corpus size, so
    * centroid assignment stays O(n·K) — real IVF trains K=Θ(√n_target)
    * centroids once and holds them fixed as the corpus grows; deriving
    * centroid count from the corpus (e.g. every 50th row) would make
    * assignment O(n²/50), asymptotically worse than brute force. */
  val numCentroids = 32

  /** IVF without the training step: the first `numCentroids` corpus vectors
    * serve as centroids ("trained" centroids drop in identically). Vectors
    * are assigned to their max-cosine centroid (one shuffle on cluster_id);
    * queries probe the `nprobe` nearest centroid lists only — the candidate
    * set shrinks by ~n_clusters/nprobe vs brute force, the classic
    * recall/throughput dial. */
  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val cents = e.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val simToCent = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        round(graft.plans.VectorDot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 6)
          .as("ccos"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid").asc)
    val lists = simToCent.withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid")).persist()
    // probe assignment depends only on the query row itself — recompute it
    // on just the `numQueries` rows instead of re-running the corpus-wide
    // assignment window a second time
    val probes = e.filter(col("vec_id") < numQueries).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        round(graft.plans.VectorDot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 6)
          .as("ccos"))
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid").as("pcid"))
    val q = lists.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
      .join(probes, "qid")
    val scored = lists.join(broadcast(q),
        col("cid") === col("pcid") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        round(graft.plans.VectorDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6)
          .as("cos"))
    val wRank = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cand").asc)
    scored.withColumn("rank", row_number().over(wRank)).filter(col("rank") <= 3)
  }

  val ivfTopKSql: String =
    s"""WITH $embCte,
       |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $numCentroids),
       |sims AS (
       |  SELECT e.vec_id, cid,
       |    round(${Portable.cosineSql("e.v", "cv")}, 6) AS ccos
       |  FROM e CROSS JOIN cents),
       |assigned AS (
       |  SELECT vec_id, cid, ccos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS crn
       |  FROM sims),
       |lists AS (
       |  SELECT a.vec_id, e.v, a.cid FROM assigned a JOIN e ON a.vec_id = e.vec_id
       |  WHERE a.crn = 1),
       |probes AS (
       |  SELECT vec_id AS qid, cid AS pcid FROM assigned
       |  WHERE vec_id < $numQueries AND crn <= $nprobe),
       |q AS (
       |  SELECT l.vec_id AS qid, l.v AS qv, p.pcid
       |  FROM lists l JOIN probes p ON l.vec_id = p.qid
       |  WHERE l.vec_id < $numQueries),
       |scored AS (
       |  SELECT q.qid, l.vec_id AS cand,
       |    round(${Portable.cosineSql("l.v", "qv")}, 6) AS cos
       |  FROM lists l JOIN q ON l.cid = q.pcid AND l.vec_id <> q.qid)
       |SELECT qid, cand, cos, rank FROM (
       |  SELECT qid, cand, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cand ASC) AS rank
       |  FROM scored) t
       |WHERE rank <= 3""".stripMargin

  // ---- kNN join: every vector → its top-3 bucket neighbors ----------------

  /** Full kNN self-join (the "link every training example to its nearest
    * neighbors" pass used for near-dup audit and hard-negative mining):
    * candidates bounded per LSH bucket, so work is O(Σ bucket²), never
    * O(n²); the per-key top-k is a window over the bucket-join output.
    * At planet scale the bucket key is the shuffle key and AQE absorbs
    * bucket skew — same contract as dd_embed. */
  def knnJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val b = bucketed(spark, sfDir).select(col("vec_id"), col("bucket"))
    val eb = e.join(b, "vec_id").select(col("vec_id"), col("v"), col("nrm"), col("bucket"))
      .persist() // both self-join sides
    val w = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("nbr").asc)
    eb.as("a").join(eb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("id"), col("b.vec_id").as("nbr"),
        round(graft.plans.VectorDot(col("a.v"), col("b.v"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  val knnJoinSql: String =
    s"""WITH $embCte,
       |$bucketedCte,
       |eb AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b ON e.vec_id = b.vec_id),
       |scored AS (
       |  SELECT a.vec_id AS id, b.vec_id AS nbr,
       |    round(${Portable.cosineSql("a.v", "b.v")}, 6) AS cos
       |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
       |SELECT id, nbr, cos, rank FROM (
       |  SELECT id, nbr, cos,
       |    row_number() OVER (PARTITION BY id ORDER BY cos DESC, nbr ASC) AS rank
       |  FROM scored) t
       |WHERE rank <= 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute_topk" -> (bruteTopK _),
    "ann_lsh_topk" -> (lshTopK _),
    "ann_ivf_topk" -> (ivfTopK _),
    "ann_knn_join" -> (knnJoin _),
    "dd_embed" -> (embedNearDup _))

  def oracleSql: Map[String, String] = Map(
    "ann_brute_topk" -> bruteTopKSql,
    "ann_lsh_topk" -> lshTopKSql,
    "ann_ivf_topk" -> ivfTopKSql,
    "ann_knn_join" -> knnJoinSql,
    "dd_embed" -> embedNearDupSql)
}
