package graft.dedup

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` (SURVEY §2c) — the operators a
  * training-data pipeline runs at 100 TB.
  *
  * Scale shapes:
  *  - exact: one hash shuffle, map-side partial agg.
  *  - n-gram Jaccard: inverted index (explode shingle → equi-join) instead of
  *    an O(n²) self-join; the shingle hash is the shuffle key, AQE absorbs
  *    hot-shingle skew.
  *  - MinHash+LSH: signatures are per-row column math (no shuffle); only the
  *    8 band keys are exploded and joined — candidate generation cost is
  *    O(n·bands), never O(n²).
  *  - SimHash: 16 partial-agg bit votes per doc; pairing blocked by `lang`
  *    (swap in band-buckets of the simhash itself for planet-scale corpora).
  */
object Dedup {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).documents

  // ---- #22 exact dedup ----------------------------------------------------

  def exact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val exactSql: String =
    """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // ---- #23 n-gram Jaccard via inverted index ------------------------------

  private def shingled(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), Portable.shingles(Portable.words(col("text"))).as("sh"))

  private val shingledCte: String =
    s"""sh0 AS (SELECT doc_id, ${Portable.wordsSql} AS w FROM documents),
       |shd AS (SELECT doc_id, ${Portable.shinglesSql()} AS sh FROM sh0)""".stripMargin

  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingled(spark, sfDir)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "sa"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "sb"), "id_b")
      .withColumn("jaccard", round(col("inter") / (col("sa") + col("sb") - col("inter")), 6))
      .filter(col("jaccard") >= 0.12)
      .select(col("id_a"), col("id_b"), col("inter"), col("sa"), col("sb"), col("jaccard"))
  }

  val ngramJaccardSql: String =
    s"""WITH $shingledCte,
       |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shd),
       |inv AS (SELECT doc_id, unnest(sh) AS s FROM shd),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, inter, sa.n_sh AS sa, sb.n_sh AS sb,
       |  round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b
       |WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 6) >= 0.12""".stripMargin

  // ---- #24 MinHash + LSH banding ------------------------------------------

  val numHashes = 16
  val bandSize = 2 // 8 bands of 2 → candidates at jaccard ≳ 0.2

  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingled(spark, sfDir).filter(size(col("sh")) > 0)
    val sigs = sh.select(
      col("doc_id") +: (0 until numHashes).map(i =>
        array_min(transform(col("sh"), s => Portable.hash64(s, s"mh$i"))).as(s"mh$i")): _*)
    val bands = sigs.select(col("doc_id"), explode(array(
      (0 until numHashes / bandSize).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  val minhashLshSql: String = {
    val mhCols = (0 until numHashes).map(i =>
      s"list_min(list_transform(sh, s -> ${Portable.hash64Sql("s", s"mh$i")})) AS mh$i").mkString(",\n    ")
    val bandRows = (0 until numHashes / bandSize).map(b =>
      s"($b, mh${2 * b} || '_' || mh${2 * b + 1})").mkString(", ")
    s"""WITH $shingledCte,
       |sigs AS (
       |  SELECT doc_id,
       |    $mhCols
       |  FROM shd WHERE len(sh) > 0),
       |bands AS (
       |  SELECT doc_id, b.* FROM sigs, LATERAL (VALUES $bandRows) b(band, key))
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id""".stripMargin
  }

  // ---- #25 SimHash + hamming ----------------------------------------------

  val simBits = 16

  /** Per-doc 16-bit SimHash: one partial-aggregable sum per bit (majority
    * vote of each word-hash bit), assembled into an int. */
  def simhashSigs(spark: SparkSession, sfDir: String): DataFrame = {
    val wordsTable = docs(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(Portable.words(col("text")))).as("word"))
      .withColumn("h", Portable.hash64(col("word"), "sh"))
    val votes = (0 until simBits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j"))
    val sig = (0 until simBits).map(j =>
      when(col(s"v$j") > 0, 1L << j).otherwise(0L)).reduce(_ + _)
    wordsTable.groupBy(col("doc_id"), col("lang"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), col("lang"), sig.as("simhash"))
  }

  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = simhashSigs(spark, sfDir)
    sigs.as("a").join(sigs.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(expr("a.simhash").bitwiseXOR(expr("b.simhash"))))
      .filter(col("hamming") <= 3)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.lang").as("lang"), col("hamming"))
  }

  val simhashSql: String = {
    val votes = (0 until simBits).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(",\n    ")
    val sig = (0 until simBits).map(j =>
      s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH wt AS (
       |  SELECT doc_id, lang,
       |    ${Portable.hash64Sql("word", "sh")} AS h
       |  FROM (SELECT doc_id, lang,
       |          unnest(list_distinct(${Portable.wordsSql})) AS word
       |        FROM documents)),
       |votes AS (
       |  SELECT doc_id, lang,
       |    $votes
       |  FROM wt GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, lang, $sig AS simhash FROM votes)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang AS lang,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM sigs a JOIN sigs b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> (exact _),
    "dd_ngram_jacc" -> (ngramJaccard _),
    "dd_minhash" -> (minhashLsh _),
    "dd_simhash" -> (simhash _))

  def oracleSql: Map[String, String] = Map(
    "dd_exact" -> exactSql,
    "dd_ngram_jacc" -> ngramJaccardSql,
    "dd_minhash" -> minhashLshSql,
    "dd_simhash" -> simhashSql)
}
