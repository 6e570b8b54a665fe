package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy join (entity resolution) via the deletion-
  * neighborhood index — the published SymSpell/FastSS construction: for
  * distance ≤ 1 between a length-L and a length-(L-1) string, match iff
  * the short string EQUALS one of the long string's single-char deletion
  * variants. The index is linear (L variants per canonical row, tiny
  * equi-join buckets keyed by full variant strings) — no prefix blocking
  * with hot buckets, no O(n²) candidate pass; the classic scale answer
  * for typo-tolerant joins at corpus size.
  *
  * Fixture: every 5th customer name gets one digit deleted at a
  * key-derived position; the join recovers ALL canonical names within
  * edit distance 1 (several — deleting a digit from a zero-run makes the
  * dirty string reachable from multiple canonical keys), which is the
  * realistic ER ambiguity the match count surfaces.
  */
object FuzzyJoin {

  /** One row per dirty record: how many canonical rows are within edit
    * distance 1, and the smallest such key (deterministic resolution). */
  def fuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val canon = Tables(spark, sfDir).customer
      .select(col("c_custkey").as("ck"), col("c_name").as("cname"))
    // dirty side: delete the char at a key-derived digit position (1-based
    // 10..18 of "Customer#NNNNNNNNN")
    val dirty = canon.filter(col("ck") % 5 === 0)
      .withColumn("p", (col("ck") % 9 + 10).cast("int"))
      .select(col("ck").as("dk"),
        concat(expr("substring(cname, 1, p - 1)"),
          expr("substring(cname, p + 1, length(cname))")).as("dname"))
    // deletion-neighborhood index: all distinct 1-deletion variants.
    // r10 OPT (guide §2.4, project-before-exchange): the r9 form carried
    // the full `cname` through the distinct's exchange and the join just
    // to re-check `levenshtein(dname, cname) = 1` — a belt that is
    // PROVABLY always true on this join's rows: dname = v is cname with
    // exactly one char deleted, so length(dname) = length(cname) − 1
    // (distance ≥ 1, never 0) and one insertion reconstructs cname
    // (distance ≤ 1). Dropping cname narrows the distinct's shuffle rows
    // by the name width and removes a per-row levenshtein; output is
    // value-identical (the aggregate never reads cname).
    val variants = canon
      .select(col("ck"), col("cname"),
        explode(sequence(lit(1), length(col("cname")))).as("pos"))
      .select(col("ck"),
        concat(expr("substring(cname, 1, pos - 1)"),
          expr("substring(cname, pos + 1, length(cname))")).as("v"))
      .distinct()
    dirty.join(variants, col("dname") === col("v"))
      .groupBy(col("dk"), col("dname"))
      .agg(count(lit(1)).as("n_matches"), min(col("ck")).as("best_ck"))
  }

  /** The same construction relationally in DuckDB (not a transcript). */
  val fuzzyJoinSql: String =
    """WITH canon AS (
      |  SELECT c_custkey AS ck, c_name AS cname FROM customer),
      |dirty AS (
      |  SELECT ck AS dk,
      |    substr(cname, 1, CAST(ck % 9 + 10 AS INTEGER) - 1)
      |      || substr(cname, CAST(ck % 9 + 10 AS INTEGER) + 1) AS dname
      |  FROM canon WHERE ck % 5 = 0),
      |variants AS (
      |  SELECT DISTINCT ck, cname,
      |    substr(cname, 1, CAST(pos AS INTEGER) - 1)
      |      || substr(cname, CAST(pos AS INTEGER) + 1) AS v
      |  FROM canon, LATERAL unnest(range(1, length(cname) + 1)) t(pos))
      |SELECT CAST(dk AS BIGINT) AS dk, dname,
      |  CAST(count(*) AS BIGINT) AS n_matches,
      |  CAST(min(ck) AS BIGINT) AS best_ck
      |FROM dirty JOIN variants ON dname = v
      |WHERE levenshtein(dname, cname) = 1
      |GROUP BY dk, dname""".stripMargin
}
