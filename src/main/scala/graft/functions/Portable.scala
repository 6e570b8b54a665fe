package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column builders for the dedup/similarity/text operators.
  *
  * `hash64` is the engine's portable hash: the first 15 hex digits of an MD5,
  * read as a 60-bit integer. It is reproducible in any SQL dialect
  * (DuckDB: `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`), keyed by a salt
  * prefix to derive independent hash functions for MinHash families. MD5 is
  * a codegen'd Catalyst expression, so the hot path stays in whole-stage
  * codegen (no UDFs).
  */
object Portable {

  def hash64(c: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), c)), 1, 15), 16, 10).cast("long")

  def hash64Sql(expr: String, salt: String = ""): String =
    s"CAST('0x' || substr(md5('$salt' || $expr), 1, 15) AS BIGINT)"

  /** Whitespace word array (lowercased, empty tokens dropped). */
  def words(c: Column): Column =
    filter(split(lower(c), "\\s+"), w => length(w) > 0)

  val wordsSql: String =
    "list_filter(string_split_regex(lower(text), '\\s+'), w -> length(w) > 0)"

  /** Distinct word k-shingles ("a b c") of a word-array column; docs shorter
    * than k words yield an empty set (mirrors the DuckDB `range` behavior). */
  def shingles(wordsCol: Column, k: Int = 3): Column =
    when(size(wordsCol) >= k,
      array_distinct(
        transform(
          sequence(lit(0), size(wordsCol) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(wordsCol, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Same shingling over a DuckDB list column named `w` (1-based lists). */
  def shinglesSql(k: Int = 3): String = {
    val parts = (0 until k).map(j => s"w[i + $j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, greatest(len(w) - ${k - 1}, 0) + 1), i -> $parts))"
  }

  /** Ordered-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Ordered-fold squared L2 distance of two double-array columns; callers
    * round before comparing (same addend-order caveat as [[dot]]). */
  def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** DuckDB squared L2 over double-list expressions. */
  def dist2Sql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> (p[1] - p[2]) * (p[1] - p[2])))"

  /** Cosine similarity; callers round before emitting (summation order
    * differs across engines at the 1e-16 level). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** DuckDB cosine over double-list expressions. */
  def cosineSql(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
       | (sqrt(list_sum(list_transform($a, x -> x * x))) *
       |  sqrt(list_sum(list_transform($b, x -> x * x)))))""".stripMargin
}
