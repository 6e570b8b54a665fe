package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter over the engine's md5-prefix hash — the join-
  * pruning pattern for 100 TB anti-joins: build a tiny filter over the
  * small side, broadcast it as a LITERAL (no join node), and let only
  * maybe-members reach the expensive exact join/shuffle. Deterministic by
  * construction (pure hash math, no RNG), so an oracle can replay the
  * identical filter in SQL and the maybe/actual verdicts hash-match —
  * unlike vendor bloom implementations, whose hash mixing is opaque.
  *
  * Layout: `words` longs × 63 usable bits each (the sign bit stays clear so
  * `1 << bit` never wraps on either engine); `numHashes` salted positions
  * per key.
  */
object BloomFilter {

  val words = 16
  val numHashes = 3
  val bitsTotal: Int = words * 63

  def salt(j: Int): String = s"bloom$j"

  private def pos(key: Column, j: Int, nWords: Int): Column =
    pmod(Portable.hash64(key, salt(j)), lit(nWords * 63L))

  /** Build the filter from the key column of a (small) DataFrame: an eager
    * `nWords`-element long array (size the filter to the dim: ~9.6 bits/key
    * for 1% FP at 3 hashes). The build is a job over the dim side only
    * — the same cost class as computing a broadcast join's build side. */
  def build(dim: DataFrame, key: Column, nWords: Int = words): Array[Long] = {
    val positions = (0 until numHashes).map(j => pos(key, j, nWords))
    val agg = dim.select(explode(array(positions: _*)).as("p"))
      .select((col("p") / 63).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("p") % 63).cast("int")).as("mask"))
      .groupBy(col("word"))
      .agg(call_function("bit_or", col("mask")).as("bits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until nWords).map(w => agg.getOrElse(w, 0L)).toArray
  }

  /** Probe predicate: true iff every salted position's bit is set — the
    * "maybe member" verdict. The filter rides as a literal array; zero
    * join nodes, pure codegen'd column math per probed row. */
  def mayContain(key: Column, filter: Array[Long]): Column = {
    val lits = typedLit(filter.toSeq)
    (0 until numHashes).map { j =>
      val p = pos(key, j, filter.length)
      val word = (p / 63).cast("int")
      val bit = (p % 63).cast("int")
      call_function("shiftright", element_at(lits, word + 1), bit)
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** The same probe in DuckDB SQL against a CTE `bloom(word, bits)`. */
  def mayContainSql(keyExpr: String): String =
    (0 until numHashes).map { j =>
      val p = s"(${Portable.hash64Sql(keyExpr, salt(j))} % $bitsTotal)"
      s"""(coalesce((SELECT bits FROM bloom WHERE word = $p // 63), 0)
         |    >> CAST($p % 63 AS INTEGER)) & 1 = 1""".stripMargin
    }.mkString("(", "\n  AND ", ")")

  /** The filter-build in DuckDB SQL: a CTE `bloom(word, bits)` over a keys
    * CTE exposing `keyExpr` rows. */
  def buildSql(keysCte: String, keyExpr: String): String = {
    val posUnion = (0 until numHashes).map { j =>
      s"SELECT (${Portable.hash64Sql(keyExpr, salt(j))} % $bitsTotal) AS pos FROM $keysCte"
    }.mkString("\n    UNION ALL\n    ")
    s"""bloom(word, bits) AS (
       |  SELECT pos // 63 AS word,
       |    bit_or(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS bits
       |  FROM (
       |    $posUnion) GROUP BY 1)""".stripMargin
  }
}
