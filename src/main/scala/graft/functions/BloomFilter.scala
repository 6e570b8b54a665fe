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

  /** Kirsch–Mitzenmacher double hashing: ONE md5 per key yields two
    * independent 60-bit halves (hex chars 1–15 and 17–31), and position j
    * is (h1 + j·h2) mod m — the k salted-md5 scheme cost k digests per
    * PROBED ROW, the dominant term of the whole bloom-pruned join at
    * 100 TB (measured 3× the probe cost at k=3); K–M provably preserves
    * the FP asymptotics (Kirsch & Mitzenmacher, ESA'06). h1 + j·h2 stays
    * below 2^63 for j ≤ 4 — no wrap on either engine. Codegen
    * subexpression elimination computes the shared md5 once per row. */
  private def halves(key: Column): (Column, Column) = {
    val hex = md5(concat(lit("bloomKM:"), key))
    (conv(substring(hex, 1, 15), 16, 10).cast("long"),
      conv(substring(hex, 17, 15), 16, 10).cast("long"))
  }

  private def pos(key: Column, j: Int, nWords: Int): Column = {
    val (h1, h2) = halves(key)
    pmod(h1 + lit(j.toLong) * h2, lit(nWords * 63L))
  }

  private def posSql(keyExpr: String, j: Int, bits: Long): String = {
    val h1 = s"CAST('0x' || substr(md5('bloomKM:' || $keyExpr), 1, 15) AS BIGINT)"
    val h2 = s"CAST('0x' || substr(md5('bloomKM:' || $keyExpr), 17, 15) AS BIGINT)"
    s"(($h1 + $j * $h2) % $bits)"
  }

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

  /** The per-key digest to probe with — materialize it ONCE per row with
    * `withColumn` before filtering on [[mayContainHex]]: Catalyst does not
    * common-subexpression-eliminate across a Filter's conjuncts, so a
    * probe built inline recomputes the md5 per hash function (measured
    * ~1.6× the whole query). */
  def keyHex(key: Column): Column = md5(concat(lit("bloomKM:"), key))

  /** Probe predicate over a pre-materialized [[keyHex]] column: true iff
    * every derived position's bit is set — the "maybe member" verdict. The
    * filter rides as a literal array; zero join nodes, one digest plus
    * pure integer math per probed row. */
  def mayContainHex(hex: Column, filter: Array[Long]): Column = {
    val lits = typedLit(filter.toSeq)
    val h1 = conv(substring(hex, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(hex, 17, 15), 16, 10).cast("long")
    (0 until numHashes).map { j =>
      val p = pmod(h1 + lit(j.toLong) * h2, lit(filter.length * 63L))
      val word = (p / 63).cast("int")
      val bit = (p % 63).cast("int")
      call_function("shiftright", element_at(lits, word + 1), bit)
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** The production probe: the fused [[graft.plans.BloomProbe]] expression
    * — one digest per row (the column formulation re-digests per conjunct
    * after predicate pushdown inlining; see BloomProbe's doc). Spec'd
    * bit-equal to [[mayContainHex]]. */
  def mayContain(key: Column, filter: Array[Long]): Column =
    graft.plans.BloomProbe(key, filter, numHashes)

  /** The same probe in DuckDB SQL against a CTE `bloom(word, bits)`. */
  def mayContainSql(keyExpr: String): String =
    (0 until numHashes).map { j =>
      val p = posSql(keyExpr, j, bitsTotal)
      s"""(coalesce((SELECT bits FROM bloom WHERE word = $p // 63), 0)
         |    >> CAST($p % 63 AS INTEGER)) & 1 = 1""".stripMargin
    }.mkString("(", "\n  AND ", ")")

  /** The filter-build in DuckDB SQL: a CTE `bloom(word, bits)` over a keys
    * CTE exposing `keyExpr` rows. */
  def buildSql(keysCte: String, keyExpr: String): String = {
    val posUnion = (0 until numHashes).map { j =>
      s"SELECT ${posSql(keyExpr, j, bitsTotal)} AS pos FROM $keysCte"
    }.mkString("\n    UNION ALL\n    ")
    s"""bloom(word, bits) AS (
       |  SELECT pos // 63 AS word,
       |    bit_or(1::BIGINT << CAST(pos % 63 AS INTEGER)) AS bits
       |  FROM (
       |    $posUnion) GROUP BY 1)""".stripMargin
  }
}
