package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded-hamming candidate generation, shared by dd_simhash and mm_phash.
  *
  * Hamming ≤ `maxHamming` over a `bands`×`bandBits` signature means
  * (pigeonhole, for maxHamming < bands) at least one band is identical, so
  * candidate pairs come from an equi-join on (blocking keys, band index,
  * band value) — O(n·bands) exploded rows and a hash shuffle instead of a
  * blocked cross join; `bandBits`-bit band values keep per-bucket join work
  * bounded as the corpus grows. A pair sharing several bands would surface
  * once per band; crediting it only to its FIRST matching band keeps the
  * pipeline distinct-free (no second shuffle) and exactly-once.
  */
object Banding {

  /** Pairs within `maxHamming` of the long signature `sigCol`, blocked by
    * `keyCols` (pairs never cross a blocking key). Output: `id_a`, `id_b`
    * (from `idCol`, a < b), the a-side `keyCols`, `hamming`. */
  def hammingPairs(sigs: DataFrame, sigCol: String, idCol: String,
      keyCols: Seq[String], bands: Int, bandBits: Int, maxHamming: Int): DataFrame = {
    require(maxHamming < bands, "pigeonhole needs maxHamming < bands")
    val mask = (1L << bandBits) - 1
    val base = (keyCols :+ idCol :+ sigCol).map(col)
    val banded = sigs.select(base :+
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col(sigCol), bandBits * b).bitwiseAND(mask).as("bv"))
        }: _*)).as("bk"): _*)
      .select(base :+ col("bk.band").as("band") :+ col("bk.bv").as("bv"): _*)
      // Feeds both self-join sides. The caller owns the lifetime: the frame
      // is lazy, so unpersisting here would race the join's first execution.
      // Query harnesses (Bench/Verify) clearCache() after each query; a
      // long-lived session embedding this should do the same or unpersist
      // via spark.catalog once the join has materialized.
      .persist()
    val firstShared = coalesce((0 until bands).map { b =>
      when((shiftright(expr(s"a.$sigCol"), bandBits * b).bitwiseAND(mask) ===
            shiftright(expr(s"b.$sigCol"), bandBits * b).bitwiseAND(mask)), lit(b))
    }: _*)
    val cond = keyCols
      .map(k => col(s"a.$k") === col(s"b.$k"))
      .foldLeft(col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col(s"a.$idCol") < col(s"b.$idCol"))(_ && _)
    banded.as("a").join(banded.as("b"), cond)
      .withColumn("hamming",
        bit_count(expr(s"a.$sigCol").bitwiseXOR(expr(s"b.$sigCol"))))
      .filter(col("hamming") <= maxHamming && col("a.band") === firstShared)
      .select(col(s"a.$idCol").as("id_a") +: col(s"b.$idCol").as("id_b") +:
        keyCols.map(k => col(s"a.$k").as(k)) :+ col("hamming"): _*)
  }
}
