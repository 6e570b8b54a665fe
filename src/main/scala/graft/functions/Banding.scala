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

  /** Spanning-subset edge generator for CONNECTED-COMPONENT consumers of
    * [[hammingPairs]] — same components, without materializing the
    * quadratic pair list.
    *
    * On a replicated corpus the exact pair list grows as O(Σ g²) in
    * duplicate-group size g while the component answer grows linearly, so
    * a consumer that only wants clusters should never route through the
    * pairs. This emits a verified spanning subset instead:
    *
    *  1. STAR edges: within each (keyCols, band, band-value) bucket, every
    *     member pairs with the bucket's min-id member, kept only when the
    *     pair genuinely verifies (`hamming ≤ maxHamming`) — O(n·bands)
    *     candidate edges, each checked by per-row column math.
    *  2. FALLBACK: a bucket member that FAILS verification against the
    *     bucket min (sharing one exact band does not bound total hamming)
    *     is re-paired against EVERY other member of that bucket, keeping
    *     the verified ones. Failures must pair against all members — not
    *     just other failures — because a failure F and a success S can be
    *     a true pair (hamming(F,S) ≤ maxHamming) while F–min fails and
    *     S–min verifies; pairing failures only among themselves would
    *     silently split that component.
    *
    * Component-equality argument (vs the full [[hammingPairs]] graph):
    * every emitted edge verifies hamming ≤ maxHamming and shares a bucket
    * ⇒ edge set ⊆ true pair set. Conversely, any true pair (x, y) shares
    * ≥1 bucket (pigeonhole) with min m: if m ∈ {x, y} the star edge IS
    * (x, y); else if both verify against m, x–m–y connects them; else the
    * failing side re-pairs against the whole bucket, producing (x, y)
    * directly. So reachability — and therefore components and min-labels —
    * is identical. Cost: O(n·bands) star work + fallback work bounded by
    * (failures × bucket size) ≤ the full pairwise join, and ≈ 0 exactly on
    * the replicated corpora where the pair list blows up (near-identical
    * members all verify against the min). */
  def hammingStarEdges(sigs: DataFrame, sigCol: String, idCol: String,
      keyCols: Seq[String], bands: Int, bandBits: Int, maxHamming: Int): DataFrame = {
    require(maxHamming < bands, "pigeonhole needs maxHamming < bands")
    val mask = (1L << bandBits) - 1
    val base = (keyCols :+ idCol :+ sigCol).map(col)
    val bucketKeys = keyCols.map(col) :+ col("band") :+ col("bv")
    val banded = sigs.select(base :+
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col(sigCol), bandBits * b).bitwiseAND(mask).as("bv"))
        }: _*)).as("bk"): _*)
      .select(base :+ col("bk.band").as("band") :+ col("bk.bv").as("bv"): _*)
    // bucket min id + its signature in ONE window pass (min over a struct
    // orders by the leading id field); the window partitions on exactly the
    // bucket key, so this is the one (keys, band, bv) exchange of the whole
    // generator and the fallback join below reuses its partitioning
    val w = org.apache.spark.sql.expressions.Window.partitionBy(bucketKeys: _*)
    val withOwn = banded
      .withColumn("own", min(struct(col(idCol), col(sigCol))).over(w))
      .withColumn("own_id", col(s"own.$idCol"))
      .withColumn("own_sig", col(s"own.$sigCol"))
      .drop("own")
      .filter(col(idCol) =!= col("own_id"))
      .withColumn("own_ok",
        bit_count(col(sigCol).bitwiseXOR(col("own_sig"))) <= maxHamming)
      // feeds the star projection AND both fallback join sides
      .persist()
    val star = withOwn.filter(col("own_ok"))
      .select(col("own_id").as("id_a"), col(idCol).as("id_b"))
    val fails = withOwn.filter(!col("own_ok"))
    val failCond = keyCols
      .map(k => col(s"f.$k") === col(s"m.$k"))
      .foldLeft(col("f.band") === col("m.band") && col("f.bv") === col("m.bv") &&
        col(s"f.$idCol") =!= col(s"m.$idCol"))(_ && _)
    val fallback = fails.as("f").join(withOwn.as("m"), failCond)
      .filter(bit_count(col(s"f.$sigCol").bitwiseXOR(col(s"m.$sigCol"))) <= maxHamming)
      .select(least(col(s"f.$idCol"), col(s"m.$idCol")).as("id_a"),
        greatest(col(s"f.$idCol"), col(s"m.$idCol")).as("id_b"))
    star.union(fallback).distinct()
  }
}
