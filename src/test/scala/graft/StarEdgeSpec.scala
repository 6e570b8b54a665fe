package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-7 spanning-subset contracts: component consumers must get
  * EXACTLY the components of the full candidate graph without ever
  * materializing the quadratic pair list.
  *
  *  - [[graft.functions.Banding.hammingStarEdges]]: verified bucket-min
  *    stars + failure re-pairing ≡ the full banded-hamming pair graph.
  *  - [[graft.dedup.Dedup.ownershipEdges]]: uncapped bucket-min stars ≡
  *    the uncapped LSH clique graph — i.e. NO cap-induced recall loss for
  *    dd_clusters/dd_keep_best/dd_incremental (the round-6 ADVICE trade).
  *  - pipe_dedup: the composed manifest agrees with its parts, and the
  *    band exchange never carries the text column.
  */
class StarEdgeSpec extends AnyFunSuite {
  import SparkTest._

  /** Min-label union-find over an edge list — the independent truth. */
  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  test("hammingStarEdges: adversarial failure-vs-min bucket keeps the component whole") {
    import spark.implicits._
    // 4 bands × 16 bits, maxHamming 3. doc 1 is the bucket min; doc 3
    // verifies against it (hamming 3); doc 2 FAILS against it (hamming 6)
    // but is a true pair of doc 3 (hamming 3) — the exact case where
    // pairing failures only among THEMSELVES would split {1,2,3}.
    val a = 0L                                       // min
    val c = a ^ (7L << 16)                           // 3 bits in band 1
    val b = c ^ (7L << 32)                           // +3 bits in band 2 → d(a,b)=6, d(b,c)=3
    val d = a ^ (3L << 20) ^ (3L << 36) ^ (1L << 52) // ≥4 bits from everyone → isolated
    assert(java.lang.Long.bitCount(a ^ b) == 6 && java.lang.Long.bitCount(b ^ c) == 3 &&
      java.lang.Long.bitCount(a ^ c) == 3)
    assert(Seq(a, b, c).forall(s => java.lang.Long.bitCount(s ^ d) > 3))
    val sigs = Seq((1L, "en", a), (2L, "en", b), (3L, "en", c), (4L, "en", d))
      .toDF("doc_id", "lang", "simhash")
    def comps(df: org.apache.spark.sql.DataFrame) = components(
      df.select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))))
    val full = comps(graft.functions.Banding.hammingPairs(
      sigs, "simhash", "doc_id", Seq("lang"), 4, 16, 3))
    val star = comps(graft.functions.Banding.hammingStarEdges(
      sigs, "simhash", "doc_id", Seq("lang"), 4, 16, 3))
    assert(full == star, s"star components $star != full components $full")
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), "the fallback must bridge 2–3")
  }

  test("hammingStarEdges ≡ hammingPairs components under seeded random signatures") {
    import spark.implicits._
    // 300 signatures = 12 random bases each perturbed by 0-4 random bit
    // flips: dense mixed-similarity buckets (hamming 0-8 between group
    // members, so verify-pass, verify-fail, AND cross-pair cases all
    // occur) — maximal pressure on the verify/fallback split
    var s = 42L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val bases = Array.fill(12)(next())
    val sigs = (0L until 300L).map { i =>
      var sig = bases((i % 12).toInt)
      val flips = (next() & 0x7fffffffL % 5).toInt % 5
      for (_ <- 0 until flips) sig ^= 1L << ((next() & 0x3f).toInt)
      (i, s"g${i % 2}", sig)
    }.toDF("doc_id", "lang", "simhash")
    def comps(df: org.apache.spark.sql.DataFrame) = components(
      df.select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))))
    val full = comps(graft.functions.Banding.hammingPairs(
      sigs, "simhash", "doc_id", Seq("lang"), 4, 16, 3))
    val star = comps(graft.functions.Banding.hammingStarEdges(
      sigs, "simhash", "doc_id", Seq("lang"), 4, 16, 3))
    assert(full.nonEmpty && full == star)
  }

  test("hammingStarEdges ≡ hammingPairs components on the real corpus (sig-level fuzz)") {
    // every simhash signature of the corpus — buckets, failures, bridges
    // as the data happens to produce them
    val sigs = dedup.Dedup.simhashSigs(spark, sf)
    def edgesOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val full = components(edgesOf(graft.functions.Banding.hammingPairs(
      sigs, "simhash", "doc_id", Seq("lang"), dedup.Dedup.simBands,
      dedup.Dedup.simBandBits, 3)))
    val star = components(edgesOf(graft.functions.Banding.hammingStarEdges(
      sigs, "simhash", "doc_id", Seq("lang"), dedup.Dedup.simBands,
      dedup.Dedup.simBandBits, 3)))
    assert(full.nonEmpty && full == star)
    // and the registered row agrees with the independent union-find labels
    val row = dedup.Dedup.simhashClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(row == full)
  }

  test("ownershipEdges: components equal the uncapped clique graph; no cap recall loss") {
    import spark.implicits._
    // 40 identical docs (the degenerate corpus the cap defends against):
    // a capped pairwise join at cap=8 only ever pairs docs 0-7, classifying
    // 32 docs unique — ownership edges must cluster ALL 40, from O(n·bands)
    // edges
    val docs = (0L until 40L)
      .map(i => (i, "the same boilerplate text repeated across mirror sites " * 3))
      .toDF("doc_id", "text")
    val arrs = docs.select(col("doc_id"),
      graft.plans.ShingleHashes(col("text"), 3, distinct = true).as("hs_arr"))
    val bands = dedup.Dedup.bandRows(arrs)
    val own = dedup.Dedup.ownershipEdges(bands).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(own.length == 39L, s"stars over one clique bucket set: got ${own.length}")
    assert(components(own).values.toSet == Set(0L), "all 40 docs in cluster 0")
    // capped pairs at cap=8 lose the tail — the loss ownership avoids
    val capped = dedup.Dedup.capBands(bands, cap = 8)
    val cappedPairs = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(components(cappedPairs).keySet.size == 8, "the cap's documented trade")
    // on the real corpus: ownership components == uncapped pairwise components
    val realBands = dedup.Dedup.bandRows(dedup.Dedup.shingleArrays(spark, sf))
    val uncapped = realBands.as("a").join(realBands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val fromOwn = dedup.Dedup.clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromOwn == components(uncapped))
  }

  test("pipe_dedup: manifest = keep-best clusters + singleton survivors; text never shuffles") {
    val manifest = pipeline.Curate.dedupPipe(spark, sf).collect()
    val nDocs = Tables(spark, sf).documents.count()
    // exactly one survivor row per cluster, singletons included:
    // Σ n_members over rows = corpus size
    assert(manifest.map(_.getAs[Long]("n_members")).sum == nDocs)
    // multi-member clusters agree with the standalone keep-best row
    val kb = dedup.Dedup.keepBest(spark, sf).collect()
      .map(r => (r.getAs[Long]("cluster_id"),
        (r.getAs[Long]("keep_id"), r.getAs[Double]("keep_quality"), r.getAs[Long]("n_members"))))
      .toMap
    manifest.filter(_.getAs[Long]("n_members") > 1).foreach { r =>
      assert(kb(r.getAs[Long]("cluster_id")) ==
        ((r.getAs[Long]("keep_id"), r.getAs[Double]("keep_quality"), r.getAs[Long]("n_members"))))
    }
    manifest.filter(_.getAs[Long]("n_members") == 1).foreach { r =>
      assert(r.getAs[Long]("keep_id") == r.getAs[Long]("cluster_id"))
    }
    // plan pin: the band-edge subtree shuffles exactly twice (bucket-min
    // window + edge distinct) and NO exchange carries the fat text column
    val edges = dedup.Dedup.ownershipEdges(
      dedup.Dedup.bandRows(dedup.Dedup.shingleArrays(spark, sf)))
    val plan = edges.queryExecution.executedPlan.toString
    val nExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(nExchanges == 2, s"edges subtree must shuffle exactly twice:\n$plan")
    // the tree prints top-down, so everything ABOVE the lowest Exchange
    // (the band shuffle) is what rides the wire — the text column must be
    // consumed inside the scan-side projection, strictly below it
    val aboveBandExchange = plan.substring(0, plan.lastIndexOf("Exchange hashpartitioning"))
    assert(!aboveBandExchange.contains("text#"),
      s"a shuffle carries the text column:\n$plan")
  }
}
