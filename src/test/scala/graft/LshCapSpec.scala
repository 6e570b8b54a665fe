package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-pair contract of the LSH candidate join (a hot band bucket
  * must never go quadratic) and the two-level prefix-sum plan shape of
  * samp_pps — the two 100 TB postures round 5 flagged. */
class LshCapSpec extends AnyFunSuite {
  import SparkTest._

  test("adversarial hot bucket: cap bounds the pair volume; smallest ids survive") {
    import spark.implicits._
    // 40 identical docs — every band's bucket holds ALL of them, the exact
    // degenerate shape (boilerplate mirrors) the cap exists for
    val docs = (0L until 40L)
      .map(i => (i, "the same boilerplate text repeated across mirror sites " * 3))
      .toDF("doc_id", "text")
    val arrs = docs.select(col("doc_id"),
      graft.plans.ShingleHashes(col("text"), 3, distinct = true).as("hs_arr"))
    val capped = dedup.Dedup.cappedBandRows(arrs, cap = 8)
    val occ = capped.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n"), max(col("doc_id")).as("mx")).collect()
    assert(occ.nonEmpty)
    occ.foreach { r =>
      assert(r.getAs[Long]("n") <= 8, "bucket occupancy must respect the cap")
      assert(r.getAs[Long]("mx") <= 7, "cap must keep the SMALLEST doc_ids")
    }
    // pair volume is C(cap,2) = 28, not C(40,2) = 780
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct().count()
    assert(pairs == 28L, s"capped hot bucket must yield C(8,2) pairs, got $pairs")
  }

  test("dd_minhash output at the default cap is unchanged on a non-degenerate corpus") {
    // sf buckets sit far below 512 — the cap is a safety bound, not a
    // behavior change on healthy data
    val capped = dedup.Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val bands = dedup.Dedup.bandRows(dedup.Dedup.shingleArrays(spark, sf))
    val uncapped = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(capped.sameElements(uncapped))
  }

  test("dd_simhash_clusters: every simhash pair's endpoints share a cluster; min-member rep") {
    val pairs = dedup.Dedup.simhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val clusters = dedup.Dedup.simhashClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(pairs.nonEmpty && clusters.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, "representative must be the min member")
    }
    // the whole point: clusters are far fewer than pairs on duplicate-heavy data
    assert(clusters.groupBy(_._2).size < pairs.length)
  }

  test("dd_minhash_est: estimate recounts from signatures; err reassembles; candidates covered") {
    val sigs = dedup.Dedup.shingleArrays(spark, sf)
      .filter(size(col("hs_arr")) > 0)
      .select(col("doc_id"),
        graft.plans.MinHashSigs(col("hs_arr"), dedup.Dedup.hashAB, dedup.Dedup.mersenneP)
          .as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val rows = dedup.Dedup.minhashEst(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = dedup.Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet == pairs,
      "audit must cover exactly the candidate pairs")
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val n = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      assert(r.getAs[Long]("n_match") == n, s"($a,$b) slot recount")
      // candidates share at least one full band by construction
      assert(n >= dedup.Dedup.bandSize)
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      if (!r.isNullAt(r.fieldIndex("exact_jaccard")))
        assert(math.abs(est - r.getAs[Double]("exact_jaccard")) - 1e-9 <=
          r.getAs[Double]("abs_err") + 1e-6)
    }
  }

  test("dd_keep_best: one survivor per cluster, and it is the max-quality member") {
    val clusters = dedup.Dedup.clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val quality = text.TextOps.quality(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val kept = dedup.Dedup.keepBest(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("keep_id"), r.getAs[Double]("keep_quality"), r.getAs[Long]("n_members")))
      .toMap
    val byCluster = clusters.groupBy(_._2)
    assert(kept.keySet == byCluster.keySet, "one row per cluster, no extras")
    byCluster.foreach { case (cid, members) =>
      val (keepId, keepQ, n) = kept(cid)
      val ids = members.map(_._1)
      assert(ids.contains(keepId), s"cluster $cid keeps a non-member")
      assert(n == ids.length.toLong)
      val best = ids.map(quality).max
      assert(keepQ == best, s"cluster $cid kept quality $keepQ, best is $best")
      // tie-break: among max-quality members, the smallest id wins
      assert(keepId == ids.filter(quality(_) == best).min)
    }
  }

  test("capBands: the rank cut rides WindowGroupLimit — map-side partial limit before the exchange") {
    spark.catalog.clearCache()
    val plan = dedup.Dedup.cappedBandRows(dedup.Dedup.shingleArrays(spark, sf))
      .queryExecution.executedPlan.toString
    // rk <= cap compiles to WindowGroupLimit Partial/Final: each task ships
    // at most cap rows per bucket INTO the shuffle, so a hot bucket can't
    // even skew the exchange, let alone the join
    assert(plan.contains("WindowGroupLimit"), plan.take(900))
    assert(plan.contains("Partial"),
      "map-side partial limit must prune before the shuffle:\n" + plan.take(900))
  }

  test("samp_pps: corpus cumsum partitions by blk; only the bounded block dim single-partitions") {
    val plan = sample.Sampling.pps(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(blk"),
      "the in-block cumsum window must partition on blk:\n" + plan.take(900))
    val singles = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(singles <= 1,
      s"only the |blocks|-row offset dim may single-partition, got $singles:\n${plan.take(900)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "block offsets must broadcast back:\n" + plan.take(900))
  }
}
