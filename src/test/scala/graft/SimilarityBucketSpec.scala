package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale contract of the self-join LSH: bucket granularity beyond
  * sign-bucketing, bounded bucket membership, exactly-once pairs. */
class SimilarityBucketSpec extends AnyFunSuite {
  import SparkTest._

  test("quantized keys spread far beyond the 16 sign buckets") {
    val keyed = sim.Similarity.quantKeyed(spark, sf)
    val buckets = keyed.groupBy(col("tbl"), col("bkey")).count().collect()
    assert(buckets.length > 16, s"only ${buckets.length} occupied buckets")
    // no bucket exceeds the membership cap — the O(n·tables·cap) bound
    assert(buckets.map(_.getAs[Long]("count")).max <= sim.Similarity.bucketCap)
    // and no single bucket dominates the corpus (skew guard; sign-bucket
    // schemes concentrate ~1/16 of all rows per bucket)
    val n = Tables(spark, sf).embeddings.count()
    assert(buckets.map(_.getAs[Long]("count")).max < n / 2)
  }

  test("every vector keeps at most numTables keyed rows") {
    val perVec = sim.Similarity.quantKeyed(spark, sf)
      .groupBy(col("vec_id")).count().collect()
    assert(perVec.map(_.getAs[Long]("count")).max <= sim.Similarity.numTables)
  }

  test("candidate pairs are undirected, deduped, ordered") {
    val rows = sim.Similarity.selfJoinCandidates(spark, sf).collect()
    val pairs = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.length == pairs.distinct.length)
  }

  test("ann_recall: one row per (method, query), recall in [0,1], and the " +
      "approx paths find a strict subset of brute truth") {
    val rows = sim.Similarity.annRecall(spark, sf).collect()
    // five graded paths: lsh, ivf, the ivfpq composite, and the
    // hash-picked vs k-means-trained PQ pair (round 8)
    assert(rows.length == 5 * sim.Similarity.numQueries)
    assert(rows.map(_.getAs[String]("method")).toSet ==
      Set("lsh", "ivf", "ivfpq", "pq", "pq_trained"))
    rows.foreach { r =>
      val (nTruth, nHit) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_hit"))
      val recall = r.getAs[Double]("recall")
      assert(nHit <= nTruth, s"hits exceed truth: $r")
      assert(recall >= 0.0 && recall <= 1.0, s"recall out of range: $r")
    }
    // the audit only means something if the dial actually moves: on this
    // corpus the approximate paths must not be trivially perfect AND must
    // find something (both all-0 and all-1 would make the query vacuous)
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.exists(_ > 0.0), "no approx path found any truth neighbor")
    assert(recalls.exists(_ < 1.0), "audit is vacuous: every recall is 1.0")
  }

  test("ann_ndcg matches a local DCG recount from the engine's own lists") {
    val rows = sim.Similarity.annNdcg(spark, sf).collect()
    assert(rows.length == 5 * sim.Similarity.numQueries)
    // graded truth: brute rank r -> relevance topK+1-r; discounts as the
    // engine's ppm constants recomputed here from first principles
    val disc = (1 to 3).map(i => i -> math.round(1e6 / (math.log(i + 1.0) / math.log(2.0)))).toMap
    val idcg = (1 to 3).map(r => (sim.Similarity.topK + 1L - r) * disc(r)).sum
    val rel = sim.Similarity.bruteTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand")) ->
        (sim.Similarity.topK + 1L - r.getAs[Int]("rank"))).toMap
    val lsh = sim.Similarity.lshTopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(r =>
        rel.getOrElse((r.getAs[Long]("qid"), r.getAs[Long]("cand")), 0L) *
          disc(r.getAs[Int]("rank"))).sum).toMap
    rows.filter(_.getAs[String]("method") == "lsh").foreach { r =>
      val expect = lsh.getOrElse(r.getAs[Long]("qid"), 0L)
      assert(r.getAs[Long]("dcg_ppm") == expect, s"qid ${r.getAs[Long]("qid")}")
      assert(math.abs(r.getAs[Double]("ndcg") - expect.toDouble / idcg) < 1e-6)
    }
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg out of range: $r")
    }
    val all = rows.map(_.getAs[Double]("ndcg"))
    assert(all.exists(_ > 0.0) && all.exists(_ < 1.0), "nDCG audit is vacuous")
  }

  test("knn join ranks are contiguous and capped at 3 per vector") {
    val rows = sim.Similarity.knnJoin(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("id")).values.foreach { rs =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.length <= 3)
      assert(ranks.toSeq == (1 to ranks.length))
    }
  }

  test("ann_pq_topk: codebook and LUT stay broadcast; no cartesian product") {
    val plan = sim.Similarity.pqTopK(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("ann_pq_topk: a codeword-source row assigns to its own codeword in every subspace") {
    // vec_id = c·stride IS codeword c, so its subvector l2² to codeword c is
    // exactly 0 in every subspace — assignment must pick c (ties broken low
    // can only prefer an identical codeword with a smaller id)
    val s = sim.Similarity
    val codes = s.pqCodes(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("s"), r.getAs[Long]("c")))
    val n = Tables(spark, sf).embeddings.count()
    assert(codes.length == n * s.pqSub, "every vector gets one code per subspace")
    assert(codes.forall { case (_, _, c) => c >= 0 && c < s.pqK })
    (0 until s.pqK).foreach { c =>
      val own = codes.filter(_._1 == c.toLong * s.pqStride)
      assert(own.length == s.pqSub)
      own.foreach { case (_, _, got) => assert(got == c, s"codeword $c self-assignment") }
    }
  }

  test("ann_pq_topk: ranks contiguous, no self-candidates, all queries present") {
    val s = sim.Similarity
    val rows = s.pqTopK(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("qid")).distinct.length == s.numQueries)
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to ranks.length) && ranks.length <= 3)
      rs.foreach(r => assert(r.getAs[Long]("cand") != r.getAs[Long]("qid")))
    }
  }

  test("ann_filtered: every candidate satisfies the label predicate (pre-filter, not post-trim)") {
    val labels = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val rows = sim.Similarity.filteredTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, qlabel, cand) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(labels(qid) == qlabel, s"query $qid mislabeled")
      assert(labels(cand) == qlabel, s"candidate $cand violates the label filter of query $qid")
      assert(cand != qid)
    }
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("ann_mips: valid ranked dots per query; MIPS order genuinely differs from cosine") {
    val s = sim.Similarity
    val rows = s.mipsTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      // scores weakly decrease with rank
      assert(sorted.map(_.getAs[Double]("ip")).sliding(2).forall(w =>
        w.length < 2 || w(0) >= w(1)))
      sorted.foreach(r => assert(r.getAs[Long]("cand") != r.getAs[Long]("qid")))
    }
    // the reduction's core identity: every augmented corpus vector has the
    // SAME norm M (‖x‖² + ext² = M² = max ‖x‖²), which is what converts
    // raw-dot order into augmented-angle order
    val e = Tables(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => t._1 * t._2).sum
    val m2 = e.values.map(v => dot(v, v)).max
    e.values.foreach { v =>
      val n2 = dot(v, v)
      val ext = math.sqrt(m2 - n2)
      assert(math.abs(n2 + ext * ext - m2) < 1e-9)
    }
    // NB: the driver's synthetic embeddings are unit-normalized (norms in
    // [1-1e-7, 1+1e-7]), so on THIS fixture MIPS order ≈ cosine order and
    // ext ≈ 0 — the reduction is exercised structurally (stats broadcast,
    // augmented bucketing, raw-dot re-score) while the oracle pins the
    // values; norm-diverse corpora are where the two operators split
  }

  test("ann_radius: every row clears tau; agrees with ivf_topk on the overlap") {
    val radius = sim.Similarity.radiusSearch(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand")) -> r.getAs[Double]("cos"))
      .toMap
    assert(radius.nonEmpty)
    assert(radius.values.forall(_ >= sim.Similarity.radiusTau))
    // both rows consume the identical probe-scored stage: any top-k hit at
    // or above tau MUST appear in the radius answer with the same cosine
    sim.Similarity.ivfTopK(spark, sf).collect().foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("cand"))
      val cos = r.getAs[Double]("cos")
      if (cos >= sim.Similarity.radiusTau)
        assert(radius.get(key).contains(cos), s"topk hit $key missing from radius")
    }
  }
}
