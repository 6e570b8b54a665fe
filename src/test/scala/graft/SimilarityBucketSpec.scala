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

  test("knn join ranks are contiguous and capped at 3 per vector") {
    val rows = sim.Similarity.knnJoin(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("id")).values.foreach { rs =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.length <= 3)
      assert(ranks.toSeq == (1 to ranks.length))
    }
  }
}
