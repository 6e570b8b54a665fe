package graft

import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import SparkTest._

  test("dd_exact preserves all documents across groups") {
    val df = dedup.Dedup.exact(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0)
    assert(total == 500L)
  }

  test("dd_minhash candidate pairs are ordered and distinct") {
    val rows = dedup.Dedup.minhashLsh(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("ngram jaccard stays within (0, 1]") {
    val rows = dedup.Dedup.ngramJaccard(spark, sf).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.12 && j <= 1.0)
    }
  }

  test("simhash signature fits in 16 bits") {
    val sigs = dedup.Dedup.simhashSigs(spark, sf).collect()
    assert(sigs.nonEmpty)
    sigs.foreach(r => assert((r.getAs[Long]("simhash") >> 16) == 0L))
  }

  test("brute topk returns k ranked neighbors per query") {
    val rows = sim.Similarity.bruteTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == sim.Similarity.numQueries)
    byQ.values.foreach { rs =>
      assert(rs.length == sim.Similarity.topK)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      val coss = sorted.map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh topk neighbors are a subset of same-bucket candidates with valid cosines") {
    val rows = sim.Similarity.lshTopK(spark, sf).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cos")) <= 1.000001))
  }

  test("langid picks deterministic argmax") {
    val rows = text.TextOps.langId(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }

  test("quality score bounded [0,1]") {
    text.TextOps.quality(spark, sf).collect().foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("winnowing fingerprints: n_fp bounded by kgram count") {
    val rows = text.TextOps.fingerprint(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_fp") > 0))
  }

  test("streaming window counts equal batch aggregation") {
    val st = streaming.StreamOps.windowCounts(spark, sf)
    val n = st.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(n == 1000L, s"all events must land in a window, got $n")
  }

  test("sessionize: session bounds ordered, gaps respected") {
    val rows = streaming.StreamOps.sessionize(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("start_us") <= r.getAs[Long]("end_us"))
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == 1000L, s"every event in exactly one session, got $total")
  }

  test("mm_meta stub decode is deterministic and complete") {
    val rows = multimodal.Multimodal.mmMeta(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(Set("img", "audio", "video").contains(r.getAs[String]("fmt")))
      assert(r.getAs[Int]("width") > 0)
    }
  }
}
