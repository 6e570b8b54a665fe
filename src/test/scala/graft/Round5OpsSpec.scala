package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-5 additions: live CEP, Markov chain,
  * seasonality, bloom-pruned join, temporal join, two-stage retrieval. */
class Round5OpsSpec extends AnyFunSuite {
  import SparkTest._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("st_pattern: streaming state machine emits exactly the batch CEP matches") {
    val batch = rows(events.EventOps.pattern(spark, sf)
      .select(col("user_id"), col("v_ts_us"), col("p_ts_us"), col("gap_us")))
    val live = rows(streaming.StreamOps.stPattern(spark, sf)
      .select(col("user_id"), col("v_ts_us"), col("p_ts_us"), col("gap_us")))
    assert(live == batch, "streaming and batch CEP semantics must not drift")
    assert(batch.nonEmpty, "fixture must exercise at least one match")
  }

  test("ev_markov: rows sum to one and END outflow counts every user exactly once") {
    val m = events.EventOps.markov(spark, sf)
    val sums = m.groupBy(col("from_type")).agg(sum(col("p")).as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-4,
      s"row ${r.get(0)} sums to ${r.get(1)}"))
    val endN = m.filter(col("to_type") === "END")
      .agg(sum(col("n"))).head.getLong(0)
    val users = Tables(spark, sf).events.select(col("user_id")).distinct().count()
    assert(endN == users, "every user's journey terminates exactly once")
  }

  test("ev_seasonality: cells conserve the event count; axes stay in range") {
    val s = events.EventOps.seasonality(spark, sf).collect()
    val total = Tables(spark, sf).events.count()
    assert(s.map(_.getAs[Long]("n")).sum == total)
    assert(s.forall(r => (0L to 6L).contains(r.getAs[Long]("dow"))))
    assert(s.forall(r => (0L to 23L).contains(r.getAs[Long]("hour"))))
  }

  test("q_bloom_join: bloom gate is result-invisible and actually prunes") {
    val t = Tables(spark, sf)
    val dim = t.orders
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = t.lineitem.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    val viaOp = relational.Relational.qBloomJoin(spark, sf)
      .agg(sum(col("n_items"))).head.getLong(0)
    assert(viaOp == plain, "false positives must die in the exact join")
    // the pre-join gate passes a superset of matches but far less than the fact
    val nWords = math.max(16L, dim.count() * 10 / 63 + 1).toInt
    val bloom = functions.BloomFilter.build(dim, col("o_orderkey").cast("string"), nWords)
    val kept = t.lineitem
      .filter(functions.BloomFilter.mayContain(col("l_orderkey").cast("string"), bloom))
      .count()
    val fact = t.lineitem.count()
    assert(kept >= plain, "the gate must never drop a true match")
    assert(kept < fact, "the gate must prune the fact scan")
  }

  test("q_temporal_join: every enriched view lands in exactly one validity interval") {
    val dim = relational.Relational.qScd2(spark, sf)
    val views = Tables(spark, sf).events
      .filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), unix_micros(col("ts")).as("vt"))
    // direct interval join, counted per view: multiplicity must be ≤1
    val mult = views.join(dim,
        col("vu") === col("user_id") && col("vt") >= col("valid_from_us") &&
        (col("valid_to_us").isNull || col("vt") < col("valid_to_us")))
      .groupBy(col("vu"), col("vt")).agg(count(lit(1)).as("m"))
      .agg(max(col("m"))).head.getLong(0)
    assert(mult == 1L, "SCD2 intervals must not overlap")
    val opTotal = relational.Relational.qTemporalJoin(spark, sf)
      .agg(sum(col("n_views"))).head.getLong(0)
    val direct = views.join(dim,
        col("vu") === col("user_id") && col("vt") >= col("valid_from_us") &&
        (col("valid_to_us").isNull || col("vt") < col("valid_to_us"))).count()
    assert(opTotal == direct)
  }

  test("ann_rerank: exact stage emits k ordered rows per query from coarse survivors") {
    val r = sim.Similarity.rerank(spark, sf).collect()
    val perQ = r.groupBy(_.getAs[Long]("qid"))
    perQ.foreach { case (qid, rs) =>
      assert(rs.length == sim.Similarity.topK, s"qid=$qid")
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      val cs = byRank.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"qid=$qid rerank order must be exact-cosine descending")
    }
    assert(perQ.nonEmpty)
  }
}
