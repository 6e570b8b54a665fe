package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RangeJoinRewrite optimizer rule: a natural BETWEEN join against a
  * plan-time interval dim must plan as the RangeLookup projection (no join
  * node), bail out when unsafe, and agree with the un-rewritten join. */
class RangeJoinRewriteSpec extends AnyFunSuite {
  import SparkTest._

  test("the natural geo BETWEEN join plans with NO join node") {
    val plan = enrich.EnrichQueries.geoJoinAuto(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"range join must rewrite away:\n${plan.take(900)}")
    assert(plan.contains("range_lookup"), plan.take(900))
  }

  test("rewritten join equals the BroadcastNestedLoopJoin on a rule-free session") {
    val rewritten = enrich.EnrichQueries.geoJoinAuto(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    val bare = spark.newSession() // no extraOptimizations installed
    assert(bare.experimental.extraOptimizations.isEmpty)
    val s = events.Signups.derive(bare, sf)
      .withColumn("ip_int", enrich.GeoIp.ipToInt(col("ip")))
      .filter(col("ip_int").isNotNull)
    val joined = s.join(enrich.GeoIp.rangesDf(bare),
        col("ip_int") >= col("lo") && col("ip_int") <= col("hi"))
      .select(col("event_id"), col("ip_int"), col("country"), col("city"))
    assert(joined.queryExecution.executedPlan.toString.contains("Join"),
      "control run must actually plan a join")
    val expected = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(rewritten == expected)
  }

  test("overlapping intervals bail out: the join survives (multiplicity would change)") {
    import spark.implicits._
    plans.GraftExtensions.install(spark)
    val dim = Seq((0L, 10L, "a"), (5L, 15L, "b")).toDF("lo", "hi", "tag")
    val fact = Seq(7L, 20L).toDF("k")
    val joined = fact.join(dim, col("k") >= col("lo") && col("k") <= col("hi"))
    assert(joined.queryExecution.executedPlan.toString.contains("Join"),
      "overlap must not rewrite")
    // k=7 hits BOTH intervals — the join's 2-row answer is preserved
    assert(joined.count() == 2)
  }

  test("non-range and outer joins are left untouched") {
    import spark.implicits._
    plans.GraftExtensions.install(spark)
    val dim = Seq((0L, 10L, "a"), (11L, 15L, "b")).toDF("lo", "hi", "tag")
    val fact = Seq(7L, 20L).toDF("k")
    val outer = fact.join(dim,
      col("k") >= col("lo") && col("k") <= col("hi"), "left")
    assert(outer.queryExecution.executedPlan.toString.contains("Join"))
    assert(outer.count() == 2) // k=20 survives with nulls
    val disjointOk = fact.join(dim, col("k") >= col("lo") && col("k") <= col("hi"))
    assert(!disjointOk.queryExecution.executedPlan.toString.contains("Join"),
      "the clean disjoint dim DOES rewrite")
    assert(disjointOk.count() == 1)
  }
}
