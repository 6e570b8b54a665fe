package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  import SparkTest._

  test("bloom never misses a true member and stays literal-only in the plan") {
    val rows = rules.RuleQueries.ruBloom(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getAs[Boolean]("actual")) assert(r.getAs[Boolean]("maybe"),
        s"false negative on ${r.getAs[String]("ip")}")
    }
    // the probe stage itself has no join node for the filter (literal array)
    val s = graft.events.Signups.derive(spark, sf)
    val block = s.filter(col("susp_ip")).select(col("ip")).distinct()
    val filter = graft.functions.BloomFilter.build(block, col("ip"))
    val probe = s.select(col("event_id"),
      graft.functions.BloomFilter.mayContain(col("ip"), filter).as("maybe"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe must not join:\n${plan.take(600)}")
  }

  test("fused BloomProbe equals the column-math probe bit-for-bit") {
    import spark.implicits._
    val dim = (1 to 80).map(i => s"k$i").toDF("k")
    val f = graft.functions.BloomFilter.build(dim, col("k"))
    val probes = (1 to 2000).map(i => s"p$i").toDF("k")
      .select(col("k"),
        graft.functions.BloomFilter.mayContain(col("k"), f).as("fused"),
        graft.functions.BloomFilter.mayContainHex(
          graft.functions.BloomFilter.keyHex(col("k")), f).as("columnar"))
    assert(probes.filter(col("fused") =!= col("columnar")).count() == 0)
    // and true members always pass through the fused path
    val members = dim.select(col("k"),
      graft.functions.BloomFilter.mayContain(col("k"), f).as("m"))
    assert(members.filter(!col("m")).count() == 0)
  }

  test("filter bits are deterministic and non-member keys mostly rejected") {
    import spark.implicits._
    val dim = (1 to 50).map(i => s"10.0.0.$i").toDF("k")
    val f1 = graft.functions.BloomFilter.build(dim, col("k"))
    val f2 = graft.functions.BloomFilter.build(dim, col("k"))
    assert(f1.sameElements(f2))
    val probes = (1 to 500).map(i => s"192.168.1.$i").toDF("k")
    val fp = probes.filter(graft.functions.BloomFilter.mayContain(col("k"), f1)).count()
    // 50 keys * 3 hashes in 1008 bits → ~14% bits set → FP ~ 0.14^3 ≈ 0.3%
    assert(fp < 25, s"false-positive rate implausibly high: $fp/500")
  }
}
