package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 directive/advice closures. */
class Round9OpsSpec extends AnyFunSuite {
  import SparkTest.spark

  /** Single-file events.parquet fixture (micros NTZ flavor) from
    * (event_id, day, user_id) triples — usable as an sfDir. */
  private def eventsFixture(rows: Seq[(Long, Long, Long)]): String = {
    val dir = Files.createTempDirectory("r9_events")
    val data = rows.map { case (id, day, uid) =>
      Row(id, day * 86400000000L, uid, "create", 1.0, "{}")
    }
    val base = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val df = spark.createDataFrame(java.util.Arrays.asList(data: _*), base)
      .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
    val tmp = Files.createTempDirectory("r9_w")
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/out")
    val part = Files.list(Path.of(s"$tmp/out")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Path.of(part), dir.resolve("events.parquet"))
    dir.toString
  }

  test("q_mv_rewrite answers from the rollup, not the fact, and matches the naive aggregate") {
    val sf = SparkTest.sf
    val df = relational.Relational.mvRewriteQ(spark, sf)
    val scans = df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).mkString(",")
          case _ => ""
        }
    }
    assert(scans.exists(_.contains("mv_lineitem_daily")),
      s"rewritten plan must scan the rollup:\n${scans.mkString("\n")}")
    assert(!scans.exists(_.contains("lineitem.parquet")),
      s"rewritten plan still scans the fact:\n${scans.mkString("\n")}")
    // value identity vs the naive plan over the fact (exact decimal partials
    // make re-aggregation bit-identical, so == on doubles is the right bar)
    val naive = Tables(spark, sf).lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_base_price"),
        count(lit(1)).as("count_order"))
    def key(r: Row) = (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))
    val got = df.collect().map(r => key(r) -> r.toSeq).toMap
    val want = naive.collect().map(r => key(r) -> r.toSeq).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("MvRewrite declines shapes the rollup cannot answer") {
    val sf = SparkTest.sf
    val t = Tables(spark, sf)
    val mvPath = spark.conf.get("spark.sql.warehouse.dir") +
      "/mv_lineitem_daily_" + java.lang.Integer.toHexString(sf.hashCode)
    relational.Relational.mvRewriteQ(spark, sf) // materialize the rollup
    val rule = graft.plans.MvRewrite(spark, mvPath)
    // grouping outside the MV dims
    val byPart = t.lineitem.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("s"))
    assert(!rule.fired(rule(byPart.queryExecution.analyzed)))
    // filter on a non-dim column
    val nonDimFilter = t.lineitem.filter(col("l_discount") > 0.05)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("s"))
    assert(!rule.fired(rule(nonDimFilter.queryExecution.analyzed)))
    // an aggregate the MV has no partial state for
    val maxAgg = t.lineitem.groupBy(col("l_returnflag")).agg(max(col("l_tax")).as("m"))
    assert(!rule.fired(rule(maxAgg.queryExecution.analyzed)))
    // distinct aggregation must never re-aggregate partial counts
    val distinctAgg = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"))
    assert(!rule.fired(rule(distinctAgg.queryExecution.analyzed)))
  }

  test("st_growth horizon guard trips on TRUE span overflow, not decoded span") {
    // The round-8 advice scenario: user 0 is first seen on the globally
    // earliest day and active again 100 days later. ShiftingBitmap
    // saturates day 100 into bit 62, so the DECODED calendar spans only
    // 0..62 and the old global-span heuristic (span < 63 → pass) let live
    // flows silently diverge from batch ev_growth. The exact guard keys on
    // the pre-saturation max(day) carried beside the bitmap and must
    // refuse this fixture.
    val dir = eventsFixture(Seq(
      (0L, 0L, 0L), (1L, 100L, 0L), // the saturating user
      (2L, 0L, 1L), (3L, 1L, 1L))) // a normal neighbor
    val e = intercept[IllegalArgumentException] {
      streaming.StreamOps.growthLive(spark, dir).collect()
    }
    assert(e.getMessage.contains("horizon"), e.getMessage)
  }

  test("trained PQ beats hash-picked PQ on CLUSTERED embeddings (measured recall)") {
    // The round-8 residual: the real fixture's near-uniform vectors make
    // trained-PQ recall noise-level, so the codebook win was only proven
    // indirectly (Lloyd reconstruction-error monotonicity). This fixture is
    // a mixture of gaussians — the data k-means training exists FOR — and
    // turns the win into a measured recall number: ann_recall's own audit,
    // run unchanged against the clustered dir, must grade pq_trained above
    // the hash-picked pq baseline.
    // MANY small clusters (100 × 4): a query's true top-3 are its own-mode
    // siblings, and retrieving them forces the codebook to SEPARATE modes —
    // with 8 codewords per subspace over 100 modes, codeword PLACEMENT
    // decides which modes collide in code space, which is exactly what
    // Lloyd optimizes and hash-picking doesn't. (A few-big-clusters fixture
    // is adverse the other way: every same-cluster member quantizes to the
    // same codes and recall@3 degenerates to tie-order luck for BOTH
    // codebooks — measured 0.067 vs 0.067.)
    val k = 100
    val dim = 64
    val n = 400
    var seed = 0x9e3779b97f4a7c15L
    def nextUnit(): Float = { // deterministic LCG → [0, 1)
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33).toDouble / (1L << 31).toDouble).toFloat
    }
    val centers = Array.fill(k, dim)(nextUnit() * 10f)
    val rows = (0 until n).map { i =>
      val c = centers(i % k)
      Row(i.toLong, c.map(x => x + (nextUnit() - 0.5f) * 0.5f).toSeq, (i % k))
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = Files.createTempDirectory("r9_clustered")
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp_out")
    val part = Files.list(Path.of(s"$dir/tmp_out")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Path.of(part), Path.of(s"$dir/embeddings.parquet"))
    val recall = sim.Similarity.annRecall(spark, dir.toString)
      .groupBy(col("method")).agg(avg(col("recall")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    info(s"clustered-fixture recall: $recall")
    assert(recall("pq_trained") > recall("pq"),
      s"trained codebook must beat hash-picked on clustered data: $recall")
  }

  test("q_salted_join: replicate-broadcast-free salted SMJ shape, result equals plain join") {
    val sf = "/root/testdata/sf0.001"
    val df = relational.Relational.qSaltedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the shape the row exists to pin: a sort-merge join whose keys carry
    // the salt (hot key spread over saltedJoinFactor reducers), the dim
    // side fed by the salt-range explode (Generate), and NO broadcast of
    // either join side (broadcasting would make the salting pointless)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(plan.contains("Generate explode"), s"expected dim-side explode in:\n$plan")
    assert(plan.toLowerCase.contains("salt"), "join keys must carry the salt")
    assert(!plan.contains("BroadcastHashJoin"), "salted join must not broadcast")
    val got = df.orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val t = Tables(spark, sf)
    val plain = t.events.join(t.customer,
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == plain, s"salted join must equal the plain join: $got vs $plain")
  }

  test("st_growth guard passes at the exact 62-day boundary and flows equal batch") {
    // last_day - first_day == 62 is the largest representable span: bit 62
    // is exact there (one set bit, no dropped days), so the guard must NOT
    // trip and the decomposition must equal the batch code on the decoded
    // frame.
    val dir = eventsFixture(Seq(
      (0L, 0L, 0L), (1L, 62L, 0L),
      (2L, 5L, 1L), (3L, 6L, 1L)))
    val live = streaming.StreamOps.growthLive(spark, dir)
      .orderBy("day_idx").collect().map(_.toSeq).toSeq
    val ud = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"),
        (unix_micros(col("ts").cast(TimestampType)) / 86400000000L)
          .cast("long").as("day_idx"))
      .distinct()
    val batch = graft.events.EventOps.growthOver(ud)
      .orderBy("day_idx").collect().map(_.toSeq).toSeq
    assert(live == batch, s"live=$live batch=$batch")
  }
}
