package graft.events

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-pipeline operators (SURVEY §2a #1-3).
  *
  * Mirrors the reference's ingest loop (eventstream.rs:40-62: split NDJSON
  * chunks, JSON-decode each line, drop malformed, count throughput) as
  * declarative transforms: `from_json` with an explicit schema (malformed →
  * null, the PERMISSIVE analog of the reference's `deserialize error` skip),
  * time-bucketed counting, and tagged-event filtering with pushdown.
  */
object EventOps {

  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** JSON payload parsing: schema'd extraction from the raw `props` string;
    * unparseable payloads surface as null `k` (reference drops them). */
  def parseJson(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    ev.select(
        col("event_id"),
        from_json(col("props"), propsSchema).as("p"))
      .select(
        col("event_id"),
        col("p.k").as("k"),
        col("p.k").isNotNull.as("valid"))
  }

  // regex mirrors from_json's verdicts on shapes the generator could emit:
  // signed ints parse, and the [,}] anchor rejects a truncated "{"k": 5"
  // that the JSON parser would null out
  val parseJsonSql: String =
    """SELECT event_id,
      |  CAST(regexp_extract(props, '"k": (-?[0-9]+)[,}]', 1) AS INTEGER) AS k,
      |  regexp_extract(props, '"k": (-?[0-9]+)[,}]', 1) <> '' AS valid
      |FROM events""".stripMargin

  /** Ingest throughput: events per hour per type (the reference counts every
    * 400 lines; the scalable form is a time-bucketed aggregation). */
  def throughput(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    ev.groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
  }

  val throughputSql: String =
    """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour_epoch,
      |  event_type,
      |  count(*) AS n,
      |  round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Tagged-event filter + projection (Event::Signup variant): predicate and
    * column pruning both reach the parquet scan. */
  def signups(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
  }

  val signupsSql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      |FROM events
      |WHERE event_type = 'signup'""".stripMargin

  // ---- conversion funnel ---------------------------------------------------

  /** Ordered view→click→purchase funnel per user: each stage's first
    * timestamp must follow the previous stage's. Three partial-agg passes
    * all keyed on user_id — the shuffles share one partitioning, so at
    * scale the exchanges after the first are reused, and each stage's
    * input shrinks (click events × users-who-viewed, then purchase ×
    * users-who-clicked). */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("first_view_us"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts_us") > col("first_view_us"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("first_click_us"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts_us") > col("first_click_us"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("first_purchase_us"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("first_view_us"), col("first_click_us"),
        col("first_purchase_us"),
        (lit(1) + when(col("first_click_us").isNotNull, 1).otherwise(0)
          + when(col("first_purchase_us").isNotNull, 1).otherwise(0)).as("stage"))
  }

  /** Match window for [[pattern]] (µs). */
  val patternWindowUs: Long = 3600L * 1000000

  /** CEP sequence matching WITH NEGATION — the MATCH_RECOGNIZE /
    * Flink-CEP capability: find `view → purchase` within 1 h with NO
    * `error` event between them (the "clean conversion" pattern; negation
    * is what separates CEP from plain funnels). The naive plan is a
    * per-pattern self-join chain; the engine compiles the whole pattern to
    * ONE window pass: running "last view ts" and "last error ts" columns
    * over the (ts, event_id)-ordered per-user stream turn the match into a
    * per-row predicate — `last_view` within the window AND `last_error`
    * absent-or-before-it. One user_id shuffle for ANY pattern of this
    * (A then B, not C between) family; ties resolved by the explicit
    * (ts_us, event_id) total order on both engines. */
  def pattern(spark: SparkSession, sfDir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("ts_us"))).over(W))
      .withColumn("last_error",
        max(when(col("event_type") === "error", col("ts_us"))).over(W))
      .filter(col("event_type") === "purchase" &&
        col("last_view").isNotNull &&
        col("ts_us") - col("last_view") <= patternWindowUs &&
        (col("last_error").isNull || col("last_error") < col("last_view")))
      .select(col("user_id"), col("last_view").as("v_ts_us"),
        col("ts_us").as("p_ts_us"),
        (col("ts_us") - col("last_view")).as("gap_us"))
  }

  val patternSql: String =
    s"""WITH o AS (
       |  SELECT user_id, event_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
       |  FROM events),
       |w AS (
       |  SELECT user_id, event_type, ts_us,
       |    max(CASE WHEN event_type = 'view' THEN ts_us END) OVER win AS last_view,
       |    max(CASE WHEN event_type = 'error' THEN ts_us END) OVER win AS last_error
       |  FROM o
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT user_id, last_view AS v_ts_us, ts_us AS p_ts_us,
       |  ts_us - last_view AS gap_us
       |FROM w
       |WHERE event_type = 'purchase' AND last_view IS NOT NULL
       |  AND ts_us - last_view <= $patternWindowUs
       |  AND (last_error IS NULL OR last_error < last_view)""".stripMargin

  /** Conversion window for [[funnelWindow]] (µs): each stage must land
    * within 24 h of the previous stage's first event. */
  val funnelWindowUs: Long = 24L * 3600 * 1000000

  /** Time-bounded funnel — [[funnel]] with the product-analytics semantics
    * dashboards actually use: a click only converts if it lands within 24 h
    * of the first view, a purchase within 24 h of that click (unbounded
    * funnels overcount by crediting conversions weeks later). Emits the
    * stage-report shape (stage, users, conversion-from-previous) rather
    * than per-user rows. Same shrinking three-pass plan as [[funnel]], one
    * user_id partitioning shared across stages; rates are single divisions
    * of exact counts. */
  def funnelWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts_us") > col("t1") &&
        col("ts_us") <= col("t1") + funnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts_us") > col("t2") &&
        col("ts_us") <= col("t2") + funnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    val nv = v.agg(count(lit(1))).head().getLong(0)
    val nc = c.agg(count(lit(1))).head().getLong(0)
    val np = p.agg(count(lit(1))).head().getLong(0)
    import spark.implicits._
    // conversion division + round run through Spark SQL so the rounding
    // convention matches every other query (and DuckDB's round)
    Seq(("1_view", nv, nv), ("2_click", nc, nv), ("3_purchase", np, nc))
      .toDF("stage", "n_users", "prev")
      .select(col("stage"), col("n_users"),
        when(col("prev") === 0, 0.0)
          .otherwise(round(col("n_users").cast("double") / col("prev"), 6))
          .as("conv_from_prev"))
  }

  val funnelWindowSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
       |v AS (SELECT user_id, min(ts_us) AS t1 FROM ev
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT ev.user_id, min(ts_us) AS t2
       |      FROM ev JOIN v ON ev.user_id = v.user_id
       |      WHERE event_type = 'click' AND ts_us > t1
       |        AND ts_us <= t1 + $funnelWindowUs GROUP BY 1),
       |p AS (SELECT ev.user_id, min(ts_us) AS t3
       |      FROM ev JOIN c ON ev.user_id = c.user_id
       |      WHERE event_type = 'purchase' AND ts_us > t2
       |        AND ts_us <= t2 + $funnelWindowUs GROUP BY 1),
       |n AS (SELECT (SELECT count(*) FROM v) AS nv,
       |             (SELECT count(*) FROM c) AS nc,
       |             (SELECT count(*) FROM p) AS np)
       |SELECT '1_view' AS stage, nv AS n_users,
       |  CASE WHEN nv = 0 THEN 0.0 ELSE round(CAST(nv AS DOUBLE) / nv, 6) END
       |    AS conv_from_prev FROM n
       |UNION ALL
       |SELECT '2_click', nc,
       |  CASE WHEN nv = 0 THEN 0.0 ELSE round(CAST(nc AS DOUBLE) / nv, 6) END FROM n
       |UNION ALL
       |SELECT '3_purchase', np,
       |  CASE WHEN nc = 0 THEN 0.0 ELSE round(CAST(np AS DOUBLE) / nc, 6) END FROM n""".stripMargin

  val funnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |v AS (SELECT user_id, min(ts_us) AS first_view_us FROM ev
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT ev.user_id, min(ts_us) AS first_click_us
      |      FROM ev JOIN v ON ev.user_id = v.user_id
      |      WHERE event_type = 'click' AND ts_us > first_view_us GROUP BY 1),
      |p AS (SELECT ev.user_id, min(ts_us) AS first_purchase_us
      |      FROM ev JOIN c ON ev.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND ts_us > first_click_us GROUP BY 1)
      |SELECT v.user_id, first_view_us, first_click_us, first_purchase_us,
      |  1 + CASE WHEN first_click_us IS NOT NULL THEN 1 ELSE 0 END
      |    + CASE WHEN first_purchase_us IS NOT NULL THEN 1 ELSE 0 END AS stage
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  // ---- HLL distinct sketch -------------------------------------------------

  /** Approximate distinct users per event type via the portable HLL
    * register sketch (graft.plans.HllSketch, a TypedImperativeAggregate:
    * 16-byte mergeable buffer, partial-agg friendly — only the registers
    * cross the shuffle). The estimate derives from the registers with
    * integer-exact arithmetic, so DuckDB replaying the same algorithm
    * hash-matches the "approximate" number exactly; the exact distinct
    * count rides along to show the sketch error. */
  def hllUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .groupBy(col("event_type"))
      .agg(graft.plans.HllSketch.registers(col("user_id").cast("string")).as("regs"),
        countDistinct(col("user_id")).as("exact"))
      .select(col("event_type"), col("exact"),
        graft.plans.HllSketch.estimate("regs").as("est"))

  /** Register-replay CTEs shared by the batch and streaming HLL oracles —
    * the layout constants (64 registers, 55-bit widths, α=0.709) exist in
    * exactly two places: HllSketch (engine) and here (oracle). Expects an
    * `events` table; yields `inv(event_type, inv_scaled)`. */
  val hllReplayCtes: String =
    """h AS (
      |  SELECT event_type, user_id,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM events),
      |r AS (SELECT event_type, CAST(h % 64 AS INT) AS b, h // 64 AS w FROM h),
      |regs AS (
      |  SELECT event_type, b,
      |    max(CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END) AS reg
      |  FROM r GROUP BY 1, 2),
      |inv AS (
      |  SELECT event_type,
      |    sum(1::BIGINT << (55 - reg)) + (64 - count(*)) * (1::BIGINT << 55) AS inv_scaled
      |  FROM regs GROUP BY 1)""".stripMargin

  val hllEstimateSql: String =
    "round(CAST(0.709 AS DOUBLE) * 4096 * power(2.0, 55) / inv_scaled, 4)"

  val hllUsersSql: String =
    s"""WITH $hllReplayCtes,
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact FROM events GROUP BY 1)
       |SELECT inv.event_type, ex.exact,
       |  $hllEstimateSql AS est
       |FROM inv JOIN ex ON inv.event_type = ex.event_type""".stripMargin

  // ---- KMV theta sketch: distinct counts WITH set algebra ------------------

  /** Pairwise audience overlap via the KMV theta sketch
    * (graft.plans.KmvSketch, a TypedImperativeAggregate: ≤ k=256 longs of
    * mergeable state). Where HLL only unions, KMV intersects — "distinct
    * users who did BOTH A and B" from two O(k) sketches instead of a
    * user-level join, which is what keeps cross-segment overlap matrices
    * tractable at 100 TB (Beyer et al., SIGMOD'07). The diagonal
    * (type_a = type_b) degenerates to the plain KMV distinct estimate; the
    * exact intersection rides along to show the sketch error. Estimates are
    * integer-exact up to one double multiply+divide, so the DuckDB replay
    * hash-matches bit-for-bit. */
  def thetaKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    val sk = ev.groupBy(col("event_type"))
      .agg(graft.plans.KmvSketch.sketch(col("user_id").cast("string")).as("sk"))
    // exact side: one shuffle by user_id; per-pair counts off the distinct set
    val du = ev.select(col("event_type"), col("user_id")).distinct()
    val exact = du.as("x").join(du.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") <= col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact"))
    // sketch side: a handful of rows — broadcast the self-join both ways
    val est = broadcast(sk.as("a")).join(broadcast(sk.as("b")),
        col("a.event_type") <= col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        graft.plans.KmvSketch.intersectEstimate("a.sk", "b.sk").as("est"))
    exact.join(broadcast(est), Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("exact"), col("est"))
  }

  /** KMV-replay CTEs shared by the batch and streaming theta oracles —
    * k=256 and the hash layout exist in exactly two places: KmvSketch
    * (engine) and here (oracle). Expects an `events` table; yields
    * `inter(type_a, type_b, theta, m)`. */
  val kmvReplayCtes: String =
    """h AS (
      |  SELECT DISTINCT event_type,
      |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      |  FROM events),
      |rk AS (SELECT event_type, h,
      |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r,
      |         count(*) OVER (PARTITION BY event_type) AS nd FROM h),
      |th AS (SELECT event_type,
      |         CASE WHEN max(nd) < 256 THEN CAST(power(2.0, 60) AS BIGINT)
      |              ELSE max(CASE WHEN r = 256 THEN h END) END AS theta
      |       FROM rk GROUP BY 1),
      |s AS (SELECT event_type, h FROM rk WHERE r <= 256),
      |pair AS (SELECT ta.event_type AS type_a, tb.event_type AS type_b,
      |           least(ta.theta, tb.theta) AS theta
      |         FROM th ta JOIN th tb ON ta.event_type <= tb.event_type),
      |inter AS (SELECT p.type_a, p.type_b, p.theta,
      |            (SELECT count(*) FROM s sa JOIN s sb ON sb.h = sa.h
      |             WHERE sa.event_type = p.type_a AND sb.event_type = p.type_b
      |               AND sa.h < p.theta) AS m
      |          FROM pair p)""".stripMargin

  val kmvEstimateSql: String =
    "round(CAST(i.m AS DOUBLE) * power(2.0, 60) / i.theta, 4)"

  val thetaKmvSql: String =
    s"""WITH $kmvReplayCtes,
       |ex AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
       |         count(*) AS exact
       |       FROM (SELECT DISTINCT event_type, user_id FROM events) x
       |       JOIN (SELECT DISTINCT event_type, user_id FROM events) y
       |         ON x.user_id = y.user_id AND x.event_type <= y.event_type
       |       GROUP BY 1, 2)
       |SELECT ex.type_a, ex.type_b, ex.exact,
       |  $kmvEstimateSql AS est
       |FROM ex JOIN inter i ON i.type_a = ex.type_a AND i.type_b = ex.type_b""".stripMargin

  // ---- latency/value quantiles --------------------------------------------

  /** Per-type value quantiles. Exact `percentile` (per-group sort) matches
    * DuckDB's `quantile_cont` interpolation bit-for-bit at 6dp; at 100 TB
    * swap in `approx_percentile` (t-digest, partial-agg mergeable) — the
    * query shape is identical, only the agg function changes. */
  def quantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir).events
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))

  val quantilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90,
      |  round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY 1""".stripMargin

  // ---- Count-Min frequency sketch -----------------------------------------

  val cmsDepth = 3
  val cmsWidth = 64

  /** Count-Min sketch estimates vs exact counts — the third sketch family
    * next to HLL (distinct) and TopKByScore (heavy ranks): per-key frequency
    * under sublinear state. The sketch is d×w = 192 mergeable counters built
    * in ONE partial aggregation (order-independent sums — exactly
    * reproducible, unlike Misra-Gries-style samplers); estimates probe it
    * via a broadcast join and take the min over rows. Output pairs every
    * probe's estimate with its true count, so the CMS overestimate guarantee
    * (`est_n ≥ true_n`) is visible and spec-asserted. Hashes are the
    * engine's portable md5 family, salted per row. */
  def cms(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events.select(col("user_id"))
    def cells(df: DataFrame): DataFrame = df
      .select(col("user_id"), posexplode(array((0 until cmsDepth).map { j =>
        pmod(graft.functions.Portable.hash64(col("user_id").cast("string"), s"cms$j"),
          lit(cmsWidth.toLong))
      }: _*)))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "cell")
    val sketch = cells(ev).groupBy(col("j"), col("cell")).agg(count(lit(1)).as("c"))
    val probes = cells(ev.filter(col("user_id") < 20).distinct())
    val est = probes.join(broadcast(sketch), Seq("j", "cell"))
      .groupBy(col("user_id")).agg(min(col("c")).as("est_n"))
    val truth = ev.filter(col("user_id") < 20)
      .groupBy(col("user_id")).agg(count(lit(1)).as("true_n"))
    truth.join(est, "user_id")
  }

  val cmsSql: String = {
    val cell = "CAST('0x' || substr(md5('cms' || j || CAST(user_id AS VARCHAR)), 1, 15) " +
      s"AS BIGINT) % $cmsWidth"
    s"""WITH cells AS (
       |  SELECT user_id, j, $cell AS cell
       |  FROM events, LATERAL unnest([0, 1, 2]) t(j)),
       |sketch AS (SELECT j, cell, count(*) AS c FROM cells GROUP BY 1, 2),
       |probes AS (
       |  SELECT DISTINCT user_id, j, $cell AS cell
       |  FROM events, LATERAL unnest([0, 1, 2]) t(j)
       |  WHERE user_id < 20),
       |est AS (
       |  SELECT user_id, min(c) AS est_n
       |  FROM probes JOIN sketch USING (j, cell) GROUP BY 1),
       |truth AS (
       |  SELECT user_id, count(*) AS true_n FROM events
       |  WHERE user_id < 20 GROUP BY 1)
       |SELECT truth.user_id, true_n, est_n
       |FROM truth JOIN est USING (user_id)""".stripMargin
  }

  // ---- rolling distinct actives (DAU / WAU) -------------------------------

  /** Daily + trailing-7-day distinct actives — the DAU/WAU report. Distinct
    * COUNT over a sliding window isn't directly window-able; the scalable
    * pattern is: distinct (day, user) pairs first (one shuffle, corpus
    * collapses to activity pairs), then EXPLODE each pair into the ≤7
    * window days it contributes to — a plain equi-aggregation with
    * map-side expansion, no range join (a days×pairs non-equi join would
    * re-scan the whole pair set per day). The trailing day dim prunes
    * window anchors with no activity of their own. */
  def wau(spark: SparkSession, sfDir: String): DataFrame = {
    // r9 OPT (guide §2.4/§2.3): the previous form built the distinct
    // (day, user) frame and consumed it THREE times un-persisted (days dim,
    // dau agg, wau agg) then stitched with two joins — 3 corpus scans,
    // 3 distinct shuffles, 2 join exchanges. Fused: explode each activity
    // row into its ≤7 trailing window anchors FIRST (map-side, no shuffle),
    // then ONE (day, user) aggregation dedupes pairs while carrying an
    // own-day flag (max(d = day)), and ONE (day) aggregation reads both
    // counts off it: wau = pair count, dau = Σ own-flag. dau > 0 filters to
    // exactly the days with own activity (the old days-dim inner join).
    // 1 scan + 2 exchanges, both with map-side partial aggregation; at
    // 100 TB the first exchange carries the same ≤7×|distinct pairs| rows
    // the old wau agg shuffled, and the other 5 passes disappear.
    // r10 fix (r9 ADVICE): the oracle's countDistinct(user_id) excludes
    // NULL users while count(1) over (day, user) groups would count a
    // NULL-user group — events.user_id is non-null by generation, but the
    // rewrite should be equivalent for ALL inputs, not just this corpus.
    val ev = Tables(spark, sfDir).events
      .filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("d"), col("user_id"))
    ev.select(col("d"), col("user_id"),
        explode(sequence(col("d"), date_add(col("d"), 6))).as("day"))
      .groupBy(col("day"), col("user_id"))
      .agg(max(when(col("d") === col("day"), 1L).otherwise(0L)).as("own"))
      .groupBy(col("day"))
      .agg(sum(col("own")).as("dau"), count(lit(1)).as("wau"))
      .filter(col("dau") > 0)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
  }

  val wauSql: String =
    """WITH du AS (
      |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT d AS day FROM du),
      |dau AS (SELECT d AS day, count(*) AS dau FROM du GROUP BY 1),
      |wau AS (
      |  SELECT day, count(DISTINCT user_id) AS wau FROM (
      |    SELECT d + CAST(i AS INTEGER) AS day, user_id
      |    FROM du, LATERAL unnest(range(0, 7)) t(i))
      |  GROUP BY 1)
      |SELECT strftime(days.day, '%Y-%m-%d') AS day, dau, wau
      |FROM days JOIN dau USING (day) JOIN wau USING (day)""".stripMargin

  // ---- cohort retention matrix --------------------------------------------

  /** Daily cohort retention: users grouped by first-seen day, counted
    * distinct on each later active day's offset — the standard retention
    * triangle. Shapes: the first-seen dim is one partial agg on user_id;
    * the join back is co-partitioned on the SAME key (no extra exchange);
    * the retention cell count is a two-phase distinct agg. Day keys emitted
    * as strings so the compare is representation-proof. */
  def cohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
    ev.join(first, "user_id")
      .groupBy(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("d"), col("cohort_d")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  val cohortsSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
      |first AS (
      |  SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY 1)
      |SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_day,
      |  date_diff('day', cohort_d, d) AS day_offset,
      |  count(DISTINCT ev.user_id) AS n_users
      |FROM ev JOIN first ON ev.user_id = first.user_id
      |GROUP BY 1, 2""".stripMargin

  // ---- rate-anomaly detection ---------------------------------------------

  val spikeWindow = 10
  // alert-sensitivity knob (production convention is 3σ; 2σ is the level
  // with a non-empty tail on this corpus's uniform synthetic rates)
  val spikeZ = 2.0

  /** Event-rate anomaly detection — the "is something unusual happening"
    * query this whole watcher exists for (the reference surfaces raw
    * signup throughput to a human, eventstream.rs:46-52; this makes the
    * judgment an operator). Per (event_type, minute) counts, then a
    * z-score of each bucket against its `spikeWindow` trailing observed
    * buckets. Variance is assembled from EXACT integer window sums
    * ((n·Σx² − (Σx)²) / (n·(n−1))) carried in 38-digit decimals (Spark)
    * / HUGEINT (oracle), so both engines derive identical doubles at any
    * event rate — no streaming-variance accumulation drift and no Long
    * wrap on x² for hot buckets. A FLAT baseline (zero variance) with any
    * deviation is infinite z: flagged 'spike' with z left null — the
    * clearest anomaly must not read as 'ok'. One count agg + one window
    * per event_type series; series are independent, so the window never
    * sees more than one type's buckets (at 100 TB the bucket series per
    * type is tiny — minutes per year — while the count agg does all the
    * heavy lifting map-side). */
  def spikes(spark: SparkSession, sfDir: String): DataFrame =
    spikesOver(Tables(spark, sfDir).events)

  /** [[spikes]] over any frame with (ts timestamp, event_type) columns. */
  def spikesOver(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("minute_epoch"))
      .rowsBetween(-spikeWindow, -1)
    val nDec = col("n_events").cast("decimal(19,0)")
    events
      .groupBy(
        unix_timestamp(date_trunc("minute", col("ts"))).as("minute_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("w_n", count(col("n_events")).over(w))
      .withColumn("s1", sum(nDec).over(w))
      .withColumn("s2", sum(nDec * nDec).over(w))
      .filter(col("w_n") === spikeWindow)
      // exact integer variance numerator; its sign is an exact predicate
      .withColumn("num", col("w_n") * col("s2") - col("s1") * col("s1"))
      .withColumn("z", when(col("num") > 0,
        round((col("n_events").cast("double") -
            col("s1").cast("double") / col("w_n")) /
          sqrt(col("num").cast("double") / (col("w_n") * (col("w_n") - 1))), 6)))
      .select(col("event_type"), col("minute_epoch"), col("n_events"), col("z"),
        // |z|: a COLLAPSE is as anomalous as a surge — a one-sided test
        // reads a site outage as 'ok' the moment the baseline has any
        // variance at all
        when(col("z").isNotNull && abs(col("z")) >= spikeZ, "spike")
          // flat baseline, deviating bucket: z is +/-infinity, not 'ok'
          .when(col("num") === 0 && nDec * col("w_n") =!= col("s1"), "spike")
          .otherwise("ok").as("verdict"))
  }

  val spikesSql: String =
    s"""WITH c AS (
       |  SELECT CAST(epoch(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS BIGINT) AS minute_epoch,
       |    event_type, count(*) AS n_events
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT *,
       |    count(n_events) OVER win AS w_n,
       |    CAST(sum(n_events) OVER win AS HUGEINT) AS s1,
       |    CAST(sum(CAST(n_events AS HUGEINT) * n_events) OVER win AS HUGEINT) AS s2
       |  FROM c WINDOW win AS (PARTITION BY event_type ORDER BY minute_epoch
       |    ROWS BETWEEN $spikeWindow PRECEDING AND 1 PRECEDING)),
       |v AS (
       |  SELECT *, w_n * s2 - s1 * s1 AS num FROM w WHERE w_n = $spikeWindow),
       |z AS (
       |  SELECT event_type, minute_epoch, n_events, num, s1, w_n,
       |    CASE WHEN num > 0 THEN
       |      round((CAST(n_events AS DOUBLE) - CAST(s1 AS DOUBLE) / w_n)
       |        / sqrt(CAST(num AS DOUBLE) / (w_n * (w_n - 1))), 6) END AS z
       |  FROM v)
       |SELECT event_type, minute_epoch, n_events, z,
       |  CASE WHEN z IS NOT NULL AND abs(z) >= $spikeZ THEN 'spike'
       |       WHEN num = 0 AND CAST(n_events AS HUGEINT) * w_n <> s1 THEN 'spike'
       |       ELSE 'ok' END AS verdict
       |FROM z""".stripMargin

  // ---- time-series gap-fill -----------------------------------------------

  /** Dense per-(type, minute) event series: sparse counts zero-filled over
    * each type's [first, last] minute — the sparse→dense pass every
    * time-series consumer (anomaly models, dashboards, the ev_spike z-score)
    * wants under it, made explicit.
    *
    * Scale shape: the dense grid is generated with a TWO-LEVEL explode —
    * hours from the type's bounds, then the ≤60 minutes inside each hour —
    * so no task ever materializes a type's whole range as one array: a type
    * spanning years fans out across the hour rows (the mm_batchpack
    * sharding lesson). One agg shuffle for the sparse counts, a tiny
    * per-type bounds agg, and one equi-join on (type, minute) that Spark
    * distributes on exactly the output key. */
  def gapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    val sparse = ev.groupBy(col("event_type"),
        unix_timestamp(date_trunc("minute", col("ts"))).as("minute_epoch"))
      .agg(count(lit(1)).as("n"))
    val bounds = sparse.groupBy(col("event_type"))
      .agg(min(col("minute_epoch")).as("lo"), max(col("minute_epoch")).as("hi"))
    val hours = bounds.select(col("event_type"), col("lo"), col("hi"),
      explode(sequence(col("lo") - pmod(col("lo"), lit(3600L)), col("hi"), lit(3600L)))
        .as("h"))
    val dense = hours.select(col("event_type"),
      explode(sequence(greatest(col("h"), col("lo")),
        least(col("h") + 3540L, col("hi")), lit(60L))).as("minute_epoch"))
    dense.join(sparse, Seq("event_type", "minute_epoch"), "left")
      .select(col("event_type"), col("minute_epoch"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  val gapfillSql: String =
    """WITH sparse AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS BIGINT) AS minute_epoch,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT event_type, min(minute_epoch) AS lo, max(minute_epoch) AS hi
      |  FROM sparse GROUP BY 1),
      |dense AS (
      |  SELECT event_type, unnest(range(lo, hi + 60, 60)) AS minute_epoch
      |  FROM bounds)
      |SELECT d.event_type, d.minute_epoch, coalesce(s.n, 0) AS n
      |FROM dense d LEFT JOIN sparse s
      |  ON s.event_type = d.event_type AND s.minute_epoch = d.minute_epoch""".stripMargin

  // ---- incremental aggregate maintenance ----------------------------------

  /** The delta cutoff: everything from this day on is "the new increment".
    * A production refresh passes the previous watermark here. */
  val incrSplitNs: Long =
    java.time.Instant.parse("2024-01-24T00:00:00Z").getEpochSecond * 1000000000L

  /** Incremental rollup maintenance: the standing per-(type, day) aggregate
    * table is refreshed by MERGING the stored partials with partials
    * computed over the delta only — never by rescanning history. Every
    * statistic is chosen mergeable (count/sum/min/max; the mean is derived
    * AFTER the merge), which is exactly Spark's partial-aggregation
    * contract, promoted to a cross-run maintenance strategy: at 100 TB the
    * daily refresh costs O(delta), and both scans here prune on the split
    * predicate PUSHED into the parquet scan — `Tables.eventsBefore/From`
    * apply the cutoff to the RAW loaded `ts` column, whatever its physical
    * flavor, precisely so it reaches `PushedFilters` (in prod the "old"
    * branch is a read of the stored rollup, not a scan). The merged result
    * hash-matches the full recompute — that equality IS the oracle check. */
  def incrAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables(spark, sfDir)
    def withDay(d: DataFrame): DataFrame =
      d.withColumn("day_us", graft.epochUs(date_trunc("day", col("ts"))))
    def partials(d: DataFrame): DataFrame =
      d.groupBy(col("event_type"), col("day_us"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v_raw"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"))
    val old = partials(withDay(t.eventsBefore(incrSplitNs)))
    val delta = partials(withDay(t.eventsFrom(incrSplitNs)))
    old.unionByName(delta)
      .groupBy(col("event_type"), col("day_us"))
      .agg(sum(col("n")).as("n"), round(sum(col("sum_v_raw")), 2).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
      .withColumn("avg_v", round(col("sum_v") / col("n"), 6))
  }

  val incrAggSql: String =
    """SELECT event_type,
      |  epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) AS day_us,
      |  count(*) AS n, round(sum(value), 2) AS sum_v,
      |  min(value) AS min_v, max(value) AS max_v,
      |  round(round(sum(value), 2) / count(*), 6) AS avg_v
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Time-RANGE window frames — value-based, not row-count-based: each
    * event's trailing-hour activity (count + exact integer sum) per user.
    * ROWS frames (q_running) can't express "the last hour"; RANGE frames
    * are also tie-safe BY CONSTRUCTION (all peers at the same ts_us are in
    * every frame that includes the boundary, whatever their shuffle order —
    * no (ts, event_id) tie-break needed). ONE shuffle on user_id serves
    * both window aggregates; sums run on floor(value) BIGINT so both
    * engines fold exactly. */
  def rolling(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"),
        graft.epochUs(col("ts")).as("ts_us"),
        floor(col("value")).cast("long").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    ev.select(col("event_id"), col("user_id"), col("ts_us"),
      count(lit(1)).over(w).as("n_1h"),
      sum(col("v")).over(w).as("sum_v_1h"))
  }

  val rollingSql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) OVER w AS BIGINT) AS sum_v_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Behavioral transition matrix (first-order Markov over the event
    * stream): per user, each event's successor in deterministic
    * (ts, event_id) order, counted into (from, to) cells. ONE user_id
    * window shuffle + ONE bounded aggregation (≤ |types|² cells at any
    * corpus size) — the analytics view product teams read as a funnel
    * graph, and the transition prior a sessionization QA job checks
    * against. */
  def paths(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.epochUs(col("ts")).as("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    ev.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  val pathsSql: String =
    """WITH o AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC) AS to_type
      |  FROM events)
      |SELECT event_type AS from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** First-order Markov chain over the per-user event stream WITH the
    * terminal state — ev_paths models observed transitions; this fits the
    * full chain: the last event of every user transitions to 'END' (the
    * absorbing state product analytics needs to answer "where do journeys
    * end?"), and each (from → to) edge carries its probability
    * n / Σ_to n. Probabilities are ONE division of exact integer counts
    * routed through round(…, 6), so both engines derive identical doubles.
    * Plan: one user_id shuffle for the lead(), one |types|²-sized agg —
    * the model is O(|types|²) regardless of corpus size. */
  def markov(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val trans = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.epochUs(col("ts")).as("ts_us"))
      .withColumn("to_type", coalesce(lead(col("event_type"), 1).over(w), lit("END")))
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    trans
      .withColumn("row_n", sum(col("n")).over(wf))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("row_n"), 6).as("p"))
  }

  val markovSql: String =
    """WITH o AS (
      |  SELECT event_type AS from_type,
      |    coalesce(lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC),
      |      'END') AS to_type
      |  FROM events),
      |t AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM o GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM t""".stripMargin

  /** Seasonality profile — the (day-of-week × hour-of-day) activity matrix
    * behind capacity planning and anomaly baselines. Both axes come from
    * INTEGER epoch arithmetic ((day_index + 4) mod 7 anchors 1970-01-01 to
    * Thursday; 0 = Sunday) — no engine-specific calendar functions, so the
    * buckets cannot drift between Spark and the oracle. One map-side-heavy
    * agg into ≤168 cells plus a broadcast total; distinct actives are the
    * two-phase distinct that scales to any corpus. */
  def seasonality(spark: SparkSession, sfDir: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = Tables(spark, sfDir).events
      .select(graft.epochUs(col("ts")).as("ts_us"), col("user_id"))
      .select(((expr(s"ts_us DIV $dayUs") + 4) % 7).as("dow"),
        expr(s"(ts_us % $dayUs) DIV 3600000000").as("hour"),
        col("user_id"))
    seasonalityOver(ev.groupBy(col("dow"), col("hour"), col("user_id"))
      .agg(count(lit(1)).as("c")))
  }

  /** The seasonality readout as a READ-TIME VIEW over a drained
    * (dow, hour, user_id, c) presence matrix. The matrix cells are
    * mergeable order/partition/micro-batch-invariant SUMS (distinct
    * actives themselves cannot fold incrementally, but the per-user
    * presence rows they are counted FROM can — the same move madOver
    * makes for medians); state is bounded by 168 × population. Shared
    * verbatim by the batch row and the streaming twin (st_seasonality). */
  def seasonalityOver(presence: DataFrame): DataFrame = {
    val cells = presence.groupBy(col("dow"), col("hour"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_users"))
    val total = cells.agg(sum(col("n")).as("total"))
    cells
      .crossJoin(broadcast(total))
      .select(col("dow"), col("hour"), col("n"), col("n_users"),
        round(col("n").cast("double") / col("total"), 6).as("share"))
  }

  val seasonalitySql: String =
    """WITH o AS (
      |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000) // 3600000000 AS hour,
      |    user_id
      |  FROM events)
      |SELECT dow, hour, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM o), 6) AS share
      |FROM o GROUP BY 1, 2""".stripMargin

  // ---- schema-flexible extraction (Spark 4 VARIANT) ------------------------

  /** Heterogeneous payloads: nested objects, type drift across records,
    * missing paths, arrays, and one malformed line — the shapes a real
    * event feed ships without warning. */
  val variantCorpus: Seq[(Long, String)] = Seq(
    (1L, """{"user": {"id": 7, "tags": ["mod", "new"]}, "score": 3.5}"""),
    (2L, """{"user": {"id": 8}, "score": 12}"""),
    (3L, """{"user": "anon", "score": "high"}"""),
    (4L, """{"items": [1, 2, 3]}"""),
    (5L, """not json"""))

  /** Schema-flexible semi-structured extraction via Spark 4 VARIANT — the
    * modern answer to `ev_parse_json`'s fixed-schema `from_json`: payloads
    * parse ONCE into the binary variant encoding (`try_parse_json`,
    * malformed → null, the reference's deserialize-error skip), then any
    * number of typed paths extract lazily (`try_variant_get` — wrong-typed
    * or absent paths yield null, never an error) and `schema_of_variant`
    * reports each record's observed shape for drift monitoring. At 100 TB
    * this is the schema-on-read posture: one parse per record regardless
    * of how many fields downstream queries touch, no reprocessing when a
    * producer adds a field. Per-row scan math, zero shuffles. */
  def variantExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    variantCorpus.toDF("rec_id", "payload")
      .withColumn("v", try_parse_json(col("payload")))
      .select(col("rec_id"),
        try_variant_get(col("v"), "$.user.id", "bigint").as("user_id"),
        try_variant_get(col("v"), "$.user.tags[0]", "string").as("first_tag"),
        try_variant_get(col("v"), "$.score", "double").as("score"),
        try_variant_get(col("v"), "$.items[2]", "bigint").as("third_item"),
        col("v").isNull.as("malformed"),
        schema_of_variant(col("v")).as("vschema"))
  }

  /** Oracle: hand-traced VALUES over the corpus literals (the cmd_parse
    * pattern) — typed-path verdicts follow the documented variant rules
    * (absent path → null, incompatible type → null under `try_`), schema
    * strings follow schema_of_variant's documented rendering (numeric
    * literals type as the narrowest exact type: 12 → BIGINT, 3.5 →
    * DECIMAL(2,1); null variant → VOID). */
  val variantExtractSql: String =
    """SELECT CAST(rec_id AS BIGINT) AS rec_id,
      |  CAST(user_id AS BIGINT) AS user_id, first_tag,
      |  CAST(score AS DOUBLE) AS score, CAST(third_item AS BIGINT) AS third_item,
      |  malformed, vschema
      |FROM (VALUES
      |  (1, 7, 'mod', 3.5, NULL, false,
      |   'OBJECT<score: DECIMAL(2,1), user: OBJECT<id: BIGINT, tags: ARRAY<STRING>>>'),
      |  (2, 8, NULL, 12.0, NULL, false,
      |   'OBJECT<score: BIGINT, user: OBJECT<id: BIGINT>>'),
      |  (3, NULL, NULL, NULL, NULL, false,
      |   'OBJECT<score: STRING, user: STRING>'),
      |  (4, NULL, NULL, NULL, 3, false,
      |   'OBJECT<items: ARRAY<BIGINT>>'),
      |  (5, NULL, NULL, NULL, NULL, true, NULL)
      |) t(rec_id, user_id, first_tag, score, third_item, malformed, vschema)""".stripMargin

  // ---- windowed trending top-k --------------------------------------------

  /** Per-hour trending users (top-3 by event count per hour bucket) — the
    * "what's hot NOW" windowed complement of `ev_topk_users`' global
    * TakeOrdered. Two bounded exchanges: the (hour, user) count agg
    * (map-side partials) and the per-hour rank window, where Spark's
    * WindowGroupLimit pushes the rank≤k cutoff BELOW the window exchange —
    * each map task ships only its local top-k per hour, so the shuffle
    * volume is O(hours·k·tasks), independent of user cardinality (the
    * plan-spec'd guarantee that makes this shape safe at 100 TB). Ties
    * break by user_id for a deterministic result on both engines. */
  def trending(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_epoch")).orderBy(col("n").desc, col("user_id").asc)
    Tables(spark, sfDir).events
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
  }

  val trendingSql: String =
    """WITH c AS (
      |  SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour_epoch,
      |    user_id, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT hour_epoch, user_id, n, rk FROM (
      |  SELECT hour_epoch, user_id, n,
      |    CAST(row_number() OVER (PARTITION BY hour_epoch
      |      ORDER BY n DESC, user_id ASC) AS BIGINT) AS rk
      |  FROM c) t
      |WHERE rk <= 3""".stripMargin

  // ---- batch sessionization (gaps-and-islands) ----------------------------

  /** Batch sessionization: 30-minute-gap sessions per user with per-session
    * stats — the batch twin of `st_sessionize` (the canonical
    * gaps-and-islands shape: lag → new-session flag → running-sum session
    * id → per-session aggregation). ONE shuffle on user_id serves the lag
    * window, the cumulative sum, AND the final (user_id, sess_id) group —
    * HashPartitioning(user_id) satisfies the grouping's clustered
    * distribution, so no second exchange at any scale. Ties share the
    * deterministic (ts_us, event_id) total order the streaming oracle
    * established (duplicate-(user, ts) events must never split a session
    * differently between the two windows). */
  def sessions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), graft.epochUs(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > lit(1800000000L), 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }

  val sessionsSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |o2 AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT user_id, ts_us,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      |  FROM o2)
      |SELECT user_id, sess_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
      |  count(*) AS n_events, max(ts_us) - min(ts_us) AS dur_us
      |FROM s GROUP BY user_id, sess_id""".stripMargin

  // ---- peak concurrency (sweep line) ---------------------------------------

  /** Peak concurrent sessions per hour — the capacity-planning readout
    * (how many users are on AT ONCE, not how many events arrive; the load
    * number an ops team sizes streaming state and connection pools from).
    * The naive form is an interval self-join (O(n²) at any real scale) or
    * a single global ordered running sum (one task owns the whole
    * timeline). This is the scalable two-level sweep line instead:
    * sessions become ±1 boundary deltas, each HOUR sweeps its own deltas
    * under a bounded window (partitioned running sum — ties resolve
    * (ts, +1-before-−1, user, sess) so touching sessions count as
    * concurrent and the prefix max is order-invariant), and hours chain
    * through a cumulative baseline over the BOUNDED hour dim (the
    * tx_textrank / ev_gapfill dim-window pattern — never the corpus).
    * peak(h) = baseline(h) + max in-hour prefix = the global running
    * concurrency's max, without any global order. Shuffles: one on
    * user_id (the session windows), one on hour — both keyed, both
    * partial-agg friendly. */
  def concurrency(spark: SparkSession, sfDir: String): DataFrame = {
    val wSess = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val sess = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), graft.epochUs(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wSess))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > lit(1800000000L), 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        wSess.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
    val deltas = sess.select(col("user_id"), col("sess_id"),
        col("start_us").as("ts_us"), lit(1L).as("d"))
      .unionAll(sess.select(col("user_id"), col("sess_id"),
        col("end_us").as("ts_us"), lit(-1L).as("d")))
      .withColumn("hour", expr("ts_us DIV 3600000000"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour"))
      .orderBy(col("ts_us").asc, col("d").desc, col("user_id").asc, col("sess_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val perHour = deltas
      .withColumn("rel", sum(col("d")).over(wIn))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_deltas"), sum(col("d")).as("tot"),
        max(col("rel")).as("max_rel"))
    val wHours = org.apache.spark.sql.expressions.Window
      .orderBy(col("hour"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perHour
      .withColumn("base", coalesce(sum(col("tot")).over(wHours), lit(0L)))
      .select((col("hour") * 3600).as("hour_epoch"), col("n_deltas"),
        (col("base") + col("max_rel")).as("peak"))
  }

  val concurrencySql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |o2 AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS new_sess
      |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT user_id, ts_us,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      |  FROM o2),
      |sess AS (
      |  SELECT user_id, sess_id, min(ts_us) AS start_us, max(ts_us) AS end_us
      |  FROM s GROUP BY 1, 2),
      |d AS (
      |  SELECT user_id, sess_id, start_us AS ts_us, 1 AS d FROM sess
      |  UNION ALL
      |  SELECT user_id, sess_id, end_us AS ts_us, -1 AS d FROM sess),
      |r AS (
      |  SELECT ts_us,
      |    CAST(sum(d) OVER (ORDER BY ts_us ASC, d DESC, user_id ASC, sess_id ASC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rc
      |  FROM d)
      |SELECT (ts_us // 3600000000) * 3600 AS hour_epoch,
      |  count(*) AS n_deltas, max(rc) AS peak
      |FROM r GROUP BY 1""".stripMargin

  // ---- sample-ratio mismatch guardrail --------------------------------------

  /** χ² critical at α=0.05, df=1. */
  val srmCritical = 3.841

  /** Sample-ratio mismatch (SRM) check — the guardrail run BEFORE reading
    * any experiment result (Fabijan et al., KDD'19: a significant
    * deviation of the realized A/B split from its design ratio means the
    * assignment or logging is broken and every downstream metric —
    * including ev_abtest's z-readout — is invalid). Exposed = any `view`
    * (the population ev_abtest reads), assignment = the same parity split,
    * computed as a pushed-down type filter + two-phase distinct on
    * user_id; expected split 50/50;
    * χ² with df=1 collapses to (n_a − n_b)²/(n_a + n_b) — an EXACT-BIGINT
    * numerator and ONE double division, 6dp-rounded, so the verdict is
    * engine-stable. Scale shape: the per-user fold shares ev_abtest's one
    * user_id exchange; the readout is one row. */
  def abSrm(spark: SparkSession, sfDir: String): DataFrame = {
    val exposed = Tables(spark, sfDir).events
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct()
      .select(when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B").as("variant"))
    exposed.groupBy(col("variant")).agg(count(lit(1)).as("n"))
      .agg(max(when(col("variant") === "A", col("n"))).as("n_a"),
        max(when(col("variant") === "B", col("n"))).as("n_b"))
      .select(col("n_a"), col("n_b"),
        round(((col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))).cast("double")
          / (col("n_a") + col("n_b")).cast("double"), 6).as("chi2"))
      .withColumn("srm", col("chi2") > srmCritical)
  }

  val abSrmSql: String =
    s"""WITH exposed AS (
       |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
       |v AS (
       |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM exposed),
       |c AS (SELECT variant, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
       |w AS (
       |  SELECT max(CASE WHEN variant = 'A' THEN n END) AS n_a,
       |    max(CASE WHEN variant = 'B' THEN n END) AS n_b
       |  FROM c)
       |SELECT n_a, n_b,
       |  round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
       |    / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
       |  round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
       |    / CAST(n_a + n_b AS DOUBLE), 6) > $srmCritical AS srm
       |FROM w""".stripMargin

  // ---- A/B experiment readout ----------------------------------------------

  /** Two-sample experiment readout — the analytics row every event platform
    * ships: deterministic variant assignment (user_id parity — the
    * hash-split samp_split generalizes), per-variant exposure (saw a view)
    * and conversion (purchased within 1 h AFTER first view — an attribution
    * window, so the rate is a real dial rather than saturating on dense
    * streams), and the pooled two-proportion z-statistic. ONE shuffle on
    * user_id serves both the first-view window and the per-user fold
    * (HashPartitioning(user_id) satisfies the grouping), then a 2-row
    * variant agg and a ONE-ROW readout — at 100 TB the only corpus-sized
    * work is that first exchange. Rates and z are double divisions of
    * exact integer operands evaluated in the same expression order on both
    * engines (sqrt is IEEE-correctly-rounded), so the verdict is
    * engine-stable without rounding slack; a degenerate experiment
    * (se = 0) reads out z = null, significant = false on both. */
  def abtest(spark: SparkSession, sfDir: String): DataFrame = {
    val wU = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val perUser = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), graft.epochUs(col("ts")).as("ts_us"))
      .withColumn("fv", min(when(col("event_type") === "view", col("ts_us"))).over(wU))
      .filter(col("fv").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(when(col("event_type") === "purchase"
          && col("ts_us") > col("fv")
          && col("ts_us") <= col("fv") + lit(3600000000L), 1)).as("np"))
      .select(
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B").as("variant"),
        col("np"))
    val byVariant = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_exp"),
        count(when(col("np") > 0, 1)).as("n_conv"))
    byVariant.agg(
        max(when(col("variant") === "A", col("n_exp"))).as("n_exp_a"),
        max(when(col("variant") === "A", col("n_conv"))).as("n_conv_a"),
        max(when(col("variant") === "B", col("n_exp"))).as("n_exp_b"),
        max(when(col("variant") === "B", col("n_conv"))).as("n_conv_b"))
      .withColumn("ra", col("n_conv_a").cast("double") / col("n_exp_a"))
      .withColumn("rb", col("n_conv_b").cast("double") / col("n_exp_b"))
      .withColumn("p", (col("n_conv_a") + col("n_conv_b")).cast("double")
        / (col("n_exp_a") + col("n_exp_b")))
      .withColumn("se",
        sqrt((col("p") * (lit(1).cast("double") - col("p"))) *
          (lit(1).cast("double") / col("n_exp_a") + lit(1).cast("double") / col("n_exp_b"))))
      .withColumn("z",
        when(col("se") === 0, lit(null).cast("double"))
          .otherwise((col("ra") - col("rb")) / col("se")))
      .select(col("n_exp_a"), col("n_conv_a"), round(col("ra"), 6).as("rate_a"),
        col("n_exp_b"), col("n_conv_b"), round(col("rb"), 6).as("rate_b"),
        round(col("z"), 6).as("z"),
        coalesce(abs(col("z")) > 1.96, lit(false)).as("significant"))
  }

  val abtestSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    min(CASE WHEN event_type = 'view'
      |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
      |      OVER (PARTITION BY user_id) AS fv
      |  FROM events),
      |u AS (
      |  SELECT user_id,
      |    count(CASE WHEN event_type = 'purchase' AND ts_us > fv
      |      AND ts_us <= fv + 3600000000 THEN 1 END) AS np
      |  FROM e WHERE fv IS NOT NULL GROUP BY 1),
      |bv AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    count(*) AS n_exp,
      |    count(CASE WHEN np > 0 THEN 1 END) AS n_conv
      |  FROM u GROUP BY 1),
      |one AS (
      |  SELECT
      |    max(CASE WHEN variant = 'A' THEN n_exp END) AS n_exp_a,
      |    max(CASE WHEN variant = 'A' THEN n_conv END) AS n_conv_a,
      |    max(CASE WHEN variant = 'B' THEN n_exp END) AS n_exp_b,
      |    max(CASE WHEN variant = 'B' THEN n_conv END) AS n_conv_b
      |  FROM bv),
      |calc AS (
      |  SELECT *, CAST(n_conv_a AS DOUBLE) / n_exp_a AS ra,
      |    CAST(n_conv_b AS DOUBLE) / n_exp_b AS rb,
      |    CAST(n_conv_a + n_conv_b AS DOUBLE) / (n_exp_a + n_exp_b) AS p
      |  FROM one),
      |sc AS (
      |  SELECT *, sqrt((p * (CAST(1 AS DOUBLE) - p)) *
      |      (CAST(1 AS DOUBLE) / n_exp_a + CAST(1 AS DOUBLE) / n_exp_b)) AS se
      |  FROM calc),
      |zc AS (
      |  SELECT *, CASE WHEN se = 0 THEN NULL ELSE (ra - rb) / se END AS z
      |  FROM sc)
      |SELECT n_exp_a, n_conv_a, round(ra, 6) AS rate_a,
      |  n_exp_b, n_conv_b, round(rb, 6) AS rate_b,
      |  round(z, 6) AS z,
      |  coalesce(abs(z) > 1.96, false) AS significant
      |FROM zc""".stripMargin

  // ---- CUPED variance-reduced readout --------------------------------------

  /** CUPED-adjusted experiment readout (Deng et al., WSDM'13 — the
    * industry-standard variance-reduction layer over ev_abtest): per-user
    * PRE-period activity is a covariate that soaks up between-user
    * variance the treatment cannot have caused, so the adjusted metric
    * y' = y − θ(x − x̄) reads out the same expected lift at a fraction of
    * the variance. Pre/post split at the corpus timeline midpoint
    * ((min+max)/2 of ts_us — exact BIGINT), x = pre-period events per
    * user, y = post-period events per user; θ = cov(x,y)/var(x) over the
    * POOLED population (both arms — pooling keeps θ treatment-independent,
    * the CUPED validity condition). All moments accumulate as EXACT-BIGINT
    * sums (n, Σx, Σy, Σxy, Σx², Σy² — per-user counts are small, the sums
    * bound by n·max²; a 100 TB deployment lifts them to DECIMAL(38,0)
    * unchanged); θ, the arm means, and the variance-reduction ratio
    * ρ² = (nΣxy−ΣxΣy)² / ((nΣx²−Σx²)(nΣy²−Σy²)) are double expressions of
    * those exact operands in one fixed order, so the verdict is
    * engine-stable at 6dp. Scale shape: ONE user_id exchange for the
    * per-user fold (the timeline bounds broadcast as a 1-row dim), then a
    * 2-row arm agg and a ONE-ROW readout — the only corpus-sized work is
    * the fold's exchange, shared shape with ev_abtest. Degenerate
    * covariate (var(x)=0) reads θ=null and falls back to the raw diff. */
  def cuped(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), graft.epochUs(col("ts")).as("ts_us"))
    val bounds = ev.agg( // integer floor-div keeps the cut exact (ts_us sums exceed 2^53)
      expr("(min(ts_us) + max(ts_us)) DIV 2").as("cut"))
    val perUser = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(count(when(col("ts_us") < col("cut"), 1)).as("x"),
        count(when(col("ts_us") >= col("cut"), 1)).as("y"))
      .select(when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B").as("variant"),
        col("x"), col("y"))
    val arms = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"))
    val pooled = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val wide = arms.agg(
        max(when(col("variant") === "A", col("n"))).as("n_a"),
        max(when(col("variant") === "A", col("sx"))).as("sx_a"),
        max(when(col("variant") === "A", col("sy"))).as("sy_a"),
        max(when(col("variant") === "B", col("n"))).as("n_b"),
        max(when(col("variant") === "B", col("sx"))).as("sx_b"),
        max(when(col("variant") === "B", col("sy"))).as("sy_b"))
      .crossJoin(broadcast(pooled))
    wide
      .withColumn("cov_n", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx_n", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary_n", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("theta",
        when(col("varx_n") === 0, lit(null).cast("double"))
          .otherwise(col("cov_n").cast("double") / col("varx_n").cast("double")))
      .withColumn("diff_raw",
        col("sy_a").cast("double") / col("n_a")
          - col("sy_b").cast("double") / col("n_b"))
      .withColumn("diff_cuped",
        when(col("theta").isNull, col("diff_raw"))
          .otherwise(col("diff_raw") - col("theta") *
            (col("sx_a").cast("double") / col("n_a")
              - col("sx_b").cast("double") / col("n_b"))))
      .withColumn("var_reduction",
        when(col("varx_n") === 0 || col("vary_n") === 0, lit(0d))
          .otherwise((col("cov_n").cast("double") * col("cov_n").cast("double"))
            / (col("varx_n").cast("double") * col("vary_n").cast("double"))))
      .select(col("n_a"), col("n_b"), round(col("theta"), 6).as("theta"),
        round(col("diff_raw"), 6).as("diff_raw"),
        round(col("diff_cuped"), 6).as("diff_cuped"),
        round(col("var_reduction"), 6).as("var_reduction"))
  }

  val cupedSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |b AS (
      |  SELECT (min(ts_us) + max(ts_us)) // 2 AS cut FROM e),
      |u AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    CAST(count(CASE WHEN ts_us < cut THEN 1 END) AS BIGINT) AS x,
      |    CAST(count(CASE WHEN ts_us >= cut THEN 1 END) AS BIGINT) AS y
      |  FROM e CROSS JOIN b GROUP BY user_id),
      |arms AS (
      |  SELECT
      |    max(CASE WHEN variant = 'A' THEN n END) AS n_a,
      |    max(CASE WHEN variant = 'A' THEN sx END) AS sx_a,
      |    max(CASE WHEN variant = 'A' THEN sy END) AS sy_a,
      |    max(CASE WHEN variant = 'B' THEN n END) AS n_b,
      |    max(CASE WHEN variant = 'B' THEN sx END) AS sx_b,
      |    max(CASE WHEN variant = 'B' THEN sy END) AS sy_b
      |  FROM (SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      |    FROM u GROUP BY 1)),
      |pooled AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM u),
      |m AS (
      |  SELECT *, n * sxy - sx * sy AS cov_n,
      |    n * sxx - sx * sx AS varx_n,
      |    n * syy - sy * sy AS vary_n
      |  FROM arms CROSS JOIN pooled),
      |t AS (
      |  SELECT *,
      |    CASE WHEN varx_n = 0 THEN NULL
      |      ELSE CAST(cov_n AS DOUBLE) / CAST(varx_n AS DOUBLE) END AS theta,
      |    CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b AS diff_raw
      |  FROM m)
      |SELECT n_a, n_b, round(theta, 6) AS theta,
      |  round(diff_raw, 6) AS diff_raw,
      |  round(CASE WHEN theta IS NULL THEN diff_raw
      |    ELSE diff_raw - theta *
      |      (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b) END, 6)
      |    AS diff_cuped,
      |  round(CASE WHEN varx_n = 0 OR vary_n = 0 THEN CAST(0 AS DOUBLE)
      |    ELSE (CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE))
      |      / (CAST(varx_n AS DOUBLE) * CAST(vary_n AS DOUBLE)) END, 6)
      |    AS var_reduction
      |FROM t""".stripMargin

  // ---- power / minimum-detectable-effect planner ---------------------------

  /** Experiment power planner — the row read BEFORE launch: given the
    * realized arm sizes (parity split of view-exposed users, ev_ab_srm's
    * population) and the baseline conversion rate (any-purchase among
    * exposed, pooled), the minimum detectable effect at α=0.05/power=0.8
    * (two-sided normal approximation: mde = (z_{α/2}+z_β)·√(p(1−p)(1/n_a
    * +1/n_b))) and the per-arm sample size a 10%-RELATIVE lift would need
    * (n_req = ⌈(z_{α/2}+z_β)²·2p(1−p)/(0.1p)²⌉). Counts are exact BIGINTs
    * from ONE user_id-exchanged fold; the readout is double math over
    * those two integers in one fixed order (√ is IEEE-correctly-rounded)
    * — ONE row, engine-stable at 6dp. Scale: identical shape to
    * ev_ab_srm; the only corpus-sized work is the distinct-user fold. */
  def powerMde(spark: SparkSession, sfDir: String): DataFrame = {
    val z = lit(2.801585d) // z_{0.025} + z_{0.2}, one shared literal both engines parse identically
    val perUser = Tables(spark, sfDir).events
      .groupBy(col("user_id"))
      .agg(count(when(col("event_type") === "view", 1)).as("nv"),
        count(when(col("event_type") === "purchase", 1)).as("np"))
      .filter(col("nv") > 0)
      .select(when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B").as("variant"),
        (col("np") > 0).cast("long").as("conv"))
    perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("nc"))
      .agg(max(when(col("variant") === "A", col("n"))).as("n_a"),
        max(when(col("variant") === "B", col("n"))).as("n_b"),
        sum(col("nc")).as("n_conv"))
      .withColumn("p", col("n_conv").cast("double") / (col("n_a") + col("n_b")))
      .withColumn("mde_abs", z * sqrt(col("p") * (lit(1d) - col("p"))
        * (lit(1d) / col("n_a") + lit(1d) / col("n_b"))))
      .withColumn("mde_rel",
        when(col("p") === 0, lit(null).cast("double"))
          .otherwise(col("mde_abs") / col("p")))
      .withColumn("n_req_10pct",
        when(col("p") === 0, lit(null).cast("long"))
          .otherwise(ceil((z * z * lit(2d) * col("p") * (lit(1d) - col("p")))
            / (lit(0.1d) * col("p") * (lit(0.1d) * col("p")))).cast("long")))
      .select(col("n_a"), col("n_b"), col("n_conv"),
        round(col("p"), 6).as("p"),
        round(col("mde_abs"), 6).as("mde_abs"),
        round(col("mde_rel"), 6).as("mde_rel"),
        col("n_req_10pct"))
  }

  val powerMdeSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    count(CASE WHEN event_type = 'view' THEN 1 END) AS nv,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS np
      |  FROM events GROUP BY 1),
      |v AS (
      |  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    CAST(CASE WHEN np > 0 THEN 1 ELSE 0 END AS BIGINT) AS conv
      |  FROM u WHERE nv > 0),
      |arms AS (
      |  SELECT max(CASE WHEN variant = 'A' THEN n END) AS n_a,
      |    max(CASE WHEN variant = 'B' THEN n END) AS n_b,
      |    CAST(sum(nc) AS BIGINT) AS n_conv
      |  FROM (SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |      sum(conv) AS nc FROM v GROUP BY 1)),
      |c AS (
      |  SELECT *, CAST(n_conv AS DOUBLE) / (n_a + n_b) AS p,
      |    2.801585 AS z
      |  FROM arms),
      |m AS (
      |  SELECT *, z * sqrt(p * (CAST(1 AS DOUBLE) - p)
      |    * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) AS mde_abs
      |  FROM c)
      |SELECT n_a, n_b, n_conv, round(p, 6) AS p,
      |  round(mde_abs, 6) AS mde_abs,
      |  round(CASE WHEN p = 0 THEN NULL ELSE mde_abs / p END, 6) AS mde_rel,
      |  CASE WHEN p = 0 THEN NULL
      |    ELSE CAST(ceil((z * z * CAST(2 AS DOUBLE) * p * (CAST(1 AS DOUBLE) - p))
      |      / (0.1 * p * (0.1 * p))) AS BIGINT) END AS n_req_10pct
      |FROM m""".stripMargin

  // ---- session entry paths -------------------------------------------------

  /** Top session entry paths (the behavior-flow / user-journey readout:
    * which first-3-event sequences open sessions — where ev_paths gives the
    * first-order transition matrix, this gives the ordered path heads).
    * ONE user_id exchange serves sessionization AND the in-session rank
    * (every window + the session group share HashPartitioning(user_id));
    * the path aggregation's key space is ≤ |types|³ (Zipf-tiny, bounded at
    * any corpus size), and the final top-20 is TakeOrderedAndProject — no
    * global sort. Path strings assemble via array_sort on (rk, type), so
    * the csv is deterministic under any partitioning. */
  def entryPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wSess = W.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wIn = W.partitionBy(col("user_id"), col("sess_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.epochUs(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wSess))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > lit(1800000000L), 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        wSess.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("rk", row_number().over(wIn))
      .filter(col("rk") <= 3)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rk"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)
  }

  val entryPathsSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |o2 AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT user_id, event_id, event_type, ts_us,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM o2),
      |r AS (
      |  SELECT user_id, sess_id, event_type,
      |    row_number() OVER (PARTITION BY user_id, sess_id
      |      ORDER BY ts_us, event_id) AS rk
      |  FROM s),
      |p AS (
      |  SELECT user_id, sess_id,
      |    string_agg(event_type, '>' ORDER BY rk) AS path
      |  FROM r WHERE rk <= 3 GROUP BY 1, 2)
      |SELECT path, count(*) AS n_sessions, count(DISTINCT user_id) AS n_users
      |FROM p GROUP BY 1
      |ORDER BY n_sessions DESC, path ASC LIMIT 20""".stripMargin

  // ---- mergeable histogram-sketch quantiles --------------------------------

  /** Quantile labels as exact rationals — ceil(num·n/den) in BIGINT is the
    * rank, so no 0.9·n double can round across an integer boundary. */
  val sketchQuantiles: Seq[(String, Int, Int)] =
    Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  /** Approximate per-type quantiles from a MERGEABLE fixed-grid histogram
    * sketch — the documented 100 TB drop-in for `ev_quantiles`' exact
    * `percentile` (exact quantiles need a per-group sort; bin counts are
    * order/partition-invariant SUMS that partial-aggregate and merge like
    * the CMS/HLL sketches, so the same code runs batch, incremental, and
    * under a streaming state store). 256 bins of width 4 over the value
    * domain [0, 1024) (out-of-range clamps to the edge bins; error bound =
    * one bin width). The estimate interpolates inside the bin where the
    * cumulative count crosses rank ceil(p·n) — rank computed in exact
    * BIGINT rational arithmetic, the interpolation ONE double division of
    * exact-int operands. Plan: one (type, bin) partial agg (≤ types·256
    * keys at any corpus size) + one bounded per-type window. */
  def quantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val W = org.apache.spark.sql.expressions.Window
    val bins = Tables(spark, sfDir).events
      .select(col("event_type"),
        least(lit(255L), greatest(lit(0L), floor(col("value") / 4).cast("long")))
          .as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = W.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(W.unboundedPreceding, 0)
    val cumd = bins
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(W.partitionBy(col("event_type"))))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    val ps = sketchQuantiles.toDF("p", "num", "den")
    cumd.crossJoin(broadcast(ps))
      .withColumn("rank", expr("(num * n + den - 1) DIV den"))
      .filter(col("cum") >= col("rank") && col("cum_prev") < col("rank"))
      .select(col("event_type"), col("p"), col("n"),
        round(col("bin") * 4 +
          lit(4.0) * (col("rank") - col("cum_prev")) / col("cnt"), 6).as("est"))
  }

  val quantileSketchSql: String = {
    val pRows = sketchQuantiles.map { case (l, n, d) => s"('$l', $n, $d)" }.mkString(", ")
    s"""WITH b AS (
       |  SELECT event_type,
       |    least(255, greatest(0, CAST(floor(value / 4) AS BIGINT))) AS bin,
       |    count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |c AS (
       |  SELECT event_type, bin, cnt,
       |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM b),
       |ps(p, num, den) AS (VALUES $pRows),
       |j AS (
       |  SELECT event_type, p, n, bin, cnt, cum, cum - cnt AS cum_prev,
       |    (num * n + den - 1) // den AS rank
       |  FROM c, ps)
       |SELECT event_type, p, n,
       |  round(bin * 4 + CAST(4 AS DOUBLE) * (rank - cum_prev) / cnt, 6) AS est
       |FROM j WHERE cum >= rank AND cum_prev < rank""".stripMargin
  }

  // ---- robust (median/MAD) anomaly detection -------------------------------

  /** Robust rate-anomaly detection — ev_spike's outlier-resistant twin:
    * z-scores break when the anomaly itself inflates the mean/stddev
    * (masking); the production-robust detector scores each per-(type,
    * hour) count against the MEDIAN and the median absolute deviation
    * (robust score = (c − med)/(1.4826·MAD), the consistency constant
    * making MAD σ-comparable under normality). Hour buckets because MAD
    * needs a non-degenerate count distribution (per-minute counts of 0/1
    * give MAD = 0 — the detector excludes zero-MAD types rather than score
    * against a zero denominator). Scale shape: ONE corpus aggregation to
    * (type, hour) counts; every median runs over that BOUNDED dim
    * (hours × types — time-range-, not corpus-sized) and broadcasts back,
    * so the detector adds zero corpus-sized passes beyond the count agg.
    * Exact `percentile` keeps oracle parity (the proven quantile_cont
    * interpolation match). Scores over OBSERVED hours; composing
    * ev_gapfill in front adds the zero-count droughts. */
  def anomalyMad(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables(spark, sfDir).events
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .agg(count(lit(1)).as("c"))
    madOver(counts)
  }

  /** The median/MAD scoring pass over an already-built (type, hour, c)
    * count matrix — shared by the batch detector above and its streaming
    * twin (st_anomaly_mad keeps the matrix in the state store; the matrix
    * is the detector's full sufficient statistic, so scoring at drain time
    * reproduces the batch alarm set exactly). */
  def madOver(counts: DataFrame): DataFrame = {
    val med = counts.groupBy(col("event_type"))
      .agg(expr("percentile(c, 0.5)").as("med"))
    val dev = counts.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("c") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0)
      .withColumn("score",
        round((col("c") - col("med")) / (lit(1.4826) * col("mad")), 6))
      .filter(abs(col("score")) > 3)
      .select(col("event_type"), col("hour_epoch"), col("c"),
        round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"),
        col("score"))
  }

  val anomalyMadSql: String =
    """WITH counts AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
      |      AS hour_epoch,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type, quantile_cont(c, 0.5) AS med FROM counts GROUP BY 1),
      |dev AS (
      |  SELECT counts.event_type, hour_epoch, c, med, abs(c - med) AS adev
      |  FROM counts JOIN med ON counts.event_type = med.event_type),
      |mad AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1),
      |scored AS (
      |  SELECT dev.event_type, hour_epoch, c, med, mad,
      |    round((c - med) / (1.4826 * mad), 6) AS score
      |  FROM dev JOIN mad ON dev.event_type = mad.event_type
      |  WHERE mad > 0)
      |SELECT event_type, hour_epoch, c,
      |  round(med, 6) AS med, round(mad, 6) AS mad, score
      |FROM scored WHERE abs(score) > 3""".stripMargin

  // ---- SLO error-budget burn rate ---------------------------------------------

  /** SLO availability target; budget = 1 − target = 1% of events. */
  val sloTarget = 0.99

  /** Multiwindow SLO burn-rate alerting (the Google SRE-workbook policy —
    * the ops readout every serving pipeline pages on): per hour, the
    * error rate over a FAST 1 h window and a SLOW 6 h window, each
    * normalized by the error budget (burn = rate / (1−SLO)); page when
    * BOTH exceed their threshold (fast ≥ 14.4, slow ≥ 6 — fast-only is
    * noise, slow-only is a stale incident). Exactness: both verdicts are
    * cross-multiplied integer comparisons (err·1000 ≥ 144·total and
    * err·50 ≥ 3·total — no float in the page decision); the REPORTED burn
    * rates are single 6dp divisions of exact BIGINTs. Scale shape: ONE
    * corpus aggregation to the calendar-bounded (hour → errors, total)
    * dim with map-side partials; the 6 h window is a range frame over
    * that tiny dim (gap hours carry zero mass on both engines, so sparse
    * frames are exact). */
  def errorBudget(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables(spark, sfDir).events
      .groupBy(expr("unix_timestamp(date_trunc('hour', ts)) DIV 3600").as("h"))
      .agg(count(lit(1)).as("total"),
        count(when(col("event_type") === "error", 1)).as("errors"))
    errorBudgetOver(counts)
  }

  /** The burn-rate scoring pass over an already-built (h, total, errors)
    * matrix — shared by the batch query above and its streaming twin
    * (st_error_budget keeps the matrix in the state store; the matrix is
    * the alert's full sufficient statistic, so scoring at drain time
    * reproduces the batch page set exactly). */
  def errorBudgetOver(counts: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("h")).rangeBetween(-5, 0)
    counts
      .withColumn("tot6", sum(col("total")).over(w))
      .withColumn("err6", sum(col("errors")).over(w))
      .select(col("h").as("hour_idx"), col("total"), col("errors"),
        round(col("errors").cast("double") * lit(100d) / col("total"), 6)
          .as("fast_burn"),
        round(col("err6").cast("double") * lit(100d) / col("tot6"), 6)
          .as("slow_burn"),
        (col("errors") * 1000 >= col("total") * 144 &&
          col("err6") * 50 >= col("tot6") * 3).as("page"))
  }

  val errorBudgetSql: String =
    """WITH counts AS (
      |  SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
      |      // 3600 AS h,
      |    CAST(count(*) AS BIGINT) AS total,
      |    CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
      |      AS errors
      |  FROM events GROUP BY 1),
      |win AS (
      |  SELECT *,
      |    CAST(sum(total) OVER
      |      (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS tot6,
      |    CAST(sum(errors) OVER
      |      (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS err6
      |  FROM counts)
      |SELECT h AS hour_idx, total, errors,
      |  round(CAST(errors AS DOUBLE) * 100 / total, 6) AS fast_burn,
      |  round(CAST(err6 AS DOUBLE) * 100 / tot6, 6) AS slow_burn,
      |  errors * 1000 >= total * 144 AND err6 * 50 >= tot6 * 3 AS page
      |FROM win""".stripMargin

  // ---- period-over-period metric bridge --------------------------------------

  /** Period-over-period metric decomposition — the "why did the KPI move"
    * bridge every growth review runs: purchases split at the timeline
    * midpoint, per user cohort (user_id mod 4 — production swaps in any
    * segment dim), with each cohort's contribution to the total delta
    * split into a MIX effect (the cohort got bigger/smaller) and a RATE
    * effect (its members converted more/less) via the exact midpoint
    * identity Δ(n·r) = Δn·(r₁+r₂)/2 + (n₁+n₂)/2·Δr — the symmetric
    * (Bennet) split, so the two effects CONSERVE the delta exactly:
    * Σ_seg (mix+rate) = Δtotal (the spec asserts it). Counts are exact
    * BIGINTs off ONE user_id-exchanged fold (active users and purchases
    * per (cohort, half) in the same pass); the effects are double
    * expressions of those exact operands in one fixed order, 6dp.
    * Cohorts inactive in a half contribute rate 0 (guarded, mirrored). */
  def decomp(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_type"), graft.epochUs(col("ts")).as("ts_us"))
    val bounds = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("cut"))
    val perUser = ev.crossJoin(broadcast(bounds))
      .groupBy(pmod(col("user_id"), lit(4)).as("cohort"),
        col("user_id"),
        (col("ts_us") >= col("cut")).as("p2"))
      .agg(count(when(col("event_type") === "purchase", 1)).as("np"))
    val seg = perUser.groupBy(col("cohort"))
      .agg(
        count(when(!col("p2"), 1)).as("n1"),
        count(when(col("p2"), 1)).as("n2"),
        sum(when(!col("p2"), col("np")).otherwise(0L)).as("p1"),
        sum(when(col("p2"), col("np")).otherwise(0L)).as("p2c"))
    def rate(p: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(n === 0, lit(0d)).otherwise(p.cast("double") / n.cast("double"))
    seg
      .withColumn("r1", rate(col("p1"), col("n1")))
      .withColumn("r2", rate(col("p2c"), col("n2")))
      .select(col("cohort"), col("n1"), col("n2"), col("p1"),
        col("p2c").as("p2"),
        round((col("n2") - col("n1")).cast("double")
          * (col("r1") + col("r2")) / lit(2d), 6).as("mix_effect"),
        round((col("n1") + col("n2")).cast("double") / lit(2d)
          * (col("r2") - col("r1")), 6).as("rate_effect"))
  }

  val decompSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |b AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS cut FROM e),
      |u AS (
      |  SELECT user_id % 4 AS cohort, user_id, ts_us >= cut AS p2,
      |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
      |      AS np
      |  FROM e CROSS JOIN b GROUP BY 1, 2, 3),
      |seg AS (
      |  SELECT cohort,
      |    CAST(count(CASE WHEN NOT p2 THEN 1 END) AS BIGINT) AS n1,
      |    CAST(count(CASE WHEN p2 THEN 1 END) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN NOT p2 THEN np ELSE 0 END) AS BIGINT) AS p1,
      |    CAST(sum(CASE WHEN p2 THEN np ELSE 0 END) AS BIGINT) AS p2c
      |  FROM u GROUP BY 1),
      |r AS (
      |  SELECT *,
      |    CASE WHEN n1 = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE CAST(p1 AS DOUBLE) / n1 END AS r1,
      |    CASE WHEN n2 = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE CAST(p2c AS DOUBLE) / n2 END AS r2
      |  FROM seg)
      |SELECT cohort, n1, n2, p1, p2c AS p2,
      |  round(CAST(n2 - n1 AS DOUBLE) * (r1 + r2) / CAST(2 AS DOUBLE), 6)
      |    AS mix_effect,
      |  round(CAST(n1 + n2 AS DOUBLE) / CAST(2 AS DOUBLE) * (r2 - r1), 6)
      |    AS rate_effect
      |FROM r""".stripMargin

  // ---- lead-lag cross-correlation -------------------------------------------

  /** Cross-correlation scan depth (hours each side of zero). */
  val xcorrMaxLag = 3

  /** Lead-lag cross-correlation between event-type time series — the
    * causal-diagnostics readout (does click activity LEAD purchases? by
    * how many hours?): Pearson r between hourly count series a_t and
    * b_{t+L} for every type pair at every lag L ∈ [−3, +3], zero-filled
    * over the full dense hour range (a quiet hour is data, not a missing
    * row — correlating only co-active hours overstates every r).
    * Exactness without materializing the dense grid: all five moments are
    * sums of SPARSE counts — Σab needs only the equi-join on b.h = a.h+L
    * (zero cells contribute nothing), while Σa/Σa² over the lag's overlap
    * window [mn+max(0,−L), mx−max(0,L)] are range-filtered sums, and the
    * dense length enters only as n = T − |L|. Every moment is an exact
    * BIGINT (n·Σa² ≈ 4e14 at sf1; a 100 TB deployment lifts the two
    * products to DECIMAL(38,0) unchanged); r is one double expression of
    * exact operands in fixed order, 6dp. Degenerate windows (either
    * series constant → zero variance) read r = null. Scale shape: ONE
    * corpus aggregation to the calendar-bounded (type × hour) dim with
    * map-side partials; the lag grid, both moment folds, and the shifted
    * self-join all run over that tiny dim — pairs×lags work never touches
    * row-level data. */
  def xcorr(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables(spark, sfDir).events
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', ts)) DIV 3600").as("h"))
      .agg(count(lit(1)).as("c"))
    xcorrOver(counts)
  }

  /** The pairs×lags Pearson pass over an already-built (type, h, c) count
    * matrix — shared by the batch query above and its streaming twin
    * (st_xcorr keeps the matrix in the state store; the matrix is the
    * correlogram's full sufficient statistic, so scoring at drain time
    * reproduces the batch correlogram exactly). */
  def xcorrOver(counts: DataFrame): DataFrame = {
    val c = counts
      // calendar-bounded dim; feeds bounds, both moment folds, the shifted
      // join. Lifetime (r10, VERDICT #7): session-owned — repeated-
      // invocation callers clearCache() between queries (see the
      // EnrichQueries.geoCluster note; spec: PersistLifecycleSpec).
      .persist()
    val bounds = c.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
    val lags = counts.sparkSession.range(-xcorrMaxLag, xcorrMaxLag + 1)
      .select(col("id").as("lag"))
    val types = c.select(col("event_type")).distinct()
    // r9 OPT (guide §2.3): the a-side and b-side moment folds differ only
    // in their overlap-window predicate — ONE pass over c×lags computes
    // both as conditional sums (the second full aggregation + exchange is
    // gone); the grid reads each side off the same frame under a rename.
    val inA = col("h") >= col("mn") + greatest(lit(0L), -col("lag")) &&
      col("h") <= col("mx") - greatest(lit(0L), col("lag"))
    val inB = col("h") >= col("mn") + greatest(lit(0L), col("lag")) &&
      col("h") <= col("mx") + least(lit(0L), col("lag"))
    val moms = c.crossJoin(lags).crossJoin(broadcast(bounds))
      .filter(inA || inB)
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(when(inA, col("c"))).as("sa"),
        sum(when(inA, col("c") * col("c"))).as("saa"),
        sum(when(inB, col("c"))).as("sb"),
        sum(when(inB, col("c") * col("c"))).as("sbb"))
      // both grid sides read it; tiny (types × lags). Lifetime: see the
      // note on `c` above (session-owned, clearCache() protocol).
      .persist()
    val amom = moms.select(col("event_type").as("type_a"), col("lag"),
      col("sa"), col("saa"))
    val bmom = moms.select(col("event_type").as("type_b"), col("lag"),
      col("sb"), col("sbb"))
    // b.h = a.h + L already confines a.h to the overlap window exactly
    // (both endpoints in [mn, mx] ⇔ a.h in [mn+max(0,−L), mx−max(0,L)])
    val ab = c.select(col("event_type").as("type_a"), col("h").as("ha"), col("c").as("ca"))
      .crossJoin(lags)
      .join(c.select(col("event_type").as("type_b"), col("h").as("hb"), col("c").as("cb")),
        col("hb") === col("ha") + col("lag"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(sum(col("ca") * col("cb")).as("sab"))
    val grid = types.select(col("event_type").as("type_a"))
      .crossJoin(types.select(col("event_type").as("type_b")))
      .filter(col("type_a") < col("type_b"))
      .crossJoin(lags).crossJoin(broadcast(bounds))
      .withColumn("n", col("mx") - col("mn") + 1 - abs(col("lag")))
    grid
      .join(amom, Seq("type_a", "lag"), "left")
      .join(bmom, Seq("type_b", "lag"), "left")
      .join(ab, Seq("type_a", "type_b", "lag"), "left")
      .na.fill(0L, Seq("sa", "saa", "sb", "sbb", "sab"))
      .withColumn("da", col("n") * col("saa") - col("sa") * col("sa"))
      .withColumn("db", col("n") * col("sbb") - col("sb") * col("sb"))
      .select(col("type_a"), col("type_b"), col("lag"), col("n"),
        when(col("da") > 0 && col("db") > 0,
          round((col("n") * col("sab") - col("sa") * col("sb")).cast("double")
            / sqrt(col("da").cast("double") * col("db").cast("double")), 6))
          .as("r"))
  }

  val xcorrSql: String =
    s"""WITH c AS (
       |  SELECT event_type,
       |    CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600
       |      AS h,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT min(h) AS mn, max(h) AS mx FROM c),
       |lags(lag) AS (VALUES ${(-xcorrMaxLag to xcorrMaxLag)
          .map(l => s"(CAST($l AS BIGINT))").mkString(", ")}),
       |types AS (SELECT DISTINCT event_type FROM c),
       |amom AS (
       |  SELECT event_type AS type_a, lag,
       |    CAST(sum(c) AS BIGINT) AS sa, CAST(sum(c * c) AS BIGINT) AS saa
       |  FROM c CROSS JOIN lags CROSS JOIN b
       |  WHERE h >= mn + greatest(CAST(0 AS BIGINT), -lag)
       |    AND h <= mx - greatest(CAST(0 AS BIGINT), lag)
       |  GROUP BY 1, 2),
       |bmom AS (
       |  SELECT event_type AS type_b, lag,
       |    CAST(sum(c) AS BIGINT) AS sb, CAST(sum(c * c) AS BIGINT) AS sbb
       |  FROM c CROSS JOIN lags CROSS JOIN b
       |  WHERE h >= mn + greatest(CAST(0 AS BIGINT), lag)
       |    AND h <= mx + least(CAST(0 AS BIGINT), lag)
       |  GROUP BY 1, 2),
       |ab AS (
       |  SELECT a.event_type AS type_a, bb.event_type AS type_b, lag,
       |    CAST(sum(a.c * bb.c) AS BIGINT) AS sab
       |  FROM c a CROSS JOIN lags JOIN c bb ON bb.h = a.h + lag
       |  GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT t1.event_type AS type_a, t2.event_type AS type_b, lag,
       |    mx - mn + 1 - abs(lag) AS n
       |  FROM types t1 CROSS JOIN types t2 CROSS JOIN lags CROSS JOIN b
       |  WHERE t1.event_type < t2.event_type),
       |m AS (
       |  SELECT g.type_a, g.type_b, g.lag, g.n,
       |    coalesce(am.sa, 0) AS sa, coalesce(am.saa, 0) AS saa,
       |    coalesce(bm.sb, 0) AS sb, coalesce(bm.sbb, 0) AS sbb,
       |    coalesce(ab.sab, 0) AS sab
       |  FROM grid g
       |  LEFT JOIN amom am ON am.type_a = g.type_a AND am.lag = g.lag
       |  LEFT JOIN bmom bm ON bm.type_b = g.type_b AND bm.lag = g.lag
       |  LEFT JOIN ab ON ab.type_a = g.type_a AND ab.type_b = g.type_b
       |    AND ab.lag = g.lag)
       |SELECT type_a, type_b, lag, n,
       |  CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
       |    THEN round(CAST(n * sab - sa * sb AS DOUBLE)
       |      / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
       |           * CAST(n * sbb - sb * sb AS DOUBLE)), 6)
       |  END AS r
       |FROM m""".stripMargin

  // ---- distribution drift monitor ------------------------------------------

  /** The event-type universe as an explicit list — the drift L1 sums per
    * type in THIS written order on both engines (a floating sum across an
    * aggregation's nondeterministic row order would not hash-match; a
    * fixed-order pivot makes the addend order part of the query text). */
  val driftTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Day-over-day distribution drift — the data-drift monitor every ML
    * pipeline runs between training and serving (a shift in the event-type
    * mix is the first symptom of upstream breakage or behavior change):
    * per day, the event-type share vector; drift(day) = L1 distance to the
    * previous day's vector (total variation ×2). Scale shape: ONE corpus
    * aggregation to (day, type) counts; the pivot to fixed-order share
    * columns, the lag window, and the L1 fold all run over the BOUNDED day
    * dim. Shares are single divisions of exact-int operands; the L1 sums
    * its |Δshare| terms in the explicit [[driftTypes]] order, so the
    * double is bit-identical across engines and partitionings. */
  def drift(spark: SparkSession, sfDir: String): DataFrame =
    driftOver(Tables(spark, sfDir).events
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("c")))

  /** The drift verdict as a READ-TIME VIEW over a drained (day_epoch,
    * event_type, c) count matrix — the detector's full sufficient
    * statistic, whose cells are mergeable order/partition/micro-batch-
    * invariant SUMS bounded by the calendar. Shared verbatim by the batch
    * row above and the streaming twin (st_drift), so the live verdict set
    * EQUALS the batch verdict set and the batch oracle is reused. */
  def driftOver(counts: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wDay = W.orderBy(col("day_epoch"))
    val pivoted = counts.groupBy(col("day_epoch"))
      .pivot("event_type", driftTypes)
      .agg(first(col("c")))
      .na.fill(0L, driftTypes)
    val withN = pivoted.withColumn("n",
      driftTypes.map(t => col(t)).reduce(_ + _))
    val shares = driftTypes.foldLeft(withN) { (df, t) =>
      df.withColumn(s"s_$t", col(t).cast("double") / col("n"))
    }
    val lagged = driftTypes.foldLeft(shares) { (df, t) =>
      df.withColumn(s"p_$t", lag(col(s"s_$t"), 1).over(wDay))
    }
    lagged
      .filter(col(s"p_${driftTypes.head}").isNotNull)
      .withColumn("drift_l1", round(
        driftTypes.map(t => abs(col(s"s_$t") - col(s"p_$t"))).reduce(_ + _), 6))
      .select(col("day_epoch"), col("n"), col("drift_l1"),
        (col("drift_l1") > 0.08).as("drifted"))
  }

  /** EWMA lookback (days) and its fixed-point scale. Weights are the
    * α = ½ geometric series 2^(W−r)/2^W truncated at W terms (tail mass
    * 2^−W ≈ 1e−6 dropped) — so the weighted sum is an exact BIGINT and the
    * single /2^W is an exact power-of-two double scale. */
  val fcWindow = 20
  private val fcScale = 1L << fcWindow // 2^20

  /** Per-type next-day activity forecast — truncated-EWMA level (α = ½)
    * plus an OLS trend over the last [[fcWindow]] observed days. The
    * traffic-forecast / capacity-planning primitive, built ORDER-PROOF: the
    * EWMA is an integer weighted sum (weights 2^19…2^0), the OLS slope's
    * numerator and denominator are integer sums, and each output does ONE
    * double division — so results are bit-identical across engines and
    * partition orders, with no float-summation hazard. Scale shape: one
    * corpus aggregation to the (type, day) dim; everything after runs over
    * ≤ W rows per type. */
  /** Probe selector for [[seriesSim]] (every 29th user — scale-free). */
  val seriesSimProbeMod = 29

  /** Behavioral time-series similarity search — "which users' activity
    * CURVES look like this one's" (the retention-twin / cohort-matching /
    * anomaly-triage query; the distributed-streaming similarity-search
    * capability of the EDBT'19 line): each user's per-day activity counts
    * form a calendar-length series; probes get their top-3 most similar
    * other users by cosine over those series. Formulated SPARSELY — the
    * dot product is one equi-join on day (days both series are zero
    * contribute nothing, so the dense-vector dot equals the sparse sum),
    * norms are per-user exact-integer Σc²; cosine = exact-int dot / two
    * IEEE sqrts, rounded 6dp BEFORE ranking so both engines rank identical
    * doubles (ties cand asc). Scale shape: one (user, day) agg, one
    * norm agg, one day-keyed join bounded by probes×active-users-per-day
    * (the DECLARED brute baseline — the LSH swap is implemented beside it
    * as [[seriesLsh]], recall audited by [[seriesRecall]]; the series
    * CONSTRUCTION and scoring stages are what this row pins), one
    * probe-keyed top-3 window (WindowGroupLimit). */
  def seriesSim(spark: SparkSession, sfDir: String): DataFrame =
    seriesSimOver(Tables(spark, sfDir).events
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("c")))

  /** The search over a (user_id, day, c) count matrix — shared with the
    * streaming twin (st_series_sim drains the SAME matrix from state). */
  def seriesSimOver(ud0: DataFrame): DataFrame = {
    val ud = ud0.persist()
    val nrm = ud.groupBy(col("user_id")).agg(sum(col("c") * col("c")).as("n2"))
    val probe = ud.filter(col("user_id") % seriesSimProbeMod === 0)
      .select(col("user_id").as("pu"), col("day"), col("c").as("pc"))
    val dots = probe
      .join(ud.select(col("user_id").as("cu"), col("day"), col("c").as("cc")),
        Seq("day"))
      .filter(col("cu") =!= col("pu"))
      .groupBy(col("pu"), col("cu")).agg(sum(col("pc") * col("cc")).as("dot"))
    val scored = dots
      .join(nrm.select(col("user_id").as("pu"), col("n2").as("np")), "pu")
      .join(nrm.select(col("user_id").as("cu"), col("n2").as("nc")), "cu")
      .select(col("pu"), col("cu"),
        round(col("dot").cast("double") / (sqrt(col("np")) * sqrt(col("nc"))), 6)
          .as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pu")).orderBy(col("cos_sim").desc, col("cu").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("pu").as("probe_user"), col("cu").as("cand_user"),
        col("cos_sim"), col("rk"))
  }

  val seriesSimSql: String =
    s"""WITH ud AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |nrm AS (SELECT user_id, sum(c * c) AS n2 FROM ud GROUP BY 1),
       |probe AS (SELECT * FROM ud WHERE user_id % $seriesSimProbeMod = 0),
       |dots AS (
       |  SELECT p.user_id AS pu, u.user_id AS cu, sum(p.c * u.c) AS dot
       |  FROM probe p JOIN ud u ON u.day = p.day AND u.user_id <> p.user_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT pu, cu,
       |    round(CAST(dot AS DOUBLE) / (sqrt(np.n2) * sqrt(nc.n2)), 6) AS cos_sim
       |  FROM dots JOIN nrm np ON np.user_id = dots.pu
       |    JOIN nrm nc ON nc.user_id = dots.cu)
       |SELECT pu AS probe_user, cu AS cand_user, cos_sim, rk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY pu
       |    ORDER BY cos_sim DESC, cu ASC) AS BIGINT) AS rk
       |  FROM scored) t WHERE rk <= 3""".stripMargin

  /** Anchor-series count for [[seriesLsh]] — 4 sign bits → 16 buckets.
    * Production scales this ~log(n) (more anchors = finer buckets) and
    * OR-s several tables for recall, exactly the ann_quant_topk posture;
    * 4 keeps the sf-fixture buckets non-degenerate for the recall audit. */
  val seriesLshAnchors = 4

  /** LSH-bucketed behavioral series search — the PRODUCTION twin of
    * [[seriesSim]] (which is the brute baseline, like ann_brute_topk
    * beside ann_lsh_topk): instead of probing every user active on a
    * shared day, each user's series is sign-bucketed against 4 anchor
    * series and probes join THEIR BUCKET ONLY. The hyperplane family is
    * centered-cosine sign LSH made EXACT-INTEGER: bit_a(u) =
    * [D·dot(u,a) > s_u·s_a] — the sign of the COVARIANCE of series u
    * with anchor a over the D-day calendar (dot of mean-centered series
    * = dot − D·μ_u·μ_a; multiply through by D² and every term is a
    * BIGINT, so bucketing is bit-identical across engines with zero
    * float folds; raw-dot signs would be useless here because counts are
    * nonnegative, so covariance sign is the natural hyperplane). Anchors
    * are the 4 highest-volume users (sum(c) desc, user_id asc —
    * deterministic, portable, and high-coverage so signs split the
    * corpus). Probes MULTI-PROBE (Lv et al. VLDB'07): each probe also
    * searches the [[seriesLshAnchors]] buckets at Hamming distance 1
    * (single-bit flips), since a true neighbor's covariance signs rarely
    * differ from the probe's in more than one anchor — recall triples at
    * the fixture for 5× probe-side (not corpus-side) candidate work.
    * Scoring reuses [[seriesSim]]'s exact stages unchanged:
    * sparse integer dot, 6dp-rounded cosine, (cos desc, cand asc) top-3.
    * Scale shape: anchor dots are one broadcast day-join against ≤4
    * calendar-bounded series (O(nnz·4)); the candidate join's key is
    * (day, bucket) instead of day — per-task work drops from
    * Σ_day p_d·a_d to Σ_(day,b) p_db·a_db·(1+A), and anchors grow with
    * log n to keep buckets balanced. A candidate owns exactly ONE bucket,
    * so the ≤(1+A) probe copies hit disjoint keys — no pair dedup needed.
    * Recall is audited by ev_series_recall. */
  def seriesLsh(spark: SparkSession, sfDir: String): DataFrame =
    seriesSimLshOver(Tables(spark, sfDir).events
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("c")))

  /** The bucketed search over a (user_id, day, c) count matrix — shared
    * with the streaming twin (st_series_lsh drains the SAME matrix from
    * state, the [[seriesSimOver]] contract). `anchors` IS the scale dial
    * the docstring's "grow ~log n" claim rests on: buckets = 2^anchors
    * and the whole pipeline (bits, bucket keys, multi-probe flips) is
    * generated from it — the graded row pins the 4-anchor fixture, a
    * spec exercises a larger count end-to-end against the driver
    * replay. */
  def seriesSimLshOver(ud0: DataFrame,
      anchors: Int = seriesLshAnchors): DataFrame = {
    val ud = ud0.persist()
    // persisted: consumed THREE times (anchor TakeOrdered, the bits join,
    // the bucket-0 backfill) — without the pin each consumer re-aggregates
    // the corpus matrix
    val tot = ud.groupBy(col("user_id"))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("n2"))
      .persist()
    val cal = ud.agg((max(col("day")) - min(col("day")) + lit(1L)).as("d"))
    // 4-row frame: the unpartitioned window is bounded by the limit
    val wA = org.apache.spark.sql.expressions.Window
      .orderBy(col("s").desc, col("user_id").asc)
    val anch = tot.orderBy(col("s").desc, col("user_id").asc)
      .limit(anchors)
      .withColumn("aid", row_number().over(wA).cast("long") - 1L)
      .select(col("user_id").as("au"), col("aid"), col("s").as("sa"))
    val aser = anch.join(ud.withColumnRenamed("user_id", "auu"),
        col("auu") === col("au"))
      .select(col("aid"), col("day"), col("c").as("ac"), col("sa"))
    val adot = ud.join(broadcast(aser), Seq("day"))
      .groupBy(col("user_id"), col("aid"))
      .agg(sum(col("c") * col("ac")).as("dot"), max(col("sa")).as("sa"))
    // covariance sign, exact in BIGINTs; a (user, aid) pair absent from
    // adot has dot = 0 → sign(−s_u·s_a) < 0 → bit 0, so the inner-join
    // aggregate loses nothing and bucket 0 backfills via the left join
    val bits = adot
      .join(tot.select(col("user_id"), col("s")), "user_id")
      .crossJoin(broadcast(cal))
      .groupBy(col("user_id"))
      .agg(sum(when(col("d") * col("dot") > col("s") * col("sa"),
        pow(lit(2.0), col("aid")).cast("long")).otherwise(0L)).as("bk"))
    val bucket = tot.select(col("user_id"), col("n2"))
      .join(bits, Seq("user_id"), "left")
      .select(col("user_id"), col("n2"),
        coalesce(col("bk"), lit(0L)).as("bucket"))
    // r9 OPT (guide §2.4): carry n2 through the candidate join instead of
    // re-joining `bucket` on pu and again on cu AFTER scoring — those two
    // joins cost four exchanges (dots re-shuffled twice + both bucket
    // probes); riding n2 on the join rows costs 8 bytes per shuffled row
    // and the norms fall out of the (pu, cu) aggregate as max() of a
    // per-key-constant. Output unchanged (np/nc are functions of pu/cu).
    // The persist moved from `bucket` (single consumer now) onto `udb`,
    // which both sides of the candidate join read.
    val udb = ud.join(
        bucket.select(col("user_id"), col("bucket"), col("n2")), "user_id")
      // Lifetime (r10, VERDICT #7): session-owned — repeated-invocation
      // callers clearCache() between queries (see the
      // EnrichQueries.geoCluster note; spec: PersistLifecycleSpec).
      .persist()
    // multi-probe: identity + the A single-bit flips of the probe's bucket
    val flips = lit(0L) +: (0 until anchors).map(a => lit(1L << a))
    val probe = udb.filter(col("user_id") % seriesSimProbeMod === 0)
      .select(col("user_id").as("pu"), col("day").as("pday"),
        col("c").as("pc"), col("bucket").as("pb0"), col("n2").as("np"))
      .withColumn("pb", explode(array(flips.map(f => col("pb0").bitwiseXOR(f)): _*)))
    val dots = probe
      .join(udb.select(col("user_id").as("cu"), col("day"),
          col("c").as("cc"), col("bucket").as("cb"), col("n2").as("nc")),
        col("day") === col("pday") && col("cb") === col("pb") &&
          col("cu") =!= col("pu"))
      .groupBy(col("pu"), col("cu")).agg(sum(col("pc") * col("cc")).as("dot"),
        max(col("np")).as("np"), max(col("nc")).as("nc"))
    val scored = dots
      .select(col("pu"), col("cu"),
        round(col("dot").cast("double") / (sqrt(col("np")) * sqrt(col("nc"))), 6)
          .as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pu")).orderBy(col("cos_sim").desc, col("cu").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("pu").as("probe_user"), col("cu").as("cand_user"),
        col("cos_sim"), col("rk"))
  }

  val seriesLshSql: String =
    s"""WITH ud AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |tot AS (SELECT user_id, sum(c) AS s, sum(c * c) AS n2 FROM ud GROUP BY 1),
       |cal AS (SELECT max(day) - min(day) + 1 AS d FROM ud),
       |anch AS (
       |  SELECT user_id AS au, s AS sa,
       |    row_number() OVER (ORDER BY s DESC, user_id ASC) - 1 AS aid
       |  FROM tot ORDER BY s DESC, user_id ASC LIMIT $seriesLshAnchors),
       |aser AS (
       |  SELECT aid, day, c AS ac, sa FROM anch JOIN ud ON ud.user_id = anch.au),
       |adot AS (
       |  SELECT ud.user_id, aid, sum(c * ac) AS dot, max(sa) AS sa
       |  FROM ud JOIN aser ON ud.day = aser.day GROUP BY 1, 2),
       |bits AS (
       |  SELECT adot.user_id,
       |    sum(CASE WHEN (SELECT d FROM cal) * dot > t.s * sa
       |      THEN CAST(2 ** aid AS BIGINT) ELSE 0 END) AS bk
       |  FROM adot JOIN tot t ON t.user_id = adot.user_id GROUP BY 1),
       |bucket AS (
       |  SELECT t.user_id, t.n2, coalesce(b.bk, 0) AS bucket
       |  FROM tot t LEFT JOIN bits b ON b.user_id = t.user_id),
       |udb AS (
       |  SELECT ud.user_id, day, c, bucket FROM ud
       |  JOIN bucket ON bucket.user_id = ud.user_id),
       |probe AS (
       |  SELECT p.user_id AS pu, day, c AS pc, xor(bucket, f.f) AS pb
       |  FROM udb p CROSS JOIN (VALUES ${(0L +: (0 until seriesLshAnchors)
             .map(1L << _).toSeq).map(v => s"($v)").mkString(", ")}) AS f(f)
       |  WHERE p.user_id % $seriesSimProbeMod = 0),
       |dots AS (
       |  SELECT pu, u.user_id AS cu, sum(pc * u.c) AS dot
       |  FROM probe p JOIN udb u
       |    ON u.day = p.day AND u.bucket = p.pb AND u.user_id <> p.pu
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT pu, cu,
       |    round(CAST(dot AS DOUBLE) / (sqrt(np.n2) * sqrt(nc.n2)), 6) AS cos_sim
       |  FROM dots JOIN bucket np ON np.user_id = dots.pu
       |    JOIN bucket nc ON nc.user_id = dots.cu)
       |SELECT pu AS probe_user, cu AS cand_user, cos_sim, rk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY pu
       |    ORDER BY cos_sim DESC, cu ASC) AS BIGINT) AS rk
       |  FROM scored) t WHERE rk <= 3""".stripMargin

  /** Recall@3 audit of the LSH series path against the brute row — the
    * ann_recall pattern for the behavioral search: truth is [[seriesSim]]
    * (already probe-sampled, so the brute pass costs O(probes·actives),
    * not O(n²)), the approximate side is [[seriesLsh]] unchanged, output
    * is one row per probe. The dial a production run reads before
    * trusting the bucketed path at scale (anchors up → recall down,
    * candidate work down). */
  def seriesRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = Tables(spark, sfDir).events
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("c"))
      .persist() // one matrix materialization serves truth + graded paths
    val truth = seriesSimOver(ud)
      .select(col("probe_user"), col("cand_user")).persist()
    val nTruth = truth.groupBy(col("probe_user")).agg(count(lit(1)).as("n_truth"))
    // both approximate paths graded against the ONE truth, at the same
    // per-probe candidate budget (multi-probe (1+A)/2^A vs OR-ed T/2^A
    // with T = A+1) — the dial a production run reads before choosing
    // between more flips and more tables
    def gradeOf(method: String, approx: DataFrame): DataFrame = {
      val hits = truth
        .join(approx.select(col("probe_user"), col("cand_user")),
          Seq("probe_user", "cand_user"), "left_semi")
        .groupBy(col("probe_user")).agg(count(lit(1)).as("n_hit"))
      nTruth.join(hits, Seq("probe_user"), "left")
        .select(lit(method).as("method"), col("probe_user"), col("n_truth"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall", round(col("n_hit") / col("n_truth"), 6))
    }
    gradeOf("series_lsh", seriesSimLshOver(ud))
      .unionByName(gradeOf("series_lsh_mt", seriesSimLshMtOver(ud)))
  }

  // lazy: references seriesLshMtSql, declared further down the object —
  // a strict val would interpolate null at object-init time
  lazy val seriesRecallSql: String =
    s"""WITH truth AS (
       |  SELECT probe_user, cand_user FROM ($seriesSimSql) b),
       |n_truth AS (
       |  SELECT probe_user, count(*) AS n_truth FROM truth GROUP BY 1),
       |hits AS (
       |  SELECT t.probe_user, count(*) AS n_hit
       |  FROM truth t JOIN ($seriesLshSql) a
       |    ON t.probe_user = a.probe_user AND t.cand_user = a.cand_user
       |  GROUP BY 1),
       |hitsmt AS (
       |  SELECT t.probe_user, count(*) AS n_hit
       |  FROM truth t JOIN ($seriesLshMtSql) a2
       |    ON t.probe_user = a2.probe_user AND t.cand_user = a2.cand_user
       |  GROUP BY 1)
       |SELECT 'series_lsh' AS method, n.probe_user, n.n_truth,
       |  coalesce(h.n_hit, 0) AS n_hit,
       |  round(coalesce(h.n_hit, 0) / n.n_truth, 6) AS recall
       |FROM n_truth n LEFT JOIN hits h ON h.probe_user = n.probe_user
       |UNION ALL
       |SELECT 'series_lsh_mt' AS method, n.probe_user, n.n_truth,
       |  coalesce(h2.n_hit, 0) AS n_hit,
       |  round(coalesce(h2.n_hit, 0) / n.n_truth, 6) AS recall
       |FROM n_truth n LEFT JOIN hitsmt h2 ON h2.probe_user = n.probe_user""".stripMargin

  /** Table count for [[seriesLshMt]] — [[seriesLshAnchors]] + 1 tables with
    * NO multi-probe, so the per-probe expected candidate budget (T buckets
    * out of 2^A) EQUALS the single-table row's multi-probe budget (1 + A
    * buckets out of 2^A): the Lv et al. VLDB'07 trade made measurable —
    * OR-ed tables buy recall with MORE independent anchor sets, multi-probe
    * with MORE flips of ONE set, at the same candidate spend. */
  val seriesLshTables: Int = seriesLshAnchors + 1

  /** Multi-table OR-ed series LSH — the PRODUCTION recall story the
    * single-table row's docstring only promised ("production ORs several
    * tables"): [[seriesLshTables]] independent hash tables, table t's
    * hyperplane family = the volume-ranked anchors [t·A, (t+1)·A) (disjoint
    * sets, so the tables' bucketings are as independent as deterministic
    * anchor choice allows), a user owns ONE bucket PER TABLE, and a probe's
    * candidates are the users co-bucketed with it in ANY table (the OR).
    * Candidate pairs are made DISTINCT before scoring — a pair co-bucketed
    * in several tables must contribute each shared day once, not once per
    * table. Scoring reuses the exact stages unchanged (sparse integer dot
    * over the distinct pairs, 6dp cosine, (cos desc, cand asc) top-3).
    * Scale shape: anchor dots stay one broadcast day-join against ≤ T·A
    * calendar-bounded series; pair GENERATION moves off the day-level join
    * entirely onto the (tbl, bucket)-keyed bucket table (n·T rows), and the
    * scoring join is bounded by the distinct candidate pairs — expected
    * T/2^A of the corpus per probe, the same spend as the single-table
    * row's (1+A)/2^A. ev_series_recall grades both side by side. */
  def seriesLshMt(spark: SparkSession, sfDir: String): DataFrame =
    seriesSimLshMtOver(Tables(spark, sfDir).events
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("c")))

  /** The OR-ed multi-table search over a (user_id, day, c) count matrix. */
  def seriesSimLshMtOver(ud0: DataFrame, anchors: Int = seriesLshAnchors,
      tables: Int = seriesLshTables): DataFrame = {
    val ud = ud0.persist()
    val tot = ud.groupBy(col("user_id"))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("n2"))
      .persist()
    val cal = ud.agg((max(col("day")) - min(col("day")) + lit(1L)).as("d"))
    val nA = anchors * tables
    // T·A-row frame: the unpartitioned window is bounded by the limit;
    // rank r serves table r DIV A as its anchor aid = r % A
    val wA = org.apache.spark.sql.expressions.Window
      .orderBy(col("s").desc, col("user_id").asc)
    val anch = tot.orderBy(col("s").desc, col("user_id").asc)
      .limit(nA)
      .withColumn("r", row_number().over(wA).cast("long") - 1L)
      .select(col("user_id").as("au"), expr(s"r DIV $anchors").as("tbl"),
        (col("r") % anchors).as("aid"), col("s").as("sa"))
    val aser = anch.join(ud.withColumnRenamed("user_id", "auu"),
        col("auu") === col("au"))
      .select(col("tbl"), col("aid"), col("day"), col("c").as("ac"), col("sa"))
    val adot = ud.join(broadcast(aser), Seq("day"))
      .groupBy(col("user_id"), col("tbl"), col("aid"))
      .agg(sum(col("c") * col("ac")).as("dot"), max(col("sa")).as("sa"))
    // covariance sign per (user, table): same exact-BIGINT hyperplane as
    // the single-table row, keyed by table; a user off ALL of a table's
    // anchor days backfills to that table's bucket 0 via the left join
    val bits = adot
      .join(tot.select(col("user_id"), col("s")), "user_id")
      .crossJoin(broadcast(cal))
      .groupBy(col("user_id"), col("tbl"))
      .agg(sum(when(col("d") * col("dot") > col("s") * col("sa"),
        pow(lit(2.0), col("aid")).cast("long")).otherwise(0L)).as("bk"))
    val tbls = ud.sparkSession.range(tables).select(col("id").as("tbl"))
    val bucket = tot.select(col("user_id"))
      .crossJoin(broadcast(tbls))
      .join(bits, Seq("user_id", "tbl"), "left")
      .select(col("user_id"), col("tbl"), coalesce(col("bk"), lit(0L)).as("bucket"))
      .persist()
    // the OR: distinct co-bucketed pairs across all tables — pair
    // generation runs on the n·T bucket table, never on day-level rows.
    // NB (r9, measured): carrying n2 on the pair rows through the dots
    // joins — the single-table row's §2.4 trick — REGRESSED here (5.0 →
    // 9.4 s): the widened rows ride the pair×days intermediate through two
    // shuffles, while the tot joins this would remove run over the SMALL
    // dots output. Norm attachment stays post-aggregation.
    val pairs = bucket.filter(col("user_id") % seriesSimProbeMod === 0)
      .select(col("user_id").as("pu"), col("tbl"), col("bucket"))
      .join(bucket.select(col("user_id").as("cu"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("cu") =!= col("pu"))
      .select(col("pu"), col("cu")).distinct()
    val dots = pairs
      .join(ud.select(col("user_id").as("pu"), col("day"), col("c").as("pc")), "pu")
      .join(ud.select(col("user_id").as("cu"), col("day"), col("c").as("cc")),
        Seq("cu", "day"))
      .groupBy(col("pu"), col("cu")).agg(sum(col("pc") * col("cc")).as("dot"))
    val scored = dots
      .join(tot.select(col("user_id").as("pu"), col("n2").as("np")), "pu")
      .join(tot.select(col("user_id").as("cu"), col("n2").as("nc")), "cu")
      .select(col("pu"), col("cu"),
        round(col("dot").cast("double") / (sqrt(col("np")) * sqrt(col("nc"))), 6)
          .as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pu")).orderBy(col("cos_sim").desc, col("cu").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("pu").as("probe_user"), col("cu").as("cand_user"),
        col("cos_sim"), col("rk"))
  }

  /** The shared CTE prefix (ud/tot/cal) + the mt candidate/score chain, so
    * the standalone oracle and the recall oracle stay one text. */
  private def seriesLshMtBodySql(anchors: Int, tables: Int): String =
    s"""anchmt AS (
       |  SELECT user_id AS au, s AS sa,
       |    row_number() OVER (ORDER BY s DESC, user_id ASC) - 1 AS r
       |  FROM tot ORDER BY s DESC, user_id ASC LIMIT ${anchors * tables}),
       |anchmt2 AS (SELECT au, sa, r // $anchors AS tbl, r % $anchors AS aid FROM anchmt),
       |asermt AS (
       |  SELECT tbl, aid, day, c AS ac, sa
       |  FROM anchmt2 JOIN ud ON ud.user_id = anchmt2.au),
       |adotmt AS (
       |  SELECT ud.user_id, tbl, aid, sum(c * ac) AS dot, max(sa) AS sa
       |  FROM ud JOIN asermt ON ud.day = asermt.day GROUP BY 1, 2, 3),
       |bitsmt AS (
       |  SELECT adotmt.user_id, tbl,
       |    sum(CASE WHEN (SELECT d FROM cal) * dot > t.s * sa
       |      THEN CAST(2 ** aid AS BIGINT) ELSE 0 END) AS bk
       |  FROM adotmt JOIN tot t ON t.user_id = adotmt.user_id GROUP BY 1, 2),
       |tblsmt AS (SELECT range AS tbl FROM range(0, $tables)),
       |bucketmt AS (
       |  SELECT t.user_id, tb.tbl, coalesce(b.bk, 0) AS bucket
       |  FROM tot t CROSS JOIN tblsmt tb
       |  LEFT JOIN bitsmt b ON b.user_id = t.user_id AND b.tbl = tb.tbl),
       |pairsmt AS (
       |  SELECT DISTINCT p.user_id AS pu, c2.user_id AS cu
       |  FROM bucketmt p JOIN bucketmt c2
       |    ON c2.tbl = p.tbl AND c2.bucket = p.bucket AND c2.user_id <> p.user_id
       |  WHERE p.user_id % $seriesSimProbeMod = 0),
       |dotsmt AS (
       |  SELECT pu, cu, sum(pud.c * cud.c) AS dot
       |  FROM pairsmt JOIN ud pud ON pud.user_id = pairsmt.pu
       |    JOIN ud cud ON cud.user_id = pairsmt.cu AND cud.day = pud.day
       |  GROUP BY 1, 2),
       |scoredmt AS (
       |  SELECT pu, cu,
       |    round(CAST(dot AS DOUBLE) / (sqrt(np.n2) * sqrt(nc.n2)), 6) AS cos_sim
       |  FROM dotsmt JOIN tot np ON np.user_id = dotsmt.pu
       |    JOIN tot nc ON nc.user_id = dotsmt.cu)""".stripMargin

  val seriesLshMtSql: String =
    s"""WITH ud AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |tot AS (SELECT user_id, sum(c) AS s, sum(c * c) AS n2 FROM ud GROUP BY 1),
       |cal AS (SELECT max(day) - min(day) + 1 AS d FROM ud),
       |${seriesLshMtBodySql(seriesLshAnchors, seriesLshTables)}
       |SELECT pu AS probe_user, cu AS cand_user, cos_sim, rk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY pu
       |    ORDER BY cos_sim DESC, cu ASC) AS BIGINT) AS rk
       |  FROM scoredmt) t WHERE rk <= 3""".stripMargin

  final case class HwRow(event_type: String, h: Long, yhat: Double,
      level: Double, trend: Double)

  /** Fixed-point scale for [[hwForecast]]: 2^20 sub-count units. */
  val hwScale: Long = 1L << 20

  /** Holt–Winters seasonal forecast (Winters 1960, additive form) — the
    * seasonality-aware member of the forecast family: [[forecast]] fits
    * level+trend only, yet [[seasonality]] shows the fixture's strong
    * day-of-week cycle; HW carries a period-7 seasonal state so Friday's
    * forecast learns from Fridays. α=1/2, β=γ=1/4 — DYADIC smoothing
    * constants on purpose: the whole recursion runs in 2^20 fixed-point
    * BIGINTs with arithmetic-shift halving/quartering (floor — Spark's
    * `>>`and DuckDB's `>>` agree on negatives where `//`/`DIV` do NOT:
    * DuckDB `//` truncates BIGINTs toward zero), so every state value and
    * forecast is EXACT — no float recursion, no rounding-boundary
    * cascade, bit-identical engines (outputs are dyadics ≤ 2^40, exact in
    * double). Init is dyadic too: level = 8-day mean (shift, not /7),
    * trend = adjacent-week mean delta /64, seasons = first-week residuals.
    * Scale shape: one corpus agg to the calendar-bounded (type, day)
    * matrix (the [[forecastOver]] family), zero-filled against the global
    * spine, then a per-type ordered fold via `flatMapGroups` — the
    * bounded-per-key sequential-state idiom (state = level, trend, 7
    * seasons; group size = calendar days); output 7 horizons per type. */
  def hwForecast(spark: SparkSession, sfDir: String): DataFrame =
    hwForecastOver(Tables(spark, sfDir).events
      .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c")))

  /** The fold over a (event_type, day, c) count matrix — shared with the
    * streaming twin (st_hw_forecast drains the SAME matrix from state). */
  def hwForecastOver(cc: DataFrame): DataFrame = {
    val spark = cc.sparkSession
    import spark.implicits._
    val cal = cc.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = cc.select(col("event_type")).distinct()
      .crossJoin(broadcast(cal))
      .select(col("event_type"),
        explode(sequence(lit(0L), col("d1") - col("d0"))).as("t"), col("d0"))
    val y = spine.join(cc.withColumnRenamed("event_type", "cet"),
        col("cet") === col("event_type") && col("day") === col("t") + col("d0"),
        "left")
      .select(col("event_type"), col("t"),
        (coalesce(col("c"), lit(0L)) * hwScale).as("y"))
    y.as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (tpe, it) =>
        val ys = it.toArray.sortBy(_._2).map(_._3)
        require(ys.length >= 16, s"HW init needs 16 days, got ${ys.length}")
        var l = ys.take(8).sum >> 3
        var b = (ys.slice(8, 16).sum - ys.take(8).sum) >> 6
        var s = ys.take(7).map(_ - l)
        var t = 7
        while (t < ys.length) {
          val su = s(0)
          val ln = (ys(t) - su + l + b) >> 1
          val bn = (ln - l + 3 * b) >> 2
          val sn = (ys(t) - ln + 3 * su) >> 2
          l = ln; b = bn
          s = s.drop(1) :+ sn
          t += 1
        }
        (1 to 7).map(h => HwRow(tpe, h.toLong,
          (l + h * b + s(h - 1)).toDouble / hwScale,
          l.toDouble / hwScale, b.toDouble / hwScale))
      }
      .toDF()
  }

  val hwForecastSql: String =
    s"""WITH RECURSIVE cc AS (
       |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
       |    count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |cal AS (SELECT min(day) AS d0, max(day) AS d1 FROM cc),
       |spine AS (
       |  SELECT t.event_type, g.d AS day0
       |  FROM (SELECT DISTINCT event_type FROM cc) t, cal,
       |    LATERAL unnest(range(0, CAST(d1 - d0 + 1 AS INTEGER))) g(d)),
       |y AS (
       |  SELECT s.event_type, s.day0 AS t,
       |    CAST(coalesce(c, 0) AS BIGINT) * $hwScale AS y
       |  FROM spine s LEFT JOIN cc ON cc.event_type = s.event_type
       |    AND cc.day = s.day0 + (SELECT d0 FROM cal)),
       |lb AS (
       |  SELECT event_type,
       |    CAST(sum(CASE WHEN t < 8 THEN y ELSE 0 END) AS BIGINT) >> 3 AS l0,
       |    (CAST(sum(CASE WHEN t >= 8 AND t < 16 THEN y ELSE 0 END) AS BIGINT)
       |     - CAST(sum(CASE WHEN t < 8 THEN y ELSE 0 END) AS BIGINT)) >> 6 AS b0
       |  FROM y GROUP BY event_type),
       |init AS (
       |  SELECT y.event_type, lb.l0, lb.b0, list(y.y - lb.l0 ORDER BY y.t) AS s0
       |  FROM y JOIN lb ON lb.event_type = y.event_type
       |  WHERE y.t < 7 GROUP BY y.event_type, lb.l0, lb.b0),
       |rec AS (
       |  SELECT event_type, CAST(7 AS BIGINT) AS t, l0 AS l, b0 AS b, s0 AS s
       |  FROM init
       |  UNION ALL
       |  SELECT r.event_type, r.t + 1,
       |    (y.y - r.s[1] + r.l + r.b) >> 1,
       |    (((y.y - r.s[1] + r.l + r.b) >> 1) - r.l + 3 * r.b) >> 2,
       |    list_append(r.s[2:7],
       |      (y.y - ((y.y - r.s[1] + r.l + r.b) >> 1) + 3 * r.s[1]) >> 2)
       |  FROM rec r JOIN y ON y.event_type = r.event_type AND y.t = r.t),
       |fin AS (SELECT event_type, l, b, s FROM rec
       |        WHERE t = (SELECT max(t) FROM rec)),
       |h AS (SELECT CAST(i AS BIGINT) AS h FROM range(1, 8) t(i))
       |SELECT event_type, h,
       |  CAST(l + h * b + s[CAST(h AS INTEGER)] AS DOUBLE) / $hwScale AS yhat,
       |  CAST(l AS DOUBLE) / $hwScale AS level,
       |  CAST(b AS DOUBLE) / $hwScale AS trend
       |FROM fin, h""".stripMargin

  def forecast(spark: SparkSession, sfDir: String): DataFrame =
    forecastOver(Tables(spark, sfDir).events
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"))
      .agg(count(lit(1)).as("c")))

  /** The EWMA + OLS forecast as a READ-TIME VIEW over a drained
    * (event_type, day_epoch, c) count matrix — the same mergeable
    * calendar-bounded state family as [[driftOver]]/[[cusumOver]]; shared
    * verbatim by the batch row and the streaming twin (st_forecast). */
  def forecastOver(counts: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wr = W.partitionBy(col("event_type")).orderBy(col("day_epoch").desc)
    counts
      .withColumn("r", row_number().over(wr))
      .filter(col("r") <= fcWindow)
      .withColumn("t", lit(fcWindow + 1) - col("r")) // later day = larger t
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        max(when(col("r") === 1, col("c"))).as("last_c"),
        sum(expr(s"c * shiftleft(CAST(1 AS BIGINT), $fcWindow - r)")).as("ewma_scaled"),
        sum(col("t") * col("c")).as("stc"),
        sum(col("t")).as("st"),
        sum(col("c")).as("sc"),
        sum(col("t") * col("t")).as("stt"))
      .withColumn("num", col("n_days") * col("stc") - col("st") * col("sc"))
      .withColumn("den", col("n_days") * col("stt") - col("st") * col("st"))
      .select(col("event_type"), col("n_days"), col("last_c"),
        col("ewma_scaled"),
        round(col("ewma_scaled") / lit(fcScale.toDouble), 6).as("ewma"),
        round(when(col("den") === 0, 0.0)
          .otherwise(col("num").cast("double") / col("den")), 6).as("slope"),
        round(col("ewma_scaled") / lit(fcScale.toDouble) +
          when(col("den") === 0, 0.0)
            .otherwise(col("num").cast("double") / col("den")), 6).as("forecast"))
  }

  val forecastSql: String =
    s"""WITH d AS (
       |  SELECT event_type,
       |    CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day_epoch,
       |    count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day_epoch DESC) AS r
       |  FROM d),
       |w AS (SELECT *, ${fcWindow + 1} - r AS t FROM rk WHERE r <= $fcWindow),
       |a AS (
       |  SELECT event_type, count(*) AS n_days,
       |    max(CASE WHEN r = 1 THEN c END) AS last_c,
       |    sum(c * (CAST(1 AS BIGINT) << ($fcWindow - r))) AS ewma_scaled,
       |    sum(t * c) AS stc, sum(t) AS st, sum(c) AS sc, sum(t * t) AS stt
       |  FROM w GROUP BY 1),
       |f AS (
       |  SELECT *, n_days * stc - st * sc AS num, n_days * stt - st * st AS den
       |  FROM a)
       |SELECT event_type, n_days, CAST(last_c AS BIGINT) AS last_c,
       |  CAST(ewma_scaled AS BIGINT) AS ewma_scaled,
       |  round(ewma_scaled / $fcScale.0, 6) AS ewma,
       |  round(CASE WHEN den = 0 THEN 0.0 ELSE CAST(num AS DOUBLE) / den END, 6) AS slope,
       |  round(ewma_scaled / $fcScale.0 +
       |    CASE WHEN den = 0 THEN 0.0 ELSE CAST(num AS DOUBLE) / den END, 6) AS forecast
       |FROM f""".stripMargin

  val driftSql: String = {
    val pivotCols = driftTypes.map(t =>
      s"count(CASE WHEN event_type = '$t' THEN 1 END) AS c_$t").mkString(",\n    ")
    val nSum = driftTypes.map(t => s"c_$t").mkString(" + ")
    val shareCols = driftTypes.map(t =>
      s"CAST(c_$t AS DOUBLE) / n AS s_$t").mkString(",\n    ")
    val lagCols = driftTypes.map(t =>
      s"lag(s_$t) OVER (ORDER BY day_epoch) AS p_$t").mkString(",\n    ")
    val l1 = driftTypes.map(t => s"abs(s_$t - p_$t)").mkString(" + ")
    s"""WITH p AS (
       |  SELECT CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT)
       |      AS day_epoch,
       |    $pivotCols
       |  FROM events GROUP BY 1),
       |withn AS (SELECT *, $nSum AS n FROM p),
       |sh AS (
       |  SELECT day_epoch, n,
       |    $shareCols
       |  FROM withn),
       |lg AS (
       |  SELECT *,
       |    $lagCols
       |  FROM sh)
       |SELECT day_epoch, n, round($l1, 6) AS drift_l1,
       |  round($l1, 6) > 0.08 AS drifted
       |FROM lg WHERE p_${driftTypes.head} IS NOT NULL""".stripMargin
  }

  // ---- heavy hitters (two-pass Misra–Gries) --------------------------------

  /** Counters in the MG summary; threshold = n/(k+1). 100 keeps the sketch
    * comfortably above the heavy set at every test scale (the exponential
    * value mix puts ~35 buckets over threshold) while the full bucket
    * domain (~490 keys) exceeds it — the sketch genuinely prunes. */
  val hhK = 100

  /** Frequent-key detection, production two-pass shape: which value-buckets
    * carry more than 1/(k+1) of all events. Pass 1 is ONE corpus scan into a
    * [[graft.plans.MisraGries]] summary — O(k) state per partition, 16k
    * bytes on the wire, candidates GUARANTEED to contain every true heavy
    * hitter (no false negatives). Pass 2 recounts ONLY the ≤k candidates
    * (an IN-filter that rides the scan; map-side partials over ≤k keys, so
    * shuffle volume is O(k·tasks) — independent of key cardinality) and the
    * exact counts discard the sketch's false positives. The naive form —
    * global `groupBy(bucket)` then HAVING — shuffles every key at corpus
    * scale; this shuffles 48. The ≤k-row candidate collect is
    * driver-bounded by construction (same contract as the Bloom dim).
    * `share` is ONE double division of exact-int operands. */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(floor(col("value")).cast("long").as("bucket"))
    val pass1 = ev.agg(
      graft.plans.MisraGries.candidates(col("bucket"), hhK).as("cands"),
      count(lit(1)).as("n")).head()
    val cands = pass1.getSeq[Long](0)
    val n = pass1.getLong(1)
    ev.filter(col("bucket").isin(cands: _*))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(hhK + 1L) > lit(n))
      .withColumn("share", round(col("cnt").cast("double") / lit(n.toDouble), 6))
  }

  val heavyHittersSql: String =
    s"""WITH b AS (SELECT CAST(floor(value) AS BIGINT) AS bucket FROM events),
       |c AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
       |t AS (SELECT count(*) AS n FROM b)
       |SELECT bucket, cnt, round(CAST(cnt AS DOUBLE) / n, 6) AS share
       |FROM c, t WHERE cnt * ${hhK + 1} > n""".stripMargin

  // ---- activity bitmaps (bitmap-index retention) ----------------------------

  /** Per-user day-activity BITMAP — the bitmap-index pattern for
    * activity/retention analytics: a user's whole month of presence is ONE
    * int64 (bit i = active on day i from corpus start), built by a
    * `bit_or` partial aggregation (order/partition-invariant like any
    * sketch), after which every retention question is bit math on 8
    * bytes/user — days_active = popcount, week-1 activity = `& 0x7F`,
    * week-4 retention = two mask tests — with NO re-scan of the event
    * corpus. The exploded form this replaces at 100 TB is a distinct
    * (user, day) pair set: |users|·|days| rows shuffled per question
    * vs |users| longs ONCE here. Corpus start is a one-row broadcast;
    * offsets clamp at 62 so an out-of-window straggler can't overflow
    * the bit index. */
  def bitmapActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val d0 = ev.agg(min(col("d")).as("d0"))
    ev.crossJoin(broadcast(d0))
      .select(col("user_id"),
        least(datediff(col("d"), col("d0")).cast("long"), lit(62L)).as("off"))
      .groupBy(col("user_id"))
      .agg(
        expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(off AS INT)))").as("bitmap"),
        min(col("off")).as("first_day"),
        max(col("off")).as("last_day"))
      .select(col("user_id"), col("bitmap"),
        bit_count(col("bitmap")).cast("long").as("days_active"),
        col("first_day"), col("last_day"),
        (col("bitmap").bitwiseAND(lit(127L)) =!= 0L).as("w1_active"),
        ((col("bitmap").bitwiseAND(lit(127L)) =!= 0L) &&
          (col("bitmap").bitwiseAND(lit(127L << 21)) =!= 0L)).as("w4_retained"))
  }

  val bitmapActivitySql: String =
    s"""WITH d AS (
       |  SELECT user_id,
       |    CAST(date_diff('day',
       |      (SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) FROM events),
       |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS off
       |  FROM events),
       |b AS (
       |  SELECT user_id,
       |    bit_or(CAST(1 AS BIGINT) << CAST(least(off, 62) AS INTEGER)) AS bitmap,
       |    min(off) AS first_day, max(off) AS last_day
       |  FROM d GROUP BY 1)
       |SELECT user_id, bitmap, CAST(bit_count(bitmap) AS BIGINT) AS days_active,
       |  first_day, last_day,
       |  (bitmap & 127) <> 0 AS w1_active,
       |  ((bitmap & 127) <> 0 AND (bitmap & ${127L << 21}) <> 0) AS w4_retained
       |FROM b""".stripMargin

  // ---- cohort lifetime value -------------------------------------------------

  /** Cohort LTV curve — `ev_cohorts` counts who comes back; this accumulates
    * what they're WORTH: per (signup-day cohort × week-of-life), active
    * users, revenue, cumulative revenue, and cumulative LTV per cohort
    * member — the payback-period readout growth teams plot cohort-by-cohort.
    *
    * Scale shape: first-day frame and event frame co-partition on user_id
    * (one shuffle pair), then ONE bounded aggregation to (cohort × age)
    * cells; the cumulative window runs over that bounded dim partitioned by
    * cohort — never the corpus — and cohort sizes broadcast-join back onto
    * it. Money is exact BIGINT cents through every sum; the per-user LTV is
    * the only double — a single division rounded at source. */
  def ltv(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), to_date(col("ts")).as("d"),
        round(col("value") * lit(100), 0).cast("long").as("cents"))
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
    val cells = ev.join(first, "user_id")
      .groupBy(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_day"),
        expr("CAST(datediff(d, cohort_d) AS BIGINT) DIV 7").as("age_w"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(col("cents")).as("cents"))
    val sizes = first
      .groupBy(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age_w"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.join(broadcast(sizes), "cohort_day")
      .withColumn("cum_cents", sum(col("cents")).over(w))
      .select(col("cohort_day"), col("age_w"), col("n_active"), col("cents"),
        col("cum_cents"), col("n_cohort"),
        round(col("cum_cents").cast("double") / col("n_cohort").cast("double"), 4)
          .as("ltv_cents"))
  }

  val ltvSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |first AS (SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY 1),
      |cells AS (
      |  SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_day,
      |    CAST(date_diff('day', cohort_d, d) AS BIGINT) // 7 AS age_w,
      |    count(DISTINCT ev.user_id) AS n_active,
      |    CAST(sum(cents) AS BIGINT) AS cents
      |  FROM ev JOIN first ON ev.user_id = first.user_id
      |  GROUP BY 1, 2),
      |sizes AS (
      |  SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_day,
      |    CAST(count(*) AS BIGINT) AS n_cohort
      |  FROM first GROUP BY 1)
      |SELECT cohort_day, age_w, n_active, cents,
      |  CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY age_w
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
      |  n_cohort,
      |  round(CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY age_w
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(n_cohort AS DOUBLE), 4) AS ltv_cents
      |FROM cells JOIN sizes USING (cohort_day)""".stripMargin

  // ---- multi-touch attribution ----------------------------------------------

  /** Attribution lookback window: touches within 24 h before the conversion. */
  val attribWindowUs = 86400000000L

  /** Multi-touch attribution — the marketing-analytics staple: every
    * `purchase` conversion credits the user's preceding touch events
    * (within [[attribWindowUs]]) under the three standard models at once —
    * first-touch, last-touch, and linear — per channel (event type).
    *
    * Scale shape: conversions join touches on user_id EQUI-key (the range
    * predicate is a residual inside the co-partitioned hash join — never a
    * cartesian), then ONE conv_id exchange serves all three window passes
    * (first/last row_number + per-conversion touch count share the
    * partitioning), and the final channel agg is bounded by |types|.
    * Linear credit stays EXACT: each conversion splits 1,000,000 integer
    * micro-credits per touch via round-half-up integer division — no
    * double summation anywhere, so channel totals hash-match at any
    * partitioning. Ties resolve on (ts_us, event_id) both directions. */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.epochUs(col("ts")).as("ts_us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"), col("ts_us").as("cts"))
    val touch = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts_us"))
    val j = conv.join(touch, Seq("user_id"))
      .filter(col("ts_us") <= col("cts") &&
        col("ts_us") > col("cts") - lit(attribWindowUs))
    val w = Window.partitionBy(col("conv_id"))
    j.select(col("channel"),
        row_number().over(w.orderBy(col("ts_us").asc, col("touch_id").asc)).as("ra"),
        row_number().over(w.orderBy(col("ts_us").desc, col("touch_id").desc)).as("rd"),
        count(lit(1)).over(w).as("n"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("ra") === 1, 1L).otherwise(0L)).as("conv_first"),
        sum(when(col("rd") === 1, 1L).otherwise(0L)).as("conv_last"),
        sum(expr("(1000000 + n DIV 2) DIV n")).as("credit_micros"))
  }

  val attributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type,
       |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
       |  FROM events),
       |c AS (SELECT user_id, event_id AS conv_id, ts_us AS cts
       |      FROM e WHERE event_type = 'purchase'),
       |t AS (SELECT user_id, event_id AS touch_id, event_type AS channel, ts_us
       |      FROM e WHERE event_type <> 'purchase'),
       |j AS (
       |  SELECT c.conv_id, t.channel, t.ts_us, t.touch_id
       |  FROM c JOIN t ON c.user_id = t.user_id
       |    AND t.ts_us <= c.cts AND t.ts_us > c.cts - $attribWindowUs),
       |r AS (
       |  SELECT channel,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY ts_us ASC, touch_id ASC) AS ra,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY ts_us DESC, touch_id DESC) AS rd,
       |    count(*) OVER (PARTITION BY conv_id) AS n
       |  FROM j)
       |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
       |  CAST(sum(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_first,
       |  CAST(sum(CASE WHEN rd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_last,
       |  CAST(sum((1000000 + n // 2) // n) AS BIGINT) AS credit_micros
       |FROM r GROUP BY 1""".stripMargin

  // ---- RFM segmentation (sort-free exact quartiles) -------------------------

  /** Cents per monetary histogram bucket (100.00 currency units). */
  val rfmMonetaryBucket = 10000L

  /** RFM segmentation — the classic customer-value grid (Recency ×
    * Frequency × Monetary, each quartiled) that marketing/retention teams
    * read, produced WITHOUT the global `ntile` sort every textbook version
    * uses (a no-partition window = one task owns all users). Quartile
    * thresholds come from the exact discrete-percentile-over-value-histogram
    * pattern instead: each metric's per-user values collapse to a BOUNDED
    * (value → count) histogram (recency in days ≤ corpus span; frequency
    * ≤ max events/user; monetary pre-bucketed to [[rfmMonetaryBucket]]
    * cents), the cumulative window runs over that tiny dim — never the
    * user corpus — and the threshold test is exact integer cross-multiply
    * (`cum·4 ≥ k·n`, no division). Shuffles: ONE on user_id (the per-user
    * agg); everything after is histogram-sized aggs and one-row broadcasts
    * back onto the user frame. Money stays exact: cents BIGINT end-to-end,
    * so segment totals hash-match at any partitioning. */
  def rfm(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = Tables(spark, sfDir).events
      .select(col("user_id"), to_date(col("ts")).as("d"),
        round(col("value") * lit(100), 0).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("f"),
        sum(col("cents")).as("cents"))
    val stats = u.agg(max(col("last_d")).as("d1"), count(lit(1)).as("n"))
    val m = u.crossJoin(broadcast(stats))
      .select(col("user_id"),
        datediff(col("d1"), col("last_d")).cast("long").as("r"),
        col("f"),
        expr(s"cents DIV $rfmMonetaryBucket").as("mb"),
        col("cents"), col("n"))
    // exact discrete quartiles of metric `c`: smallest value whose cumulative
    // user count reaches k/4 of the population, k = 1,2,3
    def discQuartiles(c: String): DataFrame = {
      val h = m.groupBy(col(c).as("v"), col("n")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("v"))))
      h.agg(
        min(when(col("cum") * 4 >= col("n"), col("v"))).as(s"${c}_q1"),
        min(when(col("cum") * 2 >= col("n"), col("v"))).as(s"${c}_q2"),
        min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as(s"${c}_q3"))
    }
    def quartileOf(c: String): org.apache.spark.sql.Column =
      lit(1L) + (col(c) > col(s"${c}_q1")).cast("long") +
        (col(c) > col(s"${c}_q2")).cast("long") +
        (col(c) > col(s"${c}_q3")).cast("long")
    m.crossJoin(broadcast(discQuartiles("r")))
      .crossJoin(broadcast(discQuartiles("f")))
      .crossJoin(broadcast(discQuartiles("mb")))
      .select(quartileOf("r").as("r_q"), quartileOf("f").as("f_q"),
        quartileOf("mb").as("m_q"), col("f"), col("cents"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), sum(col("f")).as("f_total"),
        sum(col("cents")).as("cents_total"))
  }

  val rfmSql: String = {
    def discQ(c: String): String =
      s"""SELECT
         |    min(CASE WHEN cum * 4 >= n THEN v END) AS ${c}_q1,
         |    min(CASE WHEN cum * 2 >= n THEN v END) AS ${c}_q2,
         |    min(CASE WHEN cum * 4 >= n * 3 THEN v END) AS ${c}_q3
         |  FROM (SELECT v, n, sum(cnt) OVER (ORDER BY v) AS cum
         |        FROM (SELECT $c AS v, n, count(*) AS cnt FROM m GROUP BY 1, 2))""".stripMargin
    def qOf(c: String): String =
      s"1 + CAST($c > ${c}_q1 AS BIGINT) + CAST($c > ${c}_q2 AS BIGINT) + CAST($c > ${c}_q3 AS BIGINT)"
    s"""WITH u AS (
       |  SELECT user_id, max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_d,
       |    CAST(count(*) AS BIGINT) AS f,
       |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1),
       |s AS (SELECT max(last_d) AS d1, CAST(count(*) AS BIGINT) AS n FROM u),
       |m AS (
       |  SELECT user_id, CAST(date_diff('day', last_d, d1) AS BIGINT) AS r,
       |    f, cents // $rfmMonetaryBucket AS mb, cents, n
       |  FROM u, s),
       |rq AS (${discQ("r")}),
       |fq AS (${discQ("f")}),
       |mq AS (${discQ("mb")}),
       |lab AS (
       |  SELECT ${qOf("r")} AS r_q, ${qOf("f")} AS f_q, ${qOf("mb")} AS m_q,
       |    f, cents
       |  FROM m, rq, fq, mq)
       |SELECT r_q, f_q, m_q, count(*) AS n_users,
       |  CAST(sum(f) AS BIGINT) AS f_total, CAST(sum(cents) AS BIGINT) AS cents_total
       |FROM lab GROUP BY 1, 2, 3""".stripMargin
  }

  // ---- chi-square drift test ------------------------------------------------

  /** χ² critical value at α=0.01, df=|types|−1=4. */
  val chi2Critical = 13.277

  /** Day-over-day χ² drift test — ev_drift's SIGNIFICANCE layer: L1/TV
    * distance says how far the event-type mix moved, the χ² statistic says
    * whether the move exceeds sampling noise (small days drift wildly by
    * chance; a raw distance threshold can't tell a quiet Sunday from real
    * breakage). Expected counts come from the PREVIOUS day's mix scaled to
    * today's volume; χ² = Σ (o−e)²/e with the classic verdict at α=0.01.
    * Numerics: each term's deviation is the cross-multiplied exact BIGINT
    * o_i·N_prev − c_prev,i·N_today (exact while o·N < 2^63, i.e. into the
    * 100 TB range); the square and division run in doubles from exact-int
    * inputs, and the per-type terms sum in the explicit [[driftTypes]]
    * order (the ev_drift fixed-order pivot) so the double is bit-identical
    * across engines and partitionings. Zero-expected cells (a type absent
    * yesterday, present today) are the textbook undefined case — excluded
    * from the statistic, surfaced in `n_new_types`. Scale shape: ONE
    * corpus aggregation to (day, type); everything after runs on the
    * bounded day dim. */
  def chi2Drift(spark: SparkSession, sfDir: String): DataFrame =
    chi2DriftOver(Tables(spark, sfDir).events
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("c")))

  /** The χ² verdict as a READ-TIME VIEW over the same drained (day_epoch,
    * event_type, c) matrix [[driftOver]] reads — shared verbatim by the
    * batch row and the streaming twin (st_chi2_drift). */
  def chi2DriftOver(counts: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wDay = W.orderBy(col("day_epoch"))
    val pivoted = counts.groupBy(col("day_epoch"))
      .pivot("event_type", driftTypes)
      .agg(first(col("c")))
      .na.fill(0L, driftTypes)
      .withColumn("n", driftTypes.map(t => col(t)).reduce(_ + _))
    val withPrev = driftTypes.foldLeft(
        pivoted.withColumn("n_prev", lag(col("n"), 1).over(wDay))) {
      (df, t) => df.withColumn(s"${t}_prev", lag(col(t), 1).over(wDay))
    }.filter(col("n_prev").isNotNull && col("n_prev") > 0)
    val terms = driftTypes.map { t =>
      val dev = (col(t) * col("n_prev") - col(s"${t}_prev") * col("n"))
        .cast("double")
      when(col(s"${t}_prev") > 0,
        dev * dev / (col(s"${t}_prev") * col("n") * col("n_prev")).cast("double"))
        .otherwise(lit(0.0))
    }
    val newTypes = driftTypes.map(t =>
      when(col(s"${t}_prev") === 0 && col(t) > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    withPrev.select(col("day_epoch"), col("n"), col("n_prev"),
        round(terms.reduce(_ + _), 6).as("chi2"),
        newTypes.as("n_new_types"))
      .withColumn("drifted", col("chi2") > chi2Critical)
  }

  val chi2DriftSql: String = {
    val pivotCols = driftTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN c ELSE 0 END) AS BIGINT) AS $t")
      .mkString(",\n      |    ")
    val prevCols = driftTypes.map(t =>
      s"lag($t) OVER (ORDER BY day_epoch) AS ${t}_prev").mkString(",\n      |    ")
    val termSum = driftTypes.map(t =>
      s"""CASE WHEN ${t}_prev > 0 THEN
         |      CAST($t * n_prev - ${t}_prev * n AS DOUBLE)
         |      * CAST($t * n_prev - ${t}_prev * n AS DOUBLE)
         |      / CAST(${t}_prev * n * n_prev AS DOUBLE) ELSE 0.0 END""".stripMargin)
      .mkString("\n      |    + ")
    val newSum = driftTypes.map(t =>
      s"CASE WHEN ${t}_prev = 0 AND $t > 0 THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH counts AS (
       |  SELECT CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT)
       |      AS day_epoch,
       |    event_type, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |p AS (
       |  SELECT day_epoch,
       |    $pivotCols
       |  FROM counts GROUP BY 1),
       |p2 AS (
       |  SELECT *, ${driftTypes.mkString(" + ")} AS n FROM p),
       |pv AS (
       |  SELECT day_epoch, ${driftTypes.mkString(", ")}, n,
       |    lag(n) OVER (ORDER BY day_epoch) AS n_prev,
       |    $prevCols
       |  FROM p2)
       |SELECT day_epoch, n, n_prev,
       |  round($termSum, 6) AS chi2,
       |  CAST($newSum AS BIGINT) AS n_new_types,
       |  round($termSum, 6) > $chi2Critical AS drifted
       |FROM pv WHERE n_prev IS NOT NULL AND n_prev > 0""".stripMargin
  }

  // ---- out-of-orderness profile (watermark sizing) --------------------------

  /** Arrival blocks for the two-level disorder sweep: 10 min of arrival
    * time per block (bounded by ingest rate × block span, the
    * ev_concurrency bucket argument). */
  val disorderBlockUs = 600L * 1000000

  /** The synthetic feed is perfectly time-ordered (event_id follows ts), so
    * the driver-gated row applies a deterministic 0–30 min "network delay"
    * to the arrival sequence (wide enough to overtake the sparse corpus's
    * inter-event gaps) — production runs the identical query on the raw
    * ingest order. Deterministic: a pure function of event_id, identical
    * in the oracle. */
  val disorderJitterSql = "((event_id * 7919) % 1800) * 1000000"

  /** Out-of-orderness profile — the diagnostic run BEFORE choosing any
    * watermark (every streaming operator in §2b holds state bounded by the
    * watermark delay; size it too tight and late events silently drop, too
    * loose and state balloons): per event, lateness = how far behind the
    * feed's running-max event time it arrived (arrival order = event_id,
    * the ingest sequence); per type, the lateness quantiles and the exact
    * fraction of events a 1 min / 5 min / 1 h watermark would discard.
    * The naive form is ONE global ordered running-max window — a single
    * task owns the whole corpus. The engine runs the ev_concurrency
    * two-level decomposition: arrival blocks of [[disorderBlock]] events
    * get per-block maxima; the cross-block prefix-max runs over the
    * BOUNDED block dim and broadcasts back; the in-block strict-preceding
    * running max is a window whose partitions are capped at the block
    * size. greatest(in-block, prefix) with −1 sentinels (never NULL — the
    * engines disagree on NULL semantics in greatest). All lateness math
    * exact BIGINT; drop rates are single divisions of exact counts;
    * quantiles via the proven exact-percentile parity (approx_percentile
    * is the 100 TB drop-in, the ev_quantiles note). */
  def disorder(spark: SparkSession, sfDir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sfDir).events
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("arrival", expr(s"ts_us + $disorderJitterSql"))
      .withColumn("blk", expr(s"arrival DIV $disorderBlockUs"))
    val bmax = ev.groupBy(col("blk")).agg(max(col("ts_us")).as("bm"))
      .withColumn("prefix_max", coalesce(
        max(col("bm")).over(W.orderBy(col("blk"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(-1L)))
      .select(col("blk"), col("prefix_max"))
    val wIn = W.partitionBy(col("blk"))
      .orderBy(col("arrival"), col("event_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val late = ev.join(broadcast(bmax), "blk")
      .withColumn("in_max", coalesce(max(col("ts_us")).over(wIn), lit(-1L)))
      .withColumn("seen_max", greatest(col("in_max"), col("prefix_max")))
      .withColumn("late_s",
        when(col("seen_max") < 0, lit(0L))
          .otherwise(greatest(lit(0L),
            expr(s"(seen_max - ts_us) DIV 1000000"))))
    late.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(late_s, 0.5)"), 6).as("p50_s"),
        round(expr("percentile(late_s, 0.95)"), 6).as("p95_s"),
        max(col("late_s")).as("max_s"),
        round(sum(when(col("late_s") > 60, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("drop_1m"),
        round(sum(when(col("late_s") > 300, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("drop_5m"),
        round(sum(when(col("late_s") > 3600, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("drop_1h"))
  }

  val disorderSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       |    epoch_us(CAST(ts AS TIMESTAMP)) + $disorderJitterSql AS arrival,
       |    (epoch_us(CAST(ts AS TIMESTAMP)) + $disorderJitterSql)
       |      // $disorderBlockUs AS blk
       |  FROM events),
       |bm AS (
       |  SELECT blk, max(ts_us) AS bm FROM ev GROUP BY 1),
       |pm AS (
       |  SELECT blk, coalesce(max(bm) OVER (ORDER BY blk
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS prefix_max
       |  FROM bm),
       |lt AS (
       |  SELECT event_type,
       |    CASE WHEN greatest(
       |        coalesce(max(ts_us) OVER (PARTITION BY ev.blk
       |          ORDER BY arrival, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1),
       |        prefix_max) < 0 THEN 0
       |      ELSE greatest(0, (greatest(
       |        coalesce(max(ts_us) OVER (PARTITION BY ev.blk
       |          ORDER BY arrival, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1),
       |        prefix_max) - ts_us) // 1000000) END AS late_s
       |  FROM ev JOIN pm ON ev.blk = pm.blk)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  round(quantile_cont(late_s, 0.5), 6) AS p50_s,
       |  round(quantile_cont(late_s, 0.95), 6) AS p95_s,
       |  CAST(max(late_s) AS BIGINT) AS max_s,
       |  round(CAST(sum(CASE WHEN late_s > 60 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS drop_1m,
       |  round(CAST(sum(CASE WHEN late_s > 300 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS drop_5m,
       |  round(CAST(sum(CASE WHEN late_s > 3600 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*), 6) AS drop_1h
       |FROM lt GROUP BY 1""".stripMargin

  // ---- CUSUM changepoint detection ------------------------------------------

  /** CUSUM changepoint detection over per-(type, minute) rates — the
    * sequential shift detector (Page 1954) that catches SUSTAINED level
    * changes z-scores and MAD miss (both score buckets independently; a
    * 20% rate drift below the outlier threshold accumulates in CUSUM until
    * it alarms). The recursive textbook form S_i = max(0, S_{i-1} + d_i)
    * looks unexpressible in SQL windows; the engine uses the prefix-sum
    * identity S_i = cum_i − min(0, min_{j≤i−1} cum_j) — TWO window passes
    * (running sum + running min), no recursion. The standard slack
    * k = μ/2 (only rates 1.5× the mean accumulate — without slack,
    * random-walk noise alarms constantly) and the mean itself are
    * cross-multiplied free of divisions: everything scales by 2D so
    * d_i = 2·n_i·D − 3·S (D = observed minutes, S = Σn per type) and
    * cum/runmin/S_i are all exact BIGINTs; the alarm predicate
    * S_i > 2·S is integer — no float can drift between engines. Scale
    * shape: ONE corpus aggregation to the (type, minute) dim; both
    * windows run per type over that time-bounded dim (minutes ≤ calendar
    * range, not corpus size) — the same bounded-window argument as
    * ev_anomaly_mad/ev_drift. */
  def cusum(spark: SparkSession, sfDir: String): DataFrame =
    cusumOver(Tables(spark, sfDir).events
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("minute", col("ts"))).as("minute_epoch"))
      .agg(count(lit(1)).as("n")))

  /** The CUSUM read-time view over a (event_type, minute_epoch, n) count
    * matrix — shared by the batch detector above and the streaming twin
    * (st_cusum drains the same matrix out of the state store). */
  def cusumOver(counts: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val stats = counts.groupBy(col("event_type"))
      .agg(sum(col("n")).as("s"), count(lit(1)).as("d"))
    val wOrd = W.partitionBy(col("event_type")).orderBy(col("minute_epoch"))
    val scored = counts.join(broadcast(stats), "event_type")
      .withColumn("dev", lit(2L) * col("n") * col("d") - lit(3L) * col("s"))
      .withColumn("cum", sum(col("dev")).over(
        wOrd.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("runmin", least(lit(0L), coalesce(min(col("cum")).over(
        wOrd.rowsBetween(W.unboundedPreceding, -1)), lit(0L))))
      .withColumn("cusum", col("cum") - col("runmin"))
    scored.filter(col("cusum") > lit(2L) * col("s"))
      .select(col("event_type"), col("minute_epoch"), col("n"),
        col("cusum"), col("s"), col("d"),
        round(col("cusum").cast("double") / (lit(2L) * col("d")).cast("double"), 4)
          .as("excess"))
  }

  val cusumSql: String =
    """WITH counts AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS BIGINT)
      |      AS minute_epoch,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS s,
      |    CAST(count(*) AS BIGINT) AS d
      |  FROM counts GROUP BY 1),
      |cm AS (
      |  SELECT counts.event_type, minute_epoch, n, s, d,
      |    CAST(sum(2 * n * d - 3 * s) OVER (PARTITION BY counts.event_type
      |      ORDER BY minute_epoch ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM counts JOIN stats ON counts.event_type = stats.event_type),
      |c AS (
      |  SELECT event_type, minute_epoch, n, s, d, cum,
      |    least(CAST(0 AS BIGINT), coalesce(CAST(min(cum) OVER (
      |      PARTITION BY event_type ORDER BY minute_epoch
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      CAST(0 AS BIGINT))) AS runmin
      |  FROM cm)
      |SELECT event_type, minute_epoch, n, cum - runmin AS cusum, s, d,
      |  round(CAST(cum - runmin AS DOUBLE) / CAST(2 * d AS DOUBLE), 4) AS excess
      |FROM c WHERE cum - runmin > 2 * s""".stripMargin

  // ---- linear gap interpolation ---------------------------------------------

  /** Time-series resampling with LINEAR interpolation — ev_gapfill's
    * numeric sibling (gapfill answers "nothing happened" with zeros; a
    * metering/telemetry series wants the value BRIDGED: pandas
    * `resample().interpolate()`, InfluxDB/Timescale `interpolate()`).
    * Each per-type minute series densifies to every minute between its
    * first and last observation; missing minutes take
    * v = n0 + (n1−n0)·(g−t0)/(t1−t0) between their nearest observed
    * neighbors. Numerics: operands stay exact BIGINT through the
    * cross-multiplied numerator/denominator; the interpolated value is ONE
    * 6dp-rounded division per row — no float accumulates. Scale shape: ONE
    * corpus agg to the (type, minute) dim; the lead window and the
    * gap-pair explode run over that time-bounded dim; each gap explodes in
    * its own task (gaps are silence-bounded — for month-long droughts the
    * ev_gapfill two-level sequence trick drops in unchanged). */
  def interp(spark: SparkSession, sfDir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // persisted: the bounded (type, minute) dim feeds BOTH union branches —
    // unpersisted, each branch re-runs the corpus aggregation (Catalyst
    // prunes the unused lead() from the observed branch, so the subtrees
    // differ and exchange reuse can't kick in)
    val obs = Tables(spark, sfDir).events
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("minute", col("ts"))).as("m"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val w = W.partitionBy(col("event_type")).orderBy(col("m"))
    val withNext = obs
      .withColumn("m1", lead(col("m"), 1).over(w))
      .withColumn("n1", lead(col("n"), 1).over(w))
    val observed = obs.select(col("event_type"), col("m").as("minute_epoch"),
      round(col("n").cast("double"), 6).as("value"), lit(false).as("interpolated"))
    val bridged = withNext
      .filter(col("m1").isNotNull && col("m1") > col("m") + 60)
      .select(col("event_type"), col("m"), col("n"), col("m1"), col("n1"),
        explode(sequence(col("m") + 60, col("m1") - 60, lit(60L))).as("g"))
      .select(col("event_type"), col("g").as("minute_epoch"),
        round(col("n").cast("double")
          + ((col("n1") - col("n")) * (col("g") - col("m"))).cast("double")
            / (col("m1") - col("m")).cast("double"), 6).as("value"),
        lit(true).as("interpolated"))
    observed.unionAll(bridged)
  }

  val interpSql: String =
    """WITH obs AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS BIGINT) AS m,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |nx AS (
      |  SELECT event_type, m, n,
      |    lead(m) OVER (PARTITION BY event_type ORDER BY m) AS m1,
      |    lead(n) OVER (PARTITION BY event_type ORDER BY m) AS n1
      |  FROM obs)
      |SELECT event_type, m AS minute_epoch,
      |  round(CAST(n AS DOUBLE), 6) AS value, false AS interpolated
      |FROM obs
      |UNION ALL
      |SELECT event_type, g AS minute_epoch,
      |  round(CAST(n AS DOUBLE)
      |    + CAST((n1 - n) * (g - m) AS DOUBLE) / CAST(m1 - m AS DOUBLE), 6)
      |    AS value,
      |  true AS interpolated
      |FROM nx, LATERAL unnest(range(m + 60, m1, 60)) t(g)
      |WHERE m1 IS NOT NULL AND m1 > m + 60""".stripMargin

  // ---- growth accounting ----------------------------------------------------

  /** Growth accounting — the canonical DAU decomposition (new / retained /
    * resurrected / churned per day) product and growth teams read daily;
    * ev_cohorts gives the retention TRIANGLE, this gives the day-over-day
    * FLOW, and net = new + resurrected − churned reconciles the DAU delta
    * exactly. Semantics: a user active on day d is `new` (no prior
    * activity), `retained` (active on d−1), or `resurrected` (active
    * before but not d−1); `churned` on d = active on d−1 but not d (only
    * counted for d ≤ max observed day). Scale shape: the corpus collapses
    * to distinct (user, day) FIRST (one (user, day) exchange with partial
    * dedup); the lag/lead windows re-key on user_id — a second, much
    * smaller exchange over ≤ users·days rows; the final per-day agg is
    * calendar-bounded. All counts exact BIGINT. */
  def growth(spark: SparkSession, sfDir: String): DataFrame =
    growthOver(Tables(spark, sfDir).events
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day_idx"))
      .distinct())

  /** The decomposition over a distinct (user_id, day_idx) frame — shared
    * with the streaming twin (st_growth reconstructs the same frame from
    * per-user bitmap state, then runs literally this code). */
  def growthOver(ud: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("user_id")).orderBy(col("day_idx"))
    val flagged = ud
      .withColumn("prev", lag(col("day_idx"), 1).over(w))
      .withColumn("next", lead(col("day_idx"), 1).over(w))
    val maxDay = flagged.agg(max(col("day_idx")).as("max_day"))
    val active = flagged.select(col("day_idx"),
      when(col("prev").isNull, 1L).otherwise(0L).as("is_new"),
      when(col("prev") === col("day_idx") - 1, 1L).otherwise(0L).as("is_ret"),
      when(col("prev").isNotNull && col("prev") < col("day_idx") - 1, 1L)
        .otherwise(0L).as("is_res"))
      .groupBy(col("day_idx"))
      .agg(sum(col("is_new")).as("n_new"), sum(col("is_ret")).as("n_retained"),
        sum(col("is_res")).as("n_resurrected"))
    // churn events land on the day AFTER the user's last-consecutive day
    val churn = flagged
      .filter(col("next").isNull || col("next") > col("day_idx") + 1)
      .select((col("day_idx") + 1).as("day_idx"))
      .join(broadcast(maxDay), col("day_idx") <= col("max_day"))
      .groupBy(col("day_idx")).agg(count(lit(1)).as("n_churned"))
    active.join(churn, Seq("day_idx"), "full_outer")
      .na.fill(0L, Seq("n_new", "n_retained", "n_resurrected", "n_churned"))
      .select(col("day_idx"), col("n_new"), col("n_retained"),
        col("n_resurrected"), col("n_churned"),
        (col("n_new") + col("n_resurrected") - col("n_churned")).as("net"))
  }

  val growthSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_idx
      |  FROM events),
      |f AS (
      |  SELECT user_id, day_idx,
      |    lag(day_idx) OVER (PARTITION BY user_id ORDER BY day_idx) AS prev,
      |    lead(day_idx) OVER (PARTITION BY user_id ORDER BY day_idx) AS next
      |  FROM ud),
      |mx AS (SELECT max(day_idx) AS max_day FROM f),
      |act AS (
      |  SELECT day_idx,
      |    CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |    CAST(sum(CASE WHEN prev = day_idx - 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_retained,
      |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev < day_idx - 1
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM f GROUP BY 1),
      |ch AS (
      |  SELECT f.day_idx + 1 AS day_idx, CAST(count(*) AS BIGINT) AS n_churned
      |  FROM f, mx
      |  WHERE (next IS NULL OR next > f.day_idx + 1) AND f.day_idx + 1 <= max_day
      |  GROUP BY 1)
      |SELECT coalesce(act.day_idx, ch.day_idx) AS day_idx,
      |  coalesce(n_new, 0) AS n_new,
      |  coalesce(n_retained, 0) AS n_retained,
      |  coalesce(n_resurrected, 0) AS n_resurrected,
      |  coalesce(n_churned, 0) AS n_churned,
      |  coalesce(n_new, 0) + coalesce(n_resurrected, 0) - coalesce(n_churned, 0)
      |    AS net
      |FROM act FULL OUTER JOIN ch ON act.day_idx = ch.day_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_cusum" -> (cusum _),
    "ev_disorder" -> (disorder _),
    "ev_chi2_drift" -> (chi2Drift _),
    "ev_ab_srm" -> (abSrm _),
    "ev_cuped" -> (cuped _),
    "ev_power_mde" -> (powerMde _),
    "ev_xcorr" -> (xcorr _),
    "ev_decomp" -> (decomp _),
    "ev_error_budget" -> (errorBudget _),
    "ev_interp" -> (interp _),
    "ev_growth" -> (growth _),
    "ev_rfm" -> (rfm _),
    "ev_attribution" -> (attribution _),
    "ev_ltv" -> (ltv _),
    "ev_bitmap" -> (bitmapActivity _),
    "ev_heavy_hitters" -> (heavyHitters _),
    "ev_drift" -> (drift _),
    "ev_forecast" -> (forecast _),
    "ev_hw_forecast" -> (hwForecast _),
    "ev_series_sim" -> (seriesSim _),
    "ev_series_lsh" -> (seriesLsh _),
    "ev_series_lsh_mt" -> (seriesLshMt _),
    "ev_series_recall" -> (seriesRecall _),
    "ev_anomaly_mad" -> (anomalyMad _),
    "ev_quantile_sketch" -> (quantileSketch _),
    "ev_entry_paths" -> (entryPaths _),
    "ev_concurrency" -> (concurrency _),
    "ev_abtest" -> (abtest _),
    "ev_sessions" -> (sessions _),
    "ev_trending" -> (trending _),
    "ev_variant" -> (variantExtract _),
    "ev_rolling" -> (rolling _),
    "ev_paths" -> (paths _),
    "ev_incr_agg" -> (incrAgg _),
    "ev_gapfill" -> (gapfill _),
    "ev_spike" -> (spikes _),
    "ev_cms" -> (cms _),
    "ev_wau" -> (wau _),
    "ev_cohorts" -> (cohorts _),
    "ev_parse_json" -> (parseJson _),
    "ev_throughput" -> (throughput _),
    "ev_signups" -> (signups _),
    "ev_funnel" -> (funnel _),
    "ev_funnel_window" -> (funnelWindow _),
    "ev_pattern" -> (pattern _),
    "ev_markov" -> (markov _),
    "ev_seasonality" -> (seasonality _),
    "ev_hll_users" -> (hllUsers _),
    "ev_theta_kmv" -> (thetaKmv _),
    "ev_quantiles" -> (quantiles _))

  def oracleSql: Map[String, String] = Map(
    "ev_cusum" -> cusumSql,
    "ev_disorder" -> disorderSql,
    "ev_chi2_drift" -> chi2DriftSql,
    "ev_ab_srm" -> abSrmSql,
    "ev_cuped" -> cupedSql,
    "ev_power_mde" -> powerMdeSql,
    "ev_xcorr" -> xcorrSql,
    "ev_decomp" -> decompSql,
    "ev_error_budget" -> errorBudgetSql,
    "ev_interp" -> interpSql,
    "ev_growth" -> growthSql,
    "ev_rfm" -> rfmSql,
    "ev_attribution" -> attributionSql,
    "ev_ltv" -> ltvSql,
    "ev_bitmap" -> bitmapActivitySql,
    "ev_heavy_hitters" -> heavyHittersSql,
    "ev_drift" -> driftSql,
    "ev_forecast" -> forecastSql,
    "ev_hw_forecast" -> hwForecastSql,
    "ev_series_sim" -> seriesSimSql,
    "ev_series_lsh" -> seriesLshSql,
    "ev_series_lsh_mt" -> seriesLshMtSql,
    "ev_series_recall" -> seriesRecallSql,
    "ev_anomaly_mad" -> anomalyMadSql,
    "ev_quantile_sketch" -> quantileSketchSql,
    "ev_entry_paths" -> entryPathsSql,
    "ev_concurrency" -> concurrencySql,
    "ev_abtest" -> abtestSql,
    "ev_sessions" -> sessionsSql,
    "ev_trending" -> trendingSql,
    "ev_variant" -> variantExtractSql,
    "ev_rolling" -> rollingSql,
    "ev_paths" -> pathsSql,
    "ev_incr_agg" -> incrAggSql,
    "ev_gapfill" -> gapfillSql,
    "ev_spike" -> spikesSql,
    "ev_cms" -> cmsSql,
    "ev_wau" -> wauSql,
    "ev_cohorts" -> cohortsSql,
    "ev_parse_json" -> parseJsonSql,
    "ev_throughput" -> throughputSql,
    "ev_signups" -> signupsSql,
    "ev_funnel" -> funnelSql,
    "ev_funnel_window" -> funnelWindowSql,
    "ev_pattern" -> patternSql,
    "ev_markov" -> markovSql,
    "ev_seasonality" -> seasonalitySql,
    "ev_hll_users" -> hllUsersSql,
    "ev_theta_kmv" -> thetaKmvSql,
    "ev_quantiles" -> quantilesSql)
}
