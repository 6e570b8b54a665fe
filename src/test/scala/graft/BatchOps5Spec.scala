package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-5 additions: CUSUM changepoints, growth
  * accounting, market-basket pairs, burst pairs, code routing. */
class BatchOps5Spec extends AnyFunSuite {
  import SparkTest._

  test("ev_cusum: prefix-sum identity equals the recursive textbook fold") {
    // recompute the unfiltered statistic per type and replay Page's
    // recursion S_i = max(0, S_{i-1} + d_i) on the collected (bounded,
    // time-range-sized) minute series
    val counts = Tables(spark, sf).events
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("minute", col("ts"))).as("m"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    counts.foreach { case (_, rows) =>
      val series = rows.sortBy(_.getAs[Long]("m")).map(_.getAs[Long]("n"))
      val s = series.sum
      val d = series.length.toLong
      // recursive fold in the 2D-scaled integer units the query uses
      var si = 0L
      var maxSi = 0L
      series.foreach { n =>
        si = math.max(0L, si + (2 * n * d - 3 * s))
        maxSi = math.max(maxSi, si)
      }
      // the query's prefix identity, same scale
      var cum = 0L
      var runmin = 0L
      var maxPrefix = 0L
      series.foreach { n =>
        cum += 2 * n * d - 3 * s
        maxPrefix = math.max(maxPrefix, cum - runmin)
        runmin = math.min(runmin, cum)
      }
      assert(maxSi == maxPrefix, "prefix identity must equal the recursion")
    }
    // and the alarm set is exactly the rows where the statistic crosses 2S
    events.EventOps.cusum(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("cusum") > 2 * r.getAs[Long]("s"))
    }
  }

  test("ev_growth: flows decompose DAU and reconcile its delta exactly") {
    val g = events.EventOps.growth(spark, sf).collect()
      .map(r => r.getAs[Long]("day_idx") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))
      .toMap
    val dau = Tables(spark, sf).events
      .select(expr("unix_micros(ts) DIV 86400000000").as("day_idx"), col("user_id"))
      .distinct().groupBy("day_idx").count().collect()
      .map(r => r.getAs[Long]("day_idx") -> r.getAs[Long]("count")).toMap
    dau.foreach { case (day, n) =>
      val (nw, ret, res, _) = g(day)
      assert(nw + ret + res == n, s"day $day: new+retained+resurrected != DAU")
    }
    // day-over-day reconciliation on consecutive observed days
    dau.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(d0, d1) if d1 == d0 + 1 =>
        val (nw, _, res, _) = g(d1)
        val churn1 = g(d1)._4
        assert(dau(d1) - dau(d0) == nw + res - churn1,
          s"day $d1: DAU delta must equal new+resurrected-churned")
      case _ =>
    }
  }

  test("q_basket: support bounded by both marginals, join not cartesian") {
    val b = relational.Relational.qBasket(spark, sf)
    val plan = b.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    b.collect().foreach { r =>
      val s = r.getAs[Long]("support")
      assert(s >= 2 && s <= math.min(r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b")))
      assert(r.getAs[Long]("pa") < r.getAs[Long]("pb"))
      assert(r.getAs[Double]("lift") > 0)
    }
  }

  test("ru_burst_pairs: banded equi-join equals the naive quadratic self-join") {
    val s = events.Signups.derive(spark, sf)
      .select(col("fingerprint"), col("event_id"), col("ts_us"))
    val a = s.select(col("fingerprint"), col("event_id").as("ea"), col("ts_us").as("ta"))
    val b = s.select(col("fingerprint"), col("event_id").as("eb"), col("ts_us").as("tb"))
    val naive = a.join(b, Seq("fingerprint"))
      .filter((col("ta") < col("tb") || (col("ta") === col("tb") && col("ea") < col("eb"))) &&
        col("tb") - col("ta") <= rules.RuleQueries.burstWindowUs)
      .groupBy("fingerprint").agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val banded = rules.RuleQueries.burstPairs(spark, sf).collect()
      .map(r => r.getAs[String]("fingerprint") -> r.getAs[Long]("n_pairs")).toMap
    assert(banded == naive, "banded join must find exactly the naive pairs")
    val plan = rules.RuleQueries.burstPairs(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(400))
  }

  test("ann_incremental: merged totals cover the corpus; shares consistent") {
    val rows = sim.Similarity.incrementalIndex(spark, sf).collect()
    val corpus = Tables(spark, sf).embeddings.count()
    assert(rows.map(_.getAs[Long]("n_total")).sum == corpus,
      "every vector must land in exactly one list")
    val deltaTotal = rows.map(_.getAs[Long]("n_delta")).sum
    val expectedDelta = Tables(spark, sf).embeddings
      .filter(col("vec_id") % 5 === 0).count()
    assert(deltaTotal == expectedDelta, "delta assignment must cover the delta split")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_base") + r.getAs[Long]("n_delta"))
    }
  }

  test("q_ldiv: groups partition the customer universe, verdict is the l test") {
    val rows = relational.Relational.qLdiv(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("grp_n")).sum == Tables(spark, sf).customer.count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("released") ==
        (r.getAs[Long]("n_sensitive") >= relational.Relational.lDivL))
      assert(r.getAs[Long]("n_sensitive") <= r.getAs[Long]("grp_n"))
    }
  }

  test("web_bfs_depth: level-synchronous expansion equals driver-side BFS") {
    val got = web.WebOps.bfsDepth(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("depth")).toMap
    // reference BFS on the collected (tiny at sf0.001) synthetic graph
    val n = Tables(spark, sf).documents.count()
    val ids = Tables(spark, sf).documents.select("doc_id").collect().map(_.getLong(0))
    val adj = ids.filter(_ % 2 == 0)
      .flatMap(d => Seq(d -> ((d * 7 + 3) % n), d -> ((d * 13 + 11) % n)))
      .filter { case (s, t) => s != t }
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).distinct }
    val want = scala.collection.mutable.Map[Long, Long]()
    var frontier = ids.filter(_ % 97 == 0).toSet
    frontier.foreach(want(_) = 0L)
    var d = 1L
    while (d <= web.WebOps.bfsMaxDepth && frontier.nonEmpty) {
      val next = frontier.flatMap(x => adj.getOrElse(x, Array.empty[Long]))
        .filterNot(want.contains)
      next.foreach(want(_) = d)
      frontier = next
      d += 1
    }
    assert(got == want.toMap, "distributed BFS must equal the reference BFS")
  }

  test("q_pseudonym: tokens preserve the natural key's join structure") {
    val t = Tables(spark, sf)
    val natural = t.customer.join(t.orders,
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).map(_._2)
    val tokenized = relational.Relational.qPseudonym(spark, sf).collect()
      .map(_.getAs[Long]("n_orders")).sorted
    assert(tokenized.sorted.sameElements(natural.sorted),
      "per-entity order counts must survive pseudonymization")
    // and the natural key never appears in the release
    val cols = relational.Relational.qPseudonym(spark, sf).columns
    assert(!cols.exists(_.contains("custkey")), cols.mkString(","))
  }

  test("st_cusum: streaming alarm set equals the batch detector") {
    val live = streaming.StreamOps.cusumLive(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val batch = events.EventOps.cusum(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(live == batch, "sketch-in-state + read-time view must equal batch")
  }

  test("src_csv: clean rows pass, every dirty shape lands in quarantine") {
    val rows = sources.CsvQueries.csvIngest(spark, sf).collect()
    assert(rows.length == 7)
    val quarantined = rows.filter(_.getAs[Boolean]("quarantined"))
    assert(quarantined.length == 4, "4 dirty shapes")
    assert(quarantined.forall(_.getAs[String]("raw") != null),
      "dead-letter branch must carry the raw line")
    val clean = rows.filter(!_.getAs[Boolean]("quarantined"))
    assert(clean.map(_.getAs[String]("name")).toSet ==
      Set("alice", "smith, bob", "says \"hi\""),
      "quoted delimiters and RFC 4180 doubled quotes must unwrap")
  }

  test("ev_interp: series densifies to a contiguous minute grid, bridged values bounded") {
    val rows = events.EventOps.interp(spark, sf).collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { case (_, rs) =>
      val minutes = rs.map(_.getAs[Long]("minute_epoch")).sorted
      assert(minutes.zip(minutes.tail).forall { case (a, b) => b == a + 60 },
        "dense grid must have no holes between first and last observation")
      // a bridged value lies between its neighbors (linearity)
      val byMin = rs.map(r => r.getAs[Long]("minute_epoch") ->
        (r.getAs[Double]("value"), r.getAs[Boolean]("interpolated"))).toMap
      byMin.foreach { case (m, (v, interp)) =>
        if (interp) {
          // walk to nearest observed on each side
          def seek(step: Long): Double = {
            var t = m + step
            while (byMin(t)._2) t += step
            byMin(t)._1
          }
          val (lo, hi) = (seek(-60) min seek(60), seek(-60) max seek(60))
          assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"$v outside [$lo,$hi]")
        } else assert(v >= 1.0, "observed minutes carry their count")
      }
    }
  }

  test("q_log_compact: survivors are exactly the keys whose last record upserts") {
    val ev = Tables(spark, sf).events
    val survivors = relational.Relational.qLogCompact(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_ops")).toMap
    val byUser = ev.select(col("user_id"), col("event_type"),
        graft.epochUs(col("ts")).as("ts_us"), col("event_id")).collect()
      .groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (uid, rs) =>
      val last = rs.maxBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
      val lastIsUpsert = last.getAs[String]("event_type") != "error"
      assert(survivors.contains(uid) == lastIsUpsert,
        s"user $uid: tombstone-last keys must vanish")
      if (lastIsUpsert) assert(survivors(uid) == rs.length,
        "n_ops must count the full journal depth")
    }
  }

  test("q_aqp: sample tracks the rate and the estimate sits within error bounds") {
    relational.Relational.qAqp(spark, sf).collect().foreach { r =>
      val (nEx, nS) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_sample"))
      val p = nS.toDouble / nEx
      assert(p > 0.01 && p < 0.12, s"5% hash sample way off: $p")
      val (est, exact) = (r.getAs[Long]("est_cents"), r.getAs[Long]("exact_cents"))
      val seCents = r.getAs[Double]("se_dollars") * 100
      assert(math.abs(est - exact) <= 6 * seCents + 1,
        s"estimate must sit within ~6 SE of truth (est=$est exact=$exact se=$seCents)")
    }
  }

  test("ev_disorder: two-level sweep equals the single global running-max window") {
    // reference: one global pass in (arrival, event_id) order on the
    // collected (tiny at sf0.001) corpus
    val ev = Tables(spark, sf).events
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Long]("ts_us")))
    val jitter = (eid: Long) => ((eid * 7919) % 1800) * 1000000L
    val ordered = ev.sortBy { case (_, eid, ts) => (ts + jitter(eid), eid) }
    var runMax = -1L
    val lateBy = scala.collection.mutable.Map[String, List[Long]]()
    ordered.foreach { case (t, _, ts) =>
      val late = if (runMax < 0) 0L else math.max(0L, (runMax - ts) / 1000000L)
      lateBy(t) = late :: lateBy.getOrElse(t, Nil)
      runMax = math.max(runMax, ts)
    }
    val got = events.EventOps.disorder(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("max_s"))).toMap
    lateBy.foreach { case (t, ls) =>
      assert(got(t)._1 == ls.length, s"$t: row count")
      assert(got(t)._2 == ls.max, s"$t: max lateness ${got(t)._2} vs ${ls.max}")
    }
  }

  test("st_temporal_join: live per-tier counts equal the batch temporal join") {
    val live = streaming.StreamOps.temporalJoinLive(spark, sf).collect()
      .map(r => r.getAs[String]("tier") -> r.getAs[Long]("n_views")).toMap
    val batch = relational.Relational.qTemporalJoin(spark, sf).collect()
      .map(r => r.getAs[String]("tier") -> r.getAs[Long]("n_views")).toMap
    assert(live == batch, s"$live vs $batch")
  }

  test("q_feature_join: features never see at-or-after-label data") {
    val feats = relational.Relational.qFeatureJoin(spark, sf).collect()
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
    feats.foreach { r =>
      val (uid, ts) = (r.getAs[Long]("user_id"), r.getAs[Long]("label_ts_us"))
      val prior = ev(uid).filter(_.getAs[Long]("ts_us") < ts)
      val views = prior.count(e => e.getAs[String]("event_type") == "view"
        && e.getAs[Long]("ts_us") >= ts - 86399999999L)
      val spend = prior.filter(_.getAs[String]("event_type") == "purchase")
        .map(_.getAs[Long]("cents")).sum
      assert(r.getAs[Long]("f_views_24h") == views, s"user $uid views")
      assert(r.getAs[Long]("f_spend_cents") == spend, s"user $uid spend leak")
    }
  }

  test("tx_auc: histogram Mann-Whitney equals the rank-based definition") {
    val scored = text.Classify.classify(spark, sf)
      .join(Tables(spark, sf).documents
        .select(col("doc_id"), (col("lang") === "en").as("truth")), "doc_id")
      .select(col("score_milli"), col("truth")).collect()
      .map(r => r.getAs[Long]("score_milli") -> r.getAs[Boolean]("truth"))
    // reference: average-rank AUC on the driver
    val sorted = scored.sortBy(_._1)
    val ranks: Seq[(Boolean, Double)] = sorted.zipWithIndex.groupBy(_._1._1)
      .toSeq.flatMap { case (_, g) =>
        val avg = g.map(_._2 + 1).sum.toDouble / g.length
        g.toSeq.map { case ((_, t), _) => (t, avg) }
      }
    val nPos = scored.count(_._2).toDouble
    val nNeg = scored.length - nPos
    val want = (ranks.filter(_._1).map(_._2).sum - nPos * (nPos + 1) / 2) / (nPos * nNeg)
    val got = text.TextOps.auc(spark, sf).head.getAs[Double]("auc")
    assert(math.abs(got - want) < 1e-5, s"auc $got vs $want")
  }

  test("ev_chi2_drift: statistic matches a driver-side recomputation") {
    val types = events.EventOps.driftTypes
    val counts = Tables(spark, sf).events
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("d"), col("event_type"))
      .count().collect()
      .groupBy(_.getAs[Long]("d"))
      .map { case (d, rs) =>
        d -> types.map(t => rs.find(_.getString(1) == t)
          .map(_.getAs[Long]("count")).getOrElse(0L))
      }
    val days = counts.keys.toSeq.sorted
    val want = days.sliding(2).collect { case Seq(d0, d1) =>
      val (prev, cur) = (counts(d0), counts(d1))
      val (np, n) = (prev.sum, cur.sum)
      val chi2 = types.indices.map { i =>
        if (prev(i) > 0) {
          val dev = (cur(i) * np - prev(i) * n).toDouble
          dev * dev / (prev(i).toDouble * n * np)
        } else 0.0
      }.sum
      d1 -> chi2
    }.toMap
    events.EventOps.chi2Drift(spark, sf).collect().foreach { r =>
      val w = want(r.getAs[Long]("day_epoch"))
      assert(math.abs(r.getAs[Double]("chi2") - w) < 1e-4,
        s"day ${r.getAs[Long]("day_epoch")}: ${r.getAs[Double]("chi2")} vs $w")
    }
  }

  test("ru_shadow: buckets partition the candidate-incumbent match pairs") {
    val rows = rules.RuleQueries.ruShadow(spark, sf).collect()
    val nCand = rows.head.getAs[Long]("n_candidate")
    assert(nCand > 0)
    val none = rows.find(_.getAs[String]("incumbent") == "<none>")
    assert(none.isDefined, "candidate-only bucket must exist")
    // every share is n_events / n_candidate
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("share") -
        r.getAs[Long]("n_events").toDouble / nCand) < 1e-5)
    }
  }

  test("geo_cluster: grid banding finds exactly the naive all-pairs matches") {
    val pts = events.Signups.derive(spark, sf)
      .withColumn("ip_int", enrich.GeoIp.ipToInt(col("ip")))
      .filter(col("ip_int").isNotNull)
      .select(col("event_id"),
        (col("ip_int") % 170001L - 85000L).as("la"),
        (expr("ip_int DIV 7") % 360001L - 180000L).as("lo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r = enrich.EnrichQueries.geoCellMdeg
    var naive = 0L
    for (a <- pts; b <- pts
         if a._1 < b._1 && math.abs(a._2 - b._2) <= r && math.abs(a._3 - b._3) <= r)
      naive += 1
    val banded = enrich.EnrichQueries.geoCluster(spark, sf).collect()
      .map(_.getAs[Long]("n_pairs")).sum
    assert(banded == naive, s"banded $banded vs naive $naive")
    val plan = enrich.EnrichQueries.geoCluster(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "spatial banding must stay an equi-join:\n" + plan.take(600))
  }

  test("st_session_native: native session_window equals the custom state machine") {
    // the two realizations differ only at EXACT-gap boundaries (half-open
    // vs strict >) — absent such ties, session sets must be identical
    val native = streaming.StreamOps.sessionNative(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).toSet
    val custom = streaming.StreamOps.sessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).toSet
    assert(native == custom, s"${native.size} native vs ${custom.size} custom")
  }

  test("ev_ab_srm: chi2 recomputes from the variant counts") {
    val r = events.EventOps.abSrm(spark, sf).head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val want = math.pow((na - nb).toDouble, 2) / (na + nb)
    assert(math.abs(r.getAs[Double]("chi2") - want) < 1e-4)
    assert(r.getAs[Boolean]("srm") == (r.getAs[Double]("chi2") > events.EventOps.srmCritical))
  }

  test("samp_uncertainty: selected batch is exactly the K smallest margins") {
    val all = text.Classify.classify(spark, sf).collect()
      .map(r => (math.abs(r.getAs[Long]("score_milli")), r.getAs[Long]("doc_id")))
      .sorted.take(sample.Sampling.uncertaintyK).toSet
    val got = sample.Sampling.uncertainty(spark, sf).collect()
      .map(r => (r.getAs[Long]("margin_milli"), r.getAs[Long]("doc_id"))).toSet
    assert(got == all)
  }

  test("ru_reputation: decay weights are exact shifts, fresher hits dominate") {
    val rows = rules.RuleQueries.ruReputation(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // scores strictly ordered (desc, ip asc tie-break)
    val scores = rows.map(r => (-r.getAs[Long]("score"), r.getAs[String]("ip")))
    assert(scores.sameElements(scores.sorted), "top-20 order must be deterministic")
    // every score is a sum of powers of two in [1, 2^30] times match count
    rows.foreach { r =>
      val (n, s) = (r.getAs[Long]("n_matches"), r.getAs[Long]("score"))
      assert(s >= n && s <= n * (1L << 30), s"score $s outside bounds for $n matches")
    }
  }

  test("dd_lsh_curve: stricter configs are subsets; permissive config is the union ceiling") {
    val rows = dedup.Dedup.lshCurve(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_bands"), r.getAs[Long]("rows_per_band")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_union"),
          r.getAs[Double]("est_prob_at_half"))).toMap
    assert(rows.keySet == Set((8L, 2L), (4L, 4L), (2L, 8L)))
    val union = rows.values.head._2
    rows.values.foreach { case (n, u, _) => assert(u == union && n <= union) }
    // monotonicity of the analytic S-curve at tau=0.5: permissive > strict
    assert(rows((8L, 2L))._3 > rows((4L, 4L))._3)
    assert(rows((4L, 4L))._3 > rows((2L, 8L))._3)
    // exact dyadic: (8,2) value is 1 - (3/4)^8 precisely
    assert(rows((8L, 2L))._3 == 1.0 - math.pow(0.75, 8))
  }

  test("tx_code: fixture code rows flag, prose corpus does not") {
    val rows = text.TextOps.code(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_code")).toMap
    assert(rows(-1L) && rows(-2L), "embedded code must be detected")
    assert(!rows(-3L), "embedded prose must pass")
    assert(rows.filterKeys(_ >= 0).values.forall(!_), "synthetic corpus is all prose")
  }
}
