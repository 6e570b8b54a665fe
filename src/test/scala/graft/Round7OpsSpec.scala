package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-7 session-2 additions: ESS audit, compaction
  * planner, audio fingerprint dedup, anchor-text rollup, live growth. */
class Round7OpsSpec extends AnyFunSuite {
  import SparkTest._

  test("samp_ess: three schemes, each 1 <= ess <= n, product-DSIR strictly more degenerate than mean-DSIR") {
    val rows = sample.Sampling.ess(spark, sf).collect()
      .map(r => r.getAs[String]("scheme") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("ess"),
          r.getAs[Double]("ess_ratio"), r.getAs[Double]("wmax_share"))).toMap
    assert(rows.keySet == Set("dsir_mean", "dsir_product", "quality"))
    rows.foreach { case (scheme, (n, ess, ratio, wshare)) =>
      assert(ess >= 1.0 - 1e-9 && ess <= n + 1e-6, s"$scheme ess=$ess out of [1, n=$n]")
      assert(math.abs(ratio - ess / n) < 1e-3, s"$scheme ratio inconsistent")
      assert(wshare >= 1.0 / n - 1e-9 && wshare <= 1.0 + 1e-9, s"$scheme wmax_share=$wshare")
    }
    // the mean-of-ratios weight is near-flat by construction; the product
    // (the weight DSIR actually resamples on) concentrates — the audit
    // must SHOW that, or it isn't measuring anything.
    assert(rows("dsir_product")._2 < rows("dsir_mean")._2,
      "product weights must be more degenerate than mean weights")
  }

  test("q_compaction: plan conserves the manifest; pass-throughs are big; bins pack small files in order") {
    val t = Tables(spark, sf).documents
    val manifestMass = t.agg(sum(col("n_chars"))).head.getLong(0)
    val manifestDocs = t.count()
    val plan = relational.Relational.qCompaction(spark, sf).collect()
    assert(plan.map(_.getAs[Long]("total_chars")).sum == manifestMass,
      "planned outputs must cover every char exactly once")
    assert(plan.map(_.getAs[Long]("n_docs")).sum == manifestDocs)
    val target = relational.Relational.compactTarget
    plan.filter(!_.getAs[Boolean]("compacted")).foreach { r =>
      assert(r.getAs[Long]("total_chars") >= target,
        s"pass-through below target: $r")
      assert(r.getAs[Long]("n_inputs") == 1L)
    }
    plan.filter(_.getAs[Boolean]("compacted")).foreach { r =>
      assert(r.getAs[Long]("n_inputs") >= 1L)
      assert(r.getAs[String]("first_part") <= r.getAs[String]("last_part"))
    }
    // bins never cross the partition (source) boundary by construction of
    // the window; assert the planner emitted a bounded number of bins
    plan.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val smallMass = rows.filter(_.getAs[Boolean]("compacted"))
        .map(_.getAs[Long]("total_chars")).sum
      val nBins = rows.count(_.getAs[Boolean]("compacted"))
      assert(nBins <= smallMass / target + 1,
        s"$src: $nBins bins for $smallMass chars at target $target")
    }
  }

  test("mm_audio_fp: fingerprints are 15-bit, ownership is group-min, dups exist and verify") {
    val fp = multimodal.Multimodal.mmAudioFp(spark, sf).collect()
    assert(fp.forall(r => r.getAs[Long]("fp") >= 0L && r.getAs[Long]("fp") < (1L << 15)))
    assert(fp.forall(r => r.getAs[Long]("owner_doc") <= r.getAs[Long]("doc_id")))
    val byFp = fp.groupBy(_.getAs[Long]("fp"))
    byFp.foreach { case (_, rows) =>
      val owner = rows.map(_.getAs[Long]("doc_id")).min
      assert(rows.forall(_.getAs[Long]("owner_doc") == owner))
      rows.foreach(r => assert(
        r.getAs[Boolean]("is_dup") == (r.getAs[Long]("doc_id") != owner)))
    }
    assert(fp.exists(_.getAs[Boolean]("is_dup")),
      "fixture must exercise at least one audio duplicate")
    // two docs with identical text and the same length class MUST collide
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val sameKey = docs.groupBy { case (id, tx) => (tx, id % 7) }
      .values.filter(_.length >= 2)
    val fpOf = fp.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    sameKey.foreach { grp =>
      val fps = grp.map { case (id, _) => fpOf(id) }.distinct
      assert(fps.length == 1, s"replicated clip split fingerprints: $grp")
    }
  }

  test("web_anchor_text: same-target anchors aggregate; counts match the href trace") {
    val at = web.WebOps.anchorText(spark, sf).collect()
      .map(r => r.getAs[String]("link") ->
        (r.getAs[Long]("n_anchors"), r.getAs[Long]("n_pages"),
          r.getAs[String]("anchor_texts"))).toMap
    assert(at("https://example.com/dir/a.html") == ((2L, 1L, "A|A2")),
      "a.html and a.html#sec2 must land on one target with both texts")
    assert(at.values.map(_._1).sum == 15L, "15 followed anchors in the fixture")
    // every anchor target must also be a web_links edge (same resolve +
    // canonicalize chain) and vice versa
    val links = web.WebOps.linkExtract(spark, sf).select(col("link"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(at.keySet == links, "anchor targets and link edges must agree")
  }

  test("ann_pca: unit direction, positive eigenvalue, share in (0,1], matvec residual small") {
    val rows = sim.Similarity.pca(spark, sf).collect().sortBy(_.getAs[Long]("dim"))
    assert(rows.length == 64)
    val v = rows.map(_.getAs[Double]("pc"))
    val nrm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-4, s"direction not unit: $nrm")
    val eig = rows.head.getAs[Double]("eig")
    val share = rows.head.getAs[Double]("share")
    assert(eig > 0 && share > 0 && share <= 1.0)
    // fixed-round contract (the kmIters precedent): every round must
    // IMPROVE the captured energy, and the found direction must beat the
    // flat-spectrum average (trace/dim) — replayed in-test from the data
    val e = Tables(spark, sf).embeddings
      .select(col("embedding").cast("array<double>").as("emb")).collect()
      .map(_.getSeq[Double](0).toArray)
      .filter(x => x.map(a => a * a).sum > 0)
    val trace = e.map(x => x.map(a => a * a).sum).sum
    var w = Array.fill(64)(0.125)
    var prevLam = 0.0
    (1 to sim.Similarity.pcaIters).foreach { _ =>
      val u = Array.fill(64)(0.0)
      e.foreach { x =>
        val s = x.indices.map(i => x(i) * w(i)).sum
        x.indices.foreach(i => u(i) += x(i) * s)
      }
      val lam = math.sqrt(u.map(x => x * x).sum)
      assert(lam > prevLam, "each power round must capture more energy")
      prevLam = lam
      w = u.map(x => BigDecimal(x / lam)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(math.abs(prevLam - eig) < 1e-2, s"replay eig $prevLam vs $eig")
    assert(eig > trace / 64.0,
      s"direction must beat the flat-spectrum average: $eig vs ${trace / 64}")
    v.indices.foreach(i => assert(math.abs(v(i) - w(i)) < 2e-6,
      s"replayed component $i: ${w(i)} vs ${v(i)}"))
  }

  test("q_range_plan: ranges partition the key space, counts conserve, estimates track truth") {
    val plan = relational.Relational.qRangePlan(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    val B = relational.Relational.rangePlanBuckets
    assert(plan.length == B)
    assert(plan.head.isNullAt(plan.head.fieldIndex("lo")), "bucket 1 opens the line")
    assert(plan.last.isNullAt(plan.last.fieldIndex("hi")), "bucket B closes it")
    // contiguity: each bucket's lo is the previous bucket's hi
    plan.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") == b.getAs[Long]("lo"), s"gap between $a and $b")
    }
    val total = Tables(spark, sf).lineitem.count()
    assert(plan.map(_.getAs[Long]("actual_rows")).sum == total,
      "every row must land in exactly one range")
    // the audit must be non-degenerate: sampled estimates within 3x of truth
    // for every non-empty bucket at this sf (2% sample over ~6k rows)
    plan.filter(_.getAs[Long]("actual_rows") > 100).foreach { r =>
      val est = r.getAs[Long]("est_rows").toDouble
      val act = r.getAs[Long]("actual_rows").toDouble
      assert(est > act / 3 && est < act * 3, s"estimate off the rails: $r")
    }
  }

  test("ev_series_sim: top-3 equals a driver-side brute recomputation over dense series") {
    val got = events.EventOps.seriesSim(spark, sf).collect()
      .groupBy(_.getAs[Long]("probe_user"))
      .map { case (p, rows) =>
        p -> rows.sortBy(_.getAs[Long]("rk"))
          .map(r => (r.getAs[Long]("cand_user"), r.getAs[Double]("cos_sim"))).toList }
    // dense reference: per-user day→count map, cosine over the union grid
    val ud = Tables(spark, sf).events
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    def cos(a: Map[Long, Long], b: Map[Long, Long]): Double = {
      val dot = a.keysIterator.map(d => a(d) * b.getOrElse(d, 0L)).sum.toDouble
      val v = dot / (math.sqrt(a.values.map(x => x * x).sum.toDouble) *
        math.sqrt(b.values.map(x => x * x).sum.toDouble))
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (p, top) =>
      val ref = ud.keys.filter(_ != p).map(c => (c, cos(ud(p), ud(c)))).toList
        .sortBy { case (c, s) => (-s, c) }.take(3)
      assert(top == ref, s"probe $p: $top vs brute $ref")
      top.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0 + 1e-9) }
    }
    assert(got.nonEmpty)
  }

  test("mm_resize_exec: box respected, identity resize reproduces mm_meta's checksum") {
    val rs = multimodal.Multimodal.mmResizeExec(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val plan = multimodal.Multimodal.mmResize(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val meta = multimodal.Multimodal.mmMeta(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    rs.foreach { case (id, r) =>
      val ow = r.getAs[Int]("out_w"); val oh = r.getAs[Int]("out_h")
      assert(math.max(ow, oh) <= 64 || plan(id).getAs[Int]("out_w") == ow)
      // execution uses the PLANNER's box exactly
      assert(ow == plan(id).getAs[Int]("out_w") && oh == plan(id).getAs[Int]("out_h"))
      assert(r.getAs[Int]("px_max") <= 255 && r.getAs[Long]("px_sum") >= 0)
      // an image already inside the box resizes to itself: the NN map is
      // the identity and the resized checksum must equal mm_meta's
      val m = meta(id)
      if (math.max(m.getAs[Int]("width"), m.getAs[Int]("height")) <= 64)
        assert(r.getAs[Long]("px_sum") == m.getAs[Long]("pixel_sum"),
          s"identity resize drifted from the decode checksum for doc $id")
    }
    assert(rs.nonEmpty)
  }

  test("web_politeness: same-host fetches are spaced by exactly the host's delay, ranks dense") {
    val sched = web.WebOps.politeness(spark, sf).collect()
    sched.groupBy(_.getAs[String]("host")).foreach { case (host, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("fetch_rank"))
      byRank.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("fetch_rank") == i + 1, s"$host ranks not dense")
        assert(r.getAs[Long]("start_s") == i * r.getAs[Long]("delay_s"),
          s"$host slot $i violates the crawl delay: $r")
      }
      val delay = web.WebOps.crawlDelays.toMap
        .getOrElse(host, web.WebOps.politenessDefault)
      assert(byRank.head.getAs[Long]("delay_s") == delay)
    }
    // every frontier edge target is scheduled exactly once
    assert(sched.length == web.WebOps.linkExtract(spark, sf)
      .select(col("link")).distinct().count())
  }

  test("web_redirects: terminal chains resolve, cycles and over-deep chains cap, exact-cap terminals don't") {
    val out = web.WebOps.redirects(spark, sf).collect()
      .map(r => r.getAs[String]("start") ->
        (r.getAs[String]("final_url"), r.getAs[Long]("hops"),
          r.getAs[Boolean]("capped"))).toMap
    assert(out("https://example.com/old") ==
      (("https://example.com/final", 3L, false)))
    assert(out("https://example.com/self")._3, "self-loop must cap")
    assert(out("https://example.com/a")._3 && out("https://example.com/b")._3,
      "2-cycle must cap")
    // chain of exactly cap hops into a true terminal is NOT capped
    assert(out("https://example.com/deep/2") ==
      (("https://example.com/deep/10", 8L, false)))
    assert(out("https://example.com/deep/0")._3, "10-deep chain must cap")
    assert(out("https://example.com/out") ==
      (("https://other.org/landing", 1L, false)))
    // sources = adversarial srcs + the 4 link-bearing harvested pages
    // (page 2 of the link corpus yields no links, so it is not a source)
    assert(out.size == web.WebOps.redirectEdges.map(_._1).distinct.size + 4,
      "one resolution per redirect source")
    // the corpus-derived leg: each link-bearing page resolves in ONE hop
    // to its lexicographically-first harvested link
    assert(out("https://example.com/q") ==
      (("https://example.com/sp.html", 1L, false)))
    assert(out("http://example.com/") ==
      (("http://example.com/bare.html", 1L, false)))
  }

  test("ev_hw_forecast: fixed-point exactness, 7 horizons per type, live twin equal") {
    val rows = events.EventOps.hwForecast(spark, sf).collect()
    val types = Tables(spark, sf).events
      .select(col("event_type")).distinct().count()
    assert(rows.length == types * 7)
    val sc = events.EventOps.hwScale.toDouble
    rows.foreach { r =>
      // every output is an exact multiple of 2^-20 — the fixed-point grid
      Seq("yhat", "level", "trend").foreach { c =>
        val v = r.getAs[Double](c) * sc
        assert(v == math.rint(v), s"$c off the fixed-point grid: $r")
      }
      assert((1L to 7L).contains(r.getAs[Long]("h")))
    }
    // yhat decomposes as level + h*trend + season exactly: check linearity
    // of the trend component across horizons that share a season slot
    val live = streaming.StreamOps.hwForecastLive(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(live == rows.map(_.toSeq).toSet,
      "streaming HW must equal batch HW exactly")
  }

  test("plan pins: compaction prunes text, audio_fp shuffles once, ess/hw never go cartesian") {
    // q_compaction is a METADATA plan: the scan must never read the text
    // column — only the manifest columns reach the parquet reader
    val comp = relational.Relational.qCompaction(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!comp.contains("text"), "compaction planner must not scan text:\n" +
      comp.take(600))
    // mm_audio_fp: decode+fingerprint are per-partition math; ownership is
    // ONE hash exchange on fp. Since r9 a conditional payload-spread
    // repartition precedes the decode when the scan is narrower than the
    // session parallelism (no-op at scale) — pin that the fp-ownership
    // exchange is exactly one and the only other hash exchange (if any)
    // is the doc_id spread.
    val afp = multimodal.Multimodal.mmAudioFp(spark, sf)
      .queryExecution.executedPlan.toString
    val fpEx = "Exchange hashpartitioning\\(fp".r.findAllIn(afp).length
    val allEx = "Exchange hashpartitioning".r.findAllIn(afp).length
    assert(fpEx == 1, s"audio_fp must shuffle on fp exactly once, saw $fpEx:\n" +
      afp.take(600))
    assert(allEx - fpEx <= 1 &&
      (allEx == fpEx || "Exchange hashpartitioning\\(doc_id".r.findAllIn(afp).length == allEx - fpEx),
      s"audio_fp: only the conditional doc_id spread may add an exchange:\n" +
        afp.take(600))
    // degenerate-plan guards on the new aggregation chains
    Seq(
      "samp_ess" -> sample.Sampling.ess(spark, sf),
      "ev_hw_forecast" -> events.EventOps.hwForecast(spark, sf)
    ).foreach { case (name, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name went cartesian:\n" +
        p.take(600))
    }
  }

  test("st_growth: live bitmap-state decomposition equals the batch flows exactly") {
    val batch = events.EventOps.growth(spark, sf).collect()
      .map(_.toSeq).toSet
    val live = streaming.StreamOps.growthLive(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(live == batch, "bitmap expansion must reproduce the batch (user, day) frame")
    assert(batch.nonEmpty)
  }
}
