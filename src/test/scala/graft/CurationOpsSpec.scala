package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Late-round-2 curation/maintenance operators: perceptual-hash near-dup
  * (mm_phash), fingerprint-overlap near-dup (tx_winnow_pairs), incremental
  * rollup maintenance (ev_incr_agg), live silence detection (st_silence). */
class CurationOpsSpec extends AnyFunSuite {
  import SparkTest._

  test("mm_phash: banded pairs equal the brute-force hamming join exactly once") {
    val sigs = multimodal.Multimodal.mmPhashSigs(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("phash")))
    val brute = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb)
      if h <= multimodal.Multimodal.phashMaxHamming
    } yield (ia, ib, h)).toSet
    val rows = multimodal.Multimodal.mmPhash(spark, sf).collect()
    val banded = rows
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
    // exactly-once: first-matching-band crediting emits no duplicates
    assert(banded.length == banded.toSet.size)
    // pigeonhole completeness: hamming ≤ 3 over 4 disjoint 16-bit bands
    // means the banded equi-join can't miss a pair the brute join finds
    assert(banded.toSet == brute)
  }

  test("Banding.hammingPairs equals brute force on seeded-random signatures") {
    // corpus-independent pin of the pigeonhole completeness: random 64-bit
    // signatures (including adversarial duplicates) across several seeds
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val base = Seq.fill(40)(rnd.nextLong())
      // duplicates + near-dups (≤3 flipped bits) to exercise every verdict
      val sigs = (base ++ base.take(5) ++ base.take(8).map { s =>
        (0 until rnd.nextInt(4)).foldLeft(s)((x, _) => x ^ (1L << rnd.nextInt(64)))
      }).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = sigs.toDF("doc_id", "sig")
      val got = functions.Banding.hammingPairs(df, "sig", "doc_id", Nil, 4, 16, 3)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
      val brute = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (ia, ib, h)).toSet
      assert(got.length == got.toSet.size, s"seed $seed: exactly-once violated")
      assert(got.toSet == brute, s"seed $seed")
    }
  }

  test("mm_phash: no cartesian product; candidates come from the band equi-join") {
    val plan = multimodal.Multimodal.mmPhash(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("tx_winnow_pairs: pairs match a brute-force recount over fingerprint sets") {
    val sets = text.TextOps.fingerprintSets(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("fp")))
    val byFp = sets.groupBy(_._2).view
      .mapValues(_.map(_._1).sorted)
      .filter { case (_, ds) =>
        ds.size >= 2 && ds.size <= text.TextOps.winnowMaxDf }
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
    byFp.values.foreach { ds =>
      var i = 0
      while (i < ds.size) {
        var j = i + 1
        while (j < ds.size) {
          val k = (ds(i), ds(j))
          counts(k) = counts.getOrElse(k, 0L) + 1
          j += 1
        }
        i += 1
      }
    }
    val brute = counts.collect {
      case ((a, b), n) if n >= text.TextOps.winnowMinShared => (a, b, n)
    }.toSet
    val got = text.TextOps.winnowPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_shared"))).toSet
    assert(got == brute)
  }

  test("dd_normalized: reformatted copies collapse; raw-byte dups stay counted") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "The quick,  Brown FOX!"),   // punctuation + case + double space
      (2L, "the quick brown fox"),      // canonical form
      (3L, "THE QUICK BROWN FOX."),     // case + trailing punct
      (4L, "the quick brown fox"),      // raw-byte dup of 2
      (5L, "a different document"),
      (6L, "the quick\nbrown fox"),     // re-wrapped copy: newline = space
      (7L, "foo\nbar"),                 // must NOT weld to "foobar"
      (8L, "foobar")).toDF("doc_id", "text")
    val key = dedup.Dedup.normKey(col("text"))
    val groups = crafted
      .groupBy(md5(key).as("norm_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        countDistinct(md5(col("text"))).as("n_exact_variants"))
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"),
        r.getAs[Long]("n_exact_variants"))).toSet
    // docs 1-4 and the re-wrapped 6 are one normalized group (keeper = min
    // doc_id = 1) spanning 4 raw-byte variants — exact dedup alone would
    // have kept 4 of them; "foo\nbar" and "foobar" stay distinct
    assert(groups == Set((1L, 5L, 4L), (5L, 1L, 1L), (7L, 1L, 1L), (8L, 1L, 1L)))
    // corpus run: group keys are unique and copies conserve the doc count
    val corpus = dedup.Dedup.normalized(spark, sf).collect()
    assert(corpus.map(_.getAs[String]("norm_md5")).distinct.length == corpus.length)
    assert(corpus.map(_.getAs[Long]("n_copies")).sum ==
      Tables(spark, sf).documents.count())
  }

  test("st_rate_limit: throttle report equals batch recompute minus open buckets") {
    val limit = streaming.StreamOps.rateLimitPerMinute
    val got = streaming.StreamOps.rateLimit(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("minute_us"),
        r.getAs[Long]("n_seen"), r.getAs[Long]("n_allowed"), r.getAs[Long]("n_dropped")))
    // internal consistency: allowed capped at the budget, dropped = overflow
    got.foreach { case (_, _, n, a, d) =>
      assert(a == math.min(n, limit) && d == n - a && d > 0)
    }
    // batch recompute: per-(user, minute) counts over budget, excluding each
    // user's final (still-open) bucket — the holdback the stream never emits
    val ev = Tables(spark, sf).events.select(col("user_id"),
      (graft.epochUs(col("ts")) - graft.epochUs(col("ts")) % 60000000L).as("m"))
    val counts = ev.groupBy(col("user_id"), col("m")).agg(count(lit(1)).as("n"))
    val lastM = counts.groupBy(col("user_id")).agg(max(col("m")).as("last_m"))
    val exp = counts.join(lastM, "user_id")
      .filter(col("m") < col("last_m") && col("n") > limit)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("m"),
        r.getAs[Long]("n"))).toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet == exp)
    assert(got.nonEmpty, "corpus has over-budget minutes; an empty report is a bug")
  }

  test("ev_incr_agg: merged old+delta partials equal the single-pass recompute") {
    val ev = Tables(spark, sf).events
      .withColumn("day_us", graft.epochUs(date_trunc("day", col("ts"))))
    val direct = ev.groupBy(col("event_type"), col("day_us"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .withColumn("avg_v", round(col("sum_v") / col("n"), 6))
      .collect().map(_.toSeq).toSet
    val merged = events.EventOps.incrAgg(spark, sf).collect().map(_.toSeq).toSet
    assert(merged == direct)
  }

  test("ev_incr_agg: the split predicate reaches the parquet scan on both branches") {
    val plan = events.EventOps.incrAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(ts"), plan.take(1200))
    assert(plan.contains("GreaterThanOrEqual(ts"), plan.take(1200))
  }

  test("dd_containment: directions consistent with pair stats, verdicts match thresholds") {
    val th = dedup.Dedup.containThreshold
    val rows = dedup.Dedup.containment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (inter, sa, sb) = (r.getAs[Long]("inter"), r.getAs[Long]("sa"), r.getAs[Long]("sb"))
      assert(inter <= math.min(sa, sb), "intersection bounded by either set")
      val (ab, ba) = (r.getAs[Double]("cont_a_in_b"), r.getAs[Double]("cont_b_in_a"))
      assert(ab >= th || ba >= th)
      val expected =
        if (ab >= th && ba >= th) "mutual" else if (ab >= th) "a_in_b" else "b_in_a"
      assert(r.getAs[String]("verdict") == expected)
    }
  }

  test("ev_quantiles: the documented approx_percentile drop-in stays within tolerance") {
    // SURVEY §2a sells approx_percentile as the 100 TB drop-in for the
    // exact percentile. Its guarantee is on RANK, not value (it returns an
    // actual element; tiny strata have value gaps near the tail), so pin
    // the honest contract: each approximate quantile lands between the
    // exact percentiles ±4 rank-points around its target
    val bounds = Tables(spark, sf).events
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.46)").as("lo50"), expr("percentile(value, 0.54)").as("hi50"),
        expr("percentile(value, 0.86)").as("lo90"), expr("percentile(value, 0.94)").as("hi90"),
        expr("percentile(value, 0.95)").as("lo99"), expr("percentile(value, 1.0)").as("hi99"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val approx = Tables(spark, sf).events
      .groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 10000)").as("p50"),
        expr("approx_percentile(value, 0.9, 10000)").as("p90"),
        expr("approx_percentile(value, 0.99, 10000)").as("p99"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"), r.getAs[Double]("p99"))).toMap
    assert(bounds.keySet == approx.keySet)
    approx.foreach { case (t, (a50, a90, a99)) =>
      val b = bounds(t)
      Seq(("50", a50, "lo50", "hi50"), ("90", a90, "lo90", "hi90"),
          ("99", a99, "lo99", "hi99")).foreach { case (p, a, lo, hi) =>
        assert(a >= b.getAs[Double](lo) && a <= b.getAs[Double](hi),
          s"$t p$p: approx $a outside [${b.getAs[Double](lo)}, ${b.getAs[Double](hi)}]")
      }
    }
  }

  test("q_skew_probe: top-k by count, shares consistent, uniform-multiple sane") {
    val rows = relational.Relational.qSkewProbe(spark, sf).collect()
    assert(rows.length == relational.Relational.skewTopK)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.sorted.reverse.toSeq == cnts.toSeq, "descending by count")
    assert(rows.head.getAs[Double]("skew_x") >= 1.0, "top key at or above average")
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      assert(share > 0 && share <= 1)
      // skew_x is the multiple over uniform expectation — positive, and
      // the TOP key is at or above average (the tail of the top-10 can dip
      // just under 1.0 on a near-uniform corpus)
      assert(r.getAs[Double]("skew_x") > 0)
    }
  }

  test("samp_temperature: sqrt damping — boost falls as source mass rises; shares normalize") {
    val rows = sample.Sampling.temperature(spark, sf).collect()
      .map(r => (r.getAs[Long]("mass"), r.getAs[Double]("raw_share"),
        r.getAs[Double]("temp_share"), r.getAs[Double]("boost")))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    // monotone: more mass never earns a higher boost
    rows.sortBy(_._1).sliding(2).foreach {
      case Array((m1, _, _, b1), (m2, _, _, b2)) if m1 < m2 => assert(b2 <= b1)
      case _ => ()
    }
  }

  test("st_gapfill: streaming zero-minutes equal the batch gapfill's n=0 rows") {
    val got = streaming.StreamOps.stGapfill(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("minute_epoch")))
    assert(got.length == got.toSet.size, "each empty minute closes exactly once")
    val exp = events.EventOps.gapfill(spark, sf).filter(col("n") === 0)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("minute_epoch")))
      .toSet
    assert(got.toSet == exp)
  }

  test("st_silence: streaming gaps equal the batch lag recompute") {
    val gapUs = streaming.StreamOps.silenceGapUs
    val got = streaming.StreamOps.silence(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("silent_from_us"),
        r.getAs[Long]("silent_to_us"), r.getAs[Long]("gap_us")))
    got.foreach { case (_, from, to, gap) =>
      assert(gap == to - from && gap > gapUs)
    }
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"))
    val exp = Tables(spark, sf).events
      .select(col("event_type"), graft.epochUs(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("us") - col("prev") > gapUs)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("prev"),
        r.getAs[Long]("us"), r.getAs[Long]("us") - r.getAs[Long]("prev"))).toSet
    assert(got.toSet == exp)
  }
}
