package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the experiment-science + diagnostics additions: CUPED
  * variance reduction, power planning, streaming MAD anomalies,
  * t-closeness, lead-lag cross-correlation, calibration audit. Each test
  * recomputes the statistic from an INDEPENDENT driver-side reference on
  * the collected (bounded at sf0.001) data, so an engine-side plan change
  * that silently altered semantics would fail here even if both oracle
  * sides drifted together.
  */
class ExperimentOpsSpec extends AnyFunSuite {
  import SparkTest._

  private def perUserXY: (Array[(Long, Long, Long)], Long) = {
    // (user, pre-count x, post-count y) with the query's exact midpoint cut
    val ev = Tables(spark, sf).events
      .select(col("user_id"), graft.epochUs(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val xy = ev.groupBy(_._1).toArray.map { case (u, rows) =>
      (u, rows.count(_._2 < cut).toLong, rows.count(_._2 >= cut).toLong)
    }
    (xy, cut)
  }

  test("ev_cuped: theta, adjusted diff, and rho2 match the textbook formulas") {
    val (xy, _) = perUserXY
    val n = xy.length.toLong
    val (sx, sy) = (xy.map(_._2).sum, xy.map(_._3).sum)
    val sxy = xy.map(t => t._2 * t._3).sum
    val sxx = xy.map(t => t._2 * t._2).sum
    val syy = xy.map(t => t._3 * t._3).sum
    val covN = n * sxy - sx * sy
    val varxN = n * sxx - sx * sx
    val varyN = n * syy - sy * sy
    val a = xy.filter(_._1 % 2 == 0)
    val b = xy.filter(_._1 % 2 != 0)
    val theta = covN.toDouble / varxN.toDouble
    val diffRaw = a.map(_._3).sum.toDouble / a.length - b.map(_._3).sum.toDouble / b.length
    val diffCuped = diffRaw -
      theta * (a.map(_._2).sum.toDouble / a.length - b.map(_._2).sum.toDouble / b.length)
    val rho2 = covN.toDouble * covN.toDouble / (varxN.toDouble * varyN.toDouble)
    val row = events.EventOps.cuped(spark, sf).head()
    assert(row.getAs[Long]("n_a") == a.length && row.getAs[Long]("n_b") == b.length)
    assert(math.abs(row.getAs[Double]("theta") - theta) < 1e-5)
    assert(math.abs(row.getAs[Double]("diff_raw") - diffRaw) < 1e-5)
    assert(math.abs(row.getAs[Double]("diff_cuped") - diffCuped) < 1e-5)
    assert(math.abs(row.getAs[Double]("var_reduction") - rho2) < 1e-5)
    assert(rho2 >= 0 && rho2 <= 1, "Cauchy-Schwarz bounds the reduction ratio")
  }

  test("ev_power_mde: MDE and required-n match the normal-approximation formulas") {
    val row = events.EventOps.powerMde(spark, sf).head()
    val (na, nb, nc) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"),
      row.getAs[Long]("n_conv"))
    val p = nc.toDouble / (na + nb)
    val z = 2.801585d
    val mde = z * math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(row.getAs[Double]("p") - p) < 1e-5)
    assert(math.abs(row.getAs[Double]("mde_abs") - mde) < 1e-5)
    assert(math.abs(row.getAs[Double]("mde_rel") - mde / p) < 1e-4)
    assert(row.getAs[Long]("n_req_10pct") ==
      math.ceil(z * z * 2 * p * (1 - p) / (0.1 * p * 0.1 * p)).toLong)
  }

  test("st_anomaly_mad: the live alarm set equals the batch alarm set") {
    val batch = events.EventOps.anomalyMad(spark, sf).collect().map(_.toSeq).toSet
    val live = streaming.StreamOps.anomalyMadLive(spark, sf).collect().map(_.toSeq).toSet
    assert(live == batch, "state-store matrix + read-time view must equal batch")
  }

  test("q_tclose: TV distance and verdict match an exact driver-side recount") {
    val cust = Tables(spark, sf).customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) DIV 100000")
          .as("b"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    val nTotal = cust.length.toLong
    val marginal = cust.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val got = relational.Relational.qTclose(spark, sf).collect()
    assert(got.map(_.getAs[Long]("grp_n")).sum == nTotal)
    got.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      val grp = cust.filter(_._1 == key)
      val gn = grp.length.toLong
      val gb = grp.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
      val sumAbs = marginal.map { case (b, cv) =>
        math.abs(gb.getOrElse(b, 0L) * nTotal - cv * gn)
      }.sum
      assert(r.getAs[Boolean]("released") == (2 * sumAbs <= gn * nTotal))
      assert(math.abs(r.getAs[Double]("tv_dist") -
        sumAbs.toDouble / (2.0 * gn * nTotal)) < 1e-5)
      assert(r.getAs[Double]("tv_dist") >= 0 && r.getAs[Double]("tv_dist") <= 1)
    }
  }

  test("ev_xcorr: sparse-moment decomposition equals a dense-series Pearson") {
    val counts = Tables(spark, sf).events
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('hour', ts)) DIV 3600").as("h"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val hours = counts.keySet.map(_._2)
    val (mn, mx) = (hours.min, hours.max)
    def series(t: String): Array[Long] =
      (mn to mx).map(h => counts.getOrElse((t, h), 0L)).toArray
    def pearson(a: Array[Long], b: Array[Long], lag: Int): Option[Double] = {
      val pairs =
        if (lag >= 0) a.dropRight(lag).zip(b.drop(lag))
        else a.drop(-lag).zip(b.dropRight(-lag))
      val n = pairs.length.toDouble
      val (sa, sb) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sab = pairs.map(p => p._1 * p._2).sum.toDouble
      val saa = pairs.map(p => p._1 * p._1).sum.toDouble
      val sbb = pairs.map(p => p._2 * p._2).sum.toDouble
      val (da, db) = (n * saa - sa * sa, n * sbb - sb * sb)
      if (da > 0 && db > 0) Some((n * sab - sa * sb) / math.sqrt(da * db)) else None
    }
    val got = events.EventOps.xcorr(spark, sf).collect()
    assert(got.length == 10 * (2 * events.EventOps.xcorrMaxLag + 1),
      "full pairs x lags grid must be present")
    got.foreach { r =>
      val (ta, tb, lag) = (r.getString(0), r.getString(1), r.getAs[Long]("lag").toInt)
      val want = pearson(series(ta), series(tb), lag)
      val rv = Option(r.getAs[java.lang.Double]("r")).map(_.doubleValue())
      (want, rv) match {
        case (Some(w), Some(v)) =>
          assert(math.abs(w - v) < 1e-5, s"($ta,$tb,$lag): $w vs $v")
          assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
        case (None, None) => ()
        case other => fail(s"($ta,$tb,$lag): null-mismatch $other")
      }
      assert(r.getAs[Long]("n") == mx - mn + 1 - math.abs(lag))
    }
  }

  test("ev_error_budget: window recount matches; live twin pages identically") {
    val batch = events.EventOps.errorBudget(spark, sf).collect()
    // driver-side recount of the 6h range frame over the sparse hour dim
    val cells = batch.map(r => r.getAs[Long]("hour_idx") ->
      (r.getAs[Long]("total"), r.getAs[Long]("errors"))).toMap
    batch.foreach { r =>
      val h = r.getAs[Long]("hour_idx")
      val win = (h - 5 to h).flatMap(cells.get)
      val (t6, e6) = (win.map(_._1).sum, win.map(_._2).sum)
      assert(math.abs(r.getAs[Double]("slow_burn") - e6.toDouble * 100 / t6) < 1e-5)
      assert(r.getAs[Boolean]("page") ==
        (r.getAs[Long]("errors") * 1000 >= r.getAs[Long]("total") * 144 &&
          e6 * 50 >= t6 * 3))
    }
    val live = streaming.StreamOps.errorBudgetLive(spark, sf).collect().map(_.toSeq).toSet
    assert(live == batch.map(_.toSeq).toSet, "live page set must equal batch")
  }

  test("ev_decomp: mix + rate effects conserve the total KPI delta exactly") {
    val rows = events.EventOps.decomp(spark, sf).collect()
    val dTotal = rows.map(r => r.getAs[Long]("p2") - r.getAs[Long]("p1")).sum
    val dBridge = rows.map(r =>
      r.getAs[Double]("mix_effect") + r.getAs[Double]("rate_effect")).sum
    assert(math.abs(dBridge - dTotal) < 1e-4,
      s"bridge $dBridge must reconcile the raw delta $dTotal")
    assert(rows.length == 4, "one row per cohort")
  }

  test("q_dp_counts: draws are deterministic, clamped, and Laplace-bounded") {
    val a = relational.Relational.qDpCounts(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_released"))).sortBy(t => (t._1, t._2))
    val b = relational.Relational.qDpCounts(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getAs[Long]("n_true"),
        r.getAs[Long]("n_released"))).sortBy(t => (t._1, t._2))
    assert(a.sameElements(b), "the seeded draw must be reproducible")
    a.foreach { case (_, _, t, rel) =>
      assert(rel >= 0, "released counts are clamped at zero")
      // inverse-CDF Laplace(b=1) from a 60-bit uniform is bounded by
      // ln(2^60) ≈ 41.6; allow integer-rounding slack
      assert(math.abs(rel - t) <= 43, s"noise out of Laplace range: $t -> $rel")
    }
    assert(a.exists { case (_, _, t, rel) => t != rel }, "noise must be present")
  }

  test("q_table_hash: fingerprint matches a driver-side recount and ignores order") {
    val got = relational.Relational.qTableHash(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("xor_h"), r.getAs[Long]("sum32"))).toMap
    // independent recount on the customer table (bounded at sf0.001)
    val hs = Tables(spark, sf).customer
      .select(graft.functions.Portable.hash64(
        concat_ws("|", col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")), "fp").as("h"))
      .collect().map(_.getLong(0))
    val want = (hs.length.toLong, hs.reduce(_ ^ _), hs.map(_ % 4294967296L).sum)
    assert(got("customer") == want, "customer fingerprint must recount exactly")
    // order/partitioning invariance: scrambled input, same fingerprint
    val scrambled = Tables(spark, sf).customer.repartition(7)
      .sortWithinPartitions(col("c_acctbal"))
      .select(graft.functions.Portable.hash64(
        concat_ws("|", col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")), "fp").as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"),
        sum(pmod(col("h"), lit(4294967296L))))
      .head()
    assert((scrambled.getLong(0), scrambled.getLong(1), scrambled.getLong(2)) == want)
  }

  test("ann_mmr: unrolled selection equals a driver-side greedy replay") {
    val got = sim.Similarity.mmr(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("step"), r.getAs[Long]("cand")))
    // rebuild pool + pairwise sims from raw vectors, replay the greedy
    val vecs = Tables(spark, sf).embeddings
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      BigDecimal(d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (0L until sim.Similarity.numQueries.toLong).filter(vecs.contains).foreach { qid =>
      val pool = vecs.keys.filter(_ != qid).toSeq
        .map(c => c -> cos(vecs(c), vecs(qid)))
        .sortBy { case (c, s) => (-s, c) }.take(sim.Similarity.mmrPool)
      var selected = Vector(pool.head._1)
      (2 to sim.Similarity.mmrK).foreach { _ =>
        val pick = pool.filterNot(p => selected.contains(p._1)).map { case (c, rel) =>
          val pen = selected.map(s => cos(vecs(c), vecs(s))).max
          val m = BigDecimal(sim.Similarity.mmrLambda * rel -
            (1 - sim.Similarity.mmrLambda) * pen)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (c, m)
        }.minBy { case (c, m) => (-m, c) }._1
        selected :+= pick
      }
      val gotSel = got.filter(_._1 == qid).sortBy(_._2).map(_._3)
      assert(gotSel.sameElements(selected), s"qid $qid: $gotSel vs $selected")
    }
  }

  test("src_parquet_stats: row-group rows fold to the graded totals; footers match data") {
    val raw = sources.ParquetStats.footerStats(spark, sf).collect()
    assert(raw.nonEmpty && raw.forall(_.getAs[Long]("row_group") >= 0))
    val folded = raw.groupBy(r => (r.getString(0), r.getString(1))).map { case (k, rs) =>
      k -> (rs.map(_.getAs[Long]("n_values")).sum, rs.map(_.getAs[Long]("min_v")).min,
        rs.map(_.getAs[Long]("max_v")).max)
    }
    // footers must agree with a full data scan (zone-map soundness)
    val o = Tables(spark, sf).orders
      .agg(count(col("o_orderkey")), min(col("o_orderkey")), max(col("o_orderkey")))
      .head()
    assert(folded(("orders", "o_orderkey")) ==
      ((o.getLong(0), o.getLong(1), o.getLong(2))))
    val q = sources.ParquetStats.srcParquetStats(spark, sf)
      .filter(col("table_name") === "orders" && col("col_name") === "o_orderkey")
      .head()
    assert((q.getAs[Long]("n_values"), q.getAs[Long]("min_v"), q.getAs[Long]("max_v")) ==
      ((o.getLong(0), o.getLong(1), o.getLong(2))))
  }

  test("st_xcorr: the live correlogram equals the batch correlogram") {
    val batch = events.EventOps.xcorr(spark, sf).collect().map(_.toSeq).toSet
    val live = streaming.StreamOps.xcorrLive(spark, sf).collect().map(_.toSeq).toSet
    assert(live == batch, "state-store matrix + read-time view must equal batch")
  }

  test("tx_feature_hash: vectors recount driver-side; signed mass bounded by tf") {
    val got = text.TextOps.featureHashVec(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getSeq[Long](1).toArray, r.getAs[Long]("nnz"))).toMap
    // and the query projection serializes exactly that vector
    val ser = text.TextOps.featureHash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("v")).toMap
    got.foreach { case (id, (v, _)) => assert(ser(id) == v.mkString("|")) }
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def h64(s: String, salt: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + s).getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    docs.take(50).foreach { case (id, textv) =>
      val words = textv.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val want = Array.fill(text.TextOps.fhDims)(0L)
      words.foreach { w =>
        val dim = (h64(w, "fh") % text.TextOps.fhDims).toInt
        want(dim) += (if (h64(w, "fhs") % 2 == 0) 1L else -1L)
      }
      val (v, nnz) = got(id)
      assert(v.sameElements(want), s"doc $id: ${v.toSeq} vs ${want.toSeq}")
      assert(nnz == v.count(_ != 0L))
      assert(v.map(math.abs).sum <= words.length, "signed mass cannot exceed tf")
    }
  }

  test("q_fd_discover: verdicts recount from exact distinct sets") {
    val cust = Tables(spark, sf).customer
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment")).collect()
    val got = relational.Relational.qFdDiscover(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getAs[Long]("n_lhs"), r.getAs[Long]("n_pairs"), r.getAs[Boolean]("holds")))
      .toMap
    val ck = cust.map(_.getLong(0)).distinct.length.toLong
    val ckSeg = cust.map(r => (r.getLong(0), r.getString(2))).distinct.length.toLong
    assert(got(("customer", "c_custkey", "c_mktsegment")) == ((ck, ckSeg, ck == ckSeg)))
    val nk = cust.map(_.getInt(1)).distinct.length.toLong
    val nkSeg = cust.map(r => (r.getInt(1), r.getString(2))).distinct.length.toLong
    assert(got(("customer", "c_nationkey", "c_mktsegment")) == ((nk, nkSeg, nk == nkSeg)))
    assert(!got(("customer", "c_nationkey", "c_mktsegment"))._3,
      "nation cannot determine segment — the fixture must exercise a violation")
  }

  test("tx_calibration: cells recount the langid scan; ECE reassembles from them") {
    val preds = text.TextOps.langId(spark, sf)
      .join(Tables(spark, sf).documents.select(col("doc_id"), col("lang")), "doc_id")
      .collect()
      .map(r => (r.getAs[Long]("score"), r.getAs[String]("lang_pred") == r.getAs[String]("lang")))
    val row = text.TextOps.calibration(spark, sf).head()
    var ece = 0.0
    (1 to 4).foreach { i =>
      val lvl = preds.filter(_._1 == i)
      val n = Option(row.getAs[java.lang.Long](s"n_$i")).map(_.longValue())
      assert(n.getOrElse(0L) == lvl.length.toLong, s"level $i count")
      if (lvl.nonEmpty) {
        val acc = lvl.count(_._2).toDouble / lvl.length
        assert(math.abs(row.getAs[Double](s"acc_$i") - acc) < 1e-5, s"level $i acc")
        ece += math.abs(acc - i / 4.0) * lvl.length
      }
    }
    assert(row.getAs[Long]("n_scored") == preds.length.toLong)
    assert(math.abs(row.getAs[Double]("ece") - ece / preds.length) < 1e-5)
  }
}
