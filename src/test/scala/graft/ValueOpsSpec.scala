package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Internal-consistency properties for the customer-value / governance /
  * corpus-statistics operators (the driver's DuckDB gate checks engine
  * parity; these pin the invariants a parity bug on BOTH sides would hide). */
class ValueOpsSpec extends AnyFunSuite {
  import SparkTest._

  test("ev_bitmap: popcount equals distinct active days; masks agree with raw day sets") {
    val t = Tables(spark, sf)
    val exact = t.events.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().groupBy("user_id").agg(count(lit(1)).as("n_days"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = events.EventOps.bitmapActivity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      // the 62-clamp can only merge days, never invent them
      assert(r.getAs[Long]("days_active") <= exact(uid))
      assert(r.getAs[Long]("days_active") >= 1L)
      assert(r.getAs[Long]("first_day") <= r.getAs[Long]("last_day"))
    }
    assert(rows.length == exact.size, "one bitmap row per user")
  }

  test("ev_rfm: segments partition the user population; quartile labels in 1..4") {
    val seg = events.EventOps.rfm(spark, sf).collect()
    val users = Tables(spark, sf).events.select("user_id").distinct().count()
    assert(seg.map(_.getAs[Long]("n_users")).sum == users, "segments partition users")
    seg.foreach { r =>
      Seq("r_q", "f_q", "m_q").foreach { c =>
        val q = r.getAs[Long](c)
        assert(q >= 1L && q <= 4L, s"$c=$q out of quartile range")
      }
    }
    // total frequency mass is conserved: sum of per-segment event counts
    assert(seg.map(_.getAs[Long]("f_total")).sum ==
      Tables(spark, sf).events.count())
  }

  test("ev_attribution: linear credit conserves ~1e6 micros per attributed conversion") {
    val rows = events.EventOps.attribution(spark, sf).collect()
    val first = rows.map(_.getAs[Long]("conv_first")).sum
    val last = rows.map(_.getAs[Long]("conv_last")).sum
    // every conversion with >=1 touch contributes exactly one first and one last
    assert(first == last && first > 0)
    val credit = rows.map(_.getAs[Long]("credit_micros")).sum
    val touches = rows.map(_.getAs[Long]("n_touches")).sum
    // round-half-up splits drift at most n/2 micros per conversion
    assert(math.abs(credit - first * 1000000L) <= touches / 2 + first,
      s"credit=$credit for $first conversions")
  }

  test("ev_ltv: cumulative revenue reconstructs per-cell revenue; actives bounded by cohort") {
    val rows = events.EventOps.ltv(spark, sf).collect()
      .map(r => (r.getAs[String]("cohort_day"), r.getAs[Long]("age_w"),
        r.getAs[Long]("n_active"), r.getAs[Long]("cents"),
        r.getAs[Long]("cum_cents"), r.getAs[Long]("n_cohort")))
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val sorted = cells.sortBy(_._2)
      var run = 0L
      sorted.foreach { case (_, _, nAct, cents, cum, nCoh) =>
        run += cents
        assert(cum == run, "cum_cents is the running sum over age_w")
        assert(nAct <= nCoh, "active members cannot exceed the cohort")
      }
    }
  }

  test("samp_kcenter: greedy radii are non-increasing and picks are distinct") {
    val rows = sim.Similarity.kcenter(spark, sf).collect().sortBy(_.getAs[Long]("pick"))
    val ids = rows.flatMap(r => Option(r.get(1)).map(_.asInstanceOf[Long]))
    assert(ids.distinct.length == ids.length, "no center picked twice")
    // pick 1..k radii, then the coverage radius: each is a max over a
    // frontier that only shrinks, so the sequence never increases
    val radii = rows.filter(_.getAs[Long]("pick") >= 1L).map(_.getAs[Double]("r2"))
    radii.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"greedy radius increased: $a -> $b")
    case _ => ()
    }
  }

  test("tx_zipf: counts non-increasing by rank; rank 1 ratio is exactly 1; shares form a prefix of total") {
    val rows = text.TextOps.zipf(spark, sf).collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.head.getAs[Double]("zipf_ratio") == 1.0)
    rows.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b.getAs[Long]("cnt") <= a.getAs[Long]("cnt"), "rank order follows count")
    case _ => ()
    }
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    // each share is rounded at 6dp, so the sum can overshoot 1 by up to
    // zipfTopK half-ulps of the rounding grid
    assert(shareSum > 0 && shareSum <= 1.0 + text.TextOps.zipfTopK * 5e-7)
  }

  test("q_kanon: no released group smaller than k; suppressed rows pool into one bucket") {
    val rows = relational.Relational.qKanon(spark, sf).collect()
    val released = rows.filter(!_.getAs[Boolean]("suppressed"))
    released.foreach { r =>
      // released groups are singletons (n_groups=1) of size >= k
      assert(r.getAs[Long]("n_groups") == 1L)
      assert(r.getAs[Long]("n_rows") >= relational.Relational.kAnonK)
    }
    val suppressed = rows.filter(_.getAs[Boolean]("suppressed"))
    assert(suppressed.length <= 1, "all suppressed groups pool into one bucket")
    suppressed.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("nationkey")) && r.isNullAt(r.fieldIndex("mktsegment")))
    }
    // release decision conserves the population
    assert(rows.map(_.getAs[Long]("n_rows")).sum == Tables(spark, sf).customer.count())
  }

  test("st_bitmap: streaming lifecycle bitmap equals the batch min-day replay") {
    val live = streaming.StreamOps.stBitmap(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("first_day"), r.getAs[Long]("bitmap"))).toMap
    val ev = Tables(spark, sf).events
      .select(col("user_id"), expr("ts_ns DIV 86400000000000").as("day"))
    // reference: per-user day sets folded in scala (canonical min-anchored form)
    val days = ev.collect().groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(1)).toSet }
    days.foreach { case (u, ds) =>
      val m = ds.min
      val expect = ds.map(d => 1L << math.min(d - m, 62L)).reduce(_ | _)
      assert(live(u) == ((m, expect)), s"user $u bitmap mismatch")
    }
  }
}
