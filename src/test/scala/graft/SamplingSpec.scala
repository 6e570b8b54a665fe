package graft

import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  import SparkTest._

  test("stratified sample is deterministic and respects per-stratum rates") {
    val a = sample.Sampling.stratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    val b = sample.Sampling.stratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(a.sameElements(b), "hash sampling must be run-stable")
    // kept fraction tracks the configured rate (hash-uniformity tolerance)
    val total = Tables(spark, sf).documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_._2).view.mapValues(_.length).toMap
    sample.Sampling.rates.foreach { case (lang, rate) =>
      val frac = kept.getOrElse(lang, 0).toDouble / total(lang)
      assert(math.abs(frac - rate / 100.0) < 0.25, s"$lang kept $frac vs rate $rate%")
    }
  }

  test("reservoir keeps exactly K per stratum with contiguous ranks") {
    val rows = sample.Sampling.reservoir(spark, sf).collect()
    val byLang = rows.groupBy(_.getString(1))
    assert(byLang.keySet == sample.Sampling.rates.map(_._1).toSet)
    byLang.values.foreach { rs =>
      assert(rs.length == sample.Sampling.reservoirK)
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to sample.Sampling.reservoirK))
    }
  }

  test("tx_pii redacts every detected email and ip") {
    val rows = text.TextOps.pii(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(r.getAs[Long]("n_emails") >= 1 && red.contains("<EMAIL>"))
      assert(r.getAs[Long]("n_ips") >= 1 && red.contains("<IP>"))
      assert(!red.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+.*"), s"email survived: $red")
    }
  }
}
