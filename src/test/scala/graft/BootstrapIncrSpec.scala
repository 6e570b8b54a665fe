package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the deterministic Poisson bootstrap and the incremental
  * curation refresh. */
class BootstrapIncrSpec extends AnyFunSuite {
  import SparkTest._

  test("samp_bootstrap: B replicates, Poisson(1) draw mass, deterministic") {
    val b = sample.Sampling.bootstrap(spark, sf).collect()
    assert(b.length == sample.Sampling.bootstrapB, "one row per replicate")
    assert(b.map(_.getAs[Long]("rep")).toSet ==
      (0L until sample.Sampling.bootstrapB.toLong).toSet)
    val n = Tables(spark, sf).documents.count()
    // each replicate draws ~Poisson(n) total: mean n, sd sqrt(n); 6 sigma
    val tol = 6 * math.sqrt(n.toDouble)
    b.foreach { r =>
      val draws = r.getAs[Long]("n_draws")
      assert(math.abs(draws - n) <= tol, s"rep ${r.get(0)}: $draws vs n=$n")
    }
    // replicate means bracket the corpus mean (resampling, not re-weighting)
    val mean = Tables(spark, sf).documents
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val means = b.map(_.getAs[Double]("mean_chars"))
    assert(means.min < mean && mean < means.max,
      "replicate spread must straddle the point estimate")
    // no RNG anywhere: a second run is bit-identical
    val again = sample.Sampling.bootstrap(spark, sf).collect()
    assert(b.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("pipe_incr: delta-only refresh equals the full run restricted to the delta") {
    val incr = pipeline.Curate.incr(spark, sf)
    val cut = Tables(spark, sf).documents
      .agg(max(col("doc_id"))).head.getLong(0) * 4 / 5
    assert(incr.filter(col("doc_id") < cut).count() == 0,
      "nothing below the watermark may appear in the delta manifest")
    // old ids all precede delta ids, so the full run's global min-keeper and
    // the incr's (intra-delta keeper ∘ old-index anti-join) must agree
    val full = pipeline.Curate.curate(spark, sf)
      .filter(col("doc_id") >= cut)
      .select(col("doc_id"), col("source"), col("tok"))
    val a = incr.collect().map(_.toSeq).toSet
    val b = full.collect().map(_.toSeq).toSet
    assert(a == b, "incremental refresh must reproduce the full-run delta slice")
    assert(a.nonEmpty, "fixture must exercise the delta path")
  }
}
