package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ann_hybrid fusion semantics + st_heavy_hitters' sketch/confirm split. */
class HybridHeavySpec extends AnyFunSuite {
  import SparkTest._

  test("ann_hybrid: RRF ranks an id on both lists above the same ranks alone") {
    val rows = sim.Similarity.hybridTopKQuery(spark, sf).collect()
    assert(rows.length == sim.Similarity.hybridTopK)
    // rrf is exactly the two coalesced reciprocal terms
    rows.foreach { r =>
      val rl = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rv = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(rl.isDefined || rv.isDefined, "fused row must come from a list")
      val want = rl.map(x => 1.0 / (sim.Similarity.rrfC + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (sim.Similarity.rrfC + x)).getOrElse(0.0)
      assert(r.getDouble(3) == want)
    }
    // output is rrf-descending with id tie-break
    val rrfs = rows.map(_.getDouble(3)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("st_heavy_hitters: streaming sketch candidates cover the exact heavy set") {
    val k = events.EventOps.hhK
    val got = streaming.StreamOps.stHeavyHitters(spark, sf)
      .select(col("event_type"), col("bucket"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // exact per-type heavy set, computed independently
    val ev = Tables(spark, sf).events
      .select(col("event_type"), floor(col("value")).cast("long").as("bucket"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = ev.groupBy(_._1).iterator.flatMap { case (t, g) =>
      val n = g.length
      g.groupBy(_._2).iterator.collect {
        case (b, bs) if bs.length.toLong * (k + 1) > n => (t, b)
      }
    }.toSet
    assert(got == exact, "confirm pass must trim the sketch to exactly the true heavies")
  }
}
