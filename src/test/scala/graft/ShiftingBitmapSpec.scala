package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.plans.ShiftingBitmap

class ShiftingBitmapSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), p)
    assert(res.passed, res.status.toString)
  }

  private val agg = ShiftingBitmap(BoundReference(0, LongType, nullable = true))
  private def row(v: Long) = new GenericInternalRow(Array[Any](v))

  /** Canonical reference: bits 0..61 exact offsets from min, everything at
    * offset ≥ 62 collapsed into bit 62. */
  private def reference(days: Seq[Long]): (Long, Long) = {
    val m = days.min
    (m, days.map(d => 1L << math.min(d - m, 62L)).reduce(_ | _))
  }

  private def evalBuf(buf: Array[Long]): (Long, Long) = {
    val r = agg.eval(buf).asInstanceOf[GenericInternalRow]
    (r.getLong(0), r.getLong(1))
  }

  test("update matches the canonical min-anchored bitmap in any arrival order") {
    val dayGen = Gen.nonEmptyListOf(Gen.choose(20000L, 20100L))
    check(Prop.forAll(dayGen) { days =>
      val buf = agg.createAggregationBuffer()
      days.foreach(d => agg.update(buf, row(d)))
      evalBuf(buf) == reference(days)
    })
  }

  test("merge of any split equals the whole (mergeable-summary contract)") {
    val gen = Gen.zip(Gen.nonEmptyListOf(Gen.choose(20000L, 20100L)), Gen.choose(0, 100))
    check(Prop.forAll(gen) { case (days, cutPct) =>
      val cut = days.size * cutPct / 100
      val (l, r) = days.splitAt(cut)
      val b1 = agg.createAggregationBuffer()
      val b2 = agg.createAggregationBuffer()
      l.foreach(d => agg.update(b1, row(d)))
      r.foreach(d => agg.update(b2, row(d)))
      // r side crosses the wire, as in a real shuffle/state-store merge
      val m = agg.merge(b1, agg.deserialize(agg.serialize(b2)))
      evalBuf(m) == reference(days)
    })
  }

  test("saturation: every day >= first+62 lands on bit 62, however it arrives") {
    // late-arriving early day forces a big re-anchor shift across the clamp
    val buf = agg.createAggregationBuffer()
    Seq(20100L, 20160L, 20260L, 20000L).foreach(d => agg.update(buf, row(d)))
    val (first, bits) = evalBuf(buf)
    assert(first == 20000L)
    // 20100-20000=100 and 20160, 20260 all saturate; only bit 0 and bit 62 set
    assert(bits == ((1L << 62) | 1L))
  }

  test("empty and null-only groups evaluate to null") {
    val buf = agg.createAggregationBuffer()
    assert(agg.eval(buf) == null)
    agg.update(buf, new GenericInternalRow(Array[Any](null)))
    assert(agg.eval(buf) == null)
  }
}
