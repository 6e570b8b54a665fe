package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.plans.MisraGries

class MisraGriesSpec extends AnyFunSuite {
  import SparkTest._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private def row(v: Long) = new GenericInternalRow(Array[Any](v))
  private def agg(k: Int) = MisraGries(BoundReference(0, LongType, nullable = true), k)

  private def heavySet(xs: Seq[Long], k: Int): Set[Long] = {
    val n = xs.size
    xs.groupBy(identity).collect { case (v, g) if g.size.toLong * (k + 1) > n => v }.toSet
  }

  test("summary never exceeds k counters and candidates contain every heavy hitter") {
    val k = 8
    val a = agg(k)
    val buf = a.createAggregationBuffer()
    // skewed stream: key i appears 2^(10-i) times, plus a long uniform tail
    val xs = (0L to 9L).flatMap(i => Seq.fill(1 << (10 - i).toInt)(i)) ++
      (100L until 600L)
    xs.foreach(v => a.update(buf, row(v)))
    assert(buf.size <= k)
    val cands = a.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSet
    assert(heavySet(xs, k).subsetOf(cands), "MG guarantee: no false negatives")
  }

  test("merge of partial summaries preserves the n/(k+1) guarantee (property)") {
    val k = 6
    val keyGen = Gen.frequency((8, Gen.choose(0L, 3L)), (2, Gen.choose(0L, 200L)))
    val gen = Gen.zip(Gen.nonEmptyListOf(keyGen), Gen.choose(0, 100))
    check(Prop.forAll(gen) { case (xs, cutPct) =>
      val cut = xs.size * cutPct / 100
      val (l, r) = xs.splitAt(cut)
      val a = agg(k)
      val b1 = a.createAggregationBuffer()
      val b2 = a.createAggregationBuffer()
      l.foreach(v => a.update(b1, row(v)))
      r.foreach(v => a.update(b2, row(v)))
      val m = a.merge(b1, a.deserialize(a.serialize(b2)))
      val cands = a.eval(m).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toLongArray().toSet
      m.size <= k && heavySet(xs, k).subsetOf(cands)
    })
  }

  test("buffer round-trips through serialize/deserialize") {
    val a = agg(4)
    val buf = a.createAggregationBuffer()
    Seq(7L, 7L, 7L, 2L, 9L, 2L).foreach(v => a.update(buf, row(v)))
    val rt = a.deserialize(a.serialize(buf))
    assert(rt.toSeq.sorted == buf.toSeq.sorted)
  }

  test("two-pass DataFrame heavy hitters equals the exact groupBy+HAVING") {
    import spark.implicits._
    val k = 5
    // geometric-ish key mix over a domain wider than k
    val xs = (1 to 4000).map(i => ((i * 1103515245L + 12345L) % 97L match {
      case m if m < 40 => 0L
      case m if m < 65 => 1L
      case m if m < 80 => 2L
      case m => m
    }))
    val df = xs.toDF("bucket")
    val p1 = df.agg(MisraGries.candidates($"bucket", k).as("c"), count(lit(1)).as("n")).head()
    val cands = p1.getSeq[Long](0)
    val n = p1.getLong(1)
    assert(cands.size <= k)
    val got = df.filter($"bucket".isin(cands: _*))
      .groupBy($"bucket").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * (k + 1) > n)
      .as[(Long, Long)].collect().toSet
    val exact = xs.groupBy(identity).collect {
      case (v, g) if g.size.toLong * (k + 1) > xs.size => (v, g.size.toLong)
    }.toSet
    assert(got == exact)
  }
}
