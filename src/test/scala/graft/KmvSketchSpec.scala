package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.plans.{KmvSketch, ShingleHashes}

class KmvSketchSpec extends AnyFunSuite {
  import SparkTest._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  private def row(v: String) =
    new GenericInternalRow(Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(v)))
  private def agg(k: Int) = KmvSketch(BoundReference(0, StringType, nullable = true), k)

  private def evalSorted(a: KmvSketch, buf: java.util.TreeSet[java.lang.Long]): Seq[Long] =
    a.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq

  test("sketch is the k smallest DISTINCT hashes, regardless of split point (property)") {
    val k = 16
    val gen = Gen.zip(Gen.listOf(Gen.choose(0, 300)), Gen.choose(0, 100))
    check(Prop.forAll(gen) { case (xs, cutPct) =>
      val vals = xs.map(_.toString)
      val cut = vals.size * cutPct / 100
      val (l, r) = vals.splitAt(cut)
      val a = agg(k)
      val b1 = a.createAggregationBuffer()
      val b2 = a.createAggregationBuffer()
      l.foreach(v => a.update(b1, row(v)))
      r.foreach(v => a.update(b2, row(v)))
      val merged = evalSorted(a, a.merge(b1, a.deserialize(a.serialize(b2))))
      val expect = vals.distinct.map(ShingleHashes.hash64).sorted.take(k)
      merged == expect
    })
  }

  test("DataFrame estimate: exact below k, within 4 RSE above; diagonal == intersect-with-self") {
    import spark.implicits._
    val small = (1 to 100).map(i => s"u$i").toDF("v")
      .agg(KmvSketch.sketch($"v").as("sk"))
      .select(KmvSketch.estimate("sk").as("est"),
        KmvSketch.intersectEstimate("sk", "sk").as("self"))
      .head()
    assert(small.getDouble(0) == 100.0, "not-full sketch is exact")
    assert(small.getDouble(1) == 100.0, "self-intersection of not-full sketch is exact")

    val n = 20000
    val big = (1 to n).map(i => s"user-$i").toDF("v")
      .agg(KmvSketch.sketch($"v").as("sk"))
      .select(KmvSketch.estimate("sk").as("est"),
        KmvSketch.intersectEstimate("sk", "sk").as("self"))
      .head()
    val rse = 1.0 / math.sqrt(KmvSketch.defaultK - 2)
    assert(math.abs(big.getDouble(0) - n) < 4 * rse * n,
      s"estimate ${big.getDouble(0)} vs exact $n")
    assert(big.getDouble(0) == big.getDouble(1),
      "diagonal degenerates to the distinct estimate")
  }

  test("intersection estimate tracks the true overlap of two large sets") {
    import spark.implicits._
    // A = [0, 12000), B = [8000, 20000) → |A∩B| = 4000
    val df = (0 until 20000).flatMap { i =>
      val tags = (if (i < 12000) Seq("a") else Nil) ++ (if (i >= 8000) Seq("b") else Nil)
      tags.map(t => (t, s"user-$i"))
    }.toDF("tag", "v")
    val sk = df.groupBy($"tag").agg(KmvSketch.sketch($"v").as("sk"))
    val est = sk.as("x").join(sk.as("y"), expr("x.tag < y.tag"))
      .select(KmvSketch.intersectEstimate("x.sk", "y.sk").as("est"))
      .head().getDouble(0)
    // θ-sketch intersection RSE is worse than plain KMV; allow a loose band
    assert(est > 1500 && est < 8000, s"intersection estimate $est vs exact 4000")
  }
}
