package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopKBuffer, TopKByScore}

class TopKAggSpec extends AnyFunSuite {
  import SparkTest._

  private def row(s: Double, i: Long) = new GenericInternalRow(Array[Any](s, i))

  private def agg(k: Int) =
    TopKByScore(BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true), k)

  test("buffer never exceeds k entries regardless of input size") {
    val a = agg(5)
    val buf = a.createAggregationBuffer()
    (0 until 10000).foreach(i => a.update(buf, row(i.toDouble / 100, i.toLong)))
    assert(buf.size == 5)
    assert(buf.k == 5)
    // best 5 scores survive, sorted descending
    assert(buf.scores.toSeq == Seq(99.99, 99.98, 99.97, 99.96, 99.95))
    // serialized buffer is 4 + 5*16 bytes — the O(k) wire contract
    assert(a.serialize(buf).length == 4 + 5 * 16)
  }

  test("ties break by smaller id; merge of partial buffers is k-way selection") {
    val a = agg(3)
    val b1 = a.createAggregationBuffer()
    val b2 = a.createAggregationBuffer()
    Seq((1.0, 7L), (2.0, 5L), (2.0, 3L)).foreach { case (s, i) => a.update(b1, row(s, i)) }
    Seq((2.0, 4L), (0.5, 1L), (3.0, 9L)).foreach { case (s, i) => a.update(b2, row(s, i)) }
    val m = a.merge(b1, a.deserialize(a.serialize(b2)))
    assert(m.size == 3)
    assert(m.scores.take(3).toSeq == Seq(3.0, 2.0, 2.0))
    assert(m.ids.take(3).toSeq == Seq(9L, 3L, 4L))
  }

  test("buffer round-trips through serialize/deserialize") {
    val a = agg(4)
    val buf = a.createAggregationBuffer()
    Seq((0.3, 2L), (0.9, 8L), (0.1, 5L)).foreach { case (s, i) => a.update(buf, row(s, i)) }
    val rt = a.deserialize(a.serialize(buf))
    assert(rt.size == buf.size)
    assert(rt.scores.take(3).toSeq == buf.scores.take(3).toSeq)
    assert(rt.ids.take(3).toSeq == buf.ids.take(3).toSeq)
  }

  test("DataFrame aggregate matches window-function top-k") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 7, (i * 37 % 101).toDouble, i.toLong))
      .toDF("g", "score", "id")
    val viaAgg = df.groupBy($"g")
      .agg(graft.plans.TopKAgg.topK($"score", $"id", 3).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"col.cand".as("id"), $"col.score".as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"g", $"id", $"score")
    assert(viaAgg.collect().toSet == viaWindow.collect().toSet)
  }

  test("empty group yields empty array, not null") {
    val a = agg(2)
    val buf: TopKBuffer = a.createAggregationBuffer()
    assert(a.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .numElements() == 0)
  }
}
