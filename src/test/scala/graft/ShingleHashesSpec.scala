package graft

import graft.functions.Portable
import graft.plans.ShingleHashes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShingleHashesSpec extends AnyFunSuite {
  import SparkTest._

  test("bit-twiddled hash64 equals hex-string reference") {
    Seq("", "a", "the quick brown", "mh7|x y z", "ünïcode test").foreach { s =>
      assert(ShingleHashes.hash64(s) == ShingleHashes.hash64Reference(s), s)
    }
  }

  test("expression equals declarative shingles+hash64 formulation") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents.limit(50)
    val viaExpr = docs.select(col("doc_id"),
      ShingleHashes(col("text"), 3, distinct = true).as("hs"))
    val viaFns = docs.select(col("doc_id"),
      transform(Portable.shingles(Portable.words(col("text"))),
        s => Portable.hash64(s)).as("hs"))
    val a = viaExpr.as[(Long, Seq[Long])].collect().toMap
    val b = viaFns.as[(Long, Seq[Long])].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, hs) => assert(hs.sorted == b(id).sorted, s"doc $id") }
  }

  test("positional variant preserves order and multiplicity") {
    import spark.implicits._
    val r = Seq("a b c a b c a b").toDF("text")
      .select(ShingleHashes(col("text"), 3, distinct = false).as("hs"))
      .as[Seq[Long]].head
    assert(r.length == 6) // 8 words → 6 positional 3-grams
    assert(r(0) == r(3) && r(1) == r(4)) // repeated kgrams keep positions
    val d = Seq("a b c a b c a b").toDF("text")
      .select(ShingleHashes(col("text"), 3, distinct = true).as("hs"))
      .as[Seq[Long]].head
    assert(d.length == 3)
  }

  test("short and null texts") {
    import spark.implicits._
    val r = Seq(Some("one two"), Some(""), None).toDF("text")
      .select(ShingleHashes(col("text"), 3, distinct = true).as("hs"))
      .collect()
    assert(r(0).getSeq[Long](0).isEmpty)
    assert(r(1).getSeq[Long](0).isEmpty)
    assert(r(2).isNullAt(0))
  }
}

class ShingleStringsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTest._
  import graft.plans.ShingleStrings
  import graft.functions.Portable
  import org.apache.spark.sql.functions._

  test("matches the declarative shingles() on real documents") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents.limit(100)
    val viaExpr = docs.select($"doc_id",
      ShingleStrings(col("text"), 3, distinct = true).as("sh"))
    val viaFns = docs.select($"doc_id",
      Portable.shingles(Portable.words(col("text"))).as("sh"))
    val a = viaExpr.as[(Long, Seq[String])].collect().toMap
    val b = viaFns.as[(Long, Seq[String])].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, sh) => assert(sh.sorted == b(id).sorted, s"doc $id") }
  }

  test("short/null text and SQL registration") {
    import spark.implicits._
    val r = Seq(Some("one two"), None).toDF("text")
      .select(ShingleStrings(col("text"), 3, distinct = true).as("sh")).collect()
    assert(r(0).getSeq[String](0).isEmpty)
    assert(r(1).isNullAt(0))
    graft.plans.GraftExtensions.install(spark)
    val s = spark.sql("SELECT shingle_strings('a b c d', 3, true)").head.getSeq[String](0)
    assert(s == Seq("a b c", "b c d"))
  }
}

class HllSketchSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTest._
  import org.apache.spark.sql.functions._

  test("registers merge across partitions and estimate lands near exact") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => s"user_$i").toDF("u").repartition(8)
    val out = df.agg(graft.plans.HllSketch.registers(col("u")).as("regs"))
      .withColumn("inv", expr(
        "aggregate(transform(regs, r -> shiftleft(CAST(1 AS BIGINT), 55 - r)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .select(expr("CAST(0.709 AS DOUBLE) * 4096 * power(2.0, 55) / inv").as("est"))
      .head.getDouble(0)
    // m=64 -> ~13% standard error; 3 sigma bound
    assert(math.abs(out - n) / n < 0.4, s"estimate $out vs exact $n")
  }

  test("register definition matches the documented bit layout") {
    val buf = graft.plans.HllSketch(GraftTestBridge.expr(col("u"))).createAggregationBuffer()
    assert(buf.length == 64 && buf.forall(_ == 0))
    // hash64("x") low 6 bits pick the bucket; remaining 54 bits the rank
    val h = graft.plans.ShingleHashes.hash64("x")
    val b = (h & 63).toInt
    val rank = 55 - (64 - java.lang.Long.numberOfLeadingZeros(h >>> 6))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("x")))
    val agg = graft.plans.HllSketch(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true))
    val updated = agg.update(agg.createAggregationBuffer(), row)
    assert(updated(b) == rank.toByte)
    assert(updated.count(_ != 0) == 1)
  }
}

object GraftTestBridge {
  def expr(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftBridge.expression(c)
}
