package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions implement real `doGenCode` — these tests run them
  * with whole-stage-codegen fallback DISABLED, so a broken generated-Java
  * path fails loudly instead of silently degrading to interpreted eval. */
class CodegenSpec extends AnyFunSuite {
  import SparkTest._

  private def withStrictCodegen[A](f: org.apache.spark.sql.SparkSession => A): A = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.fallback", "false")
    f(s)
  }

  test("VectorDot generated code matches interpreted eval") {
    withStrictCodegen { s =>
      import s.implicits._
      val df = Seq(
        (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
        (Array(0.5, -1.5), Array(2.0, 2.0)),
        (Array.empty[Double], Array.empty[Double]))
        .toDF("a", "b")
      val got = df.select(graft.plans.VectorDot(col("a"), col("b")).as("d"))
        .collect().map(_.getDouble(0)).toSeq
      assert(got == Seq(32.0, -2.0, 0.0))
    }
  }

  test("Int8Quantize generated code matches interpreted eval and round semantics") {
    withStrictCodegen { s =>
      import s.implicits._
      val df = Seq(
        Tuple1(Array(1.0, -2.0, 0.5)),            // amax 2 → 63.5, -127, 31.75
        Tuple1(Array(0.0, 0.0)),                  // zero vector: amax floor
        Tuple1(Array(-3.0)),                      // single negative: -127
        Tuple1(Array(1.0, Double.NaN)))           // NaN poisons the max
        .toDF("v")
      val got = df.select(graft.plans.Int8Quantize(col("v")).as("q"))
        .collect().map(_.getSeq[Double](0).toList).toList
      // HALF_UP away from zero: 63.5 → 64, 31.75 → 32; a NaN element makes
      // EVERY output NaN (list_max semantics of the reference HOF form)
      assert(got.take(3) == List(List(64.0, -127.0, 32.0), List(0.0, 0.0), List(-127.0)))
      assert(got(3).forall(_.isNaN))
      // interpreted path agrees (expression eval outside codegen)
      val interp = graft.plans.Int8Quantize(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1.0, -2.0, 0.5),
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toList
      assert(interp == List(64.0, -127.0, 32.0))
    }
  }

  test("ShingleHashes generated code matches the interpreted hash loop") {
    withStrictCodegen { s =>
      import s.implicits._
      val df = Seq("the quick brown fox", "a b", "").toDF("text")
      val got = df.select(graft.plans.ShingleHashes(col("text"), 3, distinct = true).as("h"))
        .collect().map(_.getSeq[Long](0).toSeq).toSeq
      val exp = Seq("the quick brown fox", "a b", "").map { t =>
        val w = graft.plans.ShingleHashes.splitWords(t)
        if (w.length < 3) Seq.empty[Long]
        else w.sliding(3).map(g => graft.plans.ShingleHashes.hash64(g.mkString(" ")))
          .toSeq.distinct
      }
      assert(got == exp)
    }
  }

  test("ShingleStrings chunked generated code matches eval") {
    withStrictCodegen { s =>
      import s.implicits._
      val df = Seq("one two three four five").toDF("text")
      val got = df.select(graft.plans.ShingleStrings.chunks(col("text"), 2).as("c"))
        .head.getSeq[String](0).toSeq
      assert(got == Seq("one two", "three four", "five"))
    }
  }

  test("RangeLookup generated binary search: hits, misses, child nulls") {
    withStrictCodegen { s =>
      import s.implicits._
      val df = Seq(Some(5L), Some(15L), Some(25L), None).toDF("k")
      val idx = graft.plans.RangeLookup(col("k"), Array(0L, 10L), Array(9L, 19L))
      val got = df.select(idx.as("i")).collect()
        .map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
      assert(got == Seq(1, 2, -1, -1))
    }
  }

  test("ANN + dedup pipelines run under strict codegen at sf0.001") {
    withStrictCodegen { s =>
      assert(sim.Similarity.bruteTopK(s, sf).count() > 0)
      assert(dedup.Dedup.ngramJaccard(s, sf).count() > 0)
      assert(dedup.Dedup.chunkDups(s, sf).count() > 0)
      assert(enrich.EnrichQueries.geoIpRange(s, sf).count() > 0)
      // fused sketch expressions (MinHashSigs / SimHashSig)
      assert(dedup.Dedup.minhashLsh(s, sf).count() > 0)
      assert(dedup.Dedup.simhashSigs(s, sf).count() > 0)
      assert(sim.Similarity.quantTopK(s, sf).count() > 0)
    }
  }
}
