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

  test("ZorderKey generated interleave matches eval and hand-traced Morton codes") {
    withStrictCodegen { s =>
      import s.implicits._
      val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (65535L, 65535L),
        (3L, 5L), (70000L, 70000L)).toDF("x", "y")
      val got = df.select(graft.plans.ZorderKey(col("x"), col("y")).as("z"))
        .collect().map(_.getLong(0)).toSeq
      // hand-traced: x on even bits, y on odd; (3,5)=0b11⊕0b101→0b100111=39;
      // inputs mask to 16 bits (70000 & 65535 = 4464)
      val m = graft.plans.ZorderKey.interleave(4464L, 4464L)
      assert(got == Seq(0L, 1L, 2L, 0x55555555L, 0xFFFFFFFFL, 39L, m))
      // generated path agrees with the interpreted helper on every row
      assert(got.take(6) == Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
        (65535L, 65535L), (3L, 5L)).map { case (x, y) =>
        graft.plans.ZorderKey.interleave(x, y) })
      // adjacent cells share prefixes: z-sorted order clusters both dims
      val cellOf = (x: Long, sy: Long) => graft.plans.ZorderKey.interleave(x, sy) >> 16
      assert(cellOf(256L, 256L) == cellOf(300L, 300L)) // same 256×256 cell
      assert(cellOf(256L, 256L) != cellOf(256L, 512L))
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

  test("Bpe expressions: strict-codegen output matches interpreted eval and hand-traced values") {
    withStrictCodegen { s =>
      import s.implicits._
      val df = text.BpeQueries.corpus.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("sid", "text")
      val got = df.orderBy("sid").select(
          text.Bpe.tokenCount(col("text")).as("n"),
          array_join(text.Bpe.tokens(col("text")), "|").as("toks"),
          size(text.Bpe.tokens(col("text"))).cast("long").as("sz"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // hand-traced merge chains (see BpeQueries.bpeTokensSql for the rest)
      assert(got(0)._2 == "the|Ġthe|at|re")
      assert(got(2)._2 == "i|t|'s|Ġd|on|e")
      assert(got(9)._2 == "123|4|5|Ġ|12|Ġ|123")
      // the fused count agrees with the token array everywhere
      got.foreach { case (n, _, sz) => assert(n == sz) }
      // interpreted (non-codegen library) path agrees
      val interp = text.Bpe.encode("the theatre", text.Bpe.builtin)
      assert(interp.mkString("|") == "the|Ġthe|at|re")
    }
  }

  test("Bpe tokens always reconstruct the input (byte-map bijection + concat-only merges)") {
    // merges only ever concatenate adjacent symbols and the byte alphabet is
    // a bijection, so inverse-mapping the joined tokens must give back the
    // exact input — on the corpus and on adversarial strings
    val inverse = graft.text.Bpe.byteToUnicode.zipWithIndex
      .map { case (c, b) => c -> b.toByte }.toMap
    def roundTrip(s: String): String = {
      val joined = graft.text.Bpe.encode(s, graft.text.Bpe.builtin).mkString
      new String(joined.map(inverse).toArray, java.nio.charset.StandardCharsets.UTF_8)
    }
    val texts = graft.Tables(spark, sf).documents.select("text")
      .limit(60).collect().map(_.getString(0)).toSeq ++
      graft.text.BpeQueries.corpus ++
      Seq("", " ", "\t\nmixed \u0000 controls\r\n", "ĠĠ literal G-dots", "a" * 500)
    texts.foreach(t => assert(roundTrip(t) == t, s"round-trip failed for ${t.take(40)}"))
  }

  test("Bpe training: learned merges drop into the encoder unchanged") {
    val merges = text.BpeQueries.bpeTrain(spark, sf).collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    // th-chain learned first (hand-checked against the training corpus)
    assert(merges.take(3).toSeq == Seq(("t", "h"), ("Ġ", "th"), ("Ġth", "e")))
    // the trained-artifact contract: the learned list IS a BpeTable
    val learned = text.BpeTable(merges.zipWithIndex.toMap)
    val toks = text.Bpe.encode("the thing is thin", learned)
    assert(toks.mkString("|") == "th|e|Ġthing|Ġ|is|Ġthin", toks.mkString("|"))
  }
}
