package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph, audio, and PPS-sampling operators: invariants the engine-parity
  * hash check can't see (true-component equality vs a local union-find,
  * triangle-count divisibility, WAV round-trip, systematic-PPS budget). */
class GraphOpsSpec extends AnyFunSuite {
  import SparkTest._

  test("web_components matches a local union-find over the same edge rule") {
    val rows = web.WebOps.components(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("comp"), r.getAs[Long]("comp_size")))
    val n = Tables(spark, sf).documents.count()
    // local ground truth
    val parent = scala.collection.mutable.Map[Long, Long]((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    (0L until n).filter(_ % 3 == 0).foreach { d =>
      val dst = (d * 13 + 7) % n
      if (dst != d) { val (a, b) = (find(d), find(dst)); if (a != b) parent(math.max(a, b)) = math.min(a, b) }
    }
    val comp = (0L until n).map(i => i -> find(i)).toMap
    val sizes = comp.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(rows.length == n)
    rows.foreach { case (d, c, s) =>
      assert(c == comp(d), s"doc $d: engine comp $c vs truth ${comp(d)}")
      assert(s == sizes(comp(d)))
    }
    assert(sizes.size > 1, "fixture graph must have multiple components")
  }

  test("web_labelprop matches a local synchronous-LPA replay and is finer than components") {
    val rows = web.WebOps.labelProp(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("community"), r.getAs[Long]("comm_size")))
    val n = Tables(spark, sf).documents.count()
    val B = web.WebOps.lpaBlock
    // local replay of the SAME graph rule (rank ring + chord + head bridges)
    val blocks = (0L until n).groupBy(d => d - (d % B)).view.mapValues(_.toVector.sorted).toMap
    val raw = scala.collection.mutable.Set.empty[(Long, Long)]
    blocks.foreach { case (blk, ms) =>
      val bs = ms.size
      ms.zipWithIndex.foreach { case (d, r) =>
        raw += ((d, ms((r + 1) % bs)))
        raw += ((d, ms((r * 5 + 3) % bs)))
      }
      blocks.get(blk + B).foreach(ns => raw += ((ms.min, ns.min)))
    }
    val und = raw.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).toSet
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
      .withDefaultValue(Vector.empty[Long])
    var lbl = (0L until n).map(d => d -> d).toMap
    for (_ <- 1 to web.WebOps.lpaIters) {
      lbl = (0L until n).map { d =>
        val nbrs = adj(d)
        if (nbrs.isEmpty) d -> lbl(d)
        else d -> nbrs.map(lbl).groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val sizes = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.length == n)
    rows.foreach { case (d, c, s) =>
      assert(c == lbl(d), s"doc $d: engine $c vs replay ${lbl(d)}")
      assert(s == sizes(lbl(d)))
    }
    // the bridges chain every block into few COMPONENTS, but 4 LPA rounds keep
    // block-scale labels — communities must be strictly finer than components
    assert(sizes.size >= (n / B) / 2, s"expected block-scale communities, got ${sizes.size}")
  }

  test("web_triangles: total participation divisible by 3 and matches a local count") {
    val rows = web.WebOps.triangles(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tri"))).toMap
    assert(rows.values.sum % 3 == 0, "each triangle counted at all three corners")
    // local naive recount over the same generator
    val n = Tables(spark, sf).documents.count()
    val und = (0L until n).flatMap(d => (1 to web.WebOps.linksPerDoc).map(k => (d, (d * 7 + k) % n)))
      .filter { case (s, t) => s != t }
      .map { case (s, t) => (math.min(s, t), math.max(s, t)) }.toSet
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .withDefaultValue(Set.empty[Long])
    def neighbors(x: Long): Set[Long] =
      adj(x) ++ und.collect { case (a, b) if b == x => a }
    var total = 0L
    val local = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((u, v) <- und; w <- neighbors(u) if w > v && neighbors(v).contains(w)) {
      total += 1
      Seq(u, v, w).foreach(x => local(x) += 1)
    }
    assert(rows.values.sum == 3 * total, s"engine ${rows.values.sum} vs 3×$total")
    local.foreach { case (d, c) => assert(rows.getOrElse(d, 0L) == c, s"doc $d") }
  }

  test("mm_audio: WAV encode/decode round-trips and features match a hand recount") {
    val samples = Array[Short](100, -200, 300, 0, -5, 5)
    val (rate, back) = multimodal.Multimodal.decodeWav(
      multimodal.Multimodal.encodeWav(samples, 8000))
    assert(rate == 8000 && back.toSeq == samples.toSeq)

    val row = multimodal.Multimodal.mmAudio(spark, sf)
      .filter(col("doc_id") === 0L).head()
    val text = Tables(spark, sf).documents.filter(col("doc_id") === 0L)
      .head().getAs[String]("text").getBytes("UTF-8")
    val s = multimodal.Multimodal.audioSamplesFor(0L, text)
    assert(row.getAs[Long]("n_samples") == s.length)
    assert(row.getAs[Long]("abs_sum") == s.map(v => math.abs(v.toInt).toLong).sum)
    assert(row.getAs[Int]("peak") == s.map(v => math.abs(v.toInt)).max)
    assert(row.getAs[Long]("zero_cross") ==
      s.toSeq.sliding(2).count { case Seq(a, b) => a.toInt * b.toInt < 0 })
  }

  test("samp_pps: hit budget ≈ k, multiplicity ≥ 1, and P(hit) ∝ weight holds at the stride bound") {
    val rows = sample.Sampling.pps(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"), r.getAs[Long]("n_hits")))
    val total = Tables(spark, sf).documents.agg(sum("n_chars")).head().getLong(0)
    val stride = total / sample.Sampling.ppsK
    val hits = rows.map(_._3).sum
    assert(rows.forall(_._3 >= 1))
    assert(hits >= sample.Sampling.ppsK && hits <= sample.Sampling.ppsK + 1,
      s"systematic PPS draws floor(W/stride) ≈ k hits, got $hits")
    // a doc spanning m full strides must be hit at least m times
    rows.foreach { case (d, w, h) =>
      assert(h >= w / stride && h <= w / stride + 1, s"doc $d: $h hits for weight $w")
    }
  }
}
