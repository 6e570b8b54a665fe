package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{HllSketch, TopKByScore}

/** Property-based merge-invariance checks for the mergeable aggregates —
  * THE distributed-correctness contract: however the input is partitioned
  * and in whatever order partial buffers merge, the result equals a single
  * sequential pass. scalacheck drives random data + random partitionings. */
class MergePropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  test("TopKByScore: any partitioning + merge order = one sequential pass") {
    val gen = for {
      xs <- Gen.listOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L)))
      cuts <- Gen.listOf(Gen.chooseNum(0, math.max(xs.size, 1)))
      seed <- Gen.chooseNum(0L, 1000L)
    } yield (xs, cuts, seed)
    check(Prop.forAll(gen) { case (xs, cuts, seed) =>
      val a = TopKByScore(BoundReference(0, DoubleType, nullable = true),
        BoundReference(1, LongType, nullable = true), 5)
      def row(s: Double, i: Long) = new GenericInternalRow(Array[Any](s, i))
      // sequential reference
      val ref = a.createAggregationBuffer()
      xs.foreach { case (s, i) => a.update(ref, row(s, i)) }
      // random partitioning: split points + shuffled merge order
      val points = (cuts.map(c => math.min(c, xs.size)) :+ 0 :+ xs.size).distinct.sorted
      val parts = points.zip(points.tail).map { case (from, to) =>
        val b = a.createAggregationBuffer()
        xs.slice(from, to).foreach { case (s, i) => a.update(b, row(s, i)) }
        a.deserialize(a.serialize(b))
      }
      val shuffled = new scala.util.Random(seed).shuffle(parts)
      val merged = shuffled.foldLeft(a.createAggregationBuffer())((acc, b) => a.merge(acc, b))
      merged.scores.toSeq == ref.scores.toSeq && merged.ids.toSeq == ref.ids.toSeq
    })
  }

  test("MinKStrings: any partitioning + merge order + serde = one sequential sort-take") {
    val gen = for {
      xs <- Gen.listOf(Gen.oneOf("alpha", "beta", "beta", "gamma", "delta",
        "https://a/x", "https://a/y", "https://b/z", "", "zz", "a", "b1", "b2"))
      cuts <- Gen.listOf(Gen.chooseNum(0, math.max(xs.size, 1)))
      k <- Gen.chooseNum(1, 6)
      seed <- Gen.chooseNum(0L, 1000L)
    } yield (xs, cuts, k, seed)
    check(Prop.forAll(gen) { case (xs, cuts, k, seed) =>
      val a = graft.plans.MinKStrings(
        BoundReference(0, StringType, nullable = true), k)
      def row(s: String) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(s)))
      val ref = xs.sorted.take(k) // duplicates KEPT — min-k of the multiset
      val points = (cuts.map(c => math.min(c, xs.size)) :+ 0 :+ xs.size).distinct.sorted
      val parts = points.zip(points.tail).map { case (from, to) =>
        val b = a.createAggregationBuffer()
        xs.slice(from, to).foreach(s => a.update(b, row(s)))
        a.deserialize(a.serialize(b)) // serde round-trip on every partial
      }
      val shuffled = new scala.util.Random(seed).shuffle(parts)
      val merged = shuffled.foldLeft(a.createAggregationBuffer())((acc, b) => a.merge(acc, b))
      merged.values.take(merged.size).map(_.toString).toSeq == ref
    })
  }

  test("MinHashSigs: the fused loop equals the explode-and-min reference") {
    val words = Gen.listOf(Gen.oneOf("spark", "join", "scan", "merge", "row",
      "key", "batch", "agg", "the", "a"))
    check(Prop.forAll(words) { ws =>
      val text = ws.mkString(" ")
      val hs = {
        val w = graft.plans.ShingleHashes.splitWords(text)
        if (w.length < 3) Seq.empty[Long]
        else w.sliding(3).map(g => graft.plans.ShingleHashes.hash64(g.mkString(" ")))
          .toSeq.distinct
      }
      val p = graft.dedup.Dedup.mersenneP
      val ab = graft.dedup.Dedup.hashAB
      // reference: per-function min over exploded hashes (the aggregation form)
      val ref = ab.map { case (a, b) =>
        if (hs.isEmpty) Long.MaxValue
        else hs.map(h => ((h % p) * a + b) % p).min
      }
      val got = graft.plans.MinHashSigs.sigs(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(hs.toArray),
        ab.map(_._1).toArray, ab.map(_._2).toArray, p).toSeq
      got == ref
    })
  }

  test("HllSketch: register state is partition- and order-invariant") {
    val gen = for {
      xs <- Gen.listOf(Gen.alphaNumStr)
      cuts <- Gen.listOf(Gen.chooseNum(0, math.max(xs.size, 1)))
      seed <- Gen.chooseNum(0L, 1000L)
    } yield (xs, cuts, seed)
    check(Prop.forAll(gen) { case (xs, cuts, seed) =>
      val a = HllSketch(BoundReference(0, StringType, nullable = true))
      def row(s: String) = new GenericInternalRow(Array[Any](UTF8String.fromString(s)))
      val ref = a.createAggregationBuffer()
      xs.foreach(s => a.update(ref, row(s)))
      val points = (cuts.map(c => math.min(c, xs.size)) :+ 0 :+ xs.size).distinct.sorted
      val parts = points.zip(points.tail).map { case (from, to) =>
        val b = a.createAggregationBuffer()
        xs.slice(from, to).foreach(s => a.update(b, row(s)))
        b
      }
      val shuffled = new scala.util.Random(seed).shuffle(parts)
      val merged = shuffled.foldLeft(a.createAggregationBuffer())((acc, b) => a.merge(acc, b))
      merged.toSeq == ref.toSeq
    })
  }

  test("spikeFold: any micro-batch split — including mid-bucket — equals one pass") {
    import streaming.StreamOps.{SpikeBucket, SpikeOut, SpikeState, spikeFold}
    // splits are ORDERED (micro-batches preserve event-time order per key)
    // and cut the raw EVENT stream, so a boundary can land inside a minute —
    // the partial bucket must merge in pending, never half-emit
    val gen = for {
      ns <- Gen.listOf(Gen.chooseNum(1L, 8L))
      cuts <- Gen.listOf(Gen.chooseNum(0, 500))
    } yield (ns, cuts)
    check(Prop.forAll(gen) { case (ns, cuts) =>
      val events = ns.zipWithIndex.flatMap { case (n, i) => Seq.fill(n.toInt)(i * 60L) }
      def bucketize(ev: Seq[Long]): Seq[SpikeBucket] =
        ev.groupBy(identity).toSeq.sortBy(_._1)
          .map { case (m, es) => SpikeBucket(m, es.size.toLong) }
      val (whole, endSt) = spikeFold("t", SpikeState(Nil, None), bucketize(events))
      val points = (cuts.map(c => math.min(c, events.size)) :+ 0 :+ events.size)
        .distinct.sorted
      val (rows, st) = points.zip(points.tail).foldLeft(
        (Vector.empty[SpikeOut], SpikeState(Nil, None))) {
        case ((acc, s), (from, to)) =>
          val (out, s2) = spikeFold("t", s, bucketize(events.slice(from, to)))
          (acc ++ out, s2)
      }
      rows == whole.toVector && st == endSt &&
        st.ring.length <= graft.events.EventOps.spikeWindow
    })
  }

  test("CommandParser.parse: total on arbitrary input — classifies, never throws") {
    // the DSL fronts an operator chat channel (command.rs): any garbage —
    // control chars, stray backticks, half-typed commands — must come back
    // as a Parsed (ok=false + error message), never an exception, and ok
    // results must carry the fields their kind promises
    val fragmentGen = Gen.oneOf(
      Gen.oneOf("status", "namechk", "signup", "rules", "add", "if",
        "if_susp_ip", "then", "email", "contains", "`x`", "`", "nodelay",
        "noexpiry", "remove", "show", "list", "enable", "disable", "renew",
        "3d", "2w", "seen", "test"),
      Gen.asciiPrintableStr.map(_.take(12)),
      Gen.listOf(Gen.chooseNum(0, 127)).map(_.map(_.toChar).mkString.take(12)))
    val cmdGen = Gen.listOf(fragmentGen).map(_.mkString(" "))
    check(Prop.forAll(cmdGen) { cmd =>
      val p = graft.commands.CommandParser.parse(cmd)
      (p.ok || p.error.nonEmpty) &&
        (!p.ok || p.kind != "error") &&
        (p.kind != "namechk" || !p.ok || p.name.exists(_.nonEmpty))
    })
  }

  test("rlFold: any ordered event split — including mid-minute — equals one pass") {
    import streaming.StreamOps.{RlState, Throttled, rlFold}
    // events are raw timestamps (several per minute) so a cut can land
    // inside a minute: the open bucket's count must thread through state,
    // never half-emit or reset
    val gen = for {
      ns <- Gen.listOf(Gen.chooseNum(1L, 5L))
      cuts <- Gen.listOf(Gen.chooseNum(0, 500))
    } yield (ns, cuts)
    check(Prop.forAll(gen) { case (ns, cuts) =>
      val events = ns.zipWithIndex.flatMap { case (n, i) =>
        (0 until n.toInt).map(j => i * 60000000L + j * 1000L)
      }
      val init = RlState(Long.MinValue, 0)
      val (whole, endSt) = rlFold(9L, init, events)
      val points = (cuts.map(c => math.min(c, events.size)) :+ 0 :+ events.size)
        .distinct.sorted
      val (rows, st) = points.zip(points.tail).foldLeft(
        (Vector.empty[Throttled], init)) {
        case ((acc, s), (from, to)) =>
          val (out, s2) = rlFold(9L, s, events.slice(from, to))
          (acc ++ out, s2)
      }
      rows == whole.toVector && st == endSt
    })
  }

  test("cdcFold: any ordered event split = one pass; pre-images chain exactly") {
    import streaming.StreamOps.{CdcEvent, CdcOut, CdcState, cdcFold}
    val gen = for {
      vs <- Gen.listOf(Gen.chooseNum(0L, 40L))
      cuts <- Gen.listOf(Gen.chooseNum(0, 100))
    } yield (vs, cuts)
    check(Prop.forAll(gen) { case (vs, cuts) =>
      val events = vs.zipWithIndex.map { case (v, i) =>
        CdcEvent(5L, i * 1000L, i.toLong, v)
      }
      val (whole, endSt) = cdcFold(5L, None, events)
      val points = (cuts.map(c => math.min(c, events.size)) :+ 0 :+ events.size)
        .distinct.sorted
      val (rows, st) = points.zip(points.tail).foldLeft(
        (Vector.empty[CdcOut], None: Option[CdcState])) {
        case ((acc, s), (from, to)) =>
          val (out, s2) = cdcFold(5L, s, events.slice(from, to))
          (acc ++ out, s2)
      }
      // split equivalence AND the journal invariant: each row's before is
      // the previous row's after
      val chained = whole.zip(whole.drop(1)).forall { case (a, b) =>
        b.before_value == a.after_value
      }
      rows == whole.toVector && st == endSt && chained
    })
  }

  test("scd2Fold: any ordered event split = one pass; state is one version") {
    import streaming.StreamOps.{Scd2Event, Scd2Out, scd2Fold}
    val gen = for {
      tiers <- Gen.listOf(Gen.chooseNum(0L, 3L))
      cuts <- Gen.listOf(Gen.chooseNum(0, 500))
    } yield (tiers, cuts)
    check(Prop.forAll(gen) { case (tiers, cuts) =>
      val events = tiers.zipWithIndex.map { case (t, i) => Scd2Event(7L, i * 10L, t) }
      val (whole, endSt) = scd2Fold(7L, None, events)
      val points = (cuts.map(c => math.min(c, events.size)) :+ 0 :+ events.size)
        .distinct.sorted
      val (rows, st) = points.zip(points.tail).foldLeft(
        (Vector.empty[Scd2Out], Option.empty[streaming.StreamOps.Scd2State])) {
        case ((acc, s), (from, to)) =>
          val (out, s2) = scd2Fold(7L, s, events.slice(from, to))
          (acc ++ out, s2)
      }
      rows == whole.toVector && st == endSt
    })
  }
}
