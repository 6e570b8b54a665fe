package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 corpus-pipeline operators: Gopher repetition/quality gates,
  * SemDeDup cluster-bucketed semantic dedup, soft-dedup reweighting. */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTest._

  test("tx_repetition: map-side only — no exchange in the plan") {
    val p = text.TextOps.repetition(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"repetition pass must be a pure scan:\n${p.take(800)}")
  }

  test("tx_repetition: mode 2-gram count matches a brute-force recount") {
    val rows = text.TextOps.repetition(spark, sf)
      .filter(col("n_words") >= 2).limit(20).collect()
    val texts = Tables(spark, sf).documents
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("t")).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val words = texts(r.getAs[Long]("doc_id")).split("\\s+").filter(_.nonEmpty)
      val grams = words.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val bestCnt = counts.values.max
      // tie-break: smallest gram among max-count, as documented
      val bestGram = counts.filter(_._2 == bestCnt).keys.min
      assert(r.getAs[Long]("top2_cnt") == bestCnt)
      assert(r.getAs[String]("top2_gram") == bestGram)
    }
  }

  test("tx_repetition: fractions live in [0, 1]") {
    val rows = text.TextOps.repetition(spark, sf).collect()
    rows.foreach { r =>
      Seq("dup_word_frac", "dup3_frac", "top2_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v")
      }
    }
  }

  test("tx_gopher: map-side only, verdicts from the documented domain") {
    val df = text.TextOps.gopher(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"quality gate must be a pure scan:\n${p.take(800)}")
    val verdicts = df.select(col("verdict")).distinct().collect().map(_.getString(0)).toSet
    val legal = Set("too_short", "too_long", "word_len", "alpha", "low_stop", "keep")
    assert(verdicts.subsetOf(legal), s"unexpected verdicts: ${verdicts -- legal}")
    assert(verdicts.contains("keep"))
  }

  test("tx_gopher: gate order — a too-short doc is never blamed on a later gate") {
    val rows = text.TextOps.gopher(spark, sf).filter(col("n_words") < 20).collect()
    rows.foreach(r => assert(r.getAs[String]("verdict") == "too_short"))
  }

  test("dd_semdedup: one verdict per vector, drop iff a lower-id cluster-mate is close") {
    val out = sim.Similarity.semDedup(spark, sf).collect()
    val n = Tables(spark, sf).embeddings.count()
    assert(out.length == n, s"${out.length} verdicts for $n vectors")
    out.foreach { r =>
      val drop = r.getAs[String]("verdict") == "drop"
      assert(drop == (r.getAs[Long]("n_dups") > 0))
    }
    // the min-id member of every cluster survives (it has no lower-id mate)
    out.groupBy(_.getAs[Long]("cid")).values.foreach { members =>
      val minId = members.map(_.getAs[Long]("vec_id")).min
      val minRow = members.find(_.getAs[Long]("vec_id") == minId).get
      assert(minRow.getAs[String]("verdict") == "keep")
    }
  }

  test("tx_pack: every doc packed once, bins ordered per source") {
    val out = text.TextOps.pack(spark, sf).collect()
    val nDocs = Tables(spark, sf).documents.count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    out.groupBy(_.getAs[String]("source")).values.foreach { bins =>
      val ids = bins.map(_.getAs[Long]("bin")).sorted
      // bins start at 0 and strictly increase; a doc longer than the budget
      // legitimately skips bins (it owns the bin where it starts), so
      // contiguity is NOT an invariant
      assert(ids.head == 0L)
      assert(ids.distinct.length == ids.length)
      // packing preserves order: later bins start at later docs
      val byBin = bins.sortBy(_.getAs[Long]("bin")).map(_.getAs[Long]("first_doc_id"))
      assert(byBin.toSeq == byBin.sorted.toSeq)
    }
  }

  test("ev_cohorts: offsets non-negative, no cell exceeds its cohort size") {
    val out = events.EventOps.cohorts(spark, sf).collect()
    assert(out.forall(_.getAs[Long]("day_offset") >= 0L))
    out.groupBy(_.getAs[String]("cohort_day")).values.foreach { cells =>
      val day0 = cells.find(_.getAs[Long]("day_offset") == 0L)
      assert(day0.isDefined, "every cohort has its day-0 cell")
      val size0 = day0.get.getAs[Long]("n_users")
      cells.foreach(c => assert(c.getAs[Long]("n_users") <= size0))
    }
  }

  test("dd_spans: reported spans are real exact duplicate substrings") {
    val out = dedup.Dedup.spans(spark, sf).collect()
    assert(out.nonEmpty, "synthetic near-dups must surface spans")
    val texts = Tables(spark, sf).documents
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("t")
        .split("\\s+").filter(_.nonEmpty)).toMap
    out.take(25).foreach { r =>
      val (a, b) = (texts(r.getAs[Long]("doc_a")), texts(r.getAs[Long]("doc_b")))
      val (sa, sb) = (r.getAs[Long]("start_a").toInt, r.getAs[Long]("start_b").toInt)
      val n = r.getAs[Long]("span_words").toInt
      assert(n >= dedup.Dedup.spanMinRun + 2)
      assert(a.slice(sa, sa + n).toSeq == b.slice(sb, sb + n).toSeq,
        s"span mismatch: ${r.mkString(",")}")
    }
  }

  test("st_hll_users: streaming sketch estimate equals the batch estimate") {
    val streamed = streaming.StreamOps.hllUsers(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("est")).toMap
    val batch = events.EventOps.hllUsers(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("est")).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("st_stream_join: streaming result equals the batch interval join") {
    val streamed = streaming.StreamOps.streamJoin(spark, sf)
      .collect().map(_.toSeq).toSet
    val ev = Tables(spark, sf).events
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id"), col("ts").as("s_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = s.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 2 HOURS"))
      .select(col("s_id"), col("p_id"), col("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("s_ts"))).as("delay_us"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("q_scd2: intervals chain without gaps, tiers change at every boundary") {
    val rows = relational.Relational.qScd2(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("tier"),
        r.getAs[Long]("valid_from_us"), Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.longValue)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_._3)
      // exactly one open (current) version per user, and it is the last
      assert(sorted.count(_._4.isEmpty) == 1)
      assert(sorted.last._4.isEmpty)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $uid: interval gap/overlap")
          assert(a._2 != b._2, s"user $uid: consecutive versions share a tier")
        case _ =>
      }
    }
  }

  test("q_running: quartiles bounded, first order has no prev_price") {
    val out = relational.Relational.qRunning(spark, sf).collect()
    assert(out.forall { r =>
      val q = r.getAs[Long]("quartile"); q >= 1 && q <= 4
    })
    // per customer: exactly the first row (min orderkey among earliest date)
    // carries a null prev_price
    out.groupBy(_.getAs[Long]("o_custkey")).values.foreach { rows =>
      assert(rows.count(_.isNullAt(rows.head.fieldIndex("prev_price"))) == 1)
    }
  }

  test("tx_pack: one exchange — bin agg reuses the source partitioning") {
    val p = text.TextOps.pack(spark, sf).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(800))
  }

  test("pack parity: BPE-budgeted packing matches a sequential reference fold") {
    // the distributed window/agg plan, budgeting on REAL BPE token counts
    val got = text.TextOps.packWithBpe(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // reference: a plain per-source sequential fold over the same counts
    val docs = Tables(spark, sf).documents.select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = scala.collection.mutable.Map.empty[(String, Long), (Long, Long, Long)]
    docs.groupBy(_._2).foreach { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, _, txt) =>
        val tok = text.Bpe.encode(txt, text.Bpe.builtin).length.toLong
        val bin = cum / text.TextOps.packBudget // doc lands where it STARTS
        val (n, first, tot) = expect.getOrElse((src, bin), (0L, Long.MaxValue, 0L))
        expect((src, bin)) = (n + 1, math.min(first, id), tot + tok)
        cum += tok
      }
    }
    assert(got == expect.toMap)
    // the BPE counts genuinely differ from the whitespace approximation
    // (otherwise this parity would be vacuous)
    val regexPack = text.TextOps.pack(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(4))).toMap
    assert(regexPack != got.map { case (k, v) => (k, v._3) },
      "BPE totals should not collapse to word counts")
    // same plan shape: still exactly one exchange
    val p = text.TextOps.packWithBpe(spark, sf).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(800))
  }

  test("dd_spans: both self-join sides read one cached positional index") {
    val p = dedup.Dedup.spans(spark, sf).queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(p).size == 2, p.take(1200))
  }

  test("ann_kmeans: every vector accounted for, full-dimension centroids") {
    val out = sim.Similarity.kmeans(spark, sf).collect()
    val n = Tables(spark, sf).embeddings.count()
    val byCluster = out.groupBy(_.getAs[Long]("cid"))
    assert(byCluster.size <= sim.Similarity.kmK)
    // membership counts cover the corpus exactly once
    assert(byCluster.values.map(_.head.getAs[Long]("n_members")).sum == n)
    // each surviving cluster carries one mean per dimension
    byCluster.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq == (0L until 64L))
    }
  }

  test("tx_profile_train: top-k per language, trained dim drives langId") {
    val prof = text.TextOps.profileTrain(spark, sf)
    val rows = prof.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).values.foreach { rs =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.length <= text.TextOps.profileTopK)
      assert(ranks.toSeq == (1L to ranks.length))
      rs.foreach(r => assert(r.getAs[Long]("df_lang") >= text.TextOps.profileMinDf))
    }
    // the trained dim slots into the langid operator unchanged
    val trained = prof.select(col("lang").as("plang"), col("word").as("pword"))
    val pred = text.TextOps.langIdWith(spark, sf, trained)
    assert(pred.count() > 0)
  }

  test("ev_wau: weekly actives bound daily actives") {
    val out = events.EventOps.wau(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"), r.toString)
    }
  }

  test("ev_cms: estimates never undercount (the CMS guarantee)") {
    val out = events.EventOps.cms(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("true_n"), r.toString))
  }

  test("dd_incremental: delta-only verdicts match the uncapped band index exactly") {
    val out = dedup.Dedup.incremental(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("new_id") % dedup.Dedup.incrMod == 0)
      if (r.getAs[Long]("n_dup_bands") == 0L) assert(r.isNullAt(r.fieldIndex("dup_of")))
      else assert(r.getAs[Long]("dup_of") < r.getAs[Long]("new_id"))
    }
    // the ownership shortcut must be EXACT vs the uncapped definition:
    // dup_of = the smallest doc sharing ANY band bucket (no cap, no pair
    // join) — recomputed independently from the raw band rows
    val bands = dedup.Dedup.bandRows(dedup.Dedup.shingleArrays(spark, sf)).collect()
      .map(r => (r.getAs[Long]("doc_id"), (r.getAs[Int]("band"), r.getAs[Long]("key"))))
    val byBucket = bands.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val byDoc = bands.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("new_id")
      val sharing = byDoc(id).flatMap(byBucket).filter(_ < id)
      if (sharing.isEmpty) assert(r.isNullAt(r.fieldIndex("dup_of")), s"doc $id")
      else assert(r.getAs[Long]("dup_of") == sharing.min, s"doc $id")
    }
  }

  test("embedding/sketch plans: broadcasts where intended, never a cartesian") {
    // CartesianProduct is the unbounded-pair failure mode; the broadcast
    // nested-loop the small dims produce is the intended shape
    for ((name, df) <- Seq(
        "ev_cms" -> events.EventOps.cms(spark, sf),
        "dd_semdedup" -> sim.Similarity.semDedup(spark, sf),
        "ann_kmeans" -> sim.Similarity.kmeans(spark, sf),
        "ev_wau" -> events.EventOps.wau(spark, sf))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n${p.take(800)}")
    }
    val cms = events.EventOps.cms(spark, sf).queryExecution.executedPlan.toString
    assert(cms.contains("BroadcastExchange"), "the CMS sketch must broadcast")
  }

  test("dd_weighted: group mass is 1 and copy counts agree with dd_exact") {
    val w = dedup.Dedup.weighted(spark, sf)
    val exact = dedup.Dedup.exact(spark, sf)
    // total weighted mass == number of distinct texts (each group sums to 1)
    val mass = w.agg(sum(col("weight"))).head.getDouble(0)
    val groups = exact.count()
    assert(math.abs(mass - groups) < 1e-3, s"mass $mass vs $groups groups")
    // every doc's n_copies equals its group's size from the exact pass
    val byCopies = w.groupBy(col("n_copies")).count().collect()
      .map(r => r.getAs[Long]("n_copies") -> r.getAs[Long]("count")).toMap
    val exactByCopies = exact.groupBy(col("n_copies")).count().collect()
      .map(r => r.getAs[Long]("n_copies") -> r.getAs[Long]("count") * r.getAs[Long]("n_copies")).toMap
    // a k-copy group contributes k docs on the weighted side
    assert(byCopies == exactByCopies)
  }

  test("dd_fuzzy_join: every dirty record recovers its origin (index is exact for d=1)") {
    val rows = dedup.FuzzyJoin.fuzzyJoin(spark, sf).collect()
    val nDirty = Tables(spark, sf).customer
      .filter(col("c_custkey") % 5 === 0).count()
    assert(rows.length == nDirty)
    rows.foreach { r =>
      // best match is the smallest key within distance 1 — never above the
      // origin key, and the origin is always reachable
      assert(r.getAs[Long]("best_ck") <= r.getAs[Long]("dk"), r.toString)
      assert(r.getAs[Long]("n_matches") >= 1L)
    }
  }

  test("tx_charset: zero shuffles; corruption drops, clean non-ASCII passes") {
    val q = text.TextOps.charset(spark, sf)
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
    val byId = q.collect().map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3), r.getString(5))).toMap
    assert(byId(-1L)._1 == 3L && byId(-1L)._3 == "drop", "replacement chars must drop")
    assert(byId(-2L)._2 == 3L && byId(-2L)._3 == "drop", "control chars must drop")
    // the gate measures BREAKAGE, not foreignness — accents/CJK pass
    assert(byId(-3L) == ((0L, 0L, "keep")))
    assert(byId.filter(_._1 >= 0).values.forall(_._3 == "keep"),
      "the clean ASCII corpus must pass wholesale")
  }

  test("tx_gazetteer: zero joins, one agg exchange; maximal matches conserve word counts") {
    val q = text.TextOps.gazetteer(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"literal dict must fuse, never join:\n${plan.take(600)}")
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges == 1, s"token stream must collapse in one agg, got $exchanges")
    val rows = q.collect()
    assert(rows.nonEmpty)
    // conservation: each 'scan' token is tagged exactly once — as the tail
    // of a 'table scan' bigram or as the standalone unigram, never both
    val byDoc = rows.groupBy(_.getLong(0))
    val tokens = Tables(spark, sf).documents
      .select(col("doc_id"), split(col("text"), " ").as("ws")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    var checkedSuppression = false
    byDoc.foreach { case (docId, dr) =>
      val n = dr.map(r => r.getString(1) -> r.getLong(3)).toMap
      val ws = tokens(docId)
      for ((uni, bi) <- Seq("scan" -> "table scan", "join" -> "hash join"))
        if (n.contains(bi)) {
          assert(n.getOrElse(uni, 0L) + n(bi) == ws.count(_ == uni),
            s"doc $docId: $uni occurrences must split between '$bi' and standalone")
          checkedSuppression = true
        }
    }
    assert(checkedSuppression, "fixture corpus never exercised bigram suppression")
  }
}
