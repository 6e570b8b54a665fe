package graft

import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import SparkTest._

  test("dd_exact preserves all documents across groups") {
    val df = dedup.Dedup.exact(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0)
    assert(total == 500L)
  }

  test("dd_minhash candidate pairs are ordered and distinct") {
    val rows = dedup.Dedup.minhashLsh(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("ngram jaccard stays within (0, 1]") {
    val rows = dedup.Dedup.ngramJaccard(spark, sf).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.12 && j <= 1.0)
    }
  }

  test("simhash signature uses the 60 effective hash bits") {
    val sigs = dedup.Dedup.simhashSigs(spark, sf).collect()
    assert(sigs.nonEmpty)
    // the word hash is a 60-bit md5 prefix, so signature bits 60-63 are 0
    sigs.foreach(r => assert((r.getAs[Long]("simhash") >>> 60) == 0L))
    // signatures actually populate the widened range (not stuck in 16 bits)
    assert(sigs.exists(r => (r.getAs[Long]("simhash") >>> 16) != 0L))
  }

  test("simhash band-join candidates credit each pair exactly once") {
    val rows = dedup.Dedup.simhash(spark, sf).collect()
    val pairs = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.length == pairs.distinct.length, "pair surfaced by more than one band")
    rows.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
  }

  test("brute topk returns k ranked neighbors per query") {
    val rows = sim.Similarity.bruteTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == sim.Similarity.numQueries)
    byQ.values.foreach { rs =>
      assert(rs.length == sim.Similarity.topK)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      val coss = sorted.map(_.getAs[Double]("cos"))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lsh topk neighbors are a subset of same-bucket candidates with valid cosines") {
    val rows = sim.Similarity.lshTopK(spark, sf).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cos")) <= 1.000001))
  }

  test("langid picks deterministic argmax") {
    val rows = text.TextOps.langId(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }

  test("quality score bounded [0,1]") {
    text.TextOps.quality(spark, sf).collect().foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("winnowing fingerprints: n_fp bounded by kgram count") {
    val rows = text.TextOps.fingerprint(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_fp") > 0))
  }

  test("streaming window counts equal batch aggregation") {
    val st = streaming.StreamOps.windowCounts(spark, sf)
    val n = st.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(n == 1000L, s"all events must land in a window, got $n")
  }

  test("sessionize: session bounds ordered, gaps respected") {
    val rows = streaming.StreamOps.sessionize(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("start_us") <= r.getAs[Long]("end_us"))
    }
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == 1000L, s"every event in exactly one session, got $total")
  }

  test("pipe_mm: manifest packs exactly the gate survivors minus perceptual dups") {
    import org.apache.spark.sql.functions._
    val mm = multimodal.Multimodal
    val kept = mm.mmPair(spark, sf).filter(col("verdict") === "keep")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // gated dups: pairs whose BOTH ends survived the gate (banding over the
    // gated subset finds exactly the full-corpus pairs restricted to it)
    val dups = mm.mmPhash(spark, sf).collect()
      .filter(r => kept(r.getLong(0)) && kept(r.getLong(1)))
      .map(_.getLong(1)).toSet
    val manifest = mm.pipeMm(spark, sf).collect()
    assert(manifest.nonEmpty)
    val packed = manifest.map(_.getAs[Long]("n_items")).sum
    assert(packed == (kept.size - dups.size).toLong,
      s"packed $packed vs ${kept.size} kept - ${dups.size} dups")
    // the composed pipeline packs strictly fewer items than the raw corpus
    val full = mm.mmBatchPack(spark, sf).collect().map(_.getAs[Long]("n_items")).sum
    assert(packed < full)
  }

  test("st_quantile_sketch: state-store sketch equals the batch sketch bit-for-bit") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val st = streaming.StreamOps.stQuantileSketch(spark, sf).collect().map(key).toSet
    val b = events.EventOps.quantileSketch(spark, sf).collect().map(key).toSet
    assert(st.nonEmpty && st == b, s"streaming ${st.size} vs batch ${b.size}")
  }

  test("st_geo_velocity: streaming alerts equal the batch detector alert-for-alert") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("username"), r.getAs[Long]("event_id"),
        r.getAs[Long]("prev_event_id"), r.getAs[String]("prev_country"),
        r.getAs[String]("country"), r.getAs[Long]("gap_us"))
    val st = streaming.StreamOps.stGeoVelocity(spark, sf).collect().map(key).toSet
    val b = enrich.EnrichQueries.geoVelocity(spark, sf).collect().map(key).toSet
    assert(st.nonEmpty, "fixture produced no country hops")
    assert(st == b, s"streaming ${st.size} vs batch ${b.size}")
  }

  test("st_trending: chained stateful aggs equal the batch top-k on watermark-closed hours") {
    import org.apache.spark.sql.functions._
    val st = streaming.StreamOps.stTrending(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(st.nonEmpty)
    // batch truth restricted to hours the final watermark (max ts - 1 h)
    // closed: append mode finalizes an hour exactly once, never the
    // trailing open hour(s)
    val maxUs = Tables(spark, sf).events
      .agg(max(graft.epochUs(col("ts")))).head.getLong(0)
    val batch = events.EventOps.trending(spark, sf).collect()
      .map(r => (r.getLong(0) * 1000000L, r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter { case (hUs, _, _, _) => hUs + 3600000000L <= maxUs - 3600000000L }
      .toSet
    assert(st == batch, s"streaming ${st.size} rows vs batch-closed ${batch.size}")
    // and the trailing hour really was withheld
    val batchAll = events.EventOps.trending(spark, sf).count()
    assert(st.size < batchAll)
  }

  test("mm_meta: real ImageIO decode round-trips the synthesized dimensions") {
    val rows = multimodal.Multimodal.mmMeta(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      // fmt comes from ImageIO's reader detection, not an assumption
      assert(r.getAs[String]("fmt") == "bmp")
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(w >= 12 && w <= 95 && h >= 8 && h <= 47)
      // BMP size is closed-form in the decoded dims: headers + padded rows
      assert(r.getAs[Long]("n_bytes") == 54L + h.toLong * ((w * 3 + 3) & ~3))
      assert(r.getAs[Long]("pixel_sum") > 0L)
    }
  }

  test("decodeImage: known-answer BMP decode reads every pixel, not just the header") {
    val gray = Array[Byte](10, 20, 30, 40, 50, 60) // 3×2, row-major top-down
    val bmp = multimodal.Multimodal.encodeBmp(3, 2, gray)
    val d = multimodal.Multimodal.decodeImage(bmp)
    assert(d.fmt == "bmp" && d.width == 3 && d.height == 2)
    assert(d.gray.toSeq == gray.toSeq, "decoded raster must match encoded pixels in order")
  }

  test("decodeImage is format-agnostic: a PNG round-trips through the same path") {
    val img = new java.awt.image.BufferedImage(5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5) {
      val v = (x * 37 + y * 11) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = multimodal.Multimodal.decodeImage(bos.toByteArray)
    assert(d.fmt == "png" && d.width == 5 && d.height == 4)
    val expected = for (y <- 0 until 4; x <- 0 until 5) yield ((x * 37 + y * 11) % 256).toByte
    assert(d.gray.toSeq == expected)
  }

  test("mm_framesample keeps every 4th frame with a content hash") {
    val rows = multimodal.Multimodal.mmFrameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("frame_idx") % 4 == 0))
    assert(rows.forall(_.getAs[String]("frame_md5").length == 32))
  }

  test("mm_resize fits into the 64-box preserving aspect order") {
    val rows = multimodal.Multimodal.mmResize(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(w >= 1 && h >= 1 && w <= 64 && h <= 64)
      // aspect preserved up to integer truncation
      assert((r.getAs[Int]("width") >= r.getAs[Int]("height")) == (w >= h))
    }
  }

  test("mm_features: histogram bins sum to payload length") {
    val rows = multimodal.Multimodal.mmFeaturesVec(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val hist: Seq[Long] = r.getAs[scala.collection.Seq[Long]]("hist").toSeq
      assert(hist.length == 8)
      assert(hist.sum > 0)
    }
  }

  test("mm_features query output serializes the vector for the compare harness") {
    val rows = multimodal.Multimodal.mmFeatures(spark, sf).limit(5).collect()
    rows.foreach { r =>
      val s = r.getAs[String]("hist")
      assert(s.split("\\|").length == 8)
    }
  }

  test("mm_pair: cosine bounded, verdict mirrors the threshold, both verdicts occur") {
    val rows = multimodal.Multimodal.mmPair(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val s = r.getAs[Double]("clip_score")
      assert(s >= -1.0 && s <= 1.0)
      val expect = if (s >= multimodal.Multimodal.pairThreshold) "keep" else "drop"
      assert(r.getAs[String]("verdict") == expect)
    }
    val kept = rows.count(_.getAs[String]("verdict") == "keep")
    assert(kept > 0 && kept < rows.length, "gate must actually split the corpus")
  }

  test("mm_batchpack: every item packed once, overhang bounded by one item") {
    val rows = multimodal.Multimodal.mmBatchPack(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_items")).sum == 500)
    val maxItemPx = multimodal.Multimodal.resizeMax.toLong * multimodal.Multimodal.resizeMax
    rows.foreach { r =>
      assert(r.getAs[Long]("n_items") >= 1)
      // bin-by-start-offset: a batch holds its budget plus at most the one
      // item that straddles the boundary
      assert(r.getAs[Long]("total_px") <= multimodal.Multimodal.pixelBudget + maxItemPx)
    }
    // the corpus must actually span shard boundaries or this spec can't
    // catch cross-shard batch-numbering regressions
    assert(rows.map(_.getAs[Long]("shard")).distinct.length >= 2)
    // batches within a (modality, shard) are contiguous doc_id runs:
    // first_doc_id strictly increases with batch id
    rows.groupBy(r => (r.getAs[String]("fmt"), r.getAs[Long]("shard")))
      .foreach { case (_, rs) =>
        val byBatch = rs.sortBy(_.getAs[Long]("batch")).map(_.getAs[Long]("first_doc_id"))
        assert(byBatch.sameElements(byBatch.sorted))
      }
  }
}
class WideningSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTest._

  test("q5_join covers only ASIA nations") {
    val rows = relational.Relational.q5Join(spark, sf).collect()
    assert(rows.nonEmpty)
    val nations = rows.map(_.getAs[String]("n_name")).toSet
    assert(nations.forall(Set("NATION_2", "NATION_7", "NATION_12", "NATION_17", "NATION_22")))
  }

  test("q_semi_anti partitions customers exactly") {
    val rows = relational.Relational.qSemiAnti(spark, sf).collect()
    val total = rows.map(r => r.getAs[Long]("n_active") + r.getAs[Long]("n_inactive")).sum
    assert(total == Tables(spark, sf).customer.count())
  }

  test("ru_lua evaluates every corpus predicate") {
    val names = rules.RuleQueries.ruLua(spark, sf)
      .select("rule_name").distinct().collect().map(_.getString(0)).toSet
    assert(names.contains("l_curl"))
  }

  test("ann_ivf_topk returns ranked neighbors per query") {
    val rows = sim.Similarity.ivfTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
    }
  }

  test("st_spike: flat-baseline deviation emits a null-z spike; mid-bucket splits merge") {
    import streaming.StreamOps.{SpikeBucket, SpikeState, spikeFold}
    // flat stretch with a deviation (the infinite-z branch), then closers
    val counts = Seq.fill(12)(5L) ++ Seq(50L) ++ Seq.fill(3)(7L)
    val buckets = counts.zipWithIndex.map { case (n, i) => SpikeBucket(i * 60L, n) }
    val (whole, endSt) = spikeFold("t", SpikeState(Nil, None), buckets)
    assert(whole.exists(r => r.verdict == "spike" && r.z.isEmpty),
      "flat-baseline deviation must emit a null-z spike")
    // a batch boundary INSIDE the 50-bucket: 20 then 30 more in the same
    // minute must merge in pending, not emit twice or double-enter the ring
    val early = buckets.take(12) :+ SpikeBucket(12 * 60L, 20L)
    val late = SpikeBucket(12 * 60L, 30L) +: buckets.drop(13)
    val (a, st1) = spikeFold("t", SpikeState(Nil, None), early)
    val (b, st2) = spikeFold("t", st1, late)
    assert((a ++ b) == whole, "mid-bucket split diverged from one pass")
    assert(st2 == endSt)
    assert(st2.ring.length <= events.EventOps.spikeWindow)
  }

  test("st_pipeline streaming matches equal batch rule engine") {
    val st = streaming.StreamOps.pipeline(spark, sf)
    val batch = rules.RuleQueries.ruEngine(spark, sf)
    assert(st.count() == batch.count())
  }

  test("sliding windows double-count each event") {
    val st = streaming.StreamOps.windowSliding(spark, sf)
    val n = st.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(n == 2000L, s"each of 1000 events in exactly 2 windows, got $n")
  }

  test("pipe_curate: every survivor clears every stage's own contract") {
    import org.apache.spark.sql.functions._
    val out = pipeline.Curate.curate(spark, sf).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    // gate: survivors pass the quality/length floors
    val gatedOk = text.TextOps.withQualityCols(Tables(spark, sf).documents)
      .filter(col("quality") >= pipeline.Curate.qualityFloor &&
        col("n_words") >= pipeline.Curate.minWords)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(gatedOk))
    // decontamination: no benchmark doc, no contaminated doc
    val contaminated = dedup.Dedup.contaminate(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ >= dedup.Dedup.contamBenchDocs))
    assert(ids.intersect(contaminated).isEmpty)
    // split: survivors are train-bucket docs only (samp_split agreement)
    val trainIds = sample.Sampling.split(spark, sf)
      .filter(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(trainIds))
    // packing: bins are monotone nondecreasing in doc order per source
    out.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      val bins = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("bin"))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
      assert(bins.head == 0L, "first doc of a source starts bin 0")
    }
  }

  test("dd_normalized: no join — normalization is scan-side math ahead of one agg") {
    spark.catalog.clearCache()
    val plan = dedup.Dedup.normalized(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
    // two exchanges only: the distinct-variant expand's partial pair + the
    // final group on norm_md5 — nothing shuffles the raw text twice
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n <= 2, s"expected <=2 exchanges, got $n\n" + plan.take(800))
  }

  test("dd_intra: repeats after the first occurrence drop, order preserved, zero shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val k = dedup.Dedup.chunkWords
    // three chunks: A, B, A — cleaned form must be "A B" (first-occurrence
    // order), counted as 3 chunks / 2 unique
    val a = (1 to k).map(i => s"a$i").mkString(" ")
    val b = (1 to k).map(i => s"b$i").mkString(" ")
    val crafted = Seq((1L, s"$a $b $a")).toDF("doc_id", "text")
    val ch = graft.plans.ShingleStrings.chunks(col("text"), k)
    val row = crafted.select(col("doc_id"),
        size(ch).cast("long").as("n_chunks"),
        size(array_distinct(ch)).cast("long").as("n_unique"),
        md5(array_join(array_distinct(ch), " ")).as("clean_md5"))
      .head()
    assert(row.getAs[Long]("n_chunks") == 3L && row.getAs[Long]("n_unique") == 2L)
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$a $b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getAs[String]("clean_md5") == expectedMd5)
    // the corpus query is a pure projection — no exchange of any kind
    spark.catalog.clearCache()
    val plan = dedup.Dedup.intra(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("pipe_funnel: stage counts monotone non-increasing; train row equals the manifest") {
    val rows = pipeline.Curate.funnel(spark, sf).collect()
      .sortBy(_.getAs[Long]("stage"))
      .map(r => (r.getAs[String]("name"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
    assert(rows.map(_._1).toSeq == Seq("raw", "gated", "deduped", "clean", "train"))
    rows.sliding(2).foreach { case Array((_, d1, t1), (_, d2, t2)) =>
      assert(d2 <= d1 && t2 <= t1, s"funnel must shrink: $rows")
    }
    val (_, trainDocs, trainToks) = rows.last
    val manifest = pipeline.Curate.curate(spark, sf)
    assert(manifest.count() == trainDocs)
    assert(manifest.agg(org.apache.spark.sql.functions.sum("tok")).head.getLong(0) == trainToks)
  }

  test("pipe_curate: one plan — contamination anti-join broadcast, no cartesian") {
    val plan = pipeline.Curate.curate(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(1000))
    assert(!plan.contains("CartesianProduct"), plan.take(1000))
  }
}
