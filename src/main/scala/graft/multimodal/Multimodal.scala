package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2f #33).
  *
  * Media are opaque `binary` columns + typed metadata; decode/feature
  * extraction runs as batched per-partition functions (the Scala analog of
  * `mapInPandas`): a typed Dataset, explicit batch shape (`grouped(64)`,
  * standing in for Arrow record batches), and a deterministic STUB decoder —
  * the container ships no image/audio codecs, so the decode body is fake by
  * design while every Spark-side concern (schema, encoders, partitioning,
  * batch iteration) is real. Swap [[decodeStub]] for a real codec to
  * productionize.
  */
object Multimodal {

  final case class Payload(doc_id: Long, payload: Array[Byte])
  final case class Meta(doc_id: Long, n_bytes: Long, width: Int, height: Int, fmt: String)

  /** Deterministic fake decode: "width" = first byte, "height" = size mod
    * 256, "format" keyed on size mod 3. */
  def decodeStub(p: Payload): Meta = {
    val n = p.payload.length.toLong
    val fmt = (n % 3) match {
      case 0 => "img"
      case 1 => "audio"
      case _ => "video"
    }
    Meta(p.doc_id, n, p.payload.headOption.map(_ & 0xff).getOrElse(0), (n % 256).toInt, fmt)
  }

  def mmMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Payload]
      .mapPartitions { it =>
        // batched decode loop — the Arrow-batch shape a real codec needs
        it.grouped(64).flatMap(batch => batch.map(decodeStub))
      }
      .toDF()
  }

  val mmMetaSql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |  ascii(substr(text, 1, 1)) AS width,
      |  CAST(length(text) % 256 AS INTEGER) AS height,
      |  CASE length(text) % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS fmt
      |FROM documents""".stripMargin

  // ---- frame sampling ------------------------------------------------------

  final case class Frame(doc_id: Long, frame_idx: Long, frame_md5: String)

  val frameBytes = 16
  val frameStride = 4

  /** Video-style frame sampling: treat the payload as fixed-size frames and
    * keep every `frameStride`-th one, emitting a content hash per kept frame.
    * Same batched per-partition shape as [[mmMeta]]; a real pipeline swaps
    * the byte-slice for a codec's keyframe extraction — the partitioning,
    * batch iteration, and output schema are what carry to 100 TB (frames
    * explode row counts ~n/64×, so this runs AFTER pushdown/pruning, never
    * before a filter). */
  def mmFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Payload]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        it.grouped(64).flatMap(_.flatMap { p =>
          val nFrames = (p.payload.length + frameBytes - 1) / frameBytes
          (0 until nFrames by frameStride).map { fi =>
            val from = fi * frameBytes
            val slice = java.util.Arrays.copyOfRange(
              p.payload, from, math.min(from + frameBytes, p.payload.length))
            md.reset()
            val digest = md.digest(slice)
            val chars = new Array[Char](32)
            var i = 0
            while (i < 16) {
              chars(2 * i) = hex((digest(i) & 0xf0) >> 4)
              chars(2 * i + 1) = hex(digest(i) & 0x0f)
              i += 1
            }
            Frame(p.doc_id, fi.toLong, new String(chars))
          }
        })
      }
      .toDF()
  }

  val mmFrameSampleSql: String =
    s"""SELECT doc_id, fi AS frame_idx,
       |  md5(substr(text, CAST(fi * $frameBytes + 1 AS INTEGER), $frameBytes)) AS frame_md5
       |FROM documents,
       |  LATERAL unnest(range(0, (length(text) + ${frameBytes - 1}) // $frameBytes)) t(fi)
       |WHERE fi % $frameStride = 0""".stripMargin

  // ---- resize planning -----------------------------------------------------

  val resizeMax = 64

  /** Resize stage: fit the (stub-decoded) dimensions into a `resizeMax` box
    * preserving aspect ratio. All-integer math ((d·max) DIV longest side) so
    * the plan is exact on both engines — the actual pixel resample is the
    * codec stub's job; this op is the dimension planning every image
    * pipeline runs before batching GPU work. Carries `fmt` for the batch
    * packer; the `mm_resize` query drops it (stable output schema). */
  private def resized(spark: SparkSession, sfDir: String): DataFrame =
    mmMeta(spark, sfDir)
      .withColumn("longest", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("fmt"), col("width"), col("height"),
        when(col("longest") <= resizeMax, col("width"))
          .otherwise(greatest(lit(1),
            expr(s"CAST(width * $resizeMax DIV longest AS INT)"))).as("out_w"),
        when(col("longest") <= resizeMax, col("height"))
          .otherwise(greatest(lit(1),
            expr(s"CAST(height * $resizeMax DIV longest AS INT)"))).as("out_h"))

  def mmResize(spark: SparkSession, sfDir: String): DataFrame =
    resized(spark, sfDir).drop("fmt")

  /** Shared resize CTE chain (`meta`→`m`→`rsz`), the single SQL source of
    * the fit-into-box math — mm_resize and mm_batchpack must pack from the
    * SAME dimensions or a drift between two copies would pass mm_resize's
    * oracle while packing different batches. */
  private val resizedSqlCtes: String =
    s"""meta AS ($mmMetaSql),
       |m AS (SELECT *, greatest(width, height) AS longest FROM meta),
       |rsz AS (SELECT doc_id, fmt, width, height,
       |  CASE WHEN longest <= $resizeMax THEN width
       |       ELSE greatest(1, CAST(width * $resizeMax // longest AS INTEGER)) END AS out_w,
       |  CASE WHEN longest <= $resizeMax THEN height
       |       ELSE greatest(1, CAST(height * $resizeMax // longest AS INTEGER)) END AS out_h
       |  FROM m)""".stripMargin

  val mmResizeSql: String =
    s"""WITH $resizedSqlCtes
       |SELECT doc_id, width, height, out_w, out_h FROM rsz""".stripMargin

  // ---- feature extraction --------------------------------------------------

  final case class Feature(doc_id: Long, hist: Array[Long])

  val featBins = 8

  /** Feature-extract stage: a fixed-length vector per payload (here an
    * 8-bin byte histogram, bin = byte >> 5 — a real pipeline emits CNN/CLIP
    * embeddings from the decoded media). One output row per input row,
    * vector column typed `array<bigint>`; single pass over the bytes per
    * payload inside the same batched loop. */
  /** Library API: histogram kept array-typed. */
  def mmFeaturesVec(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { p =>
          val h = new Array[Long](featBins)
          p.payload.foreach(b => h((b & 0xff) >> 5) += 1L)
          Feature(p.doc_id, h)
        })
      }
      .toDF()
  }

  /** Query output serializes the vector ('|'-joined) — the driver's pandas
    * compare cannot hash array cells; callers wanting vectors use
    * [[mmFeaturesVec]]. */
  def mmFeatures(spark: SparkSession, sfDir: String): DataFrame =
    mmFeaturesVec(spark, sfDir)
      .select(col("doc_id"),
        array_join(col("hist").cast("array<string>"), "|").as("hist"))

  val mmFeaturesSql: String = {
    val bins = (0 until featBins)
      .map(j => s"CAST(sum(CASE WHEN ascii(ch) >> 5 = $j THEN 1 ELSE 0 END) AS BIGINT)")
      .mkString(", ")
    s"""SELECT doc_id, array_to_string([$bins], '|') AS hist
       |FROM (SELECT doc_id, unnest(split(text, '')) AS ch FROM documents)
       |GROUP BY doc_id""".stripMargin
  }

  // ---- cross-modal pair scoring (CLIP-filter analog) -----------------------

  final case class TextFeat(doc_id: Long, t: Array[Double])

  val pairBins = 64
  val pairThreshold = 0.05

  /** LAION-style pair filtering: score every (caption, image-embedding)
    * pair and gate on the score. The caption tower runs through the same
    * batched decode loop (a 64-bin byte histogram standing in for a text
    * encoder — swap the loop body for a real model); the image tower is the
    * `embeddings` table, joined 1:1 on id. An equi-join on the pair key —
    * co-partitionable at 100 TB, broadcast when one tower is small. Output
    * keeps EVERY pair with score + verdict (tx_filter's gate pattern) so
    * mixture planning downstream sees pass rates, not just survivors. */
  def mmPair(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val txt = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { p =>
          val h = new Array[Double](pairBins)
          // skip non-ASCII bytes: every byte of a multi-byte UTF-8 char is
          // >= 0x80, and the oracle's per-CHARACTER codepoint bins drop
          // those same chars (bin >= 64 misses the range join) — skipping
          // here keeps the two engines byte-for-char consistent
          p.payload.foreach(b => if ((b & 0xff) < 0x80) h((b & 0xff) >> 1) += 1.0)
          TextFeat(p.doc_id, h)
        })
      }
      .toDF()
    val img = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val nrm = sqrt(graft.plans.VectorDot(col("t"), col("t"))) *
      sqrt(graft.plans.VectorDot(col("v"), col("v")))
    // zero-norm guard: an empty/all-multibyte caption (or zero embedding)
    // has no direction — score null, gated 'drop', never a NULL-vs-NaN
    // engine divergence
    val cos = when(nrm > 0, round(graft.plans.VectorDot(col("t"), col("v")) / nrm, 6))
    txt.join(img, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("label"), cos.as("clip_score"))
      .withColumn("verdict",
        when(col("clip_score").isNotNull && col("clip_score") >= pairThreshold,
          "keep").otherwise("drop"))
  }

  val mmPairSql: String = {
    import graft.functions.Portable
    s"""WITH ch AS (
       |  -- length guard: split('','') is [''] and ascii('') is 0, which
       |  -- would hand an empty caption a phantom bin-0 count that the
       |  -- Spark byte path (correctly) never sees
       |  SELECT doc_id, ascii(unnest(split(text, ''))) // 2 AS bin
       |  FROM documents WHERE length(text) > 0),
       |cnt AS (
       |  SELECT doc_id, bin, CAST(count(*) AS DOUBLE) AS c
       |  FROM ch GROUP BY 1, 2),
       |hist AS (
       |  SELECT d.doc_id, list(coalesce(c.c, 0.0) ORDER BY r.bin) AS t
       |  FROM documents d CROSS JOIN range(0, $pairBins) r(bin)
       |  LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.bin = r.bin
       |  GROUP BY 1),
       |e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings),
       |scored AS (
       |  SELECT h.doc_id, e.label,
       |    CASE WHEN sqrt(list_sum(list_transform(t, x -> x * x))) *
       |              sqrt(list_sum(list_transform(v, x -> x * x))) > 0
       |         THEN round(${Portable.cosineSql("t", "v")}, 6) END AS clip_score
       |  FROM hist h JOIN e ON e.vec_id = h.doc_id)
       |SELECT doc_id, label, clip_score,
       |  CASE WHEN clip_score IS NOT NULL AND clip_score >= $pairThreshold
       |       THEN 'keep' ELSE 'drop' END AS verdict
       |FROM scored""".stripMargin
  }

  // ---- perceptual-hash near-dup (pHash/dHash over decoded media) -----------

  final case class PHash(doc_id: Long, phash: Long)

  val phashBits = 64
  val phashWindow = 4
  val phashBandBits = 16
  val phashBands = 4 // 64 bits / 16-bit bands; hamming ≤ 3 ⇒ ≥1 band clean
  val phashMaxHamming = 3
  val phashSalt = "mp"

  /** Perceptual signature per payload: SimHash over the DISTINCT hashes of
    * all `phashWindow`-byte sliding windows of the raw payload. Byte-window
    * features make the signature shift-invariant (an insertion perturbs
    * only the windows it touches, unlike positional sampling) yet
    * content-discriminative (unlike global byte statistics — a byte
    * HISTOGRAM gradient put ~99% of this corpus within hamming 3 of each
    * other, and positional dHash put 0%; the window-simhash form lands the
    * informative middle). This is the byte-stream analog of pHash's DCT
    * bits: with a real codec the features become decoded-pixel blocks;
    * here the decode is the documented stub, so windows run over the raw
    * bytes. Works on any binary modality — no tokenization assumed.
    * (Oracle parity note: DuckDB windows over CHARACTERS — byte = char on
    * this corpus, the same equivalence mm_framesample's oracle relies on.)
    * Computed in the same batched decode loop as [[mmMeta]]; payloads
    * shorter than one window have no features and are filtered out
    * (mirroring the oracle's absent groups — dd_simhash's zero-word rule). */
  def mmPhashSigs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val saltBytes = phashSalt.getBytes("UTF-8")
    Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(length(col("payload")) >= phashWindow)
      .as[Payload]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(64).flatMap(_.map { p =>
          val n = p.payload.length
          val seen = new java.util.HashSet[java.lang.Long]()
          val votes = new Array[Int](phashBits)
          var i = 0
          while (i <= n - phashWindow) {
            md.reset()
            md.update(saltBytes)
            md.update(p.payload, i, phashWindow)
            val d = md.digest()
            // the engine's portable 60-bit hash: first 15 md5 hex digits =
            // the top 60 bits of the first 8 digest bytes
            var h = 0L
            var j = 0
            while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
            h = h >>> 4
            if (seen.add(h)) {
              var b = 0
              while (b < phashBits) {
                votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
                b += 1
              }
            }
            i += 1
          }
          var sig = 0L
          var b = 0
          while (b < phashBits) {
            if (votes(b) > 0) sig |= (1L << b)
            b += 1
          }
          PHash(p.doc_id, sig)
        })
      }
      .toDF()
  }

  /** Perceptual near-dup pairs: hamming ≤ 3 over the 64-bit signature via
    * the shared banded-hamming equi-join
    * ([[graft.functions.Banding.hammingPairs]], dd_simhash's machinery —
    * here with no blocking key: modality is stub-derived and
    * length-unstable, so near-identical payloads must stay pairable). */
  def mmPhash(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.Banding.hammingPairs(
      mmPhashSigs(spark, sfDir), "phash", "doc_id", Nil,
      phashBands, phashBandBits, phashMaxHamming)

  val mmPhashSql: String = {
    // unrolled votes + signature sum (simhashSql's shape); bit 63's literal
    // is min-long, but the 60-bit hash never votes it set, so the sum stays
    // in int64 range
    val votes = (0 until phashBits).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(",\n    ")
    val sig = (0 until phashBits).map(j =>
      s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH kg AS (
       |  SELECT DISTINCT doc_id,
       |    CAST('0x' || substr(md5('$phashSalt' || substr(text, CAST(i AS INTEGER), $phashWindow)), 1, 15) AS BIGINT) AS h
       |  FROM documents, LATERAL unnest(range(1, length(text) - ${phashWindow - 2})) t(i)),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM kg GROUP BY 1),
       |sigs AS (SELECT doc_id, CAST($sig AS BIGINT) AS phash FROM votes)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  bit_count(xor(a.phash, b.phash)) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $phashMaxHamming""".stripMargin
  }

  // ---- GPU batch packing ---------------------------------------------------

  val pixelBudget = 16384L
  // 256 (not a round 1000) so even the 500-doc spec corpus spans two
  // shards — the shard-boundary behavior is exercised by every tier of
  // testing, not only at bench scale
  val packShardDocs = 256L

  /** Batch packing for the accelerator: resized items pack per MODALITY
    * (an image batch can't absorb audio) into fixed pixel budgets — the
    * vision twin of tx_pack's token budgets. Same shape: per-shard window
    * cumsum, integer bin id from the item's START offset (an item never
    * splits; a batch may overhang by at most one item). The shard key is
    * (fmt, doc_id-range): bare fmt has only a handful of values, which
    * would funnel every image through ONE ordered-cumsum task at 100 TB —
    * the `packShardDocs` range bound caps any window partition at a fixed
    * row count, and batches never need to cross an input range (a real
    * packer works per input split anyway). */
  def mmBatchPack(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("fmt"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    resized(spark, sfDir)
      .select(col("doc_id"), col("fmt"),
        expr(s"doc_id DIV $packShardDocs").as("shard"),
        (col("out_w") * col("out_h")).cast("long").as("px"))
      .withColumn("cum", sum(col("px")).over(w))
      .groupBy(col("fmt"), col("shard"),
        expr(s"(cum - px) DIV $pixelBudget").as("batch"))
      .agg(count(lit(1)).as("n_items"), min(col("doc_id")).as("first_doc_id"),
        sum(col("px")).as("total_px"))
  }

  val mmBatchPackSql: String =
    s"""WITH $resizedSqlCtes,
       |c AS (SELECT doc_id, fmt, doc_id // $packShardDocs AS shard,
       |  CAST(out_w * out_h AS BIGINT) AS px,
       |  sum(CAST(out_w * out_h AS BIGINT)) OVER (
       |    PARTITION BY fmt, doc_id // $packShardDocs
       |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM rsz)
       |SELECT fmt, shard, CAST((cum - px) // $pixelBudget AS BIGINT) AS batch,
       |  count(*) AS n_items, min(doc_id) AS first_doc_id,
       |  CAST(sum(px) AS BIGINT) AS total_px
       |FROM c GROUP BY 1, 2, 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _),
    "mm_framesample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _),
    "mm_features" -> (mmFeatures _),
    "mm_pair" -> (mmPair _),
    "mm_phash" -> (mmPhash _),
    "mm_batchpack" -> (mmBatchPack _))

  def oracleSql: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_framesample" -> mmFrameSampleSql,
    "mm_resize" -> mmResizeSql,
    "mm_features" -> mmFeaturesSql,
    "mm_pair" -> mmPairSql,
    "mm_phash" -> mmPhashSql,
    "mm_batchpack" -> mmBatchPackSql)
}
