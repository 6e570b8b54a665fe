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
  * standing in for Arrow record batches), and a REAL image decode —
  * `javax.imageio` ships in every JDK, so no external codec is needed. The
  * testdata carries no media column, so each document's media payload is a
  * deterministic real BMP synthesized from (doc_id, text) by [[imageFor]];
  * [[decodeImage]] then decodes it with ImageIO and downstream operators
  * consume the DECODED width/height/format/pixels. The oracle predicts the
  * decoded values because a correct decode returns exactly what was
  * encoded — including a full pixel checksum, so a decoder that parsed
  * only the header would fail the row.
  */
object Multimodal {

  final case class Payload(doc_id: Long, payload: Array[Byte])
  final case class Meta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      fmt: String, pixel_sum: Long)

  // Synthesized image dimensions, derived from doc_id: w in [12,95], h in
  // [8,47] — max dimension exceeds resizeMax so the resize stage does real
  // work, and w*h stays small enough that per-pixel ops are cheap at bench
  // scale. The SAME formulas appear in `dimsSqlCte` for the oracle.
  private[graft] def dimsFor(docId: Long): (Int, Int) =
    ((12 + docId % 84).toInt, (8 + (docId / 5) % 40).toInt)

  /** A real 24-bpp uncompressed BMP (BITMAPINFOHEADER): grayscale pixels
    * cycled from the document's text bytes in row-major top-down order —
    * pixel (x,y) = text[(y*w + x) mod len]. Deterministic in (doc_id,
    * text), so every decoded property is oracle-predictable. */
  private[graft] def imageFor(docId: Long, text: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(docId)
    val gray = new Array[Byte](w * h)
    if (text.nonEmpty) {
      var p = 0
      while (p < gray.length) { gray(p) = text(p % text.length); p += 1 }
    }
    encodeBmp(w, h, gray)
  }

  private[graft] def encodeBmp(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, "gray buffer must be w*h")
    val rowSize = (w * 3 + 3) & ~3 // rows pad to 4-byte multiples
    val imgSize = rowSize * h
    val fileSize = 54 + imgSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = 0
    while (r < h) {
      val y = h - 1 - r // positive-height BMP stores rows bottom-up
      var x = 0
      while (x < w) {
        val v = gray(y * w + x)
        b.put(v).put(v).put(v) // BGR; grayscale so all channels equal
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      r += 1
    }
    b.array()
  }

  final case class Decoded(width: Int, height: Int, fmt: String, gray: Array[Byte])

  /** Header-only decode: dimensions + detected format from the ImageIO
    * reader WITHOUT reading the raster — all a resize planner needs. Keeps
    * the resize/batch-pack stages on a real decode while skipping the
    * per-pixel work that only [[mmMeta]]'s checksum requires. */
  private[graft] def decodeDims(payload: Array[Byte]): (Int, Int, String) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new java.io.IOException(s"no ImageIO reader for payload (${payload.length} bytes)")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        (reader.getWidth(0), reader.getHeight(0),
          reader.getFormatName.toLowerCase(java.util.Locale.ROOT))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** REAL decode via `javax.imageio`: format detected from the bytes (not
    * assumed), full raster read, gray = channel-0 samples in row-major
    * top-down order. Works for any ImageIO-readable format (BMP/PNG/GIF/
    * JPEG); the pipeline synthesizes BMP because its byte size is
    * closed-form for the oracle. */
  private[graft] def decodeImage(payload: Array[Byte]): Decoded = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new java.io.IOException(s"no ImageIO reader for payload (${payload.length} bytes)")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val img = reader.read(0)
        val w = img.getWidth
        val h = img.getHeight
        val samples = img.getRaster.getSamples(0, 0, w, h, 0, null: Array[Int])
        val gray = new Array[Byte](w * h)
        var i = 0
        while (i < gray.length) { gray(i) = samples(i).toByte; i += 1 }
        Decoded(w, h, fmt, gray)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** r9 OPT (guide §2.6/§6): the payload source for every decode pass.
    * This corpus packs into ONE parquet split (well under
    * maxPartitionBytes), so each decode `mapPartitions` — the most
    * CPU-bound work in the suite (per-window MD5s, codec loops) — ran as a
    * single task. Spread the scan over the session parallelism ONLY when
    * it is narrower (hash on doc_id: deterministic, no round-robin
    * pre-sort); at 100 TB the scan already has thousands of splits and
    * this is a no-op — no payload shuffle is ever added at scale. */
  private def payloadFrame(spark: SparkSession, sfDir: String): DataFrame =
    spreadPayloads(Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text").cast("binary").as("payload")))

  private[graft] def spreadPayloads(p: DataFrame): DataFrame = {
    val cores = p.sparkSession.sparkContext.defaultParallelism
    // r10 fix (r9 ADVICE): `p.rdd` materialized the RDD lineage on every
    // decode-path BUILD just to read the scan's partition count. The count
    // is a pure function of the (immutable) plan, so memoize it per
    // (session, semantic plan) beside the read-plan cache.
    val parts = graft.Tables.sessionMemo(
      p.sparkSession, s"spread:${p.queryExecution.logical.semanticHash()}") {
      Integer.valueOf(p.rdd.getNumPartitions)
    }.intValue()
    if (parts < cores) p.repartition(cores, col("doc_id")) else p
  }

  def mmMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    payloadFrame(spark, sfDir)
      .as[Payload]
      .mapPartitions { it =>
        // batched decode loop — the Arrow-batch shape a real codec needs
        it.grouped(64).flatMap(_.map { p =>
          val media = imageFor(p.doc_id, p.payload)
          val d = decodeImage(media)
          var s = 0L
          d.gray.foreach(g => s += (g & 0xff))
          Meta(p.doc_id, media.length.toLong, d.width, d.height, d.fmt, s)
        })
      }
      .toDF()
  }

  /** The synthesized dimensions — the single SQL source of the w/h formulas
    * (mirrors [[dimsFor]]); every mm oracle builds on this CTE. */
  private val dimsSqlCte: String =
    """dims AS (
      |  SELECT doc_id, text,
      |    12 + doc_id % 84 AS w,
      |    8 + (doc_id // 5) % 40 AS h
      |  FROM documents)""".stripMargin

  /** Expected decode output: BMP size is closed-form (54-byte headers +
    * 4-byte-padded BGR rows); pixel_sum replays the pixel-cycling rule over
    * the text — a header-only "decode" cannot produce it. An empty text
    * leaves the raster all-zero (pixel_sum 0); `p % length('')` is NULL in
    * SQL, so the sum coalesces to 0 to match the engine. */
  val mmMetaSql: String =
    s"""WITH $dimsSqlCte,
       |px AS (
       |  SELECT doc_id,
       |    CAST(coalesce(sum(ascii(substr(text, CAST(p % length(text) AS INTEGER) + 1, 1))), 0) AS BIGINT) AS pixel_sum
       |  FROM dims, LATERAL unnest(range(0, w * h)) t(p)
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(54 + h * ((w * 3 + 3) // 4 * 4) AS BIGINT) AS n_bytes,
       |  CAST(w AS INTEGER) AS width,
       |  CAST(h AS INTEGER) AS height,
       |  'bmp' AS fmt,
       |  px.pixel_sum
       |FROM dims d JOIN px ON px.doc_id = d.doc_id""".stripMargin

  // ---- audio decode + signal features --------------------------------------

  final case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Int,
      n_samples: Long, abs_sum: Long, peak: Int, zero_cross: Long)

  /** Synthesized-audio shape: mono 16-bit PCM at 8 kHz, 512–1280 samples
    * derived from doc_id, sample i = (text_byte(i mod len) − 96) · 128 —
    * word characters land positive, spaces negative, so zero crossings
    * track word boundaries. The SAME formulas appear in [[mmAudioSql]]. */
  val audioRate = 8000
  private[graft] def audioLenFor(docId: Long): Int = 512 + (docId % 7).toInt * 128

  private[graft] def audioSamplesFor(docId: Long, text: Array[Byte]): Array[Short] = {
    val n = audioLenFor(docId)
    val out = new Array[Short](n)
    if (text.nonEmpty) {
      var i = 0
      while (i < n) {
        out(i) = (((text(i % text.length) & 0xff) - 96) * 128).toShort
        i += 1
      }
    }
    out
  }

  /** A real RIFF/WAVE container (44-byte canonical header + LE PCM16). */
  private[graft] def encodeWav(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataSize)
    samples.foreach(s => b.putShort(s))
    b.array()
  }

  /** REAL decode via `javax.sound.sampled` (ships in every JDK, like
    * ImageIO): container format detected from the bytes, PCM frames read
    * through the `AudioInputStream`, samples re-assembled per the format's
    * declared endianness — a header-only parse cannot produce the sample
    * stream the feature pass consumes. */
  private[graft] def decodeWav(payload: Array[Byte]): (Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"expected mono PCM16, got $fmt")
      val bytes = ais.readAllBytes()
      val out = new Array[Short](bytes.length / 2)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort; i += 1 }
      (fmt.getSampleRate.toInt, out)
    } finally ais.close()
  }

  /** Audio decode + signal features — the audio leg of the multimodal
    * pipeline: per doc, synthesize the WAV payload, REALLY decode it, and
    * compute the waveform statistics an audio-curation pass gates on
    * (energy, peak, zero-crossing rate — the classic cheap VAD features).
    * Same batched `mapPartitions` shape as [[mmMeta]]; all features are
    * integer-exact so the oracle replays them from the generation rule. */
  def mmAudio(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    payloadFrame(spark, sfDir)
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { p =>
          val wav = encodeWav(audioSamplesFor(p.doc_id, p.payload), audioRate)
          val (rate, s) = decodeWav(wav)
          var absSum = 0L
          var peak = 0
          var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            val a = math.abs(v)
            absSum += a
            if (a > peak) peak = a
            if (i > 0 && s(i - 1).toInt * v < 0) zc += 1
            i += 1
          }
          AudioMeta(p.doc_id, wav.length.toLong, rate, s.length.toLong,
            absSum, peak, zc)
        })
      }
      .toDF()
  }

  /** Expected decode output: WAV size is closed-form (44 + 2n), features
    * replay the sample rule; `pv * v < 0` is the same strict sign test. */
  val mmAudioSql: String =
    s"""WITH au AS (
       |  SELECT doc_id, text, 512 + (doc_id % 7) * 128 AS n FROM documents),
       |s AS (
       |  SELECT doc_id, i,
       |    (ascii(substr(text, CAST(i % length(text) AS INTEGER) + 1, 1)) - 96) * 128 AS v
       |  FROM au, LATERAL unnest(range(0, n)) t(i)),
       |z AS (SELECT doc_id, v,
       |        lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s),
       |agg AS (
       |  SELECT doc_id, CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
       |    CAST(max(abs(v)) AS INTEGER) AS peak,
       |    CAST(coalesce(sum(CASE WHEN pv * v < 0 THEN 1 END), 0) AS BIGINT) AS zero_cross
       |  FROM z GROUP BY 1)
       |SELECT a.doc_id, CAST(44 + 2 * n AS BIGINT) AS n_bytes,
       |  $audioRate AS sample_rate, CAST(n AS BIGINT) AS n_samples,
       |  agg.abs_sum, agg.peak, agg.zero_cross
       |FROM au a JOIN agg ON agg.doc_id = a.doc_id""".stripMargin

  final case class ResizedImg(doc_id: Long, out_w: Int, out_h: Int,
      px_sum: Long, px_max: Int)

  /** Resize EXECUTION — [[mmResize]] plans the target box; this row runs
    * the resize on the really-decoded raster: integer nearest-neighbor
    * (source pixel (dx·w DIV out_w, dy·h DIV out_h) — the deterministic
    * kernel; production swaps in area/Lanczos, same plumbing) and emits
    * integer features of the RESIZED raster, so a header-only decode or a
    * planner-only "resize" cannot produce the row. Same batched
    * `mapPartitions` decode shape as [[mmMeta]]; the fit-into-box math is
    * shared with the planner (same `resizeMax` rule), so plan and
    * execution cannot drift. Oracle replays decode + NN mapping from the
    * generation rule — integer-exact. */
  def mmResizeExec(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    payloadFrame(spark, sfDir)
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { p =>
          val d = decodeImage(imageFor(p.doc_id, p.payload))
          val longest = math.max(d.width, d.height)
          val (ow, oh) =
            if (longest <= resizeMax) (d.width, d.height)
            else (math.max(1, d.width * resizeMax / longest),
              math.max(1, d.height * resizeMax / longest))
          var sum = 0L
          var mx = 0
          var dy = 0
          while (dy < oh) {
            val sy = dy * d.height / oh
            var dx = 0
            while (dx < ow) {
              val sx = dx * d.width / ow
              val v = d.gray(sy * d.width + sx) & 0xff
              sum += v
              if (v > mx) mx = v
              dx += 1
            }
            dy += 1
          }
          ResizedImg(p.doc_id, ow, oh, sum, mx)
        })
      }
      .toDF()
  }

  /** Replays the pixel-cycling rule through the same NN mapping; the `m`/
    * `rsz` chain is [[metaChainCtes]] verbatim so plan and execution share
    * one fit rule. */
  // def, not val: metaChainCtes initializes later in this object
  def mmResizeExecSql: String =
    s"""WITH $dimsSqlCte,
       |$metaChainCtes,
       |px AS (
       |  SELECT r.doc_id,
       |    CAST(coalesce(sum(ascii(substr(d.text,
       |      CAST((((p // out_w) * height // out_h) * width
       |            + ((p % out_w) * width // out_w)) % length(d.text) AS INTEGER) + 1, 1))), 0)
       |      AS BIGINT) AS px_sum,
       |    CAST(coalesce(max(ascii(substr(d.text,
       |      CAST((((p // out_w) * height // out_h) * width
       |            + ((p % out_w) * width // out_w)) % length(d.text) AS INTEGER) + 1, 1))), 0)
       |      AS INTEGER) AS px_max
       |  FROM rsz r JOIN dims d ON d.doc_id = r.doc_id,
       |    LATERAL unnest(range(0, CAST(out_w AS BIGINT) * out_h)) t(p)
       |  GROUP BY r.doc_id)
       |SELECT r.doc_id, CAST(out_w AS INTEGER) AS out_w,
       |  CAST(out_h AS INTEGER) AS out_h, px.px_sum, px.px_max
       |FROM rsz r JOIN px ON px.doc_id = r.doc_id""".stripMargin

  // ---- audio fingerprint dedup ---------------------------------------------

  final case class AudioFp(doc_id: Long, fp: Long)

  /** Fingerprint windows per clip (n is always divisible by 16: 512 and the
    * 128 step share the factor). */
  val audioFpWindows = 16

  /** Audio-fingerprint dedup — the audio leg of the near-dup family
    * ([[mmPhash]] is the image leg): per clip, REALLY decode the WAV and
    * compute a Chromaprint-style fingerprint (the energy-delta bit vector:
    * bit w = 1 iff window w+1 carries more |amplitude| mass than window w —
    * the same "compare adjacent band energies" construction Chromaprint/
    * Shazam-family fingerprints quantize), then resolve duplicates by
    * EXACT fingerprint lookup, which is precisely the industrial first
    * stage (hash the fp, bucket-join, verify). Ownership output (every
    * clip → its group's min doc_id), the st_minhash_dedup shape — O(n)
    * rows on any corpus, no pair list, so the operator stays linear even
    * on a fully-replicated 100 TB audio set.
    * Scale shape: decode + fingerprint are batched per-partition column
    * math (zero shuffle); the ownership pass is ONE hash exchange on fp.
    * The oracle replays decode + windows + bits from the generation rule —
    * integer-exact end to end. */
  def mmAudioFp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fps = payloadFrame(spark, sfDir)
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { p =>
          val wav = encodeWav(audioSamplesFor(p.doc_id, p.payload), audioRate)
          val (_, s) = decodeWav(wav)
          val step = s.length / audioFpWindows
          val energy = new Array[Long](audioFpWindows)
          var i = 0
          while (i < s.length) {
            energy(i / step) += math.abs(s(i).toInt)
            i += 1
          }
          var fp = 0L
          var w = 0
          while (w < audioFpWindows - 1) {
            if (energy(w + 1) > energy(w)) fp |= 1L << w
            w += 1
          }
          AudioFp(p.doc_id, fp)
        })
      }
      .toDF()
    val w = Window.partitionBy(col("fp"))
    fps
      .withColumn("owner_doc", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("fp"), col("owner_doc"),
        (col("doc_id") =!= col("owner_doc")).as("is_dup"))
  }

  /** Replays the sample rule → window |amplitude| mass → delta bits. */
  val mmAudioFpSql: String =
    s"""WITH au AS (
       |  SELECT doc_id, text, 512 + (doc_id % 7) * 128 AS n FROM documents),
       |s AS (
       |  SELECT doc_id, i, i // (n // $audioFpWindows) AS wnd,
       |    abs((ascii(substr(text, CAST(i % length(text) AS INTEGER) + 1, 1)) - 96) * 128) AS a
       |  FROM au, LATERAL unnest(range(0, n)) t(i)),
       |e AS (SELECT doc_id, wnd, sum(a) AS energy FROM s GROUP BY 1, 2),
       |b AS (SELECT doc_id, wnd,
       |        CASE WHEN lead(energy) OVER (PARTITION BY doc_id ORDER BY wnd) > energy
       |          THEN 1 ELSE 0 END AS bit
       |      FROM e),
       |fp AS (SELECT doc_id,
       |        CAST(sum(bit * (1 << CAST(wnd AS INTEGER))) AS BIGINT) AS fp
       |       FROM b WHERE wnd < ${audioFpWindows - 1} GROUP BY 1)
       |SELECT doc_id, fp,
       |  min(doc_id) OVER (PARTITION BY fp) AS owner_doc,
       |  doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
       |FROM fp""".stripMargin

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
    payloadFrame(spark, sfDir)
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

  // ---- shot-boundary detection ---------------------------------------------

  final case class Shot(doc_id: Long, shot_idx: Long, start_frame: Long, n_frames: Long)

  /** Energy-delta threshold: adjacent frames whose byte-energy differs by
    * more than this open a new shot. */
  val shotThresh = 120

  /** Video shot segmentation — the temporal-structure pass every video
    * curation pipeline runs before sampling clips (train on shots, not on
    * arbitrary windows that straddle a cut): frames are scored by a cheap
    * energy feature, a boundary opens where adjacent-frame energy jumps by
    * more than [[shotThresh]] (the classic pixel-difference shot detector,
    * with the codec's luma histogram stood in by the deterministic byte
    * energy so the oracle can replay it). Same batched `mapPartitions` shape
    * as [[mmFrameSample]] — per-doc sequential scan inside the batch loop,
    * shots emitted as (start_frame, n_frames) segments. */
  def mmVideoShots(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    payloadFrame(spark, sfDir)
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.flatMap { p =>
          val nFrames = (p.payload.length + frameBytes - 1) / frameBytes
          val e = new Array[Long](nFrames)
          var i = 0
          while (i < p.payload.length) { e(i / frameBytes) += p.payload(i) & 0xffL; i += 1 }
          val out = scala.collection.mutable.ArrayBuffer.empty[Shot]
          var shotStart = 0
          var fi = 1
          while (fi <= nFrames) {
            if (fi == nFrames || math.abs(e(fi) - e(fi - 1)) > shotThresh) {
              out += Shot(p.doc_id, out.size.toLong, shotStart.toLong, (fi - shotStart).toLong)
              shotStart = fi
            }
            fi += 1
          }
          out
        })
      }
      .toDF()
  }

  /** Byte-energy replay: per-char unnest → frame sums → lag delta →
    * boundary cumsum → segment agg. */
  val mmVideoShotsSql: String =
    s"""WITH c AS (
       |  SELECT doc_id, i // $frameBytes AS fi,
       |    ascii(substr(text, CAST(i + 1 AS INTEGER), 1)) AS b
       |  FROM documents, LATERAL unnest(range(0, length(text))) t(i)),
       |e AS (SELECT doc_id, fi, sum(b) AS e FROM c GROUP BY 1, 2),
       |d AS (SELECT doc_id, fi, e,
       |        lag(e) OVER (PARTITION BY doc_id ORDER BY fi) AS pe FROM e),
       |b AS (SELECT doc_id, fi,
       |        CASE WHEN pe IS NOT NULL AND abs(e - pe) > $shotThresh
       |             THEN 1 ELSE 0 END AS brk FROM d),
       |s AS (SELECT doc_id, fi,
       |        sum(brk) OVER (PARTITION BY doc_id ORDER BY fi
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot_idx
       |      FROM b)
       |SELECT doc_id, CAST(shot_idx AS BIGINT) AS shot_idx,
       |  CAST(min(fi) AS BIGINT) AS start_frame, count(*) AS n_frames
       |FROM s GROUP BY doc_id, shot_idx""".stripMargin

  // ---- resize planning -----------------------------------------------------

  val resizeMax = 64

  /** Resize stage: fit the DECODED dimensions (a real ImageIO header read,
    * [[decodeDims]] — no raster materialization, which only mm_meta's
    * checksum needs) into a `resizeMax` box preserving aspect ratio.
    * All-integer math ((d·max) DIV longest side) so the plan is exact on
    * both engines — the actual pixel resample belongs to the codec stage;
    * this op is the dimension planning every image pipeline runs before
    * batching GPU work. Carries `fmt` for the batch packer; the `mm_resize`
    * query drops it (stable output schema). */
  private def resized(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    payloadFrame(spark, sfDir)
      .as[Payload]
      .mapPartitions { it =>
        it.grouped(64).flatMap(_.map { p =>
          val (w, h, fmt) = decodeDims(imageFor(p.doc_id, p.payload))
          (p.doc_id, w, h, fmt)
        })
      }
      .toDF("doc_id", "width", "height", "fmt")
      .withColumn("longest", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("fmt"), col("width"), col("height"),
        when(col("longest") <= resizeMax, col("width"))
          .otherwise(greatest(lit(1),
            expr(s"CAST(width * $resizeMax DIV longest AS INT)"))).as("out_w"),
        when(col("longest") <= resizeMax, col("height"))
          .otherwise(greatest(lit(1),
            expr(s"CAST(height * $resizeMax DIV longest AS INT)"))).as("out_h"))
  }

  def mmResize(spark: SparkSession, sfDir: String): DataFrame =
    resized(spark, sfDir).drop("fmt")

  /** Shared resize CTE chain (`dims`→`meta`→`m`→`rsz`), the single SQL
    * source of the fit-into-box math — mm_resize and mm_batchpack must pack
    * from the SAME dimensions or a drift between two copies would pass
    * mm_resize's oracle while packing different batches. (Builds on
    * `dimsSqlCte` directly: resize needs only width/height/fmt, not the
    * pixel checksum.) */
  /** meta→m→rsz chain WITHOUT the dims prefix, so compositions that
    * already declare `dims` (pipe_mm) reuse the identical fit-into-box
    * math instead of a second copy. */
  private val metaChainCtes: String =
    s"""meta AS (SELECT doc_id, CAST(w AS INTEGER) AS width,
       |  CAST(h AS INTEGER) AS height, 'bmp' AS fmt FROM dims),
       |m AS (SELECT *, greatest(width, height) AS longest FROM meta),
       |rsz AS (SELECT doc_id, fmt, width, height,
       |  CASE WHEN longest <= $resizeMax THEN width
       |       ELSE greatest(1, CAST(width * $resizeMax // longest AS INTEGER)) END AS out_w,
       |  CASE WHEN longest <= $resizeMax THEN height
       |       ELSE greatest(1, CAST(height * $resizeMax // longest AS INTEGER)) END AS out_h
       |  FROM m)""".stripMargin

  private val resizedSqlCtes: String =
    s"""$dimsSqlCte,
       |$metaChainCtes""".stripMargin

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
    payloadFrame(spark, sfDir)
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
    val txt = payloadFrame(spark, sfDir)
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

  /** ch→cnt→hist→e→scored chain (no WITH), reused verbatim by pipe_mm so
    * the gate score can never drift between the standalone and composed
    * forms. */
  private val pairChainCtes: String = {
    import graft.functions.Portable
    s"""ch AS (
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
       |  FROM hist h JOIN e ON e.vec_id = h.doc_id)""".stripMargin
  }

  val mmPairSql: String =
    s"""WITH $pairChainCtes
       |SELECT doc_id, label, clip_score,
       |  CASE WHEN clip_score IS NOT NULL AND clip_score >= $pairThreshold
       |       THEN 'keep' ELSE 'drop' END AS verdict
       |FROM scored""".stripMargin

  // ---- perceptual-hash near-dup (pHash/dHash over decoded media) -----------

  final case class PHash(doc_id: Long, phash: Long)

  val phashBits = 64
  val phashWindow = 4
  val phashBandBits = 16
  val phashBands = 4 // 64 bits / 16-bit bands; hamming ≤ 3 ⇒ ≥1 band clean
  val phashMaxHamming = 3
  val phashSalt = "mp"

  /** Perceptual signature per payload: SimHash over the DISTINCT hashes of
    * all `phashWindow`-pixel sliding windows of the DECODED raster — the
    * media payload is a real BMP ([[imageFor]]) and the features run over
    * [[decodeImage]]'s gray pixels, the real-codec form of pHash's
    * DCT-over-decoded-pixels (not raw container bytes, which would hash
    * compression artifacts). Pixel-window features make the signature
    * shift-invariant (an insertion perturbs only the windows it touches,
    * unlike positional sampling) yet content-discriminative (unlike global
    * statistics — a byte HISTOGRAM gradient put ~99% of this corpus within
    * hamming 3 of each other, and positional dHash put 0%; the
    * window-simhash form lands the informative middle).
    * (Oracle parity: the decoded pixel stream IS the text cycled to w·h
    * chars — `substr(repeat(text,…),1,w*h)` — so DuckDB replays the same
    * windows; byte = char on this ASCII corpus.)
    * Computed in the same batched decode loop as [[mmMeta]]; payloads
    * decoding to fewer than one window of pixels are filtered out
    * (mirroring the oracle's absent groups — dd_simhash's zero-word rule;
    * min dims 12×8 means none are on this corpus). */
  def mmPhashSigs(spark: SparkSession, sfDir: String): DataFrame =
    phashSigsFrom(
      Tables(spark, sfDir).documents
        .select(col("doc_id"), col("text").cast("binary").as("payload")))
    // (spread applied inside phashSigsFrom — shared with pipe_mm's
    // restricted-survivor call path)

  /** The signature pass over an arbitrary payload frame — a typed
    * `mapPartitions` is a boundary Catalyst cannot push a join below, so a
    * caller that wants to decode ONLY a survivor subset (pipe_mm) must
    * stage the restriction in front; this factoring makes that the same
    * code path as the full-corpus form. */
  private def phashSigsFrom(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val saltBytes = phashSalt.getBytes("UTF-8")
    spreadPayloads(payloads.filter(length(col("payload")) > 0))
      .as[Payload]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(64).flatMap(_.flatMap { p =>
          val px = decodeImage(imageFor(p.doc_id, p.payload)).gray
          if (px.length < phashWindow) None
          else Some {
          val n = px.length
          val seen = new java.util.HashSet[java.lang.Long]()
          val votes = new Array[Int](phashBits)
          var i = 0
          while (i <= n - phashWindow) {
            md.reset()
            md.update(saltBytes)
            md.update(px, i, phashWindow)
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
          }
        })
      }
      .toDF()
  }

  /** Perceptual near-dup pairs: hamming ≤ 3 over the 64-bit signature via
    * the shared banded-hamming equi-join
    * ([[graft.functions.Banding.hammingPairs]], dd_simhash's machinery —
    * here with no blocking key: near-identical images can differ in
    * container size or format, so pairs must not be blocked on either). */
  def mmPhash(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.Banding.hammingPairs(
      mmPhashSigs(spark, sfDir), "phash", "doc_id", Nil,
      phashBands, phashBandBits, phashMaxHamming)

  /** ps→kg→votes→sigs chain (no WITH; expects a `dims` CTE in scope).
    * `keepJoin` restricts the signature pass to an upstream survivor set
    * (pipe_mm passes `JOIN keep USING (doc_id)`) — one parameterization so
    * the signature math exists in exactly one SQL copy. */
  private def phashSigCtes(keepJoin: String): String = {
    // unrolled votes + signature sum (simhashSql's shape); bit 63's literal
    // is min-long, but the 60-bit hash never votes it set, so the sum stays
    // in int64 range
    val votes = (0 until phashBits).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j").mkString(",\n    ")
    val sig = (0 until phashBits).map(j =>
      s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""ps AS (
       |  -- the decoded raster: pixel p = text[(p mod len)], so the pixel
       |  -- stream is the text cycled out to w*h characters
       |  SELECT doc_id,
       |    substr(repeat(text, CAST((w * h + length(text) - 1) // length(text) AS INTEGER)),
       |           1, CAST(w * h AS INTEGER)) AS pstr
       |  FROM dims $keepJoin WHERE length(text) > 0),
       |kg AS (
       |  SELECT DISTINCT doc_id,
       |    CAST('0x' || substr(md5('$phashSalt' || substr(pstr, CAST(i AS INTEGER), $phashWindow)), 1, 15) AS BIGINT) AS h
       |  FROM ps, LATERAL unnest(range(1, length(pstr) - ${phashWindow - 2})) t(i)),
       |votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM kg GROUP BY 1),
       |sigs AS (SELECT doc_id, CAST($sig AS BIGINT) AS phash FROM votes)""".stripMargin
  }

  val mmPhashSql: String =
    s"""WITH $dimsSqlCte,
       |${phashSigCtes("")}
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  bit_count(xor(a.phash, b.phash)) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $phashMaxHamming""".stripMargin

  /** Perceptual near-dup CLUSTERS — mm_phash's component consumer, closing
    * the last output-bound pair surface the same way dd_simhash_clusters
    * closed SimHash's: on a replicated media corpus the exact pair answer
    * grows as O(Σ g²) in duplicate-group size (99 pairs at sf0.1 → 215k at
    * the 10× sweep) while clusters grow linearly, and image dedup wants
    * "groups + a representative", not the pair list. Edge generation is
    * the verified spanning subset
    * ([[graft.functions.Banding.hammingStarEdges]] — bucket-min stars
    * checked by the same hamming ≤ 3 test, failures re-paired within their
    * bucket; components provably identical to the full [[mmPhash]] graph,
    * intermediate O(n·bands)); the component pass is the shared adaptive
    * [[graft.dedup.Dedup.clustersOf]]. The oracle replays the FULL pair
    * graph — independent of the generator. */
  def mmPhashClusters(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.Dedup.clustersOf(
      graft.functions.Banding.hammingStarEdges(
        mmPhashSigs(spark, sfDir), "phash", "doc_id", Nil,
        phashBands, phashBandBits, phashMaxHamming),
      spark, graft.dedup.Dedup.smallGraphMaxEdges)

  val mmPhashClustersSql: String =
    s"""WITH RECURSIVE $dimsSqlCte,
       |${phashSigCtes("")},
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= $phashMaxHamming),
       |edges AS (
       |  SELECT id_a, id_b FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(node, lbl) AS (
       |  SELECT DISTINCT id_a, id_a FROM edges
       |  UNION
       |  SELECT e.id_a, r.lbl FROM edges e JOIN reach r ON e.id_b = r.node)
       |SELECT node AS doc_id, min(lbl) AS cluster_id
       |FROM reach GROUP BY node""".stripMargin

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
  /** The packing stage over an arbitrary resized frame — mm_batchpack's
    * full-corpus form and pipe_mm's survivors-only form run the identical
    * code. */
  private def packFrom(rsz: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fmt"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rsz
      .select(col("doc_id"), col("fmt"),
        expr(s"doc_id DIV $packShardDocs").as("shard"),
        (col("out_w") * col("out_h")).cast("long").as("px"))
      .withColumn("cum", sum(col("px")).over(w))
      .groupBy(col("fmt"), col("shard"),
        expr(s"(cum - px) DIV $pixelBudget").as("batch"))
      .agg(count(lit(1)).as("n_items"), min(col("doc_id")).as("first_doc_id"),
        sum(col("px")).as("total_px"))
  }

  def mmBatchPack(spark: SparkSession, sfDir: String): DataFrame =
    packFrom(resized(spark, sfDir))

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

  // ---- the multimodal curation pipeline as ONE plan ------------------------

  /** The LAION-style media curation pipeline as ONE declarative plan —
    * pipe_curate's multimodal sibling: CLIP-score pair gate → perceptual-
    * hash near-dup dedup (min-id keeper over the GATED survivors — the
    * signature pass and banded join see only gate survivors, so dedup cost
    * shrinks with the gate's pass rate exactly as pipe_curate's dedup sees
    * only gated text) → accelerator batch packing of the survivors. Every
    * stage is the verified standalone operator (mm_pair's scored chain,
    * mm_phash's banded-hamming machinery, mm_batchpack's shard-bounded
    * cumsum) composed in one lineage; Catalyst sizes the dedup and pack
    * exchanges from post-gate statistics. Output = the batch manifest the
    * training loader consumes. */
  def pipeMm(spark: SparkSession, sfDir: String): DataFrame = {
    val kept = mmPair(spark, sfDir).filter(col("verdict") === "keep")
      .select(col("doc_id"))
    // restriction staged BEFORE the decode mapPartitions (Catalyst cannot
    // push a join below the typed boundary) — the signature pass really
    // does decode only gate survivors
    val sigs = phashSigsFrom(
      Tables(spark, sfDir).documents.join(kept, "doc_id")
        .select(col("doc_id"), col("text").cast("binary").as("payload")))
    // min-id keeper: a doc drops iff it has a LOWER-id perceptual near-dup
    // among the gate survivors. Edges come from the verified spanning
    // subset, not the full pair list (the round-7 consumer posture): every
    // emitted edge has id_a < id_b, and a doc with ANY lower-id true
    // neighbor is guaranteed an edge as id_b (verified star to the bucket
    // min if that verifies, else the fallback re-pairs it directly) — so
    // the drop set is IDENTICAL to the full pair list's {id_b}, from an
    // O(n·bands) intermediate instead of O(Σ g²) on replicated corpora.
    val pairs = graft.functions.Banding.hammingStarEdges(
      sigs, "phash", "doc_id", Nil, phashBands, phashBandBits, phashMaxHamming)
    val dups = pairs.select(col("id_b").as("doc_id")).distinct()
    val survivors = kept.join(dups, Seq("doc_id"), "left_anti")
    packFrom(resized(spark, sfDir).join(survivors, "doc_id"))
  }

  val pipeMmSql: String =
    s"""WITH $dimsSqlCte,
       |$pairChainCtes,
       |keep AS (
       |  SELECT doc_id FROM scored
       |  WHERE clip_score IS NOT NULL AND clip_score >= $pairThreshold),
       |${phashSigCtes("JOIN keep USING (doc_id)")},
       |dups AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= $phashMaxHamming),
       |surv AS (
       |  SELECT doc_id FROM keep
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dups)),
       |$metaChainCtes,
       |c AS (SELECT rsz.doc_id, fmt, rsz.doc_id // $packShardDocs AS shard,
       |  CAST(out_w * out_h AS BIGINT) AS px,
       |  sum(CAST(out_w * out_h AS BIGINT)) OVER (
       |    PARTITION BY fmt, rsz.doc_id // $packShardDocs
       |    ORDER BY rsz.doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM rsz JOIN surv ON rsz.doc_id = surv.doc_id)
       |SELECT fmt, shard, CAST((cum - px) // $pixelBudget AS BIGINT) AS batch,
       |  count(*) AS n_items, min(doc_id) AS first_doc_id,
       |  CAST(sum(px) AS BIGINT) AS total_px
       |FROM c GROUP BY 1, 2, 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_mm" -> (pipeMm _),
    "mm_meta" -> (mmMeta _),
    "mm_audio" -> (mmAudio _),
    "mm_audio_fp" -> (mmAudioFp _),
    "mm_resize_exec" -> (mmResizeExec _),
    "mm_video_shots" -> (mmVideoShots _),
    "mm_framesample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _),
    "mm_features" -> (mmFeatures _),
    "mm_pair" -> (mmPair _),
    "mm_phash" -> (mmPhash _),
    "mm_phash_clusters" -> (mmPhashClusters _),
    "mm_batchpack" -> (mmBatchPack _))

  def oracleSql: Map[String, String] = Map(
    "pipe_mm" -> pipeMmSql,
    "mm_meta" -> mmMetaSql,
    "mm_audio" -> mmAudioSql,
    "mm_audio_fp" -> mmAudioFpSql,
    "mm_resize_exec" -> mmResizeExecSql,
    "mm_video_shots" -> mmVideoShotsSql,
    "mm_framesample" -> mmFrameSampleSql,
    "mm_resize" -> mmResizeSql,
    "mm_features" -> mmFeaturesSql,
    "mm_pair" -> mmPairSql,
    "mm_phash" -> mmPhashSql,
    "mm_phash_clusters" -> mmPhashClustersSql,
    "mm_batchpack" -> mmBatchPackSql)
}
