package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * pipeline runs before batching GPU work. */
  def mmResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mmMeta(spark, sfDir)
      .withColumn("longest", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("longest") <= resizeMax, col("width"))
          .otherwise(greatest(lit(1),
            expr(s"CAST(width * $resizeMax DIV longest AS INT)"))).as("out_w"),
        when(col("longest") <= resizeMax, col("height"))
          .otherwise(greatest(lit(1),
            expr(s"CAST(height * $resizeMax DIV longest AS INT)"))).as("out_h"))
  }

  val mmResizeSql: String =
    s"""WITH meta AS ($mmMetaSql),
       |m AS (SELECT *, greatest(width, height) AS longest FROM meta)
       |SELECT doc_id, width, height,
       |  CASE WHEN longest <= $resizeMax THEN width
       |       ELSE greatest(1, CAST(width * $resizeMax // longest AS INTEGER)) END AS out_w,
       |  CASE WHEN longest <= $resizeMax THEN height
       |       ELSE greatest(1, CAST(height * $resizeMax // longest AS INTEGER)) END AS out_h
       |FROM m""".stripMargin

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _),
    "mm_framesample" -> (mmFrameSample _),
    "mm_resize" -> (mmResize _),
    "mm_features" -> (mmFeatures _))

  def oracleSql: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_framesample" -> mmFrameSampleSql,
    "mm_resize" -> mmResizeSql,
    "mm_features" -> mmFeaturesSql)
}
