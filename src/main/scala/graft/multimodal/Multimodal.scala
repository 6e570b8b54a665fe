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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _))

  def oracleSql: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql)
}
