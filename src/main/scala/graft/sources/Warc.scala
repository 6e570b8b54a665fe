package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (Web ARChive, ISO 28500) ingestion — the container format of
  * Common Crawl, the canonical 100 TB training-data source. The reference
  * ingests NDJSON over HTTP (eventstream.rs); a corpus build ingests WARC
  * dumps through the same engine, so the format gets first-class plumbing:
  * a pure record parser plus a Spark binding.
  *
  * Scale shape: the FILE is the parallelism unit (Common Crawl ships ~1 GB
  * segments, tens of thousands per dump — ample partitions), read via the
  * built-in `binaryFile` source so Spark's file listing/scheduling applies;
  * record splitting is per-partition CPU work with no shuffle. Gzip: whole-
  * file members are decompressed inline ([[gunzipAll]] walks concatenated
  * members, the layout Common Crawl uses — each record its own member).
  * Truncated or malformed tails yield the records parsed so far rather
  * than failing the file (dirty dumps are the norm, and losing a segment
  * to one bad record is worse than dropping the tail).
  */
object Warc {

  /** One parsed WARC record: envelope headers + raw payload bytes. */
  final case class WarcRecord(
      file: String,
      recordIndex: Int,
      warcType: String,
      targetUri: String, // "" when absent (WARC-Target-URI is optional)
      contentType: String, // "" when absent
      nBytes: Long,
      payload: Array[Byte])

  private val HeaderSep = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Decompress concatenated gzip members (the per-record-member layout
    * Common Crawl uses); plain bytes pass through untouched. */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b)
      return bytes
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)) // reads ALL members
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Parse one WARC file's bytes into records. Pure — spec-testable without
    * a SparkSession; tolerant of a malformed tail (returns what parsed). */
  def parseFile(file: String, raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes = gunzipAll(raw)
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    var ok = true
    while (ok) {
      // find the next record head (skips inter-record CRLF padding)
      val head = indexOf(bytes, "WARC/".getBytes(StandardCharsets.US_ASCII), pos)
      if (head < 0) ok = false
      else {
        val hdrEnd = indexOf(bytes, HeaderSep, head)
        if (hdrEnd < 0) ok = false // truncated header block: drop tail
        else {
          val headerText = new String(bytes, head, hdrEnd - head, StandardCharsets.UTF_8)
          val headers = headerText.split("\r\n").drop(1).flatMap { line =>
            line.indexOf(':') match {
              case -1 => None
              case c => Some(line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
                line.substring(c + 1).trim)
            }
          }.toMap
          headers.get("content-length").flatMap(_.toLongOption) match {
            case None => ok = false // a record without a length is unwalkable
            case Some(len) =>
              val start = hdrEnd + HeaderSep.length
              if (start + len > bytes.length) ok = false // truncated payload
              else {
                out += WarcRecord(
                  file = file,
                  recordIndex = idx,
                  warcType = headers.getOrElse("warc-type", ""),
                  targetUri = headers.getOrElse("warc-target-uri", ""),
                  contentType = headers.getOrElse("content-type", ""),
                  nBytes = len,
                  payload = java.util.Arrays.copyOfRange(bytes, start, (start + len).toInt))
                idx += 1
                pos = (start + len).toInt
              }
          }
        }
      }
    }
    out.result()
  }

  /** All records under `pathGlob` as a typed Dataset. `binaryFile` carries
    * whole files to executors (the WARC segment is the split unit); record
    * extraction is shuffle-free per-partition work. */
  def read(spark: SparkSession, pathGlob: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, b) => parseFile(p, b) })
  }

  /** The corpus-build projection: HTTP response records only, payload
    * decoded as text — the frame the documents pipeline starts from. */
  def responses(spark: SparkSession, pathGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    read(spark, pathGlob)
      .filter(col("warcType") === "response")
      .map(r => (r.targetUri, new String(r.payload, StandardCharsets.UTF_8)))
  }
}
